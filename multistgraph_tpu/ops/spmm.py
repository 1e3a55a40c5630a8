"""Pallas TPU SpMM: block-sparse adjacency times dense node features.

Y = A @ X with A in BSR form (ops/bsr.py) and X (padded_nodes, feat). Grid
iterates the nonzero blocks in row-major order; the output tile for a row
block stays resident in VMEM while its blocks stream through (revisited
output pattern), each step doing one 128x128 x 128xF MXU matmul. Block row
and column indices arrive via scalar prefetch so the BlockSpec index_maps can
steer the DMA pipeline (X tiles double-buffered by the Pallas runtime).

This is the aggregation kernel for graphs where dense N x N supports are
impossible (50k-1M nodes, BASELINE.json configs 4-5). Dense einsum remains
the fast path at N<=403.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spmm_kernel(row_of_ref, col_of_ref, values_ref, x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when((i == 0) | (row_of_ref[i] != row_of_ref[jnp.maximum(i - 1, 0)]))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jnp.dot(
        values_ref[0], x_ref[0], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def spmm(values, row_of, col_of, x, block: int = 128, interpret: bool = False):
    """Y = A @ X.

    values (nnz, block, block) f32; row_of/col_of (nnz,) int32 sorted by row;
    x (padded_nodes, feat) with feat a multiple of 128 for full MXU tiles.
    Returns (padded_nodes, feat).
    """
    nnz = values.shape[0]
    n_pad, feat = x.shape
    n_blocks = n_pad // block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz,),
        in_specs=[
            pl.BlockSpec((1, block, block), lambda i, row_of, col_of: (i, 0, 0)),
            pl.BlockSpec((1, block, feat), lambda i, row_of, col_of: (col_of[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, feat), lambda i, row_of, col_of: (row_of[i], 0, 0)),
    )
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nnz * block * block * feat,
            bytes_accessed=nnz * block * block * 4 + nnz * block * feat * 8,
            transcendentals=0,
        ),
    )(row_of, col_of, values, x.reshape(n_blocks, block, feat))
    return out.reshape(n_pad, feat)


def _sddmm_kernel(row_of_ref, col_of_ref, e1_ref, e2_ref, out_ref):
    out_ref[...] = jnp.maximum(
        jnp.dot(e1_ref[...], e2_ref[...], preferred_element_type=jnp.float32), 0.0
    )[None]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def sddmm_relu(e1, e2, row_of, col_of, block: int = 128, interpret: bool = False):
    """Sampled dense-dense matmul: relu(E1 @ E2) at the graph's nonzero blocks.

    e1 (padded_nodes, d), e2 (d, padded_nodes), d a multiple of 128 preferred.
    Returns (nnz, block, block) block values — the adaptive-adjacency scores
    softmax(relu(E1 E2^T)) before row normalization (ref MultiATGCN.py:81-83;
    at sparse scale the softmax is taken over the sampled support, see
    ops/adaptive.py).
    """
    nnz = row_of.shape[0]
    n_pad, d = e1.shape
    n_blocks = n_pad // block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i, row_of, col_of: (row_of[i], 0)),
            pl.BlockSpec((d, block), lambda i, row_of, col_of: (0, col_of[i])),
        ],
        out_specs=pl.BlockSpec((1, block, block), lambda i, row_of, col_of: (i, 0, 0)),
    )
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnz, block, block), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nnz * block * block * d,
            bytes_accessed=nnz * (2 * block * d + block * block) * 4,
            transcendentals=0,
        ),
    )(row_of, col_of, e1, e2)


def sparse_row_softmax(values, row_of, num_row_blocks: int):
    """Row-normalize BSR scores: values[b,i,j] / sum_j' over the row.

    Sparse analogue of softmax(relu(.)) with exp omitted on zeros — the dense
    reference includes exp(0)=1 terms for absent edges, which vanish at 1M
    nodes; the sparse definition normalizes over sampled edges only
    (documented deviation, exact at full density).
    """
    exp_vals = jnp.where(values > 0, jnp.exp(values), 0.0)
    per_block_rowsum = exp_vals.sum(axis=2)  # (nnz, block)
    totals = jax.ops.segment_sum(per_block_rowsum, row_of, num_segments=num_row_blocks)
    denom = jnp.maximum(totals[row_of], 1e-9)  # (nnz, block)
    return exp_vals / denom[:, :, None]
