"""Pallas TPU block-sparse kernels: SpMM and SDDMM with custom VJPs.

Forward kernels:
  * SpMM  — Y = A @ X with A in BSR form (ops/bsr.py). Grid iterates nonzero
    blocks row-major; each step is one 128x128 x 128xF MXU matmul accumulated
    into the output tile, which is zero-initialized via an aliased zeros
    input (so uncovered rows are correctly zero) and stays VMEM-resident
    while its row's blocks stream through.
  * sampled matmul (SDDMM core) — (A @ B)[pattern]: one output tile per
    nonzero block of the graph.

Both use PrefetchScalarGridSpec so the block row/column index arrays steer
the BlockSpec DMA pipeline.

Backward passes close under the same two kernels (defined as custom VJPs
because autodiff through scalar-prefetch pallas_calls is unsupported):
  * d/dX  SpMM   = SpMM with the block-transposed graph;
  * d/dA  SpMM   = sampled_matmul(dY, X^T) at the graph pattern;
  * d/dE1 SDDMM  = SpMM(mask.dS, E2^T);  d/dE2 = SpMM(transpose(mask.dS), E1)^T.

This is the aggregation path for graphs where dense N x N supports are
impossible (50k-1M nodes, BASELINE.json configs 4-5). Dense einsum remains
the fast path at N<=403.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int_zero_grads(*arrays):
    return tuple(np.zeros(a.shape, dtype=jax.dtypes.float0) for a in arrays)


# --------------------------------------------------------------------- SpMM
def _spmm_kernel(row_of_ref, col_of_ref, values_ref, x_ref, init_ref, out_ref):
    del row_of_ref, init_ref  # init is aliased into out; row steers the out index_map
    out_ref[...] += jnp.dot(values_ref[0], x_ref[0], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "out_blocks"))
def _spmm_impl(values, row_of, col_of, x, block: int, interpret: bool, out_blocks=None):
    """Dispatch to the row-streaming kernel (ops/spmm_stream.py, 1.26x and
    bit-exact vs the block-grid kernel below) when the feature width is
    lane-aligned; row_ptr is derived in-graph from the row-major-sorted row
    ids. Mosaic requires in-kernel DMA slices to be 128-aligned in the last
    dim, so narrow-feature calls (e.g. the model's T*B*C-flattened
    aggregations at small batch) keep the BlockSpec-pipelined block-grid
    kernel, whose pipeline pads transparently."""
    if x.shape[1] % 128 == 0:
        from multistgraph_tpu.ops.spmm_stream import spmm_stream

        n_rows = out_blocks if out_blocks is not None else x.shape[0] // block
        row_ptr = jnp.searchsorted(
            row_of, jnp.arange(n_rows + 1, dtype=row_of.dtype), side="left"
        ).astype(jnp.int32)
        return spmm_stream(values, row_ptr, col_of, x, block=block,
                           out_blocks=out_blocks, interpret=interpret)
    return _spmm_blockgrid(values, row_of, col_of, x, block=block,
                           interpret=interpret, out_blocks=out_blocks)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "out_blocks"))
def _spmm_blockgrid(values, row_of, col_of, x, block: int, interpret: bool, out_blocks=None):
    nnz = values.shape[0]
    n_pad, feat = x.shape
    in_blocks = n_pad // block
    # Output row-block count defaults to the input's (square A); boundary-
    # exchange SpMM reads from a receive buffer whose length is unrelated to
    # the output rows, so callers may pass out_blocks explicitly.
    n_blocks = out_blocks if out_blocks is not None else in_blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz,),
        in_specs=[
            pl.BlockSpec((1, block, block), lambda i, row_of, col_of: (i, 0, 0)),
            pl.BlockSpec((1, block, feat), lambda i, row_of, col_of: (col_of[i], 0, 0)),
            pl.BlockSpec((1, block, feat), lambda i, row_of, col_of: (row_of[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, feat), lambda i, row_of, col_of: (row_of[i], 0, 0)),
    )
    init = jnp.zeros((n_blocks, block, feat), jnp.float32)
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, feat), jnp.float32),
        input_output_aliases={4: 0},  # indices count the scalar-prefetch args
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nnz * block * block * feat,
            bytes_accessed=nnz * block * block * 4 + nnz * block * feat * 8,
            transcendentals=0,
        ),
    )(row_of, col_of, values, x.reshape(in_blocks, block, feat), init)
    return out.reshape(n_blocks * block, feat)


# --------------------------------------------------- sampled matmul (SDDMM)
def _sampled_kernel(row_of_ref, col_of_ref, a_ref, b_ref, out_ref):
    acc = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)[None]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _sampled_matmul_impl(a, b, row_of, col_of, block: int, interpret: bool):
    """(A @ B) evaluated only at the graph's nonzero blocks.

    a (n_pad, d), b (d, n_pad) -> (nnz, block, block).
    """
    nnz = row_of.shape[0]
    d = a.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i, row_of, col_of: (row_of[i], 0)),
            pl.BlockSpec((d, block), lambda i, row_of, col_of: (0, col_of[i])),
        ],
        out_specs=pl.BlockSpec((1, block, block), lambda i, row_of, col_of: (i, 0, 0)),
    )
    # each tile is written ONCE (no accumulation), so emitting the operand
    # dtype is a single rounding — under compute_dtype='bfloat16' this halves
    # the dominant (nnz, b, b) score array (2.4 GB at 1M nodes)
    out_dtype = a.dtype if a.dtype == jnp.bfloat16 else jnp.float32
    return pl.pallas_call(
        _sampled_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnz, block, block), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nnz * block * block * d,
            bytes_accessed=nnz * (2 * block * d + block * block) * 4,
            transcendentals=0,
        ),
    )(row_of, col_of, a, b)


def spmm_jax(values, row_of, col_of, x, block: int = 128, out_blocks=None):
    """Pure-jax BSR SpMM (gather + batched matmul + segment_sum).

    Reference/fallback implementation of `spmm` for backends without Pallas
    (CPU-compiled scaling benches, correctness cross-checks). Differentiable
    through native ops; numerically identical to the Pallas kernel.
    """
    n_pad, feat = x.shape
    nb = out_blocks if out_blocks is not None else n_pad // block
    xb = x.reshape(-1, block, feat)
    contrib = jnp.einsum(
        "ebc,ecf->ebf", values, xb[col_of], preferred_element_type=jnp.float32
    )
    return jax.ops.segment_sum(contrib, row_of, num_segments=nb).reshape(nb * block, feat)


def bsr_transpose(values, row_of, col_of, n_blocks: int):
    """Block-transpose: swap row/col, transpose tiles, re-sort row-major."""
    # int32 is ample: n_blocks^2 < 2^31 up to ~5.9M padded nodes
    key = col_of.astype(jnp.int32) * n_blocks + row_of
    perm = jnp.argsort(key)
    return (
        jnp.transpose(values[perm], (0, 2, 1)),
        col_of[perm],
        row_of[perm],
    )


# ------------------------------------------------------- public: spmm (VJP)
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _spmm_vjp(values, row_of, col_of, x, block, interpret, out_blocks):
    return _spmm_impl(values, row_of, col_of, x, block=block, interpret=interpret,
                      out_blocks=out_blocks)


def _spmm_fwd(values, row_of, col_of, x, block, interpret, out_blocks):
    y = _spmm_impl(values, row_of, col_of, x, block=block, interpret=interpret,
                   out_blocks=out_blocks)
    return y, (values, row_of, col_of, x)


def _spmm_bwd(block, interpret, out_blocks, res, dy):
    values, row_of, col_of, x = res
    n_blocks = x.shape[0] // block
    # Under compute_dtype='bfloat16' round dy ONCE before the backward
    # kernels: dV then leaves the sampled matmul already bf16, so the
    # (nnz, b, b) gradient accumulator XLA carries across the time scan is
    # half the bytes — at 1M nodes the f32 accumulators were the largest
    # allocations in the training step (2.4 GB each, docs/DESIGN.md §4).
    # dy was produced from a bf16 stream anyway; rounding before instead of
    # after the multiply-accumulate costs <1 ulp of bf16.
    if x.dtype == jnp.bfloat16:
        dy = dy.astype(jnp.bfloat16)
    # sort-key multiplier must exceed every row id (rows can outnumber x's
    # blocks for rectangular A)
    v_t, r_t, c_t = bsr_transpose(values, row_of, col_of, max(n_blocks, out_blocks or 0))
    dx = _spmm_impl(v_t, r_t, c_t, dy, block=block, interpret=interpret, out_blocks=n_blocks)
    dvalues = _sampled_matmul_impl(dy, x.T, row_of, col_of, block=block, interpret=interpret)
    zr, zc = _int_zero_grads(row_of, col_of)
    # kernels accumulate f32; cotangents must match the primal dtypes
    # (bf16 primals under compute_dtype='bfloat16')
    return dvalues.astype(values.dtype), zr, zc, dx.astype(x.dtype)


_spmm_vjp.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(values, row_of, col_of, x, block: int = 128, interpret: bool = False,
         out_blocks=None):
    """Y = A @ X; values (nnz, b, b) f32, row_of/col_of (nnz,) int32 sorted by
    row, x (padded_nodes, feat). Differentiable w.r.t. values and x.

    out_blocks (static) sets the output's row-block count when it differs from
    x's (rectangular A, e.g. aggregation from a boundary receive buffer)."""
    return _spmm_vjp(values, row_of, col_of, x, block, interpret, out_blocks)


# ------------------------------------------- public: spmm_pret (hoisted A^T)
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _spmm_pret_vjp(values, v_t, row_of, col_of, r_t, c_t, x, block, interpret,
                   out_blocks):
    return _spmm_impl(values, row_of, col_of, x, block=block,
                      interpret=interpret, out_blocks=out_blocks)


def _spmm_pret_fwd(values, v_t, row_of, col_of, r_t, c_t, x, block, interpret,
                   out_blocks):
    y = _spmm_impl(values, row_of, col_of, x, block=block, interpret=interpret,
                   out_blocks=out_blocks)
    return y, (v_t, row_of, col_of, r_t, c_t, x)


def _spmm_pret_bwd(block, interpret, out_blocks, res, dy):
    v_t, row_of, col_of, r_t, c_t, x = res
    vdtype = v_t.dtype  # transposed copy shares the primal values' dtype
    n_blocks = x.shape[0] // block
    # see _spmm_bwd: bf16 dy keeps the scan-carried dV accumulator bf16
    if x.dtype == jnp.bfloat16:
        dy = dy.astype(jnp.bfloat16)
    dx = _spmm_impl(v_t, r_t, c_t, dy, block=block, interpret=interpret,
                    out_blocks=n_blocks)
    dvalues = _sampled_matmul_impl(dy, x.T, row_of, col_of, block=block,
                                   interpret=interpret)
    zr, zc, zrt, zct = _int_zero_grads(row_of, col_of, r_t, c_t)
    # y never reads v_t (it only steers the backward), so its cotangent is
    # exactly zero; callers stop_gradient the transpose so XLA drops it.
    return (dvalues.astype(vdtype), jnp.zeros_like(v_t), zr, zc, zrt, zct,
            dx.astype(x.dtype))


_spmm_pret_vjp.defvjp(_spmm_pret_fwd, _spmm_pret_bwd)


def spmm_pret(values, pre_t, row_of, col_of, x, block: int = 128,
              interpret: bool = False, out_blocks=None):
    """`spmm` with a caller-precomputed block transpose `pre_t = (v_t, r_t,
    c_t)` (from bsr_transpose) steering the backward dX pass.

    Why it exists: inside a lax.scan, plain `spmm`'s backward re-derives the
    block transpose (argsort + gather + tile transpose of the FULL value
    array) at every step — at 1M nodes that is two ~1.2 GB copies live per
    step inside the while body, which is both the measured HBM-OOM driver
    and wasted bandwidth (docs/DESIGN.md §4). The transpose of a
    loop-invariant support is itself loop-invariant; computing it ONCE
    outside the scan and threading it here makes the backward a pure pair of
    kernel calls. Callers should pass `pre_t` under jax.lax.stop_gradient —
    y does not depend on it, so its cotangent is identically zero.
    """
    v_t, r_t, c_t = pre_t
    return _spmm_pret_vjp(values, v_t, row_of, col_of, r_t, c_t, x, block,
                          interpret, out_blocks)


# -------------------------------------------------- public: sddmm_relu (VJP)
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sddmm_vjp(e1, e2, row_of, col_of, block, interpret):
    raw = _sampled_matmul_impl(e1, e2, row_of, col_of, block=block, interpret=interpret)
    return jnp.maximum(raw, 0.0)


def _sddmm_fwd(e1, e2, row_of, col_of, block, interpret):
    raw = _sampled_matmul_impl(e1, e2, row_of, col_of, block=block, interpret=interpret)
    return jnp.maximum(raw, 0.0), (e1, e2, row_of, col_of, raw > 0)


def _sddmm_bwd(block, interpret, res, ds):
    e1, e2, row_of, col_of, mask = res
    dm = jnp.where(mask, ds, 0.0)
    n_blocks = e1.shape[0] // block
    de1 = _spmm_impl(dm, row_of, col_of, e2.T, block=block, interpret=interpret)
    m_t, r_t, c_t = bsr_transpose(dm, row_of, col_of, n_blocks)
    de2 = _spmm_impl(m_t, r_t, c_t, e1, block=block, interpret=interpret).T
    zr, zc = _int_zero_grads(row_of, col_of)
    return de1.astype(e1.dtype), de2.astype(e2.dtype), zr, zc


_sddmm_vjp.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm_relu(e1, e2, row_of, col_of, block: int = 128, interpret: bool = False):
    """relu(E1 @ E2) at the graph's nonzero blocks -> (nnz, block, block).

    The adaptive-adjacency scores softmax(relu(E1 E2^T)) before row
    normalization (ref MultiATGCN.py:81-83; at sparse scale the softmax is
    over the sampled support — see sparse_row_softmax). Differentiable.
    """
    return _sddmm_vjp(e1, e2, row_of, col_of, block, interpret)


def sparse_row_softmax(values, row_of, num_row_blocks: int):
    """Row-normalize BSR scores: exp(v)/sum over the row's sampled entries.

    Sparse analogue of softmax(relu(.)): the dense reference includes
    exp(0)=1 terms for absent edges; this definition normalizes over sampled
    edges only (exact at full density). The deviation is QUANTIFIED in
    tests/test_sparse_softmax_parity.py: at N=512, xavier-scale embeddings
    and ~5-10% block density, aggregation with the sampled softmax differs
    from the dense reference by ~O(1) relative error (the dense matrix is
    dominated by its exp(0) background, measured rel-L2 ~0.9), so for strict
    reference parity use sparse_row_softmax_dense_corrected, which reproduces
    the dense semantics EXACTLY (to float tolerance, asserted <1e-5) at
    sparse cost via a rank-1 background term.
    """
    # exp stays in the input dtype (bf16 under compute_dtype — the (nnz,b,b)
    # array is the footprint that matters); row sums accumulate in f32
    exp_vals = jnp.where(values > 0, jnp.exp(values), 0.0)
    per_block_rowsum = exp_vals.sum(axis=2, dtype=jnp.float32)  # (nnz, block)
    totals = jax.ops.segment_sum(per_block_rowsum, row_of, num_segments=num_row_blocks)
    denom = jnp.maximum(totals[row_of], 1e-9)  # (nnz, block)
    return exp_vals / denom[:, :, None].astype(exp_vals.dtype)


def sparse_row_softmax_dense_corrected(values, row_of, num_row_blocks: int, num_nodes: int):
    """EXACT sparse form of the reference's dense softmax(relu(E1 E2^T))
    (ref MultiATGCN.py:81-83), including the exp(0)=1 terms the dense matrix
    carries for absent edges and relu-clipped scores.

    Decomposition: with sampled positive scores v at the graph pattern,
      softmax_row(relu(S))_ij = [1 + (exp(v_ij) - 1) 1{sampled, v>0}] / Z_i,
      Z_i = N + sum_{sampled, v>0} (exp(v_ij) - 1)
    i.e. a sparse matrix of (exp(v)-1)/Z_i at the pattern plus the rank-1
    background (1/Z_i) * 1 1^T. Aggregation therefore is
      spmm(corrected_values, x) + background[:, None] * sum_j x_j.

    Returns (corrected_values (nnz, b, b), background (num_row_blocks, b)).
    """
    expm1 = jnp.where(values > 0, jnp.expm1(values), 0.0)
    per_block_rowsum = expm1.sum(axis=2, dtype=jnp.float32)
    totals = jax.ops.segment_sum(per_block_rowsum, row_of, num_segments=num_row_blocks)
    z = num_nodes + totals  # (num_row_blocks, block), f32
    vals = expm1 / z[row_of][:, :, None].astype(expm1.dtype)
    return vals, (1.0 / z).astype(expm1.dtype)
