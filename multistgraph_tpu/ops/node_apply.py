"""Pallas TPU kernels for the node-conditioned weight application.

The AGCN recurrence applies a DIFFERENT (K*I, O) weight matrix to every
graph node (reference MultiATGCN.py:104-108: W[n] = node_emb[n] . pool).
XLA lowers `einsum('bkni,nkio->bno')` to an n-batched matmul with M=B=16
rows per node: each MXU weight tile is loaded for only 16 row-flows, so the
op runs at ~B/128 of matmul peak AND streams the expanded 58 MB weight
tensor from HBM every scan step.

These kernels never materialize the expanded weights. They compute

    out[b,n,o] = sum_d e[n,d] * sum_{k,i} hh[b,k,n,i] * pool[k,i,d,o]

as ONE full-M matmul against the (K*I, D*O) pool — resident in VMEM via a
constant-index BlockSpec, fetched once per pallas_call — followed by an
in-register contraction with the node embedding e[n]:

    r[b,n,(d,o)] = hh[b,n,(k,i)] @ poolmat          # M = 128-row tiles
    out[b,n,o]   = sum_d e[n,d] * r[b,n,d,o]        # VPU, r never leaves VMEM

The D-fold FLOP blow-up (D=embed_dim_node, 20 in the flagship config) is
the price of full MXU utilization; in bf16 the dots still finish ~4x ahead
of the expanded-weight stream, and the only HBM traffic is hh in and out
out (~6 MB/step vs ~58 MB).

The transposed kernel computes the matching input cotangent

    dhh[b,k,n,i] = sum_o dpre[b,n,o] * W[n,k,i,o]
                 = (e[n,d] * dpre[b,n,o])[(d,o)] @ poolmat_T[(d,o),(k,i)]

by forming q = e (x) dpre on the VPU in VMEM and hitting the same
VMEM-resident pool transposed.

Both are forward-only building blocks: they are called inside the hand
written BPTT of `fused_atgru_layer` (models/multi_atgcn.py), which is
itself a custom-VJP boundary, so autodiff never traces through them.

Grid/tile layout: rows are (b, n) pairs of the (B, K, N, I) activation
tensor; a grid step owns one batch element x one 128-node slab, so the
BlockSpec gathers all K slabs of those nodes without any relayout, and the
node embedding tile is shared by every row of the slab. N is padded to a
multiple of 128 by the wrappers (zero rows in, garbage rows sliced off).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_kernel(hh_ref, e_ref, pool_ref, out_ref, *, kk, dd, oo):
    """out = sum_d e[:, d] * (sum_k hh[k] @ pool[k])[:, d*oo:(d+1)*oo]."""
    r = jax.lax.dot_general(
        hh_ref[0, 0], pool_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for k in range(1, kk):
        r = r + jax.lax.dot_general(
            hh_ref[0, k], pool_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = e_ref[:, 0:1].astype(jnp.float32) * r[:, :oo]
    for d in range(1, dd):
        acc = acc + e_ref[:, d : d + 1].astype(jnp.float32) * r[:, d * oo : (d + 1) * oo]
    out_ref[...] = acc[None]


def _apply_t_kernel(dpre_ref, e_ref, pool_t_ref, dhh_ref, *, kk, dd):
    """dhh[k] = q @ pool_t[k] with q[:, d*O+o] = e[:, d] * dpre[:, o]."""
    dpre = dpre_ref[0]
    q = jnp.concatenate(
        [e_ref[:, d : d + 1].astype(dpre.dtype) * dpre for d in range(dd)], axis=1
    )
    for k in range(kk):
        dhh_ref[0, k] = jax.lax.dot_general(
            q, pool_t_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dhh_ref.dtype)


def _pad_nodes(a, axis, n_pad):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n_pad - a.shape[axis])
    return jnp.pad(a, pad) if n_pad != a.shape[axis] else a


@functools.partial(jax.jit, static_argnames=("interpret",))
def node_factored_apply(hh, e, poolmat, interpret: bool = False):
    """out[b,n,o] = sum_{d,k,i} e[n,d] hh[b,k,n,i] poolmat[k, i, (d*O+o)].

    hh: (B, K, N, I) activation (any float dtype; dots accumulate f32),
    e: (N, D) node embedding, poolmat: (K, I, D*O) pool (same dtype as hh).
    Returns (B, N, O) float32.
    """
    b, kk, n, ii = hh.shape
    dd = e.shape[1]
    oo = poolmat.shape[2] // dd
    n_pad = -(-n // 128) * 128
    hh = _pad_nodes(hh, 2, n_pad)
    e = _pad_nodes(e, 0, n_pad)
    grid = (b, n_pad // 128)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, kk=kk, dd=dd, oo=oo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kk, 128, ii), lambda bi, ni: (bi, 0, ni, 0)),
            pl.BlockSpec((128, dd), lambda bi, ni: (ni, 0)),
            pl.BlockSpec((kk, ii, dd * oo), lambda bi, ni: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 128, oo), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, oo), jnp.float32),
        interpret=interpret,
    )(hh, e, poolmat)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def node_factored_apply_t(dpre, e, poolmat_t, out_dtype=None, interpret: bool = False):
    """dhh[b,k,n,i] = sum_{d,o} e[n,d] dpre[b,n,o] poolmat_t[k, (d*O+o), i].

    dpre: (B, N, O) cotangent, e: (N, D), poolmat_t: (K, D*O, I).
    Returns (B, K, N, I) in out_dtype (defaults to dpre.dtype).
    """
    b, n, oo = dpre.shape
    kk, _, ii = poolmat_t.shape
    dd = e.shape[1]
    out_dtype = out_dtype or dpre.dtype
    n_pad = -(-n // 128) * 128
    dpre = _pad_nodes(dpre, 1, n_pad)
    e = _pad_nodes(e, 0, n_pad)
    grid = (b, n_pad // 128)
    dhh = pl.pallas_call(
        functools.partial(_apply_t_kernel, kk=kk, dd=dd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128, oo), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((128, dd), lambda bi, ni: (ni, 0)),
            pl.BlockSpec((kk, dd * oo, ii), lambda bi, ni: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, kk, 128, ii), lambda bi, ni: (bi, 0, ni, 0)),
        out_shape=jax.ShapeDtypeStruct((b, kk, n_pad, ii), out_dtype),
        interpret=interpret,
    )(dpre, e, poolmat_t)
    return dhh[:, :, :n]


def pool_to_kernel_layout(pool, gate=None):
    """(D, K, I, O) parameter pool -> ((K, I, D*O), (K, D*O, I)) kernel mats.

    gate: optional (K,) per-support scale (softmax of weights_g, folded into
    the pool exactly as `_cell_weights` folds it into the expanded weights).
    Differentiable (pure transpose/reshape/scale) — the model calls this
    inside its flax forward so the pool parameter's gradient flows through.
    """
    d, kk, ii, oo = pool.shape
    if gate is not None:
        pool = pool * gate[None, :, None, None]
    mat = jnp.transpose(pool, (1, 2, 0, 3)).reshape(kk, ii, d * oo)
    mat_t = jnp.transpose(pool, (1, 0, 3, 2)).reshape(kk, d * oo, ii)
    return mat, mat_t


# ---------------------------------------------------------------------------
# int8 EXPANDED-weight streaming (round 5, VERDICT item 3).
#
# The factored kernels above trade the weight stream for a D-fold FLOP
# blow-up; at the flagship D=20 the dots lose to the stream (bench_node_dots
# variant B vs C).  The alternative that wins bytes without extra FLOPs:
# keep the EXPANDED per-node weights W[n] = e[n] . pool, but store the scan
# loop-invariant int8 with per-(node, out-channel) scales and convert in
# VMEM — the per-timestep HBM read halves vs bf16.  Per-(n,o) scales
# commute with the (k,i) contraction, so
#     out[n,b,o] = (hh[n,b,:] @ wq[n,:,o]) * s[n,o]
# is EXACT dequantized math (one multiply after the dot, no in-kernel
# dequant pass).  XLA cannot do this transform itself: a convert op feeding
# einsum materializes the bf16 copy in HBM (or is hoisted out of the scan
# entirely, recreating today's stream).
#
# Layout: activations arrive (N, B, K*I) — the scan's aggregation einsum
# emits 'knm,bmc->nbkc' and the (K,C)->(K*C) merge happens outside the
# kernel (adjacent dims; XLA handles it).  Mosaic supports this per-node
# batched dot form directly (probed on-chip round 2, DESIGN.md §10).
# ---------------------------------------------------------------------------


def quantize_node_weights(w):
    """(N, KI, O) float -> ((N, KI, O) int8, (N, 1, O) f32 scales).

    Symmetric absmax per (node, output-channel): each scale covers the KI
    contraction values of one output column of one node.
    """
    a = jnp.abs(w).max(axis=1, keepdims=True)
    scale = (jnp.maximum(a, 1e-12) / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _apply_q8_kernel(hh_ref, wq_ref, s_ref, out_ref):
    w = wq_ref[...].astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        hh_ref[...], w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = out * s_ref[...]


def _apply_q8_t_kernel(dpre_ref, wq_ref, s_ref, dhh_ref):
    # dhh[n,b,ki] = (dpre[n,b,o] * s[n,o]) @ wq[n,ki,o]^T — scales fold into
    # the cotangent BEFORE the dot (they are per contraction-dim o here)
    d = (dpre_ref[...] * s_ref[...]).astype(jnp.bfloat16)
    w = wq_ref[...].astype(jnp.bfloat16)
    dhh_ref[...] = jax.lax.dot_general(
        d, w, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dhh_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def node_apply_q8(hh, wq, scale, block: int = 32, interpret: bool = False):
    """out[n,b,o] = (sum_ki hh[n,b,ki] wq[n,ki,o]) * scale[n,0,o].

    hh: (N, B, KI) any float; wq: (N, KI, O) int8; scale: (N, 1, O) f32.
    Returns (N, B, O) f32.  The int8 weights are the only weight-sized HBM
    read; conversion to bf16 happens in VMEM.
    """
    n, b, ki = hh.shape
    o = wq.shape[2]
    n_pad = -(-n // block) * block
    hh = _pad_nodes(hh, 0, n_pad)
    wq = _pad_nodes(wq, 0, n_pad)
    scale = _pad_nodes(scale, 0, n_pad)
    grid = (n_pad // block,)
    out = pl.pallas_call(
        _apply_q8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, b, ki), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((block, ki, o), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((block, 1, o), lambda ni: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, b, o), lambda ni: (ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, b, o), jnp.float32),
        interpret=interpret,
    )(hh, wq, scale)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("out_dtype", "block", "interpret"))
def node_apply_q8_t(dpre, wq, scale, out_dtype=None, block: int = 32,
                    interpret: bool = False):
    """dhh[n,b,ki] = sum_o dpre[n,b,o] * scale[n,0,o] * wq[n,ki,o].

    dpre: (N, B, O); wq/scale as node_apply_q8. Returns (N, B, KI)."""
    n, b, o = dpre.shape
    ki = wq.shape[1]
    out_dtype = out_dtype or dpre.dtype
    n_pad = -(-n // block) * block
    dpre = _pad_nodes(dpre, 0, n_pad)
    wq = _pad_nodes(wq, 0, n_pad)
    scale = _pad_nodes(scale, 0, n_pad)
    grid = (n_pad // block,)
    dhh = pl.pallas_call(
        _apply_q8_t_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, b, o), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((block, ki, o), lambda ni: (ni, 0, 0)),
            pl.BlockSpec((block, 1, o), lambda ni: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, b, ki), lambda ni: (ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, b, ki), out_dtype),
        interpret=interpret,
    )(dpre, wq, scale)
    return dhh[:n]


# A k-major variant (kernels consuming the aggregation dot's natural
# (K, N, B, C) order, per-k dots in-kernel) was built and measured in
# round 5 and REMOVED: it benched worse than the merged-(N,B,KI) form
# inside the full training step (20.89 vs 19.84 ms/step — DESIGN.md §10,
# git history has the code).
