"""Multi-ATGCN, re-designed TPU-first in flax + lax.scan.

Capability parity with the reference model
(ref: libcity/model/traffic_flow_prediction/MultiATGCN.py:59-430):
multi-head temporal fusion (closeness/period/trend blocks gated by a softmax
head gate and per-hour/node/channel weights), an adaptive-graph-convolution
GRU encoder with node-conditioned Chebyshev weight pools and a learned
per-(layer, step) mix with a plain residual GRU, static-feature-conditioned
initial hidden state, and a conv output head.

TPU-first re-design (NOT a translation of the reference's per-step loops):

  * the 2-layer x 24-step Python loop (ref :194-212) becomes one
    ``lax.scan`` per layer, compiled once;
  * the support stack is built ONCE per forward; the reference rebuilds it
    inside all 96 AGCN invocations per step (ref :94-101);
  * each AGCN cell's softmax(weights_g) support scaling is folded into the
    node-conditioned weight pool instead of scaling the N x N supports
    (linearity: (g_k S_k) x W = S_k x (g_k W)), so the expensive
    aggregation S @ h is shared across cells;
  * the graph aggregation of the time-invariant input part S @ x_t is hoisted
    out of the scan and computed for all steps in one batched einsum (the
    gate and candidate AGCNs both reuse it), halving per-step graph matmuls;
  * node-conditioned weights W[n] = node_emb[n] . weights_pool are computed
    once per forward, not once per cell call (the reference recomputes them
    ~96x per step-loop, ref :104-105).

Initialization parity: the reference's ``_init_parameters`` overwrites every
parameter with xavier_uniform (dim>1) / U[0,1) (vectors) AFTER the SVD/PCA
setup (ref :348,356-361), so the effective init is xavier/uniform; that is the
default here, with the SVD/PCA recipe available via config ``svd_init=True``
(see models/initializers.py).
"""

import functools
import os
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.graph import views as graph_views
from multistgraph_tpu.models import initializers
from multistgraph_tpu.ops import layout as layout_ops
from multistgraph_tpu.ops import losses

HOURS_PER_BLOCK = 24  # the reference hardcodes 24-step fusion blocks (ref :373-393)


def _xavier(shape):
    """torch-fan xavier_uniform initializer for an arbitrary-rank tensor."""
    def init(key, _shape=None, dtype=jnp.float32):
        return initializers.torch_style_init(key, shape, dtype)
    return init


def _uniform01(shape):
    def init(key, _shape=None, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=0.0, maxval=1.0)
    return init


# --------------------------------------------------------------------------
# Fused ATGRU layer with hand-written BPTT.
#
# Reverse-mode AD of the encoder scan accumulates the cotangent of the
# EXPANDED node-conditioned weights W (N,K,I,O) — a ~233 MB read-modify-write
# per scan step (measured: ~4.8 ms of the 10.3 ms per-layer fwd+bwd at DC-237
# shapes, tools/bench_grad_variants.py). This custom VJP instead stacks the
# small per-step pre-activation cotangents during the reverse scan and forms
# every weight gradient in ONE contraction over (T, B) afterwards:
#     dW_g = einsum('tbkni,tbno->nkio', hh_stack, dpre_g_stack)
# so the only in-loop accumulators are the (K,N,N) supports cotangent and the
# small residual-GRU weights. Numerics are asserted identical to plain
# autodiff in tests/test_fused_bptt.py.
#
# Save-recompute split (measured op-by-op with tools/profile_step.py):
# the SMALL per-step intermediates (zr, hc, h_agru, zr2, hc_res) are stacked
# by the forward scan — the reverse scan re-reads them at full bandwidth.
# The LARGE graph-aggregation stacks hh/hzh (T,B,K,N,C — ~58 MB each at
# DC-237) are NOT stacked: only the dW contractions consume them, so the
# backward recomputes them in two bulk supports-einsums (~0.3 ms each)
# right at the consumption site. Stacking them instead cost ~2.6 ms/step in
# in-loop stores, zero-init broadcasts of the stack buffers, and relayout
# copies between the scan's forced stack layout and the layout the dW
# contraction wants. (Recomputing EVERYTHING is also wrong: bulk-produced
# arrays fed back into the reverse scan get sliced at 1/8 bandwidth —
# measured +6 ms over this hybrid.)
# --------------------------------------------------------------------------
# Einsum index orders of the recurrence, module-level so the layout harness
# (tools/bench_layer_layouts.py) can A/B them on the chip. The in-scan
# aggregation/apply pair and the bulk recompute/dW pair each relayout-copy
# their intermediate when the producer's chosen layout differs from the
# consumer dot's preferred one; index order is the only lever XLA gives us.
_AGG_SPEC = "knm,bmc->bknc"        # supports @ h   (per scan step)
_APPLY_SPEC = "bkni,nkio->bno"     # node-conditioned weight apply
# N-major bulk layout measured fastest on-chip (5.68 vs 5.83 ms/layer
# fwd+bwd at DC-237 bf16, tools/bench_layer_layouts.py): producing the
# recompute stacks with N outermost lets the dW dot consume them without
# the {3,4,2,1,0}->{4,0,1,2,3} relayout copy the t-major order forced.
_BULK_AGG_SPEC = "knm,tbmc->nkbtc"  # bulk recompute of hh/hzh stacks (bwd)
_DW_SPEC = "nkbti,tbno->nkio"       # one-shot weight-gradient contraction
_DAPPLY_SPEC = "bno,nkio->bkni"     # W^T apply in the reverse scan
_DSUP_SPEC = "bknc,bmc->knm"        # supports-cotangent accumulation
_DAGGT_SPEC = "knm,bknc->bmc"       # supports^T applied to dhh/dhzh

# Recurrence-scan unroll factor (A/B knob: env override lets tools/bench_*
# sweep it on-chip without code edits; 1 = plain while-loop scan).
_SCAN_UNROLL = int(os.environ.get("MSG_SCAN_UNROLL", "1"))


def _atgru_step_forward(h_prev, xs, supports, wg_h, wu_h, bg, bu,
                        rg_h, ru_h, rg_b, ru_b, dtype=None):
    """One ATGRU+residual step; returns (h_new, intermediates).

    dtype=bfloat16 runs the graph aggregations and weight applications in
    bf16 with f32 accumulation (halves the dominant HBM weight stream);
    gates/elementwise stay f32.
    """
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)
    mm = lambda spec, a, b: jnp.einsum(  # noqa: E731
        spec, cast(a), cast(b), preferred_element_type=jnp.float32
    )
    gate_x_t, upd_x_t, rg_x_t, ru_x_t, w_t = xs
    hh = mm(_AGG_SPEC, supports, h_prev)
    zr = jax.nn.sigmoid(gate_x_t + mm(_APPLY_SPEC, hh, wg_h) + bg)
    z, r = jnp.split(zr, 2, axis=-1)
    hzh = mm(_AGG_SPEC, supports, z * h_prev)
    hc = jnp.tanh(upd_x_t + mm(_APPLY_SPEC, hzh, wu_h) + bu)
    h_agru = r * h_prev + (1.0 - r) * hc
    zr2 = jax.nn.sigmoid(rg_x_t + h_agru @ rg_h + rg_b)
    z2, r2 = jnp.split(zr2, 2, axis=-1)
    hc_res = jnp.tanh(ru_x_t + (z2 * h_agru) @ ru_h + ru_b)
    h_res = r2 * h_agru + (1.0 - r2) * hc_res
    h_new = w_t * h_agru + (1.0 - w_t) * h_res
    return h_new, (zr, hc, h_agru, zr2, hc_res)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_atgru_layer(dtype, gate_x, upd_x, rg_x, ru_x, w_seq, supports,
                      wg_h, wu_h, bg, bu, rg_h, ru_h, rg_b, ru_b, state0):
    """states (T,B,N,H) of one encoder layer (graph GRU + residual GRU +
    learned per-step mix), matching the inline scan in MultiATGCN._encoder.
    dtype: None for exact f32, or jnp.bfloat16 for mixed-precision matmuls."""

    def step(h, xs):
        h_new, _ = _atgru_step_forward(
            h, xs, supports, wg_h, wu_h, bg, bu, rg_h, ru_h, rg_b, ru_b, dtype
        )
        return h_new, h_new

    _, states = jax.lax.scan(step, state0, (gate_x, upd_x, rg_x, ru_x, w_seq), unroll=_SCAN_UNROLL)
    return states


def _fused_fwd(dtype, gate_x, upd_x, rg_x, ru_x, w_seq, supports,
               wg_h, wu_h, bg, bu, rg_h, ru_h, rg_b, ru_b, state0):
    # In bf16 mode the saved-for-backward intermediates are STACKED in bf16
    # (standard mixed-precision activation saving): the scan's
    # dynamic-update-slice writes and the reverse pass's slice reads are the
    # dominant per-step stack traffic, and every consumer promotes back to
    # f32 in elementwise math. The f32 CARRY (and the returned states) stay
    # exact — only the backward's view of zr/hc/... is rounded.
    keep = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)

    def step(h, xs):
        h_new, inter = _atgru_step_forward(
            h, xs, supports, wg_h, wu_h, bg, bu, rg_h, ru_h, rg_b, ru_b, dtype
        )
        return h_new, (h_new,) + tuple(keep(i) for i in inter)

    _, outs = jax.lax.scan(step, state0, (gate_x, upd_x, rg_x, ru_x, w_seq), unroll=_SCAN_UNROLL)
    states, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s = outs
    res = (gate_x, upd_x, rg_x, ru_x, w_seq, supports, wg_h, wu_h, bg, bu,
           rg_h, ru_h, rg_b, ru_b, state0,
           states, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s)
    return states, res


def _fused_bwd(dtype, res, dstates):
    (gate_x, upd_x, rg_x, ru_x, w_seq, supports, wg_h, wu_h, bg, bu,
     rg_h, ru_h, rg_b, ru_b, state0,
     states, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s) = res
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)
    mm = lambda spec, a, b: jnp.einsum(  # noqa: E731
        spec, cast(a), cast(b), preferred_element_type=jnp.float32
    )
    # h_{t-1} for every step
    h_prev_s = jnp.concatenate([state0[None], states[:-1]], axis=0)
    # Bulk recompute of the two big graph-aggregation stacks, only consumed
    # by the dW contractions below (the reverse scan never reads them).
    hh_s = mm(_BULK_AGG_SPEC, supports, h_prev_s)
    z_s = jnp.split(zr_s, 2, axis=-1)[0]
    hzh_s = mm(_BULK_AGG_SPEC, supports, z_s * h_prev_s)

    def back_step(carry, xs):
        dh, d_sup, d_rg_h, d_ru_h = carry
        (dy, h_prev, zr, hc, h_agru, zr2, hc_res, w_t) = xs
        dh = dh + dy
        z, r = jnp.split(zr, 2, axis=-1)
        z2, r2 = jnp.split(zr2, 2, axis=-1)
        h_res = r2 * h_agru + (1.0 - r2) * hc_res
        # mix: h_new = w_t h_agru + (1-w_t) h_res
        dw_t = jnp.sum((h_agru - h_res) * dh)
        dh_agru = w_t * dh
        dh_res = (1.0 - w_t) * dh
        # residual GRU backward
        dr2 = (h_agru - hc_res) * dh_res
        dh_agru = dh_agru + r2 * dh_res
        dpre_ru = (1.0 - r2) * dh_res * (1.0 - hc_res * hc_res)
        dz2h = dpre_ru @ ru_h.T
        dz2 = dz2h * h_agru
        dh_agru = dh_agru + dz2h * z2
        d_ru_h = d_ru_h + jnp.einsum("bnc,bno->co", z2 * h_agru, dpre_ru)
        dpre_rg = jnp.concatenate([dz2, dr2], axis=-1) * zr2 * (1.0 - zr2)
        dh_agru = dh_agru + dpre_rg @ rg_h.T
        d_rg_h = d_rg_h + jnp.einsum("bnc,bno->co", h_agru, dpre_rg)
        # AGRU backward: h_agru = r h_prev + (1-r) hc
        dr = (h_prev - hc) * dh_agru
        dh_prev = r * dh_agru
        dpre_u = (1.0 - r) * dh_agru * (1.0 - hc * hc)
        dhzh = mm(_DAPPLY_SPEC, dpre_u, wu_h)
        zh = z * h_prev
        d_sup = d_sup + mm(_DSUP_SPEC, dhzh, zh)
        dzh = mm(_DAGGT_SPEC, supports, dhzh)
        dz = dzh * h_prev
        dh_prev = dh_prev + dzh * z
        dpre_g = jnp.concatenate([dz, dr], axis=-1) * zr * (1.0 - zr)
        dhh = mm(_DAPPLY_SPEC, dpre_g, wg_h)
        d_sup = d_sup + mm(_DSUP_SPEC, dhh, h_prev)
        dh_prev = dh_prev + mm(_DAGGT_SPEC, supports, dhh)
        return (dh_prev, d_sup, d_rg_h, d_ru_h), (dpre_g, dpre_u, dpre_rg, dpre_ru, dw_t)

    zero = jnp.zeros_like
    carry0 = (zero(state0), zero(supports), zero(rg_h), zero(ru_h))
    (dstate0, d_sup, d_rg_h, d_ru_h), stacks = jax.lax.scan(
        back_step, carry0,
        (dstates, h_prev_s, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s, w_seq),
        reverse=True, unroll=_SCAN_UNROLL,
    )
    dpre_g_s, dpre_u_s, dpre_rg_s, dpre_ru_s, dw_seq = stacks
    # ONE contraction over (T,B) per weight — no per-step (N,K,I,O) RMW.
    # Cotangent dtype must match the primal's (the encoder pre-casts the
    # weights to the compute dtype); the single rounding to bf16 here is
    # undone by the cast's own VJP upstream.
    d_wg_h = mm(_DW_SPEC, hh_s, dpre_g_s).astype(wg_h.dtype)
    d_wu_h = mm(_DW_SPEC, hzh_s, dpre_u_s).astype(wu_h.dtype)
    d_bg = dpre_g_s.sum(axis=(0, 1))
    d_bu = dpre_u_s.sum(axis=(0, 1))
    d_rg_b = dpre_rg_s.sum(axis=(0, 1, 2))
    d_ru_b = dpre_ru_s.sum(axis=(0, 1, 2))
    # Cotangent dtypes must mirror the primals' (the encoder may pass the
    # hoisted pre-activations in the compute dtype; the upstream cast's VJP
    # restores f32 before they reach parameters).
    return (dpre_g_s.astype(gate_x.dtype), dpre_u_s.astype(upd_x.dtype),
            dpre_rg_s.astype(rg_x.dtype), dpre_ru_s.astype(ru_x.dtype),
            dw_seq, d_sup,
            d_wg_h, d_wu_h, d_bg, d_bu, d_rg_h, d_ru_h, d_rg_b, d_ru_b, dstate0)


fused_atgru_layer.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# int8-streamed variant of the fused layer (round 5, VERDICT item 3).
#
# The scans above re-read the expanded node-conditioned weights from HBM
# every timestep (~28 MB/layer bf16 forward, again in the reverse scan) and
# run at the HBM roofline (DESIGN.md §9) — bytes are the only lever left.
# This variant quantizes the h-side weights ONCE per training step to int8
# with per-(node, out-channel) scales and applies them through the Pallas
# kernels in ops/node_apply.py (the convert to bf16 happens in VMEM, so the
# per-step HBM read halves; per-(n,o) scales commute with the (k,i)
# contraction, making the kernel exact dequantized math). Measured on-chip:
# 72.7 -> 61.9 us/step forward composition, 33.7 us transposed
# (tools/bench_apply_quant.py).
#
# Layout: everything per-step is N-MAJOR — carry (N,B,H), xs slabs
# (T,N,B,*) — because the kernel's per-node batched dot wants (N,B,KI) and
# a per-step transpose would eat the savings. The encoder transposes once
# at layer entry/exit.
#
# Gradient semantics: straight-through on the weights — d(input) flows
# through the QUANTIZED weights (the function actually applied), dW is the
# same full-precision (T,B)-contraction as the exact path, so the weight
# pools train on unquantized gradients (standard weight-only QAT).
# --------------------------------------------------------------------------


def _quantize_h_weights(wg_h, wu_h, block=32):
    """Quantize + PRE-PAD the h-side weights to the kernel's node-block
    multiple. Padding must happen here, once per train step OUTSIDE the
    scan: a pad inside the scan body is loop-invariant but XLA does not
    hoist it (memory-pressure LICM — the same lesson as the band pack,
    DESIGN.md §4), measured ~350 us/step per padded weight tensor."""
    from multistgraph_tpu.ops.node_apply import _pad_nodes, quantize_node_weights

    n, kk, ii, og = wg_h.shape
    ou = wu_h.shape[3]
    n_pad = -(-n // block) * block
    wgq, wgs = quantize_node_weights(wg_h.reshape(n, kk * ii, og))
    wuq, wus = quantize_node_weights(wu_h.reshape(n, kk * ii, ou))
    return (_pad_nodes(wgq, 0, n_pad), _pad_nodes(wgs, 0, n_pad),
            _pad_nodes(wuq, 0, n_pad), _pad_nodes(wus, 0, n_pad))


def _atgru_step_q8(h_prev, xs, supports, wq8, bg, bu, rg_h, ru_h, rg_b, ru_b,
                   dtype):
    """One N-major ATGRU+residual step streaming int8 weights.

    h_prev (N,B,H); xs slabs (N,B,*); returns (h_new, intermediates)."""
    from multistgraph_tpu.ops.node_apply import node_apply_q8

    interp = jax.default_backend() != "tpu"  # Pallas interpret off-TPU
    wgq, wgs, wuq, wus = wq8
    n, b, hdim = h_prev.shape
    cast = lambda a: a.astype(dtype)  # noqa: E731
    gate_x_t, upd_x_t, rg_x_t, ru_x_t, w_t = xs
    hh = jnp.einsum("knm,mbc->nbkc", cast(supports), cast(h_prev),
                    preferred_element_type=jnp.float32)
    hh = cast(hh).reshape(n, b, -1)
    zr = jax.nn.sigmoid(
        gate_x_t + node_apply_q8(hh, wgq, wgs, interpret=interp) + bg[:, None])
    z, r = jnp.split(zr, 2, axis=-1)
    hzh = jnp.einsum("knm,mbc->nbkc", cast(supports), cast(z * h_prev),
                     preferred_element_type=jnp.float32)
    hzh = cast(hzh).reshape(n, b, -1)
    hc = jnp.tanh(
        upd_x_t + node_apply_q8(hzh, wuq, wus, interpret=interp) + bu[:, None])
    h_agru = r * h_prev + (1.0 - r) * hc
    zr2 = jax.nn.sigmoid(rg_x_t + cast(h_agru) @ cast(rg_h) + rg_b)
    z2, r2 = jnp.split(zr2, 2, axis=-1)
    hc_res = jnp.tanh(ru_x_t + cast(z2 * h_agru) @ cast(ru_h) + ru_b)
    h_res = r2 * h_agru + (1.0 - r2) * hc_res
    h_new = w_t * h_agru + (1.0 - w_t) * h_res
    return h_new, (zr, hc, h_agru, zr2, hc_res)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_atgru_layer_q8(dtype, gate_x, upd_x, rg_x, ru_x, w_seq, supports,
                         wg_h, wu_h, bg, bu, rg_h, ru_h, rg_b, ru_b, state0):
    """N-major, int8-weight-streamed twin of fused_atgru_layer.

    All per-step tensors are N-major: gate_x/upd_x/rg_x/ru_x (T,N,B,*),
    state0 (N,B,H); returns states (T,N,B,H). dtype must be set (bf16)."""
    wq8 = _quantize_h_weights(wg_h, wu_h)

    def step(h, xs):
        h_new, _ = _atgru_step_q8(h, xs, supports, wq8, bg, bu,
                                  rg_h, ru_h, rg_b, ru_b, dtype)
        return h_new, h_new

    _, states = jax.lax.scan(step, state0, (gate_x, upd_x, rg_x, ru_x, w_seq),
                             unroll=_SCAN_UNROLL)
    return states


def _fused_q8_fwd(dtype, gate_x, upd_x, rg_x, ru_x, w_seq, supports,
                  wg_h, wu_h, bg, bu, rg_h, ru_h, rg_b, ru_b, state0):
    wq8 = _quantize_h_weights(wg_h, wu_h)
    keep = lambda a: a.astype(dtype)  # noqa: E731

    def step(h, xs):
        h_new, inter = _atgru_step_q8(h, xs, supports, wq8, bg, bu,
                                      rg_h, ru_h, rg_b, ru_b, dtype)
        return h_new, (h_new,) + tuple(keep(i) for i in inter)

    _, outs = jax.lax.scan(step, state0, (gate_x, upd_x, rg_x, ru_x, w_seq),
                           unroll=_SCAN_UNROLL)
    states, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s = outs
    res = (gate_x, upd_x, rg_x, ru_x, w_seq, supports, wg_h, wu_h, bg, bu,
           rg_h, ru_h, rg_b, ru_b, state0, wq8,
           states, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s)
    return states, res


def _fused_q8_bwd(dtype, res, dstates):
    from multistgraph_tpu.ops.node_apply import node_apply_q8_t

    (gate_x, upd_x, rg_x, ru_x, w_seq, supports, wg_h, wu_h, bg, bu,
     rg_h, ru_h, rg_b, ru_b, state0, wq8,
     states, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s) = res
    interp = jax.default_backend() != "tpu"
    wgq, wgs, wuq, wus = wq8
    n, b, hdim = state0.shape
    kk = wg_h.shape[1]
    cast = lambda a: a.astype(dtype)  # noqa: E731
    mm = lambda spec, x, y: jnp.einsum(  # noqa: E731
        spec, cast(x), cast(y), preferred_element_type=jnp.float32)
    h_prev_s = jnp.concatenate([state0[None], states[:-1]], axis=0)
    # Bulk recompute of the aggregation stacks — dW-only consumers, so they
    # use the SAME N-outermost order the exact path measured fastest
    # (_BULK_AGG_SPEC rationale above), not the scan's N-major stack order.
    hh_s = mm("knm,tmbc->nkbtc", supports, h_prev_s)
    z_s = jnp.split(zr_s, 2, axis=-1)[0]
    hzh_s = mm("knm,tmbc->nkbtc", supports, z_s * h_prev_s)

    def back_step(carry, xs):
        dh, d_sup, d_rg_h, d_ru_h = carry
        (dy, h_prev, zr, hc, h_agru, zr2, hc_res, w_t) = xs
        dh = dh + dy
        z, r = jnp.split(zr, 2, axis=-1)
        z2, r2 = jnp.split(zr2, 2, axis=-1)
        h_res = r2 * h_agru + (1.0 - r2) * hc_res
        dw_t = jnp.sum((h_agru - h_res) * dh)
        dh_agru = w_t * dh
        dh_res = (1.0 - w_t) * dh
        dr2 = (h_agru - hc_res) * dh_res
        dh_agru = dh_agru + r2 * dh_res
        dpre_ru = (1.0 - r2) * dh_res * (1.0 - hc_res * hc_res)
        dz2h = dpre_ru @ ru_h.T
        dz2 = dz2h * h_agru
        dh_agru = dh_agru + dz2h * z2
        d_ru_h = d_ru_h + jnp.einsum("nbc,nbo->co", z2 * h_agru, dpre_ru)
        dpre_rg = jnp.concatenate([dz2, dr2], axis=-1) * zr2 * (1.0 - zr2)
        dh_agru = dh_agru + dpre_rg @ rg_h.T
        d_rg_h = d_rg_h + jnp.einsum("nbc,nbo->co", h_agru, dpre_rg)
        dr = (h_prev - hc) * dh_agru
        dh_prev = r * dh_agru
        dpre_u = (1.0 - r) * dh_agru * (1.0 - hc * hc)
        dhzh = node_apply_q8_t(cast(dpre_u), wuq, wus,
                               interpret=interp).reshape(n, b, kk, hdim)
        zh = z * h_prev
        d_sup = d_sup + mm("nbkc,mbc->knm", dhzh, zh)
        dzh = mm("knm,nbkc->mbc", supports, dhzh)
        dz = dzh * h_prev
        dh_prev = dh_prev + dzh * z
        dpre_g = jnp.concatenate([dz, dr], axis=-1) * zr * (1.0 - zr)
        dhh = node_apply_q8_t(cast(dpre_g), wgq, wgs,
                              interpret=interp).reshape(n, b, kk, hdim)
        d_sup = d_sup + mm("nbkc,mbc->knm", dhh, h_prev)
        dh_prev = dh_prev + mm("knm,nbkc->mbc", supports, dhh)
        return (dh_prev, d_sup, d_rg_h, d_ru_h), (dpre_g, dpre_u, dpre_rg, dpre_ru, dw_t)

    zero = jnp.zeros_like
    carry0 = (zero(state0), zero(supports), zero(rg_h), zero(ru_h))
    (dstate0, d_sup, d_rg_h, d_ru_h), stacks = jax.lax.scan(
        back_step, carry0,
        (dstates, h_prev_s, zr_s, hc_s, h_agru_s, zr2_s, hc_res_s, w_seq),
        reverse=True, unroll=_SCAN_UNROLL,
    )
    dpre_g_s, dpre_u_s, dpre_rg_s, dpre_ru_s, dw_seq = stacks
    # Straight-through dW: the same full-precision (T,B) contraction as the
    # exact path (weights trained on unquantized gradients).
    d_wg_h = mm("nkbti,tnbo->nkio", hh_s, dpre_g_s).astype(wg_h.dtype)
    d_wu_h = mm("nkbti,tnbo->nkio", hzh_s, dpre_u_s).astype(wu_h.dtype)
    d_bg = dpre_g_s.sum(axis=(0, 2))
    d_bu = dpre_u_s.sum(axis=(0, 2))
    d_rg_b = dpre_rg_s.sum(axis=(0, 1, 2))
    d_ru_b = dpre_ru_s.sum(axis=(0, 1, 2))
    return (dpre_g_s.astype(gate_x.dtype), dpre_u_s.astype(upd_x.dtype),
            dpre_rg_s.astype(rg_x.dtype), dpre_ru_s.astype(ru_x.dtype),
            dw_seq, d_sup,
            d_wg_h, d_wu_h, d_bg, d_bu, d_rg_h, d_ru_h, d_rg_b, d_ru_b, dstate0)


fused_atgru_layer_q8.defvjp(_fused_q8_fwd, _fused_q8_bwd)


class MultiATGCN(nn.Module):
    """Flax module. Input x: (B, T_total, N, F); output: (B, Tout, N, output_dim)."""

    num_nodes: int
    input_window: int
    output_window: int
    start_dim: int
    end_dim: int
    ext_dim: int
    hidden_dim: int
    num_layers: int
    cheb_k: int
    embed_dim_node: int
    embed_dim_adj: int
    adjtype: str
    adpadj: str
    add_time_in_day: bool
    add_day_in_week: bool
    load_dynamic: bool
    gcn_off: bool
    fnn_off: bool
    node_specific_off: bool
    len_closeness: int
    len_period: int
    len_trend: int
    # Build-time constants (host numpy, captured as XLA constants):
    supports_static: Any = None       # (K_static, N, N) incl. leading identity
    static_proj: Any = None           # (N, min(N, embed_dim_node)) PCA-projected static, or None
    node_emb_init_value: Any = None   # optional (N, E) init override (svd_init mode)
    vec1_init_value: Any = None       # optional (N, d_adj)
    vec2_init_value: Any = None       # optional (d_adj, N)
    dropout_rate: float = 0.1
    # hand-written BPTT for the encoder recurrence (fused_atgru_layer):
    # avoids the per-step (N,K,I,O) weight-cotangent accumulation of plain
    # autodiff (~1.5x faster train step at DC-237); numerics identical
    # (tests/test_fused_bptt.py). Set False to fall back to autodiff.
    fused_bptt: bool = True
    # 'int8': stream the h-side node-conditioned weights int8 through the
    # Pallas apply kernels (halves the dominant per-timestep HBM read;
    # requires compute_dtype=bfloat16 + fused_bptt). None = exact path.
    weight_stream_quant: Any = None
    # 'bfloat16' runs the encoder's graph/weight matmuls in bf16 with f32
    # accumulation (halves the dominant HBM weight stream); None = exact f32
    compute_dtype: Any = None

    @property
    def output_dim(self) -> int:
        return self.end_dim - self.start_dim

    @property
    def time_index_dim(self) -> int:
        if self.add_time_in_day and self.add_day_in_week:
            return 8
        if self.add_time_in_day:
            return 1
        if self.add_day_in_week:
            # The reference's if-chain crashes on day-in-week-only configs
            # (MultiATGCN.py:313-318 leaves the attr unset); we support it.
            return 7
        return 0

    @property
    def feature_final(self) -> int:
        return self.output_dim + self.ext_dim

    @property
    def num_supports(self) -> int:
        """Total stacked supports = reference's cheb_ks (MultiATGCN.py:65-70)."""
        if self.adjtype == "multi" and self.adpadj in ("bidirection", "unidirection"):
            return 1 + (self.cheb_k - 1) * 4
        if self.adjtype == "multi":
            return 1 + (self.cheb_k - 1) * 3
        return self.cheb_k

    @property
    def len_ts(self) -> int:
        return (self.len_closeness + self.len_period + self.len_trend) // HOURS_PER_BLOCK

    # ------------------------------------------------------------------ setup
    def setup(self):
        n, e = self.num_nodes, (1 if self.node_specific_off else self.embed_dim_node)
        d_adj = self.embed_dim_adj
        out = self.output_dim

        if self.node_specific_off:
            # frozen all-ones embedding, not a parameter (MultiATGCN.py:350-354)
            self._node_emb = jnp.ones((n, 1), dtype=jnp.float32)
        elif self.node_emb_init_value is not None:
            self._node_emb = self.param(
                "node_emb", lambda k: jnp.asarray(self.node_emb_init_value, jnp.float32)
            )
        else:
            self._node_emb = self.param("node_emb", _xavier((n, e)))

        if self.vec1_init_value is not None:
            self._node_vec1 = self.param("node_vec1", lambda k: jnp.asarray(self.vec1_init_value, jnp.float32))
            self._node_vec2 = self.param("node_vec2", lambda k: jnp.asarray(self.vec2_init_value, jnp.float32))
        else:
            self._node_vec1 = self.param("node_vec1", _xavier((n, d_adj)))
            self._node_vec2 = self.param("node_vec2", _xavier((d_adj, n)))

        # Temporal-fusion heads: per-head (1, 24, N, out) weights (init matches
        # the reference's per-head ParameterList fan) + softmax head gate.
        self._weight_ts = [
            self.param("weight_ts_{}".format(i), _xavier((1, HOURS_PER_BLOCK, n, out)))
            for i in range(self.len_ts)
        ]
        self._weight_tsg = self.param("weight_tsg", _uniform01((self.len_ts,)))

        # Encoder parameters.
        ks = self.num_supports
        h = self.hidden_dim
        layers = []
        for layer in range(self.num_layers):
            dim_in = self.feature_final if layer == 0 else h
            entry: Dict[str, Any] = {}
            if not self.gcn_off:
                for name, dim_out in (("gate", 2 * h), ("update", h)):
                    entry[name] = {
                        "weights_g": self.param(
                            "l{}_{}_weights_g".format(layer, name), _xavier((ks, 1, 1))
                        ),
                        "pool": self.param(
                            "l{}_{}_pool".format(layer, name), _xavier((e, ks, dim_in + h, dim_out))
                        ),
                        "bias_pool": self.param(
                            "l{}_{}_bias_pool".format(layer, name), _xavier((e, dim_out))
                        ),
                    }
            # Plain dense GRU cells: the residual branch when graph conv is on,
            # or the only cell when gcn_off (ref :177-192).
            for name, dim_out in (("res_gate", 2 * h), ("res_update", h)):
                entry[name] = {
                    "kernel": self.param(
                        "l{}_{}_kernel".format(layer, name),
                        lambda k, s=(dim_in + h, dim_out): initializers.dense_kernel_init(k, s),
                    ),
                    "bias": self.param("l{}_{}_bias".format(layer, name), _uniform01((dim_out,))),
                }
            layers.append(entry)
        self._layers = layers
        self._weights_gru = self.param("weights_gru", _xavier((self.num_layers, self.input_window)))

        if self.static_proj is not None:
            q = self.static_proj.shape[1]
            self._static_gru_kernel = self.param(
                "static_gru_kernel", lambda k: initializers.dense_kernel_init(k, (q, h))
            )
            self._static_gru_bias = self.param("static_gru_bias", _uniform01((h,)))

        t_conv = 1 if self.fnn_off else self.input_window
        self._end_kernel = self.param(
            "end_conv_kernel",
            # torch Conv2d(outC=Tout*out, inC=t_conv, kernel=(1, H)) xavier fan:
            # fan_in = t_conv*H, fan_out = Tout*out*H.
            lambda k: jax.random.uniform(
                k, (t_conv * h, self.output_window * out),
                minval=-np.sqrt(6.0 / (t_conv * h + self.output_window * out * h)),
                maxval=np.sqrt(6.0 / (t_conv * h + self.output_window * out * h)),
            ),
        )
        self._end_bias = self.param("end_conv_bias", _uniform01((self.output_window * out,)))
        self._dropout = nn.Dropout(rate=self.dropout_rate)

    # ------------------------------------------------------------- components
    def _build_supports(self) -> jnp.ndarray:
        """Stack all supports (K_total, N, N), adaptive terms first (ref :87-101)."""
        base = jnp.asarray(self.supports_static, jnp.float32)
        if self.adpadj == "none":
            return base
        if self.adpadj == "unidirection":
            logits = jnp.maximum(self._node_vec1 @ self._node_vec2, 0.0)
        elif self.adpadj == "bidirection":
            logits = jnp.maximum(self._node_emb @ self._node_emb.T, 0.0)
        else:
            raise ValueError("unknown adpadj {!r}".format(self.adpadj))
        adaptive = jax.nn.softmax(logits, axis=1)
        eye = jnp.eye(self.num_nodes, dtype=jnp.float32)
        terms = [adaptive]
        prev2, prev1 = eye, adaptive
        for _ in range(2, self.cheb_k):
            nxt = 2.0 * adaptive @ prev1 - prev2
            terms.append(nxt)
            prev2, prev1 = prev1, nxt
        adaptive_stack = jnp.stack(terms, axis=0)
        if self.adjtype == "multi":
            return jnp.concatenate([base[:1], adaptive_stack, base[1:]], axis=0)
        # non-multi + adaptive: static supports are NOT used (ref :92-93)
        return jnp.concatenate([eye[None], adaptive_stack], axis=0)

    def _cell_weights(self, cell_params, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Node-conditioned weights split into (W_x, W_h) plus bias.

        W[n,k,i,o] = node_emb[n,:] . pool[:,k,i,o], scaled by softmax(weights_g)
        over k when adjtype='multi' (folded here instead of into the supports).

        With ``dtype`` set (bf16 mode) the gate is folded into the SMALL pool
        before expansion, the x/h split happens on the pool, and the two
        expansions run in the compute dtype directly — the f32 path writes
        the full expanded tensor (~176 MB/step at DC-237), gate-multiplies
        it, splits it (two more big copies), then casts; this path writes
        half the bytes once and nothing else. (Kept separate so the f32
        path stays bit-identical to the reference-parity numerics.)
        """
        if dtype is None:
            w = jnp.einsum("nd,dkio->nkio", self._node_emb, cell_params["pool"])
            if self.adjtype == "multi":
                gate = jax.nn.softmax(cell_params["weights_g"], axis=0)  # (K,1,1)
                w = w * gate[None, :, 0, 0][:, :, None, None]
            bias = self._node_emb @ cell_params["bias_pool"]  # (N, out)
            dim_in = w.shape[2] - self.hidden_dim
            return w[:, :, :dim_in], w[:, :, dim_in:], bias
        pool = cell_params["pool"]
        if self.adjtype == "multi":
            gate = jax.nn.softmax(cell_params["weights_g"], axis=0)  # (K,1,1)
            pool = pool * gate[None, :, 0, 0][:, :, None, None]
        pool = pool.astype(dtype)
        emb = self._node_emb.astype(dtype)
        dim_in = pool.shape[2] - self.hidden_dim
        w_x = jnp.einsum("nd,dkio->nkio", emb, pool[:, :, :dim_in])
        w_h = jnp.einsum("nd,dkio->nkio", emb, pool[:, :, dim_in:])
        bias = self._node_emb @ cell_params["bias_pool"]  # (N, out), f32
        return w_x, w_h, bias

    def _encoder_q8(self, x: jnp.ndarray, init_state: jnp.ndarray,
                    supports: jnp.ndarray) -> jnp.ndarray:
        """int8-weight-streamed N-major encoder (weight_stream_quant='int8').

        Same math as _encoder's fused path with the h-side weights streamed
        int8 (fused_atgru_layer_q8). Every per-step tensor is produced
        N-major natively — the hoisting einsums emit (T,N,B,*) — so the
        only layout transposes are one at encoder entry and one at exit."""
        dtype = jnp.dtype(self.compute_dtype)
        weights_gru = jax.nn.sigmoid(self._weights_gru)  # (L, T)
        current = jnp.transpose(x, (1, 2, 0, 3))  # (T, N, B, C)
        h = self.hidden_dim
        for layer_idx, cell in enumerate(self._layers):
            state0 = jnp.transpose(init_state[layer_idx], (1, 0, 2))  # (N,B,H)
            w_seq = weights_gru[layer_idx][: current.shape[0]]
            res_gate_k, res_gate_b = cell["res_gate"]["kernel"], cell["res_gate"]["bias"]
            res_upd_k, res_upd_b = cell["res_update"]["kernel"], cell["res_update"]["bias"]
            dim_in = current.shape[-1]
            res_x = jnp.einsum(
                "tnbc,cd->tnbd", current,
                jnp.concatenate([res_gate_k[:dim_in], res_upd_k[:dim_in]], axis=1),
            )
            res_gate_x, res_upd_x = res_x[..., : 2 * h], res_x[..., 2 * h :]
            wg_x, wg_h, bg = self._cell_weights(cell["gate"], dtype)
            wu_x, wu_h, bu = self._cell_weights(cell["update"], dtype)
            hx = jnp.einsum("knm,tmbc->tnbkc", supports, current)
            xw = jnp.einsum(
                "tnbki,nkio->tnbo", hx.astype(dtype),
                jnp.concatenate([wg_x, wu_x], axis=3),
                preferred_element_type=jnp.float32,
            )
            gate_x, upd_x = xw[..., : 2 * h].astype(dtype), xw[..., 2 * h :].astype(dtype)
            states = fused_atgru_layer_q8(
                dtype, gate_x, upd_x,
                res_gate_x.astype(dtype), res_upd_x.astype(dtype), w_seq,
                supports, wg_h, wu_h, bg, bu,
                res_gate_k[dim_in:], res_upd_k[dim_in:],
                res_gate_b, res_upd_b, state0,
            )
            current = states  # (T, N, B, H)
            self.sow(
                "intermediates", "encoder_layer_{}".format(layer_idx),
                jnp.transpose(current, (2, 0, 1, 3)),
            )
        return jnp.transpose(current, (2, 0, 1, 3))  # (B, T, N, H)

    def _encoder(self, x: jnp.ndarray, init_state: jnp.ndarray, supports: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, N, C) -> stacked per-step states of the last layer (B, T, N, H)."""
        if x.shape[2] != self.num_nodes:
            raise ValueError("node-dimension mismatch: {} vs {}".format(x.shape[2], self.num_nodes))
        if (self.weight_stream_quant == "int8" and self.fused_bptt
                and self.compute_dtype is not None and not self.gcn_off):
            return self._encoder_q8(x, init_state, supports)
        weights_gru = jax.nn.sigmoid(self._weights_gru)  # (L, T)
        current = jnp.transpose(x, (1, 0, 2, 3))  # (T, B, N, C)

        for layer_idx, cell in enumerate(self._layers):
            state0 = init_state[layer_idx]  # (B, N, H)
            w_seq = weights_gru[layer_idx][: current.shape[0]]  # (T,)

            res_gate_k, res_gate_b = cell["res_gate"]["kernel"], cell["res_gate"]["bias"]
            res_upd_k, res_upd_b = cell["res_update"]["kernel"], cell["res_update"]["bias"]
            dim_in = current.shape[-1]
            h = self.hidden_dim
            # Hoist the x-only part of the residual dense transforms over all
            # T, fused across gate+update into one (C -> 3H) matmul.
            res_x = jnp.einsum(
                "tbnc,cd->tbnd",
                current,
                jnp.concatenate([res_gate_k[:dim_in], res_upd_k[:dim_in]], axis=1),
            )
            res_gate_x, res_upd_x = res_x[..., : 2 * h], res_x[..., 2 * h :]
            res_gate_h = res_gate_k[dim_in:]
            res_upd_h = res_upd_k[dim_in:]

            if not self.gcn_off:
                dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
                # In bf16 mode _cell_weights expands the pools DIRECTLY in
                # the compute dtype (gate folded pre-expansion, x/h split on
                # the pool), so the big loop-invariant weights are built once
                # in their in-scan dtype — no f32 materialization, no
                # separate pre-cast. XLA does NOT hoist a per-step astype out
                # of the while-loop body, so building them in the right
                # dtype here is what keeps the scans streaming half the
                # bytes. The expansion einsum is differentiable; its VJP
                # hands the pool a f32 cotangent (preferred_element_type).
                # supports stays f32: it is only ~1 MB/step to cast, and its
                # cotangent is accumulated across all T steps — bf16
                # accumulation there would genuinely lose precision.
                wg_x, wg_h, bg = self._cell_weights(cell["gate"], dtype)
                wu_x, wu_h, bu = self._cell_weights(cell["update"], dtype)
                # Hoist the graph aggregation of the input sequence: shared by
                # the gate and candidate AGCNs at every step; the two weight
                # contractions fuse into one (I -> 3H) einsum.
                hx = jnp.einsum("knm,tbmc->tbknc", supports, current)
                if dtype is not None:
                    hx = hx.astype(dtype)
                xw = jnp.einsum(
                    "tbkni,nkio->tbno", hx, jnp.concatenate([wg_x, wu_x], axis=3),
                    preferred_element_type=jnp.float32,
                )
                gate_x, upd_x = xw[..., : 2 * h], xw[..., 2 * h :]

                if dtype is not None:
                    # Store the hoisted per-step pre-activations in the
                    # compute dtype too: the scans re-read one (B,N,C) slab
                    # of each per step, and those slices run well below HBM
                    # peak (tools/profile_step.py) — halving their bytes
                    # halves that cost. They are only ever ADDED to f32
                    # matmul results (promotion keeps the sum f32).
                    gate_x = gate_x.astype(dtype)
                    upd_x = upd_x.astype(dtype)
                    res_gate_x = res_gate_x.astype(dtype)
                    res_upd_x = res_upd_x.astype(dtype)
                if dtype is None:
                    # Launder the per-step input stacks into the default
                    # layout: left to itself, XLA keeps the producing dot's
                    # layout, where the step dim lands inside the (8,128)
                    # tile and every scan slice reads at ~1/8 HBM bandwidth
                    # (ops/layout.py has the measurements). In bf16 mode the
                    # astype above already serves as the relayout point —
                    # an extra copy there costs more than it saves (A/B'd).
                    gate_x, upd_x = layout_ops.force_default_layouts(gate_x, upd_x)
                if self.fused_bptt:
                    states = fused_atgru_layer(
                        dtype,
                        gate_x, upd_x, res_gate_x, res_upd_x, w_seq, supports,
                        wg_h, wu_h, bg, bu,
                        res_gate_h, res_upd_h, res_gate_b, res_upd_b, state0,
                    )
                else:
                    def step(h, inputs):
                        h_new, _ = _atgru_step_forward(
                            h, inputs, supports, wg_h, wu_h, bg, bu,
                            res_gate_h, res_upd_h, res_gate_b, res_upd_b, dtype,
                        )
                        return h_new, h_new

                    _, states = jax.lax.scan(
                        step, state0, (gate_x, upd_x, res_gate_x, res_upd_x, w_seq)
                    )
            else:
                def step(h, inputs):  # plain GRU only (ref :187-192)
                    rg_x_t, ru_x_t, _w_t = inputs
                    z_r = jax.nn.sigmoid(rg_x_t + h @ res_gate_h + res_gate_b)
                    z, r = jnp.split(z_r, 2, axis=-1)
                    hc = jnp.tanh(ru_x_t + (z * h) @ res_upd_h + res_upd_b)
                    h_new = r * h + (1.0 - r) * hc
                    return h_new, h_new

                _, states = jax.lax.scan(step, state0, (res_gate_x, res_upd_x, w_seq))
            current = states  # (T, B, N, H)
            self.sow(
                "intermediates",
                "encoder_layer_{}".format(layer_idx),
                jnp.transpose(current, (1, 0, 2, 3)),
            )

        return jnp.transpose(current, (1, 0, 2, 3))  # (B, T, N, H)

    # ---------------------------------------------------------------- forward
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        source = x[:, :, :, self.start_dim : self.end_dim]
        # With use_3tu=False the dataset truncates X to input_window steps;
        # only the closeness heads are then reachable, which the reference
        # tolerates exactly when horizon gating skips period/trend (Tout < 6).
        total_len = (
            self.len_closeness + self.len_period + self.len_trend
            if self.output_window >= 6
            else self.len_closeness
        )
        if source.shape[1] < total_len:
            raise ValueError(
                "input has {} steps but the active temporal heads need {}".format(
                    source.shape[1], total_len
                )
            )

        # Multi-head temporal fusion (ref :366-393).
        head_gate = jax.nn.softmax(self._weight_tsg)
        fused = jnp.zeros(
            (source.shape[0], HOURS_PER_BLOCK, self.num_nodes, self.output_dim), source.dtype
        )
        head = 0
        begin = 0
        for _ in range(self.len_closeness // HOURS_PER_BLOCK):
            block = source[:, begin : begin + HOURS_PER_BLOCK]
            fused = fused + head_gate[head] * block * self._weight_ts[head]
            begin += HOURS_PER_BLOCK
            head += 1
        begin = self.len_closeness
        if self.output_window >= 6:
            for _ in range(self.len_period // HOURS_PER_BLOCK):
                block = source[:, begin : begin + HOURS_PER_BLOCK]
                fused = fused + head_gate[head] * block * self._weight_ts[head]
                begin += HOURS_PER_BLOCK
                head += 1
            begin = self.len_closeness + self.len_period
            for _ in range(self.len_trend // HOURS_PER_BLOCK):
                block = source[:, begin : begin + HOURS_PER_BLOCK]
                fused = fused + head_gate[head] * block * self._weight_ts[head]
                begin += HOURS_PER_BLOCK
                head += 1

        # Re-append calendar and dynamic external features (ref :396-402).
        parts = [fused]
        if self.time_index_dim:
            parts.append(
                x[:, : self.input_window, :, self.end_dim : self.end_dim + self.time_index_dim]
            )
        if self.load_dynamic:
            parts.append(x[:, : self.input_window, :, self.end_dim + self.time_index_dim :])
        enc_in = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else fused

        self.sow("intermediates", "fused_temporal", fused)
        self.sow("intermediates", "encoder_input", enc_in)

        # Initial hidden state: zeros, or static-conditioned (ref :404-409).
        batch = source.shape[0]
        if self.static_proj is not None:
            emb = jax.nn.relu(
                jnp.asarray(self.static_proj, jnp.float32) @ self._static_gru_kernel
                + self._static_gru_bias
            )  # (N, H)
            init_state = jnp.broadcast_to(
                emb[None, None], (self.num_layers, batch, self.num_nodes, self.hidden_dim)
            )
        else:
            init_state = jnp.zeros((self.num_layers, batch, self.num_nodes, self.hidden_dim))

        supports = self._build_supports()
        self.sow("intermediates", "supports", supports)
        states = self._encoder(enc_in, init_state, supports)  # (B, T, N, H)
        self.sow("intermediates", "encoder_output", states)

        if self.fnn_off:
            states = states[:, -1:]

        # Conv output head as a (T*H -> Tout*out) contraction (ref :340-344,416-418).
        states = self._dropout(states, deterministic=not train)
        b, t, n, h = states.shape
        flat = jnp.transpose(states, (0, 2, 1, 3)).reshape(b, n, t * h)
        out = flat @ self._end_kernel + self._end_bias  # (B, N, Tout*out)
        out = out.reshape(b, n, self.output_window, self.output_dim)
        return jnp.transpose(out, (0, 2, 1, 3))  # (B, Tout, N, out)


def build_multi_atgcn(config, data_feature) -> MultiATGCN:
    """Construct the module from config + data_feature (ref :221-354)."""
    # `load_dynamic` couples the dataset and the model implicitly — and with
    # OPPOSITE defaults, in the reference too (dataset True at
    # traffic_state_datatset.py:35, model False at MultiATGCN.py:312). If a
    # user sets load_external=true and omits load_dynamic, the dataset fuses
    # the .ext columns into X (ext_dim grows) while the model, sized for
    # feature_final = output_dim + ext_dim (ref :322), never appends them to
    # the encoder input — the reference crashes in a shape error deep inside
    # the AGCN; fail here with an actionable message instead.
    load_dynamic = config.get("load_dynamic", False)
    ext_dim = data_feature.get("ext_dim", 1)
    add_tid = config.get("add_time_in_day", False)
    add_dow = config.get("add_day_in_week", False)
    time_index_dim = 8 if (add_tid and add_dow) else (
        1 if add_tid else (7 if add_dow else 0))
    if not load_dynamic and ext_dim > time_index_dim:
        raise ValueError(
            "Inconsistent load_dynamic: the dataset fused {} external feature "
            "column(s) into X (ext_dim={} > time_index_dim={}) but the model "
            "was built with load_dynamic=False, so its input width would not "
            "match. Set load_dynamic explicitly in the config: true to feed "
            "the .ext columns to the encoder, false to keep them out of the "
            "dataset as well (the dataset defaults load_dynamic to TRUE, the "
            "model to FALSE — reference quirk, traffic_state_datatset.py:35 "
            "vs MultiATGCN.py:312).".format(
                ext_dim - time_index_dim, ext_dim, time_index_dim))
    num_nodes = data_feature.get("num_nodes", 1)
    static = data_feature.get("static", None)
    adj_mx = data_feature.get("adj_mx", None)
    geo_df = data_feature.get("coordinate", None)
    adjtype = config.get("adjtype", "od")
    adpadj = config.get("adpadj", "bidirection")
    cheb_k = config.get("cheb_order", 2)
    embed_dim_node = config.get("embed_dim_node", 10)
    embed_dim_adj = config.get("embed_dim_adj", 10)

    base_adj, support_pairs = graph_views.build_views(adj_mx, static, geo_df, num_nodes, adjtype)
    supports_static = graph_views.stack_static_supports(support_pairs, cheb_k)

    static_proj = None
    if static is not None:
        static_proj = initializers.pca_project(static, min(num_nodes, embed_dim_node))

    node_emb_init = vec1_init = vec2_init = None
    if config.get("svd_init", False):
        # The reference's (overwritten) SVD/PCA init recipe, opt-in.
        vec1_init, vec2_init = initializers.svd_lowrank_embeddings(base_adj, embed_dim_adj)
        if static is not None:
            node_emb_init = initializers.pca_project(static, min(num_nodes, embed_dim_node))

    return MultiATGCN(
        num_nodes=num_nodes,
        input_window=config.get("input_window", 1),
        output_window=config.get("output_window", 1),
        start_dim=config.get("start_dim", 0),
        end_dim=config.get("end_dim", 1),
        ext_dim=data_feature.get("ext_dim", 1),
        hidden_dim=config.get("rnn_units", 64),
        num_layers=config.get("num_layers", 2),
        cheb_k=cheb_k,
        embed_dim_node=embed_dim_node,
        embed_dim_adj=embed_dim_adj,
        adjtype=adjtype,
        adpadj=adpadj,
        add_time_in_day=config.get("add_time_in_day", False),
        add_day_in_week=config.get("add_day_in_week", False),
        load_dynamic=config.get("load_dynamic", False),
        gcn_off=config.get("gcn_off", False),
        fnn_off=config.get("fnn_off", False),
        node_specific_off=config.get("node_specific_off", False),
        len_closeness=data_feature.get("len_closeness", 0),
        len_period=data_feature.get("len_period", 0),
        len_trend=data_feature.get("len_trend", 0),
        supports_static=supports_static,
        static_proj=static_proj,
        node_emb_init_value=node_emb_init,
        vec1_init_value=vec1_init,
        vec2_init_value=vec2_init,
        fused_bptt=config.get("fused_bptt", True),
        weight_stream_quant=config.get("weight_stream_quant", None),
        compute_dtype=config.get("compute_dtype", None),
    )


def training_apply_kwargs(model, batch, rng, train, tf_ratio=None):
    """Extra kwargs for model.apply during training: the dropout rng, plus —
    for models that advertise scheduled sampling (``cl_decay_steps > 0``,
    e.g. DCRNN) — the teacher targets, the traced teacher-forcing ratio, and
    a 'sampling' rng for the per-step coins."""
    rngs = {}
    kwargs = {}
    if train and rng is not None:
        rngs["dropout"] = rng
        if tf_ratio is not None and getattr(model, "cl_decay_steps", 0):
            rngs["sampling"] = jax.random.fold_in(rng, 0x5A)
            kwargs["targets"] = batch["y"][..., model.start_dim : model.end_dim]
            kwargs["tf_ratio"] = tf_ratio
    if rngs:
        kwargs["rngs"] = rngs
    return kwargs


def make_loss_fn(model: MultiATGCN, scaler):
    """calculate_loss: masked MAE on inverse-transformed pred/truth (ref :422-427)."""

    def loss_fn(params, batch, rng=None, train=True, tf_ratio=None):
        kwargs = training_apply_kwargs(model, batch, rng, train, tf_ratio)
        pred = model.apply(params, batch["X"], train=train, **kwargs)
        y_true = batch["y"][..., model.start_dim : model.end_dim]
        return losses.masked_mae(
            scaler.inverse_transform(pred), scaler.inverse_transform(y_true), 0.0
        )

    return loss_fn
