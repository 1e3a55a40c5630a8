"""Microbench: in-kernel formulations of the node-conditioned weight apply.

[Absolute us/step numbers carry the relay's ~28 ms sync latency spread over
the repeat count (docs/DESIGN.md §9); the A/B/C/D ranking is unaffected —
all variants share the bias.]

The ATGRU recurrence applies a different (K*I, O) weight to every node each
scan step (reference MultiSTGraph MultiATGCN.py:104-108). The XLA einsum
('bkni,nkio->bno') runs at ~B/128 of matmul peak and re-streams the expanded
weights from HBM every step. A Pallas mega-kernel could stream them through
a pipelined grid instead — IF the per-node (B=16)-row dots issue fast enough
back to back. This bench measures exactly that, on the real chip:

  A  per-node dots, unrolled python loop over the node block
  B  factored pool: one full-M dot against the VMEM-resident (KI, D*O) pool
     (D-fold FLOPs, near-zero weight stream), then the e-contract on the VPU
  C  XLA baseline: lax.scan of the bf16 einsum the model uses today
  D  DMA floor: same grid/BlockSpecs as A but the kernel does ~no compute
     (isolates the weight-stream + pipeline cost)

Every variant takes a chained scalar folded into its output, and the driver
scans REPEAT iterations feeding each output back into the next scalar —
one remote dispatch per variant (this relay costs ~30 ms per call, which
would otherwise swamp the kernels).

Shapes are the DC-237 flagship encoder step with gate+update fused
(O = 2H + H = 192). Run: python tools/bench_node_dots.py [--interpret]
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, NP, H, K, D, T = 16, 237, 256, 64, 5, 20, 24
KI = K * H          # 320
O = 3 * H           # 192 (gate 2H + update H)
BLK = 32            # nodes per grid step (weight block 32*320*192*2B = 3.9 MB)
RB = 512            # rows per grid step in the factored variant
REPEAT = 16


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def _chain(call):
    """jit a REPEAT-times loop feeding each output back into the scalar."""

    def body(c, _):
        out = call(c)
        return jnp.mean(out.astype(jnp.float32)).reshape(1, 1) * 1e-6, None

    return jax.jit(lambda: jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32),
                                        None, length=REPEAT)[0])


def _time(fn) -> float:
    _sync(fn())
    t0 = time.perf_counter()
    _sync(fn())
    return (time.perf_counter() - t0) / REPEAT


# ---------------------------------------------------------------- variant A
# hh is laid out (T, B, NP*KI) with node-major lanes so each node's (B, KI)
# activation is a contiguous lane slice, and the output (B, NP*O) likewise —
# mosaic cannot store a 2D dot result through a squeezed middle dim of a 3D
# block, but plain (static) lane-offset 2D loads/stores are fine.
def _a_kernel(s_ref, hh_ref, w_ref, out_ref):
    s = s_ref[0, 0]
    for n in range(BLK):
        out_ref[:, n * O : (n + 1) * O] = (
            jax.lax.dot_general(
                hh_ref[0, :, n * KI : (n + 1) * KI], w_ref[n],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + s
        ).astype(out_ref.dtype)


def make_a(hh, w, interpret):
    def call(s):
        return pl.pallas_call(
            _a_kernel,
            grid=(T, NP // BLK),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, B, BLK * KI), lambda t, nb: (t, 0, nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, KI, O), lambda t, nb: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, BLK * O), lambda t, nb: (0, nb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NP * O), jnp.bfloat16),
            interpret=interpret,
        )(s, hh, w)

    return call


# ---------------------------------------------------------------- variant B
def _b_kernel(s_ref, hh_ref, e_ref, pool_ref, out_ref):
    r = jax.lax.dot_general(
        hh_ref[0], pool_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (RB, D*O) f32
    acc = e_ref[:, 0:1].astype(jnp.float32) * r[:, :O]
    for d in range(1, D):
        acc = acc + e_ref[:, d : d + 1].astype(jnp.float32) * r[:, d * O : (d + 1) * O]
    out_ref[...] = (acc + s_ref[0, 0]).astype(out_ref.dtype)


def make_b(hh_rows, e_rows, pool, interpret):
    rows = B * NP

    def call(s):
        return pl.pallas_call(
            _b_kernel,
            grid=(T, rows // RB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, RB, KI), lambda t, rb: (t, rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, D), lambda t, rb: (rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((KI, D * O), lambda t, rb: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, O), lambda t, rb: (rb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, O), jnp.bfloat16),
            interpret=interpret,
        )(s, hh_rows, e_rows, pool)

    return call


# ---------------------------------------------------------------- variant D
def _d_kernel(s_ref, hh_ref, w_ref, out_ref):
    # Touch one row of each input so the DMAs are real but compute ~zero.
    out_ref[...] = (hh_ref[0, :, :O] + w_ref[0, 0:1, :] + s_ref[0, 0]).astype(
        out_ref.dtype
    )


def make_d(hh, w, interpret):
    def call(s):
        return pl.pallas_call(
            _d_kernel,
            grid=(T, NP // BLK),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, B, BLK * KI), lambda t, nb: (t, 0, nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, KI, O), lambda t, nb: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, O), lambda t, nb: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, O), jnp.bfloat16),
            interpret=interpret,
        )(s, hh, w)

    return call


# ---------------------------------------------------------------- baseline C
def make_c(hh_t, w4):
    def call(s):
        def step(carry, x):
            out = jnp.einsum("bkni,nkio->bno", x, w4,
                             preferred_element_type=jnp.float32)
            return carry + out.astype(jnp.bfloat16), None

        init = jnp.zeros((B, NP, O), jnp.bfloat16) + s.astype(jnp.bfloat16)
        return jax.lax.scan(step, init, hh_t)[0]

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    f16 = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32), jnp.bfloat16) * 0.1
    hh = f16(T, B, NP, KI)
    hh_flat = hh.reshape(T, B, NP * KI)
    w = f16(NP, KI, O)
    e = f16(NP, D)
    zero = jnp.zeros((1, 1), jnp.float32)

    # Consistency: A vs the reference contraction at t = T-1 (the kernel
    # overwrites out per t; the last step's result remains).
    a = make_a(hh_flat, w, args.interpret)
    ref = jnp.einsum(
        "bni,nio->bno", hh[-1].astype(jnp.float32), w.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(a(zero), np.float32).reshape(B, NP, O),
        np.asarray(ref), atol=0.5, rtol=0.1,
    )

    # B consistency: rows are (b*NP + n); pool is a rank-D factorization of a
    # DIFFERENT weight tensor, so check against its own expansion.
    pool = f16(KI, D * O)
    hh_rows = hh.reshape(T, B * NP, KI)
    e_rows = jnp.tile(e, (B, 1))
    bfn = make_b(hh_rows, e_rows, pool, args.interpret)
    w_expanded = jnp.einsum(
        "nd,dio->nio", e.astype(jnp.float32),
        pool.astype(jnp.float32).reshape(KI, D, O).transpose(1, 0, 2),
    )
    ref_b = jnp.einsum("bni,nio->bno", hh[-1].astype(jnp.float32), w_expanded)
    got_b = np.asarray(bfn(zero), np.float32).reshape(B, NP, O)
    np.testing.assert_allclose(got_b, np.asarray(ref_b), atol=1.0, rtol=0.15)
    print("numerics OK", flush=True)

    if args.interpret:
        return

    hh_t = jnp.transpose(hh.reshape(T, B, NP, K, H), (0, 1, 3, 2, 4))
    w4 = w.reshape(NP, K, H, O)
    results = {
        "A_unrolled_node_dots": _time(_chain(a)),
        "B_factored_resident_pool": _time(_chain(bfn)),
        "C_xla_einsum_scan": _time(_chain(make_c(hh_t, w4))),
        "D_dma_floor": _time(_chain(make_d(hh_flat, w, None))),
    }
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print("  {:28s} {:8.3f} ms  ({:.1f} us/step)".format(k, v * 1e3, v * 1e6 / T))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
