"""On-chip probes for a slab-granular band-SpMM kernel design.

The per-tile Pallas band kernel (ops/band.py band_fwd_pallas) measured
18.3 ms at the 1M point vs the stacked-einsum form's 12.8 ms — one
128x128 tile per grid step pays ~450 ns of grid/DMA overhead against
~21 ns of MXU work (docs/bench/band1m_spmm_pallas_r4.log). A faster
design processes C row blocks per step with ONE packed-band dot per
output tile: V_cat[r] (b, W=(2r+1)b) @ xwin[r] (W, F), where xwin is a
contiguous slice of the padded x slab when the offsets span the full
[-radius, radius] range.

This script probes the three Mosaic unknowns that decide whether that
kernel is buildable, then times the candidates:

  P1  batched dot_general (C,b,W)@(C,W,F) inside a pallas kernel
  P2  per-dot issue overhead of (b,W)@(W,F) dots in a fori_loop
  P3  ref-slice reshape (2r+1, b, F) -> (W, F) inside a kernel

Usage: python tools/probe_band_stream.py [--interpret]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128


def _report(name, ok, note=""):
    print("[{}] {} {}".format(name, "OK" if ok else "FAIL", note),
          file=sys.stderr, flush=True)


def probe_batched_dot(interpret):
    """P1: batched dot_general inside a kernel."""
    c, w, f = 4, 3 * B, B
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(c, B, w)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(c, w, f)).astype(np.float32))

    def kernel(v_ref, x_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            v_ref[...], x_ref[...],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((c, B, f), jnp.float32),
            interpret=interpret,
        )(v, x)
        want = jnp.einsum("cbw,cwf->cbf", v, x)
        ok = bool(jnp.allclose(out, want, atol=1e-3, rtol=1e-3))
        _report("P1 batched-dot", ok)
        return ok
    except Exception as exc:  # noqa: BLE001
        _report("P1 batched-dot", False, repr(exc)[:200])
        return False


def probe_slice_reshape(interpret):
    """P3: contiguous leading-dims merge of a scratch slice."""
    r, f = 2, B
    w = (2 * r + 1) * B
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(8, B, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, w)).astype(np.float32))

    def kernel(v_ref, x_ref, o_ref):
        win = x_ref[1:1 + 2 * r + 1].reshape(w, f)
        o_ref[...] = jnp.dot(v_ref[...], win,
                             preferred_element_type=jnp.float32)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, f), jnp.float32),
            interpret=interpret,
        )(v, xs)
        want = v @ xs[1:1 + 2 * r + 1].reshape(w, f)
        ok = bool(jnp.allclose(out, want, atol=1e-3, rtol=1e-3))
        _report("P3 slice-reshape", ok)
        return ok
    except Exception as exc:  # noqa: BLE001
        _report("P3 slice-reshape", False, repr(exc)[:200])
        return False


def _slope_looped(make_loop, trips=(2, 4, 8)):
    """Latency-cancelling slope: the k iterations run INSIDE one jitted
    fori_loop (the relay adds ~28 ms per DISPATCH — docs/DESIGN.md §9 —
    so per-call timing measures only the dispatch floor; the first probe
    version made exactly that mistake)."""
    jax.block_until_ready(make_loop(trips[0])())  # compile + warm
    times = []
    for k in trips:
        fn = make_loop(k)
        jax.block_until_ready(fn())
        t0 = time.time()
        jax.block_until_ready(fn())
        times.append((k, time.time() - t0))
    (k1, t1), (k2, t2) = times[0], times[-1]
    return (t2 - t1) / (k2 - k1)


def probe_streams(interpret):
    """P2 + end-to-end candidates at a 1M-ish scale: time (a) the packed
    slab kernel with per-c dots, (b) with one batched dot per slab, against
    (c) the stacked-einsum reference."""
    radius = 2
    n_off = 2 * radius + 1
    r_blocks = 8192  # 1M nodes + padding
    feat = 128
    cr = 8
    w = n_off * B
    rng = np.random.default_rng(2)
    dt = jnp.bfloat16
    v_pack = jnp.asarray(
        rng.normal(size=(r_blocks, B, w)).astype(np.float32)).astype(dt)
    xp = jnp.asarray(
        rng.normal(size=(r_blocks + 2 * radius, B, feat)).astype(np.float32)
    ).astype(dt)

    def make_kernel(batched):
        def kernel(v_hbm, x_hbm, out_ref, v_s, x_s, sem_v, sem_x):
            c = pl.program_id(0)
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            def dma_v(s, cc):
                return pltpu.make_async_copy(
                    v_hbm.at[pl.ds(cc * cr, cr)], v_s.at[s], sem_v.at[s])

            def dma_x(s, cc):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(cc * cr, cr + 2 * radius)], x_s.at[s],
                    sem_x.at[s])

            @pl.when(c == 0)
            def _():
                dma_v(slot, c).start()
                dma_x(slot, c).start()

            @pl.when(c + 1 < pl.num_programs(0))
            def _():
                dma_v(nxt, c + 1).start()
                dma_x(nxt, c + 1).start()

            dma_v(slot, c).wait()
            dma_x(slot, c).wait()
            if batched:
                # gather the C overlapping windows with static copies, one
                # batched dot per slab
                win = jnp.stack(
                    [x_s[slot, j:j + n_off].reshape(w, feat)
                     for j in range(cr)])
                out_ref[...] = jax.lax.dot_general(
                    v_s[slot], win, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            else:
                for j in range(cr):
                    out_ref[j] = jnp.dot(
                        v_s[slot, j], x_s[slot, j:j + n_off].reshape(w, feat),
                        preferred_element_type=jnp.float32)

        return kernel

    results = {}
    for name, batched in (("per-c dots", False), ("batched dot", True)):
        try:
            fn = pl.pallas_call(
                make_kernel(batched),
                grid=(r_blocks // cr,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (cr, B, feat), lambda c: (c, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((r_blocks, B, feat),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2, cr, B, w), v_pack.dtype),
                    pltpu.VMEM((2, cr + 2 * radius, B, feat), xp.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )
            jfn = jax.jit(lambda v, x, f=fn: f(v, x))
            out = jfn(v_pack, xp)
            # correctness vs einsum on a slab
            want = jnp.einsum(
                "bw,wf->bf", v_pack[5].astype(jnp.float32),
                xp[5:5 + n_off].reshape(w, feat).astype(jnp.float32))
            ok = bool(jnp.allclose(out[5], want, atol=2e-1, rtol=2e-2))

            def make_loop(k, f=fn):
                @functools.partial(jax.jit, static_argnums=2)
                def run(v, x, kk):
                    def body(i, c):
                        xi = x.at[0, 0, 0].add((c * 1e-12).astype(x.dtype))
                        return c + f(v, xi)[0, 0, 0] * 1e-12
                    return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
                return lambda: run(v_pack, xp, k)

            per = _slope_looped(make_loop)
            results[name] = per
            _report("P2 {}".format(name), ok,
                    "{:.2f} ms".format(per * 1e3))
        except Exception as exc:  # noqa: BLE001
            _report("P2 {}".format(name), False, repr(exc)[:300])

    # einsum reference at the same shape
    offs = tuple(range(-radius, radius + 1))
    v_diag = jnp.asarray(
        rng.normal(size=(n_off, r_blocks, B, B)).astype(np.float32)).astype(dt)

    def einsum_form(v, x):
        xs = jnp.stack([x[radius + o: radius + o + r_blocks] for o in offs])
        return jnp.einsum("orij,orjf->rif", v, xs,
                          preferred_element_type=jnp.float32)

    def make_loop_e(k):
        @functools.partial(jax.jit, static_argnums=2)
        def run(v, x, kk):
            def body(i, c):
                xi = x.at[0, 0, 0].add((c * 1e-12).astype(x.dtype))
                return c + einsum_form(v, xi)[0, 0, 0] * 1e-12
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return lambda: run(v_diag, xp, k)

    per = _slope_looped(make_loop_e)
    results["einsum"] = per
    _report("P2 einsum", True, "{:.2f} ms".format(per * 1e3))
    print(results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny correctness-only sweep (CPU)")
    ap.add_argument("--p4-only", action="store_true",
                    help="skip P1-P3 (already recorded) — run only "
                    "the integration-isolation timings")
    args = ap.parse_args()
    if args.p4_only:
        probe_integration()
        print("probes done (p4 only)")
        return
    p1 = probe_batched_dot(args.interpret)
    p3 = probe_slice_reshape(args.interpret)
    if not args.small:
        probe_streams(args.interpret)
        probe_integration()
    print("probes done p1={} p3={}".format(p1, p3))




def probe_integration():
    """P4: where does the slab win go in the integrated path? Times, in the
    same in-jit fori_loop harness: (a) the raw slab kernel on pre-packed
    values (probe baseline), (b) band_fwd_slab (pack inside jit,
    loop-invariant), (c) full spmm_band dispatch (pad+reshape wrapper)."""
    import functools

    from multistgraph_tpu.ops.band import (
        band_fwd_slab, band_fwd_slab_pallas, pack_band_rows, spmm_band)

    radius, feat = 2, 128
    n_off = 2 * radius + 1
    r_blocks = 8192
    w = n_off * B
    rng = np.random.default_rng(3)
    dt = jnp.bfloat16
    offs = tuple(range(-radius, radius + 1))
    v_diag = jnp.asarray(rng.normal(size=(n_off, r_blocks, B, B))
                         .astype(np.float32)).astype(dt)
    v_pack = jnp.asarray(np.asarray(
        pack_band_rows(np.asarray(v_diag, np.float32), offs, radius))
    ).astype(dt)
    xp = jnp.asarray(rng.normal(size=(r_blocks + 2 * radius, B, feat))
                     .astype(np.float32)).astype(dt)
    x_flat = jnp.asarray(rng.normal(size=(r_blocks * B, feat))
                         .astype(np.float32)).astype(dt)

    def harness(body, varg, xarg):
        # BOTH operands ride as jit arguments — a closure-captured 1.3 GB
        # value tensor serializes into the compile request (HTTP 413)
        def make_loop(k):
            @functools.partial(jax.jit, static_argnums=2)
            def run(v, a, kk):
                def it(i, c):
                    ai = a.at[(0,) * a.ndim].add((c * 1e-12).astype(a.dtype))
                    return c + body(v, ai).reshape(-1)[0].astype(
                        jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, kk, it, jnp.float32(0.0))
            return lambda: run(varg, xarg, k)
        return _slope_looped(make_loop)

    for cr in (8, 16):
        per = harness(lambda v, xi, c=cr: band_fwd_slab_pallas(
            v, xi, radius, chunk_rows=c), v_pack, xp)
        _report("P4 raw slab cr={} (pre-packed)".format(cr), True,
                "{:.2f} ms".format(per * 1e3))
    per = harness(lambda v, xi: band_fwd_slab(v, xi, offs, radius),
                  v_diag, xp)
    _report("P4 band_fwd_slab (pack in jit)", True,
            "{:.2f} ms".format(per * 1e3))
    os.environ["MSG_BAND_PALLAS"] = "slab"
    per = harness(lambda v, xi: spmm_band(v, np.asarray(offs), xi,
                                          block=B), v_diag, x_flat)
    _report("P4 spmm_band slab dispatch", True, "{:.2f} ms".format(per * 1e3))
    os.environ["MSG_BAND_PALLAS"] = "0"
    per = harness(lambda v, xi: spmm_band(v, np.asarray(offs), xi,
                                          block=B), v_diag, x_flat)
    _report("P4 spmm_band einsum dispatch", True,
            "{:.2f} ms".format(per * 1e3))
    del os.environ["MSG_BAND_PALLAS"]


if __name__ == "__main__":
    main()
