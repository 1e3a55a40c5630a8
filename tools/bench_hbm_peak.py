"""Measure the practical HBM streaming ceiling of this chip — correctly.

Three traps on this axon-relay setup make naive bandwidth probes lie (each
burned us once; see docs/DESIGN.md §8):

1. ~28 ms fixed dispatch+sync round-trip latency. Any measurement whose
   device time is under ~28 ms reads as ~28 ms. Fix: slope method — time the
   same program at several trip counts and fit the per-iteration slope; the
   fixed cost cancels.
2. XLA hoists loop-invariant work out of scans/loops, and constant-folds
   anything derived from `jnp.ones`-style compiler-known constants. Fix: the
   loop body reads through `lax.dynamic_slice` with an iteration-dependent
   start, on random data — not hoistable, not foldable.
3. A closed-over array becomes an inline HLO constant and blows the relay's
   HTTP-413 payload limit — large operands must be jit ARGUMENTS.

Measured on this chip (2026-08-17): HBM read 650 f32 / 733 bf16 GB/s
(80-90%% of the 819 GB/s v5e spec); rd+wr copy 466 GB/s; Pallas grid reads
721-749 GB/s (equal to XLA); MXU matmul peak 186.9 TF/s bf16 (95%% of the
197 spec) and 155 TF/s for "f32" inputs — i.e. DEFAULT-precision f32 dots
lower to bf16 MXU passes; true f32 arithmetic needs precision=HIGHEST.

Run: python tools/bench_hbm_peak.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

MB = 1024 * 1024
TRIPS = (8, 16, 32, 64)


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def slope(label, fn, arrs, bytes_per_iter):
    """Per-iter cost from the least-squares slope of total time vs trips."""
    times = []
    for k in TRIPS:
        _sync(fn(*arrs, k))  # compile this trip count
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _sync(fn(*arrs, k))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times.append(best)
    n = len(TRIPS)
    mk, mt = sum(TRIPS) / n, sum(times) / n
    per_iter = (sum((k - mk) * (t - mt) for k, t in zip(TRIPS, times))
                / sum((k - mk) ** 2 for k in TRIPS))
    print("  {:44s} {:7.1f} GB/s ({:.3f} ms/iter; totals {} ms)".format(
        label, bytes_per_iter / per_iter / 1e9, per_iter * 1e3,
        "/".join("{:.0f}".format(t * 1e3) for t in times)), flush=True)
    return bytes_per_iter / per_iter / 1e9


def _randarr(shape, dtype):
    return jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32).astype(dtype)


def read_bw(dtype, total_mb):
    """Pure-read slope: fused dynamic-slice + reduce, start alternates 0/1
    rows so each iteration must re-stream the array."""
    itemsize = jnp.dtype(dtype).itemsize
    rows = total_mb * MB // (itemsize * 512)
    a = _randarr((rows, 512), dtype)

    @partial(jax.jit, static_argnums=1)
    def fn(x, k):
        def body(i, c):
            b = jax.lax.dynamic_slice(x, (i % 2, 0), (rows - 2, 512))
            return c + jnp.sum(b, dtype=jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    slope("read  {} {}MB".format(jnp.dtype(dtype).name, total_mb),
          fn, (a,), (rows - 2) * 512 * itemsize)


def copy_bw(dtype, total_mb):
    """Read+write slope: materialize a shifted copy each iteration."""
    itemsize = jnp.dtype(dtype).itemsize
    rows = total_mb * MB // (itemsize * 512)
    a = _randarr((rows, 512), dtype)

    @partial(jax.jit, static_argnums=1)
    def fn(x, k):
        def body(i, c):
            b = jax.lax.dynamic_slice(x, (i % 2, 0), (rows - 2, 512)) + c
            # barrier forces the copy to materialize (otherwise the consumer
            # fuses into the slice and no write happens — measured 3.5 TB/s)
            b = jax.lax.optimization_barrier(b)
            return c + jnp.sum(b, dtype=jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    slope("copy  {} {}MB (rd+wr)".format(jnp.dtype(dtype).name, total_mb),
          fn, (a,), 2 * (rows - 2) * 512 * itemsize)


def matmul_stream(dtype, m_rows, width=512, batch=8):
    """Skinny matmul: the (M, width) operand streams from HBM through the
    MXU; at batch=8 FLOPs are negligible, so the slope == weight-stream
    time. This is the dense encoder's weight-apply access pattern."""
    itemsize = jnp.dtype(dtype).itemsize
    w = _randarr((m_rows, width), dtype)
    x = _randarr((batch, m_rows + 2), dtype)

    @partial(jax.jit, static_argnums=2)
    def fn(xx, ww, k):
        def body(i, c):
            # CARRY-dependent slice start: an i%2 start admits only two
            # distinct loop bodies, which XLA computed once each and
            # selected between (observed as 600 TB/s); a value-dependent
            # start cannot be enumerated at compile time.
            start = jnp.int32(c * 1e12) % 2
            xs = jax.lax.dynamic_slice(xx, (0, start), (batch, m_rows))
            y = jnp.dot(xs, ww, preferred_element_type=jnp.float32)
            # consume the WHOLE product nonlinearly: sum(x@w) factors into
            # (sum_i x)@w and y[0,0] shrinks the dot to one column — both
            # were observed as absurd TB/s readings.
            return c + jnp.sum(jnp.tanh(y)) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    slope("matmul stream {} {}MB (8x{}@..x{})".format(
        jnp.dtype(dtype).name, m_rows * width * itemsize // MB, m_rows, width),
        fn, (x, w), m_rows * width * itemsize)


def pallas_read(dtype, total_mb, block_rows, width):
    """Pallas grid read slope: per-iteration first-element poke keeps the
    call from being hoisted out of the loop."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    itemsize = jnp.dtype(dtype).itemsize
    rows = total_mb * MB // (itemsize * width)
    rows -= rows % block_rows
    a = _randarr((rows, width), dtype)
    grid = rows // block_rows

    def kernel(s_ref, x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        # the scalar operand carries the loop state into the kernel so the
        # call cannot be hoisted; a whole-array poke instead would copy the
        # 256MB operand every iteration and triple the measured traffic.
        o_ref[...] += s_ref[0, 0] + jnp.sum(x_ref[...], axis=0, keepdims=True,
                                            dtype=jnp.float32)[:, :128]

    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((block_rows, width), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )

    @partial(jax.jit, static_argnums=1)
    def fn(x, k):
        def body(i, c):
            return c + jnp.sum(call((c * 1e-12).reshape(1, 1), x)) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    slope("pallas read {} {}MB blk={}x{}".format(
        jnp.dtype(dtype).name, rows * width * itemsize // MB, block_rows, width),
        fn, (a,), rows * width * itemsize)


def matmul_peak(dtype, n):
    """Chained square matmuls: h <- tanh(h @ w) keeps every iteration live
    (carry-dependent) and the tanh blocks algebraic rewrites. FLOPs/iter =
    2 n^3; the slope gives sustained TF/s."""
    itemsize = jnp.dtype(dtype).itemsize
    w = _randarr((n, n), dtype) * (1.0 / n) ** 0.5
    h0 = _randarr((n, n), dtype)

    @partial(jax.jit, static_argnums=2)
    def fn(h, ww, k):
        def body(i, h):
            return jnp.tanh(jnp.dot(h, ww, preferred_element_type=jnp.float32)
                            ).astype(dtype)
        return jax.lax.fori_loop(0, k, body, h)

    times = []
    trips = TRIPS
    for k in trips:
        _sync(fn(h0, w, k))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _sync(fn(h0, w, k))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times.append(best)
    nn = len(trips)
    mk, mt = sum(trips) / nn, sum(times) / nn
    per_iter = (sum((kk - mk) * (t - mt) for kk, t in zip(trips, times))
                / sum((kk - mk) ** 2 for kk in trips))
    print("  matmul peak {} n={}: {:6.1f} TF/s ({:.3f} ms/iter; totals {} ms)".format(
        jnp.dtype(dtype).name, n, 2 * n ** 3 / per_iter / 1e12, per_iter * 1e3,
        "/".join("{:.0f}".format(t * 1e3) for t in times)), flush=True)


def sync_latency():
    e = jax.jit(lambda x: x + 1.0)
    z = jnp.float32(0.0)
    _sync(e(z))
    t0 = time.perf_counter()
    for _ in range(5):
        _sync(e(z))
    print("  sync round-trip: {:.1f} ms".format(
        (time.perf_counter() - t0) / 5 * 1e3), flush=True)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    sync_latency()
    read_bw(jnp.float32, 256)
    read_bw(jnp.bfloat16, 256)
    copy_bw(jnp.float32, 128)
    matmul_stream(jnp.bfloat16, 128 * 1024)
    matmul_stream(jnp.float32, 64 * 1024)
    pallas_read(jnp.bfloat16, 256, 512, 512)
    pallas_read(jnp.bfloat16, 256, 2048, 512)
    pallas_read(jnp.bfloat16, 256, 2048, 1024)
    matmul_peak(jnp.bfloat16, 4096)
    matmul_peak(jnp.float32, 4096)


if __name__ == "__main__":
    main()
