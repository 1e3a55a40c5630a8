"""Find the practical HBM streaming ceiling of this chip.

The streaming BSR SpMM kernel (ops/spmm_stream.py) tops out ~120 GB/s and
the weight stream of the dense encoder ~200 GB/s (tools/bench_stream_rate.py,
tools/bench_node_dots.py) against an 819 GB/s v5e spec sheet. Before chasing
kernel-side fixes, measure what ANY program can get on this chip through the
axon relay:

  a) XLA reduction of a large bf16/f32 array (pure read),
  b) XLA elementwise copy a+1 (read+write),
  c) Pallas row-block reduction (pure read, simple 2D grid),
  d) the same at several block widths.

Run: python tools/bench_hbm_peak.py
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MB = 1024 * 1024
REPEAT = 8


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def timeit(label, fn, bytes_moved):
    _sync(fn())  # compile
    t0 = time.perf_counter()
    _sync(fn())
    dt = (time.perf_counter() - t0) / REPEAT
    print("  {:44s} {:7.1f} GB/s ({:.2f} ms)".format(
        label, bytes_moved / dt / 1e9, dt * 1e3), flush=True)


def chain(body):
    """scan REPEAT times, carrying a scalar through to defeat CSE/hoisting."""
    def wrapped():
        def step(c, _):
            return body(c), None
        return jax.lax.scan(step, jnp.float32(0.0), None, length=REPEAT)[0]
    return jax.jit(wrapped)


def xla_reduce(dtype, total_mb):
    n = total_mb * MB // jnp.dtype(dtype).itemsize
    a = jnp.ones((n // 512, 512), dtype)
    fn = chain(lambda c: c * 1e-9 + jnp.sum(a, dtype=jnp.float32))
    timeit("xla sum      {} {}MB".format(jnp.dtype(dtype).name, total_mb),
           fn, total_mb * MB)


def xla_copy(dtype, total_mb):
    n = total_mb * MB // jnp.dtype(dtype).itemsize
    a = jnp.ones((n // 512, 512), dtype)

    def body(c):
        b = a + c
        return jnp.float32(b[0, 0]) * 1e-9
    fn = chain(body)
    timeit("xla a+c copy {} {}MB (rd+wr)".format(jnp.dtype(dtype).name, total_mb),
           fn, 2 * total_mb * MB)


def pallas_reduce(dtype, total_mb, block_rows, width):
    itemsize = jnp.dtype(dtype).itemsize
    rows = total_mb * MB // (itemsize * width)
    rows -= rows % block_rows
    a = jnp.ones((rows, width), dtype)
    grid = rows // block_rows

    def kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True,
                              dtype=jnp.float32)[:, :128]

    def call():
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((block_rows, width), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(a)

    fn = chain(lambda c: c * 1e-9 + jnp.sum(call()))
    actual_mb = rows * width * itemsize // MB
    timeit("pallas sum   {} {}MB rows/blk={} w={}".format(
        jnp.dtype(dtype).name, actual_mb, block_rows, width),
        fn, rows * width * itemsize)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    xla_reduce(jnp.bfloat16, 512)
    xla_reduce(jnp.float32, 512)
    xla_copy(jnp.float32, 256)
    for block_rows, width in [(256, 512), (512, 512), (1024, 512),
                              (256, 1024), (512, 1024), (128, 2048),
                              (2048, 512)]:
        pallas_reduce(jnp.bfloat16, 512, block_rows, width)


if __name__ == "__main__":
    main()
