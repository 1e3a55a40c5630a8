"""[SUPERSEDED — absolute GB/s numbers here are latency artifacts.]

The ~100-150 GB/s readings this bench produced were dominated by the relay's
~28 ms dispatch+sync round trip; the corrected slope-method measurement
(tools/bench_hbm_peak.py, docs/DESIGN.md §9) shows Pallas grid reads at
~740 GB/s, i.e. at the chip's real ceiling. Kept for the relative block-size
comparisons only.

Measure achievable HBM->VMEM streaming bandwidth through a Pallas grid.

The node-conditioned weight stream is the hard floor of the dense encoder
(tools/bench_node_dots.py): one pipelined input stream measured only
~200 GB/s on this v5e against the 819 GB/s spec. This bench sweeps
block size x number of concurrent input streams (each input gets its own
double-buffered DMA) to find the real ceiling, which sets the mega-kernel
design (how many ways to split the weight tensor).

Run: python tools/bench_stream_rate.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MB = 1024 * 1024
TOTAL_MB = 512          # bytes read per invocation per stream-set
REPEAT = 8


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def _kernel(s_ref, *refs):
    ins, out = refs[:-1], refs[-1]
    acc = s_ref[0, 0] + ins[0][0, 0:1, :].astype(jnp.float32)
    for r in ins[1:]:
        acc = acc + r[0, 0:1, :].astype(jnp.float32)
    out[...] = acc


def make(n_streams, block_mb):
    rows_per_block = block_mb * MB // (2 * 512)  # bf16, 512 lanes
    total_rows = TOTAL_MB * MB // (2 * 512 * n_streams)
    grid = total_rows // rows_per_block
    arrays = [
        jnp.ones((grid, rows_per_block, 512), jnp.bfloat16) for _ in range(n_streams)
    ]

    def call(s):
        return pl.pallas_call(
            _kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [
                pl.BlockSpec((1, rows_per_block, 512), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_streams)
            ],
            out_specs=pl.BlockSpec((1, 512), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
        )(s, *arrays)

    def body(c, _):
        out = call(c)
        return jnp.mean(out).reshape(1, 1) * 1e-6, None

    fn = jax.jit(lambda: jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32),
                                      None, length=REPEAT)[0])
    _sync(fn())
    t0 = time.perf_counter()
    _sync(fn())
    dt = (time.perf_counter() - t0) / REPEAT
    gbps = TOTAL_MB * MB / dt / 1e9
    print("  streams={:2d} block={:3d}MB grid={:4d}: {:7.1f} GB/s ({:.2f} ms)".format(
        n_streams, block_mb, grid, gbps, dt * 1e3), flush=True)
    return gbps


def main():
    for n_streams, block_mb in [
        (1, 1), (1, 2), (1, 4), (1, 8),
        (2, 2), (2, 4),
        (4, 1), (4, 2),
        (8, 1),
    ]:
        try:
            make(n_streams, block_mb)
        except Exception as exc:
            print("  streams={} block={}MB FAILED: {}".format(
                n_streams, block_mb, str(exc).splitlines()[0]), flush=True)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
