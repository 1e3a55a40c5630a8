"""Compare the block-grid SpMM kernel (ops/spmm.py) with the row-streaming
kernel (ops/spmm_stream.py) on the 50k-node spatial power-law graph.

Timing uses the latency-cancelling slope method (tools/timing.py): the old
host-loop numbers here were polluted by the relay's ~28 ms dispatch+sync
round trip and understated both kernels several-fold.

Usage: python tools/bench_spmm_stream.py [num_nodes] [avg_degree] [feat] [n_buf]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm import spmm
from multistgraph_tpu.ops.spmm_stream import row_ptr_from_rows, spmm_stream


def main():
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    avg_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    feat = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    graph, _ = bsr.random_spatial_graph(num_nodes, avg_degree, seed=0)
    print(
        "nnz_blocks={} rows={} block={}".format(
            graph.nnz_blocks, graph.num_row_blocks, graph.block
        ),
        file=sys.stderr,
    )

    values = jnp.asarray(graph.values)
    row_of = jnp.asarray(graph.row_of)
    col_of = jnp.asarray(graph.col_of)
    row_ptr = jnp.asarray(row_ptr_from_rows(graph.row_of, graph.num_row_blocks))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(graph.padded_nodes, feat)).astype(np.float32))

    from tools.timing import slope_time

    bytes_hbm = graph.nnz_blocks * (graph.block * graph.block + graph.block * feat) * 4
    print("HBM floor @ the measured 730 GB/s ceiling: {:.3f} ms".format(
        bytes_hbm / 730e9 * 1e3), file=sys.stderr)

    import functools
    import jax

    results = {}
    for name, op in [
        ("block-grid", lambda vv, xx: spmm(vv, row_of, col_of, xx)),
        ("stream", lambda vv, xx: spmm_stream(vv, row_ptr, col_of, xx)),
    ]:
        # values/x are jit ARGUMENTS — closed-over arrays become inline HLO
        # constants and blow the relay's 413 payload limit
        def make_fn(k, op=op):
            @functools.partial(jax.jit, static_argnums=2)
            def fn(vv, xx, kk):
                def body(i, c):
                    # poke x with the carry so each iteration re-executes;
                    # the induced whole-x copy is ~2 MB-scale vs the GB-scale
                    # value stream, <1% overhead
                    xi = xx.at[0, 0].add(c * 1e-12)
                    return c + jnp.sum(op(vv, xi)[0], dtype=jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return lambda: fn(values, x, k)

        t0 = time.time()
        per_iter, totals = slope_time(make_fn, trips=(4, 8, 16))
        results[name] = (op(values, x), per_iter)
        gb_s = bytes_hbm / per_iter / 1e9
        print(
            "{:>10}: {:.3f} ms/iter (slope; totals {} ms), {:.0f} GB/s effective, wall {:.0f}s".format(
                name, per_iter * 1e3,
                "/".join("{:.0f}".format(t * 1e3) for t in totals), gb_s,
                time.time() - t0,
            ),
            file=sys.stderr,
        )

    err = float(jnp.max(jnp.abs(results["block-grid"][0] - results["stream"][0])))
    print("max abs diff: {:.3g}".format(err), file=sys.stderr)
    print(
        "speedup stream vs block-grid: {:.2f}x".format(
            results["block-grid"][1] / results["stream"][1]
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
