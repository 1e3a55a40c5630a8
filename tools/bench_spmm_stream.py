"""Compare the block-grid SpMM kernel (ops/spmm.py) with the row-streaming
kernel (ops/spmm_stream.py) on the 50k-node spatial power-law graph.

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

    def sync(arr):
        return float(jnp.sum(arr[0]))

    bytes_hbm = graph.nnz_blocks * (graph.block * graph.block + graph.block * feat) * 4
    print("HBM floor @819GB/s: {:.3f} ms".format(bytes_hbm / 819e9 * 1e3), file=sys.stderr)

    results = {}
    for name, fn in [
        ("block-grid", lambda: spmm(values, row_of, col_of, x)),
        ("stream", lambda: spmm_stream(values, row_ptr, col_of, x)),
    ]:
        t0 = time.time()
        y = fn()
        sync(y)
        compile_s = time.time() - t0
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            y = fn()
        sync(y)
        dt = (time.time() - t0) / iters
        results[name] = (y, dt)
        gb_s = bytes_hbm / dt / 1e9
        print(
            "{:>10}: compile {:.1f}s, {:.3f} ms/iter, {:.0f} GB/s effective".format(
                name, compile_s, dt * 1e3, gb_s
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
