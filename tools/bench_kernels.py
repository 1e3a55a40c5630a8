"""Kernel microbench: SpMM / SDDMM edges-per-second on a spatial power-law graph.

BASELINE.json config 4: ~50k-node spatial power-law graph, single chip. Reports
effective edge throughput (edges = nonzero entries; block-granular compute
also counts padded zeros — both are printed).

Usage: python tools/bench_kernels.py [num_nodes] [avg_degree] [feat]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm import sddmm_relu, spmm


def main():
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    avg_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    feat = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    d_adj = 128

    print("building spatial power-law graph N={} deg={} ...".format(num_nodes, avg_degree), file=sys.stderr)
    graph, num_edges = bsr.random_spatial_graph(num_nodes, avg_degree, seed=0)
    print(
        "nnz_blocks={} ({:.2f}% of dense), nnz_edges={}".format(
            graph.nnz_blocks,
            100.0 * graph.nnz_blocks / graph.num_row_blocks**2,
            graph.nnz_edges,
        ),
        file=sys.stderr,
    )

    values = jnp.asarray(graph.values)
    row_of = jnp.asarray(graph.row_of)
    col_of = jnp.asarray(graph.col_of)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(graph.padded_nodes, feat)).astype(np.float32))
    e1 = jnp.asarray(rng.normal(size=(graph.padded_nodes, d_adj)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(size=(d_adj, graph.padded_nodes)).astype(np.float32))

    def sync(arr):
        # A value transfer is the only reliable barrier on relay-attached
        # chips where block_until_ready can return before remote completion.
        return float(jnp.sum(arr[0]))

    # --- SpMM ---
    t0 = time.time()
    y = spmm(values, row_of, col_of, x)
    sync(y)
    compile_s = time.time() - t0
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        y = spmm(values, row_of, col_of, x)
    sync(y)
    spmm_s = (time.time() - t0) / iters
    spmm_edges_s = graph.nnz_edges / spmm_s
    spmm_block_edges_s = graph.nnz_blocks * graph.block**2 / spmm_s
    spmm_gflops = 2 * graph.nnz_blocks * graph.block**2 * feat / spmm_s / 1e9
    print(
        "SpMM: compile {:.1f}s, {:.3f} ms/iter, {:.3g} edges/s ({:.3g} block-edges/s, {:.0f} GFLOP/s)".format(
            compile_s, spmm_s * 1e3, spmm_edges_s, spmm_block_edges_s, spmm_gflops
        ),
        file=sys.stderr,
    )

    # --- SpMM bf16 tiles (f32 accumulation) ---
    values16 = values.astype(jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    y = spmm(values16, row_of, col_of, x16)
    sync(y)
    t0 = time.time()
    for _ in range(iters):
        y = spmm(values16, row_of, col_of, x16)
    sync(y)
    spmm16_s = (time.time() - t0) / iters
    print(
        "SpMM bf16: {:.3f} ms/iter ({:.2f}x vs f32, {:.0f} GFLOP/s)".format(
            spmm16_s * 1e3, spmm_s / spmm16_s,
            2 * graph.nnz_blocks * graph.block**2 * feat / spmm16_s / 1e9,
        ),
        file=sys.stderr,
    )

    # --- SDDMM ---
    t0 = time.time()
    v2 = sddmm_relu(e1, e2, row_of, col_of)
    sync(v2)
    compile2_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        v2 = sddmm_relu(e1, e2, row_of, col_of)
    sync(v2)
    sddmm_s = (time.time() - t0) / iters
    sddmm_edges_s = graph.nnz_edges / sddmm_s
    sddmm_gflops = 2 * graph.nnz_blocks * graph.block**2 * d_adj / sddmm_s / 1e9
    print(
        "SDDMM: compile {:.1f}s, {:.3f} ms/iter, {:.3g} edges/s ({:.0f} GFLOP/s)".format(
            compile2_s, sddmm_s * 1e3, sddmm_edges_s, sddmm_gflops
        ),
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "spmm_edges_per_second_50k",
        "value": round(spmm_edges_s),
        "unit": "edges/s",
        "extras": {
            "spmm_ms": round(spmm_s * 1e3, 3),
            "spmm_gflops": round(spmm_gflops, 1),
            "sddmm_ms": round(sddmm_s * 1e3, 3),
            "sddmm_edges_per_second": round(sddmm_edges_s),
            "num_nodes": num_nodes,
            "nnz_edges": graph.nnz_edges,
            "device": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
