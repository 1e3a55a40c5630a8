"""Kernel microbench: SpMM / SDDMM edges-per-second on a spatial power-law graph.

BASELINE.json config 4: ~50k-node spatial power-law graph, single chip. Reports
effective edge throughput (edges = nonzero entries; block-granular compute
also counts padded zeros — both are printed).

Timing uses the latency-cancelling slope method (tools/timing.py,
docs/DESIGN.md §9); the earlier host-loop numbers were inflated by the
relay's per-dispatch overhead.

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

    import functools

    from tools.timing import slope_time

    def slope_op(label, op, big, dense, bytes_moved, flops):
        """Slope-time op(big, dense_poked); returns per-iter seconds."""
        def make_fn(k):
            @functools.partial(jax.jit, static_argnums=2)
            def fn(vv, xx, kk):
                def body(i, c):
                    xi = xx.at[0, 0].add((c * 1e-12).astype(xx.dtype))
                    return c + jnp.sum(op(vv, xi)[0], dtype=jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return lambda: fn(big, dense, k)

        per_iter, totals = slope_time(make_fn, trips=(4, 8, 16))
        print(
            "{}: {:.3f} ms/iter (totals {} ms), {:.3g} edges/s, {:.0f} GFLOP/s, {:.0f} GB/s effective".format(
                label, per_iter * 1e3,
                "/".join("{:.0f}".format(t * 1e3) for t in totals),
                graph.nnz_edges / per_iter, flops / per_iter / 1e9,
                bytes_moved / per_iter / 1e9,
            ),
            file=sys.stderr,
        )
        return per_iter

    spmm_flops = 2 * graph.nnz_blocks * graph.block**2 * feat
    spmm_bytes = graph.nnz_blocks * (graph.block**2 + graph.block * feat) * 4
    spmm_s = slope_op(
        "SpMM f32", lambda vv, xx: spmm(vv, row_of, col_of, xx),
        values, x, spmm_bytes, spmm_flops)
    spmm_edges_s = graph.nnz_edges / spmm_s
    spmm_gflops = spmm_flops / spmm_s / 1e9

    values16 = values.astype(jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    spmm16_s = slope_op(
        "SpMM bf16", lambda vv, xx: spmm(vv, row_of, col_of, xx),
        values16, x16, spmm_bytes // 2, spmm_flops)
    print("  SpMM bf16 speedup vs f32: {:.2f}x".format(spmm_s / spmm16_s),
          file=sys.stderr)

    sddmm_flops = 2 * graph.nnz_blocks * graph.block**2 * d_adj
    sddmm_bytes = graph.nnz_blocks * graph.block**2 * 4  # values written
    sddmm_s = slope_op(
        "SDDMM f32", lambda ee, e1x: sddmm_relu(e1x, ee, row_of, col_of),
        e2, e1, sddmm_bytes, sddmm_flops)
    sddmm_edges_s = graph.nnz_edges / sddmm_s
    sddmm_gflops = sddmm_flops / sddmm_s / 1e9

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
