"""Multi-device edges/s scaling of the boundary-exchange aggregation.

BASELINE.json asks for edges/s scaling efficiency measured across devices.
Real multi-chip hardware is not attached in this environment, so this bench
measures STRONG scaling of the edge-partitioned aggregation (one boundary
all_to_all + local/remote SpMM, the exact communication structure of
ops/spmm_boundary.py) on the virtual host-platform mesh, using the pure-jax
SpMM (ops/spmm.py:spmm_jax — Pallas needs a real TPU; the shard_map,
collective, and partition structure are identical). Efficiency(S) =
T(1) / (S * T(S)).

CAVEAT: all virtual devices share this host's physical cores (4 here), so
the measurable ceiling is the core count, NOT the sharding design — the
load-bearing measured quantity is the exchanged-volume curve
(boundary_fraction per shard count, ~0.04-0.16 vs 1.0 for all-gather) plus
monotone throughput growth. On a real pod the same tool measures true ICI
scaling (run without the CPU override).

Run: python tools/bench_scaling.py [num_nodes] [avg_degree] [feat]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm import spmm_jax
from multistgraph_tpu.ops.spmm_boundary import _exchange, partition_bsr_boundary
from multistgraph_tpu.parallel import make_mesh


def run_one(graph, num_shards, feat, iters=10):
    block = graph.block
    per = graph.num_row_blocks // num_shards
    mesh = make_mesh(num_shards, axes=("node",))
    plan = partition_bsr_boundary(graph, num_shards)
    arrs = {k: jnp.asarray(v) for k, v in plan.graph_arrays().items()}
    arrs = {
        k: jax.device_put(v, NamedSharding(mesh, P("node"))) for k, v in arrs.items()
    }
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(graph.padded_nodes, feat)).astype(np.float32)),
        NamedSharding(mesh, P("node", None)),
    )

    def shard_fn(a, x_shard):
        a = {k: v[0] for k, v in a.items()}
        recv = _exchange(
            x_shard.reshape(per, block, feat), a["send_idx"], "node",
            plan.max_send, num_shards,
        )
        y_local = spmm_jax(a["local_values"], a["local_row"], a["local_col"],
                           x_shard, block=block, out_blocks=per)
        y_remote = spmm_jax(a["remote_values"], a["remote_row"], a["remote_col"],
                            recv, block=block, out_blocks=per)
        return y_local + y_remote

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=({k: P("node") for k in arrs}, P("node", None)),
        out_specs=P("node", None), check_vma=False,
    ))
    y = fn(arrs, x)
    jax.block_until_ready(y)
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(arrs, x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, plan.boundary_fraction


def main():
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    avg_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    feat = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    graph, _ = bsr.random_spatial_graph(num_nodes, avg_degree, seed=0)
    print("graph: {} nodes, {} nnz blocks".format(num_nodes, graph.nnz_blocks),
          file=sys.stderr)
    results = {}
    t1 = None
    for s in (1, 2, 4, 8):
        if graph.num_row_blocks % s:
            continue
        dt, bf = run_one(graph, s, feat)
        t1 = t1 or dt
        eff = t1 / (s * dt)
        results[s] = {"ms": round(dt * 1e3, 2), "boundary_fraction": round(bf, 4),
                      "efficiency": round(eff, 3),
                      "edges_per_s": round(graph.nnz_edges / dt)}
        print("S={}: {:.2f} ms/iter, boundary {:.3f}, efficiency {:.2f}".format(
            s, dt * 1e3, bf, eff), file=sys.stderr)
    print(json.dumps({
        "metric": "boundary_aggregation_scaling_cpu_mesh",
        "value": results[max(results)]["efficiency"],
        "unit": "strong-scaling efficiency @8 shards",
        "extras": results,
    }))


if __name__ == "__main__":
    main()
