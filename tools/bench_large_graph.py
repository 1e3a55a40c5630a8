"""End-to-end training-step benchmark of SparseATGCN at 50k-node scale.

BASELINE.json config 4: spatial power-law graph, single chip, full training step
(forward + backward + adam) through the Pallas SpMM/SDDMM path. Reports
model-level edge throughput: edges aggregated per second =
nnz_edges x aggregations_per_step / step_seconds.

Usage: python tools/bench_large_graph.py [num_nodes] [avg_degree] [T] [B] [split]
    split: none (default) | hub | tail | band — hybrid-partition the
    graph (ops/hybrid.py, ops/band.py) before building the model.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multistgraph_tpu.models.sparse_atgcn import build_sparse_atgcn, init_with_graph
from multistgraph_tpu.ops import bsr


def main():
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    avg_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    split = sys.argv[5] if len(sys.argv) > 5 else "none"

    print("building graph N={} deg={} split={} ...".format(
        num_nodes, avg_degree, split), file=sys.stderr)
    graph, _ = bsr.random_spatial_graph(
        num_nodes, avg_degree, seed=0,
        split=None if split == "none" else split)
    # stats/partitioning read the BSR component; the model builder takes the
    # full (possibly hybrid) graph
    core = graph.bsr if split in ("hub", "tail") else graph
    nnz_edges = graph.nnz_edges
    cfg = {
        "output_window": 3, "output_dim": 1, "rnn_units": 64, "num_layers": 2,
        "embed_dim_adj": 128, "adpadj": "unidirection", "node_conditioned": "off",
        "remat": True,
    }
    model = build_sparse_atgcn(graph, cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, t_steps, core.padded_nodes, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, 3, core.padded_nodes, 1)).astype(np.float32))
    t0 = time.time()
    params = init_with_graph(model, jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), params)
    print("init {:.1f}s".format(time.time() - t0), file=sys.stderr)

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params["params"])

    @jax.jit
    def step(params, opt_state, x, y):
        others = {k: v for k, v in params.items() if k != "params"}

        def loss_fn(trainable):
            pred = model.apply({"params": trainable, **others}, x, train=False)
            return jnp.mean(jnp.abs(pred - y))

        loss, grads = jax.value_and_grad(loss_fn)(params["params"])
        updates, opt_state = tx.update(grads, opt_state, params["params"])
        params = dict(params)
        params["params"] = optax.apply_updates(params["params"], updates)
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, x, y)
    compile_s = time.time() - t0
    print("step compile {:.1f}s loss {:.4f}".format(compile_s, float(loss)), file=sys.stderr)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, y)
    loss_val = float(loss)  # value transfer = true sync
    step_s = (time.time() - t0) / iters

    # aggregations per train step: fwd (2 supports+adaptive=3? count actual):
    # per layer per timestep: 2 aggregation calls (h, z*h) + hoisted x (1 per
    # layer amortized over T). Each aggregation applies every non-identity
    # support once. Backward roughly doubles it.
    num_sup = len(model.supports) + (1 if model.adaptive_pattern is not None else 0)
    aggs = cfg["num_layers"] * t_steps * 2 * num_sup * 2  # x2 for backward
    edges_per_step = nnz_edges * aggs * batch
    edges_s = edges_per_step / step_s
    print(
        "step {:.3f}s | {:.3g} model edges/s | loss {:.4f}".format(step_s, edges_s, loss_val),
        file=sys.stderr,
    )
    # Multi-chip partition stats (BASELINE config 5): the boundary-exchange
    # plan is host-computed, so its communication volume is reportable even
    # on a single attached chip (the exchange itself is validated on the
    # 8-device virtual mesh, tests/test_sparse_dist.py).
    from multistgraph_tpu.ops.spmm_boundary import partition_bsr_boundary

    boundary = {}
    for shards in (4, 8):
        if hasattr(core, "values") and core.num_row_blocks % shards == 0:
            plan = partition_bsr_boundary(core, shards)
            boundary["boundary_fraction_s{}".format(shards)] = round(
                plan.boundary_fraction, 4
            )
    print("boundary fractions: {}".format(boundary), file=sys.stderr)

    print(json.dumps({
        "metric": "sparse_train_edges_per_second_50k" if split == "none"
                  else "sparse_train_edges_per_second_50k_" + split,
        "value": round(edges_s),
        "unit": "edges/s",
        "extras": {
            "step_seconds": round(step_s, 3),
            "compile_seconds": round(compile_s, 1),
            "num_nodes": num_nodes,
            "split": split,
            "nnz_edges": nnz_edges,
            "nnz_blocks": getattr(core, "nnz_blocks", None),
            "device": jax.devices()[0].platform,
            **boundary,
        },
    }))


if __name__ == "__main__":
    main()
