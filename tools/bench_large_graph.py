"""End-to-end training-step benchmark of SparseATGCN at 50k-node scale.

BASELINE.json config 4: spatial power-law graph, single chip, full training step
(forward + backward + adam) through the Pallas SpMM/SDDMM path. Reports
model-level edge throughput: edges aggregated per second =
nnz_edges x aggregations_per_step / step_seconds.

Usage: python tools/bench_large_graph.py [num_nodes] [avg_degree] [T] [B] [split]
                                         [--dtype f32|bf16] [--embed-dim E]
                                         [--hidden H] [--iters K]
    split: none (default) | hub | tail | band — hybrid-partition the
    graph (ops/hybrid.py, ops/band.py) before building the model.
    --dtype bf16 sets the model's compute_dtype (params/optimizer stay f32;
    graph value arrays are STORED bf16) — at 1M nodes this is what makes a
    training step fit in a v5e's 16 GB HBM at all.
"""

import argparse
import functools
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
    ap = argparse.ArgumentParser()
    ap.add_argument("num_nodes", nargs="?", type=int, default=49152)
    ap.add_argument("avg_degree", nargs="?", type=int, default=16)
    ap.add_argument("t_steps", nargs="?", type=int, default=8)
    ap.add_argument("batch", nargs="?", type=int, default=2)
    ap.add_argument("split", nargs="?", default="none",
                    choices=("none", "hub", "tail", "band"))
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32")
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpreter mode (CPU smoke runs only)")
    ap.add_argument("--family", choices=("spatial", "planted"),
                    default="spatial",
                    help="planted: scrambled planted-partition edges "
                    "(tools/bench_reorder._planted_edges), community-"
                    "reordered then hybrid-split per `split` — the 1M "
                    "family whose only tractable form is community+tail "
                    "(docs/DESIGN.md §4)")
    ap.add_argument("--adaptive-max-blocks", type=int, default=0,
                    help="cap the adaptive view's sampled pattern to the K "
                    "statically-heaviest blocks (0 = full pattern); the "
                    "HBM knob that fits adaptive training at 1M nodes")
    ap.add_argument("--serve", action="store_true",
                    help="measure forward-only PREDICT latency instead of "
                    "the training step (the 1M serving surface)")
    ap.add_argument("--band-packed", action="store_true",
                    help="band split: store the diagonals pre-packed so the "
                    "slab kernel serves them (graph_band_packed)")
    ap.add_argument("--adpadj", choices=("unidirection", "none"),
                    default="unidirection",
                    help="'none' drops the learned adaptive view — at 1M "
                    "nodes its sampled tiles + their f32 gradient "
                    "accumulators are the dominant HBM cost (docs/DESIGN.md "
                    "§4), so this is the T-at-scale trade knob")
    cli = ap.parse_args()
    num_nodes, avg_degree = cli.num_nodes, cli.avg_degree
    t_steps, batch, split = cli.t_steps, cli.batch, cli.split

    print("building graph N={} deg={} family={} split={} dtype={} ...".format(
        num_nodes, avg_degree, cli.family, split, cli.dtype), file=sys.stderr)
    if cli.family == "planted":
        from tools.bench_reorder import _planted_edges

        src, dst, w = _planted_edges(num_nodes, avg_degree)
        perm = bsr.community_order(src, dst, num_nodes)
        inv = np.empty(num_nodes, np.int64)
        inv[perm] = np.arange(num_nodes)
        src, dst = inv[src], inv[dst]
        if split == "tail":
            from multistgraph_tpu.ops.hybrid import split_scattered_tail

            graph = split_scattered_tail(src, dst, w, num_nodes)
        elif split == "hub":
            from multistgraph_tpu.ops.hybrid import split_hub_columns

            graph = split_hub_columns(src, dst, w, num_nodes)
        else:
            raise SystemExit(
                "planted family needs split=tail (the tractable form) or "
                "hub; raw/band tiling of scrambled communities needs >50 GB "
                "of value tiles (docs/DESIGN.md §4)")
    else:
        graph, _ = bsr.random_spatial_graph(
            num_nodes, avg_degree, seed=0,
            split=None if split == "none" else split)
    # stats/partitioning read the BSR component; the model builder takes the
    # full (possibly hybrid) graph
    core = graph.bsr if split in ("hub", "tail") else graph
    nnz_edges = graph.nnz_edges
    cfg = {
        "output_window": 3, "output_dim": 1, "rnn_units": cli.hidden,
        "num_layers": 2, "embed_dim_adj": cli.embed_dim,
        "adpadj": cli.adpadj, "node_conditioned": "off",
        "adaptive_max_blocks": cli.adaptive_max_blocks,
        "remat": True,
        "compute_dtype": "bfloat16" if cli.dtype == "bf16" else None,
        "graph_band_packed": cli.band_packed,
    }
    model = build_sparse_atgcn(graph, cfg, interpret=cli.interpret)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, t_steps, core.padded_nodes, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, 3, core.padded_nodes, 1)).astype(np.float32))
    t0 = time.time()
    params = init_with_graph(model, jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), params)
    print("init {:.1f}s".format(time.time() - t0), file=sys.stderr)

    if cli.serve:
        # forward-only predict latency (the serving surface) — one jitted
        # apply. Sync via VALUE TRANSFER (tools/timing.device_sync):
        # block_until_ready returns early through the axon relay, which
        # made a naive timing loop read 0.75 ms for a ~43 GB/predict
        # program. The ~28 ms dispatch bias is noise at this step size.
        from tools.timing import device_sync

        predict = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
        t0 = time.time()
        compiled = predict.lower(params, x).compile()
        compile_s = time.time() - t0
        device_sync(compiled(params, x))  # warm
        # sync EVERY iteration: letting executions queue makes the runtime
        # hold one temp allocation PER in-flight program (the 1M forward's
        # temp is most of HBM -> ResourceExhausted). The per-sync dispatch
        # round-trip is measured with a trivial program and subtracted.
        tiny = jax.jit(lambda a: a + 1.0)
        device_sync(tiny(jnp.float32(0)))
        t0 = time.time()
        for _ in range(8):
            device_sync(tiny(jnp.float32(0)))
        floor_s = (time.time() - t0) / 8
        iters = cli.iters
        t0 = time.time()
        for _ in range(iters):
            device_sync(compiled(params, x))
        raw_step_s = (time.time() - t0) / iters
        # the dispatch floor is measured on a different (trivial) program;
        # for fast programs the subtraction can go <=0 — clamp so the JSON
        # metric can never report a negative latency / absurd edges/s
        step_s = max(raw_step_s - floor_s, 1e-6)
        num_sup = len(model.supports) + (
            1 if model.adaptive_pattern is not None else 0)
        aggs = cfg["num_layers"] * t_steps * 2 * num_sup  # forward only
        edges_s = nnz_edges * aggs * batch / step_s
        scale = ("1m" if num_nodes >= 10**6
                 else "{}k".format(round(num_nodes / 1024)))
        print("serve {:.4f}s/predict | {:.3g} model edges/s".format(
            step_s, edges_s), file=sys.stderr)
        print(json.dumps({
            "metric": "sparse_serve_latency_{}{}{}".format(
                scale, "" if split == "none" else "_" + split,
                "_packed" if cli.band_packed else ""),
            "value": round(step_s * 1e3, 2),
            "unit": "ms",
            "extras": {
                "edges_per_second": round(edges_s),
                "compile_seconds": round(compile_s, 1),
                "num_nodes": num_nodes, "split": split,
                "dtype": cli.dtype, "t_steps": t_steps, "batch": batch,
                "adpadj": cli.adpadj, "band_packed": cli.band_packed,
                "nnz_edges": nnz_edges,
                "device": jax.devices()[0].platform,
            },
        }))
        return

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = tx.init(params["params"])

    # donate params+opt_state: without donation the updated tree is a SECOND
    # full allocation (4.1 GB at 1M nodes — the measured difference between
    # fitting and OOM at T=4, docs/DESIGN.md §4)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
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
    lowered = step.lower(params, opt_state, x, y)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        ma = compiled.memory_analysis()
        print("compiled memory: temp {:.2f}G args {:.2f}G out {:.2f}G "
              "(alias {:.2f}G) gen-code {:.0f}M".format(
                  ma.temp_size_in_bytes / 2**30,
                  ma.argument_size_in_bytes / 2**30,
                  ma.output_size_in_bytes / 2**30,
                  ma.alias_size_in_bytes / 2**30,
                  ma.generated_code_size_in_bytes / 2**20),
              file=sys.stderr, flush=True)
    except Exception as exc:  # noqa: BLE001 — diagnostics only
        print("memory_analysis unavailable: {!r}".format(exc), file=sys.stderr)
    params, opt_state, loss = compiled(params, opt_state, x, y)
    print("step compile {:.1f}s loss {:.4f}".format(compile_s, float(loss)), file=sys.stderr)

    iters = cli.iters
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

    scale = ("1m" if num_nodes >= 10**6
             else "{}k".format(round(num_nodes / 1024)))
    print(json.dumps({
        "metric": "sparse_train_edges_per_second_{}{}{}".format(
            scale, "" if cli.family == "spatial" else "_" + cli.family,
            "" if split == "none" else "_" + split),
        "value": round(edges_s),
        "unit": "edges/s",
        "extras": {
            "step_seconds": round(step_s, 3),
            "compile_seconds": round(compile_s, 1),
            "num_nodes": num_nodes,
            "split": split,
            "dtype": cli.dtype,
            "t_steps": t_steps,
            "batch": batch,
            "adpadj": cli.adpadj,
            "adaptive_max_blocks": cli.adaptive_max_blocks,
            "hidden": cli.hidden,
            "embed_dim_adj": cli.embed_dim,
            "nnz_edges": nnz_edges,
            "nnz_blocks": getattr(core, "nnz_blocks", None),
            "device": jax.devices()[0].platform,
            **boundary,
        },
    }))


if __name__ == "__main__":
    main()
