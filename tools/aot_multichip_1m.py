"""AOT compile evidence for THE multi-chip workload (VERDICT r4 item 1).

docs/DESIGN.md §4 establishes that full-width adaptive 1M-node training
(every sampled adaptive block, no `adaptive_max_blocks` cap, hidden 64) OOMs
one v5e chip at every probed shape (23.2G -> 16.5G as fixes landed).  The
edge-partitioned distributed backend (ops/spmm_boundary.py) is
numerics-verified at toy scale; what was missing is evidence that the ACTUAL
1M program lowers, SPMD-partitions and compiles with per-shard memory that
fits N chips.

This tool builds that exact program — SparseATGCN over the 1M spatial graph,
hub split (the adaptive form at 1M), full-width adaptive view, bf16 compute,
remat, donated params+opt_state — edge-partitioned over an
`--xla_force_host_platform_device_count=N` virtual CPU mesh, AOT
lowers + compiles it WITHOUT executing, and records the compiled
memory analysis (which for an SPMD executable is PER SHARD).

Caveats recorded with the artifact: the virtual mesh compiles through the
XLA *CPU* backend, so Pallas kernels run in interpret mode (lowered as
ordinary XLA ops) and buffer layouts may differ from TPU tiling by padding
factors; argument/output sizes are layout-exact, temp sizes are
indicative.  This is compile-level evidence, not a hardware measurement —
the strongest form buildable without an N-chip slice.

Usage:
    python tools/aot_multichip_1m.py [--num-nodes 1048576] [--n-dev 8]
                                     [--t-steps 4] [--hidden 64]
                                     [--embed-dim 128] [--json-out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=1 << 20)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--n-dev", type=int, default=8)
    ap.add_argument("--t-steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--split", choices=("hub", "band"), default="hub")
    ap.add_argument("--json-out", default=None,
                    help="also append the JSON record to this file")
    cli = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count={}".format(cli.n_dev)
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multistgraph_tpu.models.sparse_atgcn import build_sparse_atgcn_dist
    from multistgraph_tpu.ops import bsr
    from multistgraph_tpu.parallel import make_mesh

    devices = jax.devices("cpu")
    assert len(devices) >= cli.n_dev, (
        "need {} virtual devices, have {}".format(cli.n_dev, len(devices)))

    t0 = time.time()
    print("building 1M graph N={} deg={} split={} ...".format(
        cli.num_nodes, cli.avg_degree, cli.split), file=sys.stderr, flush=True)
    graph, _ = bsr.random_spatial_graph(
        cli.num_nodes, cli.avg_degree, seed=0, split=cli.split)
    build_s = time.time() - t0

    cfg = {
        # the EXACT full-width configuration DESIGN.md §4 proves OOMs one
        # chip: adaptive on, NO adaptive_max_blocks cap, full hidden/embed
        "output_window": 3, "output_dim": 1, "rnn_units": cli.hidden,
        "num_layers": 2, "embed_dim_adj": cli.embed_dim,
        "adpadj": "unidirection", "node_conditioned": "off",
        "remat": True, "compute_dtype": "bfloat16",
    }
    mesh = make_mesh(cli.n_dev, axes=("node",), devices=devices[:cli.n_dev])
    model = build_sparse_atgcn_dist(graph, cfg, mesh, interpret=True)

    core = getattr(graph, "bsr", graph)
    n_pad = core.padded_nodes
    x_sh = NamedSharding(mesh, P(None, None, "node", None))
    repl = NamedSharding(mesh, P())
    x = jax.device_put(
        np.zeros((cli.batch, cli.t_steps, n_pad, 1), np.float32), x_sh)
    y = jax.device_put(
        np.zeros((cli.batch, cfg["output_window"], n_pad, 1), np.float32), x_sh)

    # Trainable params: shapes via eval_shape (no 1M forward execution),
    # materialized as zeros — compile-only, values never matter.
    t0 = time.time()
    var_shapes = jax.eval_shape(
        lambda k, xx: model.init(k, xx, train=False), jax.random.PRNGKey(0), x)
    trainable = jax.tree_util.tree_map(
        lambda s: jax.device_put(jnp.zeros(s.shape, s.dtype), repl),
        var_shapes["params"])
    # Graph collection: the real partition plan's shapes/dtypes (bf16-cast
    # floats, node-sharded) exactly as attach_graph produces them.
    graph_coll = {}
    for key, arr in model.dist_plan.graph_arrays().items():
        dtype = (jnp.bfloat16 if np.issubdtype(arr.dtype, np.floating)
                 else arr.dtype)
        graph_coll["bnd_" + key] = jax.device_put(
            jnp.zeros(arr.shape, dtype),
            NamedSharding(mesh, P("node")))
    params = {"params": trainable, "graph": graph_coll}
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    opt_state = jax.tree_util.tree_map(
        lambda s: jax.device_put(jnp.zeros(s.shape, s.dtype), repl),
        jax.eval_shape(tx.init, trainable))
    setup_s = time.time() - t0

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y):
        def loss_fn(trainable):
            pred = model.apply(
                {"params": trainable, "graph": params["graph"]}, x, train=False)
            return jnp.mean(jnp.abs(pred - y))

        loss, grads = jax.value_and_grad(loss_fn)(params["params"])
        updates, opt_state = tx.update(grads, opt_state, params["params"])
        new = optax.apply_updates(params["params"], updates)
        return {"params": new, "graph": params["graph"]}, opt_state, loss

    print("lowering + compiling over mesh {} ...".format(
        dict(zip(mesh.axis_names, mesh.devices.shape))),
        file=sys.stderr, flush=True)
    t0 = time.time()
    with mesh:
        lowered = step.lower(params, opt_state, x, y)
        lower_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0

    record = {
        "workload": "full-width adaptive 1M training (DESIGN.md §4 multi-chip)",
        "num_nodes": cli.num_nodes, "avg_degree": cli.avg_degree,
        "split": cli.split, "n_dev": cli.n_dev,
        "t_steps": cli.t_steps, "batch": cli.batch,
        "hidden": cli.hidden, "embed_dim_adj": cli.embed_dim,
        "adaptive": "full-width (no adaptive_max_blocks cap)",
        "compute_dtype": "bfloat16", "remat": True,
        "graph_build_s": round(build_s, 1), "setup_s": round(setup_s, 1),
        "lower_s": round(lower_s, 1), "compile_s": round(compile_s, 1),
        "backend": "cpu-virtual-mesh (Pallas interpret; layouts indicative)",
    }
    try:
        ma = compiled.memory_analysis()
        record["per_shard"] = {
            "temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
            "argument_gib": round(ma.argument_size_in_bytes / 2**30, 2),
            "output_gib": round(ma.output_size_in_bytes / 2**30, 2),
            "alias_gib": round(ma.alias_size_in_bytes / 2**30, 2),
            "generated_code_mib": round(
                ma.generated_code_size_in_bytes / 2**20, 1),
        }
        # live bytes a chip must hold: temp + args + out - donated aliases
        live = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        record["per_shard"]["live_gib"] = round(live / 2**30, 2)
        record["fits_v5e_15_75_gib"] = bool(live / 2**30 < 15.75)
    except Exception as exc:  # noqa: BLE001 — report what we can
        record["memory_analysis_error"] = repr(exc)
    print(json.dumps(record, indent=2))
    if cli.json_out:
        with open(cli.json_out, "a") as f:
            f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
