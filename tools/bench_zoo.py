"""Model-zoo bench: jitted train-step time for every registered model.

Builds each comparison-set model at DC-237 scale (B=16, Tin=24, Tout=24,
N=237, F=2) straight from the registry with its shipped defaults, jits one
loss+grad+adam step, and slope-times it (tools/timing.py — cancels the
relay's fixed dispatch latency). Prints one line per model plus a JSON
summary. The reference has no such harness; per-model timings there are
manual wall-clock notes (Implementation details.pdf p.2).

Usage: python tools/bench_zoo.py [model ...]   (default: the full zoo)
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# The relay plugin pins the platform; honour an explicit JAX_PLATFORMS (e.g.
# cpu for smoke tests) via config, which the plugin cannot override.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
import optax

from multistgraph_tpu.config.defaults import MODEL_DEFAULTS
from multistgraph_tpu.models.registry import MODEL_REGISTRY
from tools.timing import slope_time

ZOO = ["RNN", "LSTM", "GRU", "FNN", "Seq2Seq", "TGCN", "AGCRN", "STGCN",
       "GWNET", "DCRNN", "ASTGCN", "MSTGCN", "MTGNN", "STSGCN", "STTN",
       "GMAN", "STGODE", "STGNCDE"]

# DC-237 scale by default; override via env for smoke tests
B = int(os.environ.get("BENCH_ZOO_BATCH", 16))
TIN = int(os.environ.get("BENCH_ZOO_TIN", 24))
TOUT = int(os.environ.get("BENCH_ZOO_TOUT", 24))
N = int(os.environ.get("BENCH_ZOO_NODES", 237))
F = 2


def bench_model(name, rng):
    config = dict(MODEL_DEFAULTS.get("traffic_state_pred/{}".format(name), {}))
    config.update(output_window=TOUT, input_window=TIN, add_time_in_day=True,
                  time_intervals=3600)
    if name in ("LSTM", "GRU"):
        config["rnn_type"] = name
    adj = (rng.random((N, N)) < 0.05).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    data_feature = {"num_nodes": N, "feature_dim": F, "output_dim": 1,
                    "adj_mx": adj}
    builder = MODEL_REGISTRY["RNN" if name in ("LSTM", "GRU") else name]
    model = builder(config, data_feature)

    x = jnp.asarray(rng.normal(size=(B, TIN, N, F)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, TOUT, N, 1)).astype(np.float32))
    params = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss_fn(p, xx):
        return jnp.mean(jnp.abs(model.apply(p, xx, train=False) - y))

    def train_step(p, o, xx):
        loss, grads = jax.value_and_grad(loss_fn)(p, xx)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def make_fn(k):
        @functools.partial(jax.jit, static_argnums=3)
        def fn(p, o, xx, kk):
            def body(_, carry):
                p, o, acc = carry
                # poke x with the carry so XLA can't hoist the loop body
                p, o, loss = train_step(
                    p, o, xx.at[0, 0, 0, 0].add(acc * 1e-12))
                return p, o, loss
            p, o, loss = jax.lax.fori_loop(0, kk, body, (p, o, jnp.float32(0)))
            return loss + sum(jnp.sum(l) * 1e-20 for l in
                              jax.tree_util.tree_leaves(p)[:1])
        return lambda: fn(params, opt, x, k)

    per_iter, _ = slope_time(make_fn, trips=(2, 4, 8))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    return per_iter, n_params


def main():
    names = sys.argv[1:] or ZOO
    rng = np.random.default_rng(0)
    results = {}
    for name in names:
        try:
            step_s, n_params = bench_model(name, rng)
            results[name] = {"step_ms": round(step_s * 1e3, 2),
                             "params": n_params}
            print("{:>8}: {:8.2f} ms/step  ({:.2f}M params)".format(
                name, step_s * 1e3, n_params / 1e6), file=sys.stderr)
        except Exception as exc:  # keep the sweep going; report at the end
            results[name] = {"error": str(exc)[:200]}
            print("{:>8}: FAILED {}".format(name, exc), file=sys.stderr)

    ok = {k: v for k, v in results.items() if "step_ms" in v}
    print(json.dumps({
        "metric": "model_zoo_step_ms_median",
        "value": round(float(np.median([v["step_ms"] for v in ok.values()])), 2)
        if ok else None,
        "unit": "ms/step",
        "extras": {"models": results, "batch": B, "num_nodes": N,
                   "device": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
