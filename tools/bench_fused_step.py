"""DC-237 full train step: fused-BPTT encoder vs plain autodiff.

Run: python tools/bench_fused_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.data.scalers import StandardScaler
from multistgraph_tpu.executor.optimizers import build_optimizer
from multistgraph_tpu.models import make_loss_fn
from __graft_entry__ import _tiny_setup

REPEAT = 32


def _time(fn, *args) -> float:
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).sum())
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).sum())
    return (time.perf_counter() - t0) / REPEAT


def step_time(fused: bool, compute_dtype=None) -> float:
    model, config, params, x, y = _tiny_setup(num_nodes=237, batch=16, hidden=64)
    model = model.clone(fused_bptt=fused, compute_dtype=compute_dtype)
    scaler = StandardScaler(mean=1.0, std=2.0)
    loss_fn = make_loss_fn(model, scaler)
    optimizer = build_optimizer(type("Cfg", (), {"get": lambda s, k, d=None: config.get(k, d)})())
    opt_state = optimizer.init(params["params"])
    rng = jax.random.PRNGKey(0)
    batch = {"X": x, "y": y}

    def make_body(b):
        def train_body(carry, _):
            p, os_ = carry
            loss, grads = jax.value_and_grad(
                lambda pp: loss_fn({"params": pp}, b, rng=rng, train=True)
            )(p["params"])
            updates, os_ = optimizer.update(grads, os_, p["params"])
            p = {"params": jax.tree_util.tree_map(lambda a, u: a + u, p["params"], updates)}
            return (p, os_), None

        return train_body

    fn = jax.jit(
        lambda b: jax.lax.scan(make_body(b), (params, opt_state), None, length=REPEAT)[0]
    )
    return _time(fn, batch)


def main():
    t_bf16 = step_time(True, "bfloat16")
    t_fused = step_time(True)
    t_plain = step_time(False)
    print("DC-237 train step (B=16): fused+bf16 %.2f ms | fused %.2f ms | "
          "plain autodiff %.2f ms | best %.2fx"
          % (t_bf16 * 1e3, t_fused * 1e3, t_plain * 1e3, t_plain / min(t_bf16, t_fused)))


if __name__ == "__main__":
    main()
