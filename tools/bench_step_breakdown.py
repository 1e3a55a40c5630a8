"""Where does the DC-237 train step's time go?

Times, each as ONE jit program with an in-program lax.scan repeat (so remote
dispatch latency is amortized) on the real chip:

  forward       — model.apply only
  loss          — apply + inverse-transform + masked MAE
  grad          — value_and_grad of the loss
  train_step    — grad + optax update + param tree add
  epoch_scan/b  — the executor's actual scan-over-batches epoch / num_batches
                  (includes the device-side batch gather)

Run: python tools/bench_step_breakdown.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.data.scalers import StandardScaler
from multistgraph_tpu.executor.optimizers import build_optimizer
from multistgraph_tpu.models import make_loss_fn
from __graft_entry__ import _tiny_setup

REPEAT = 32


def _sync(tree) -> float:
    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def _time(fn, *args) -> float:
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPEAT


def main():
    # DC-237 shapes: B=16, N=237, H=64, 4x24-step input, 24-step output
    model, config, params, x, y = _tiny_setup(num_nodes=237, batch=16, hidden=64)
    config["output_window"] = 24
    scaler = StandardScaler(mean=1.0, std=2.0)
    loss_fn = make_loss_fn(model, scaler)
    optimizer = build_optimizer(type("Cfg", (), {"get": lambda self, k, d=None: config.get(k, d)})())
    opt_state = optimizer.init(params["params"])
    batch = {"X": x, "y": y}
    rng = jax.random.PRNGKey(0)

    def repeat(body, init_carry):
        def wrapped(*args):
            def step(carry, _):
                return body(carry, *args), None

            carry, _ = jax.lax.scan(step, init_carry(*args), None, length=REPEAT)
            return carry

        return jax.jit(wrapped)

    # Chain the carry INTO the model input each iteration: with loop-invariant
    # inputs XLA hoists the whole body out of the scan and the measurement
    # reads 1/REPEAT of one evaluation (the 'forward repeated 32x' trap —
    # see docs/DESIGN.md). c*1e-30 is numerically nil but defeats invariance.
    def perturb(b, c):
        return {"X": b["X"] + c * jnp.float32(1e-30), "y": b["y"]}

    # forward only: carry a scalar so the scan isn't dead-code-eliminated
    fwd = repeat(
        lambda c, p, b: c + model.apply(p, perturb(b, c)["X"], train=False).mean(),
        lambda p, b: jnp.float32(0),
    )
    t_fwd = _time(fwd, params, batch)

    lossr = repeat(
        lambda c, p, b: c + loss_fn(p, perturb(b, c), train=False),
        lambda p, b: jnp.float32(0),
    )
    t_loss = _time(lossr, params, batch)

    def grad_sum(c, p, b, train):
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn({"params": pp}, perturb(b, c), rng=rng, train=train)
        )(p["params"])
        # touch every grad leaf so backward isn't dead-code-eliminated
        return loss + sum(g.sum() for g in jax.tree_util.tree_leaves(grads))

    gradr = repeat(lambda c, p, b: c + grad_sum(c, p, b, True), lambda p, b: jnp.float32(0))
    t_grad = _time(gradr, params, batch)
    gradr_nd = repeat(lambda c, p, b: c + grad_sum(c, p, b, False), lambda p, b: jnp.float32(0))
    t_grad_nd = _time(gradr_nd, params, batch)

    def train_body(carry, b):
        p, os = carry
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn({"params": pp}, b, rng=rng, train=True)
        )(p["params"])
        updates, os = optimizer.update(grads, os, p["params"])
        p = {"params": jax.tree_util.tree_map(lambda a, u: a + u, p["params"], updates)}
        return (p, os)

    stepr = repeat(lambda c, b: train_body(c, b), lambda b: (params, opt_state))
    t_step = _time(stepr, batch)

    print("DC-237 step breakdown (B=16, per call, amortized over %d):" % REPEAT)
    print("  forward         : %7.2f ms" % (t_fwd * 1e3))
    print("  +loss           : %7.2f ms" % (t_loss * 1e3))
    print("  +grad (dropout) : %7.2f ms" % (t_grad * 1e3))
    print("  +grad (no drop) : %7.2f ms" % (t_grad_nd * 1e3))
    print("  +optimizer      : %7.2f ms" % (t_step * 1e3))


if __name__ == "__main__":
    main()
