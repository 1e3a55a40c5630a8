"""Sharded training steps over a device mesh.

Builds jit-compiled train/eval steps whose inputs carry NamedShardings:
batch and sample dims over 'data', optionally the graph-node dim over 'node'.
Parameters and optimizer state are replicated (the model is small; node-
partitioned parameters arrive with the large-graph sparse path). Gradient
all-reduce over 'data' is inserted by XLA from the sharding annotations —
this replaces the DDP/NCCL layer a GPU framework would hand-roll.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_train_step(
    model,
    loss_fn: Callable,
    optimizer,
    mesh: Mesh,
    shard_nodes: bool = False,
) -> Callable:
    """jitted (params, opt_state, batch, rng, lr) -> (params, opt_state, loss).

    batch['X']/batch['y'] are sharded (data, None, node?, None); params and
    opt_state replicated; outputs keep the same shardings (donated inputs).
    """
    from multistgraph_tpu.executor.optimizers import set_learning_rate

    node_axis = "node" if (shard_nodes and "node" in mesh.axis_names) else None
    x_sharding = NamedSharding(mesh, P("data", None, node_axis, None))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, batch, rng, lr):
        set_learning_rate(opt_state, lr)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng=rng, train=True)
        updates, opt_state = optimizer.update(grads["params"], opt_state, params["params"])
        params = {"params": jax.tree_util.tree_map(lambda p, u: p + u, params["params"], updates)}
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, {"X": x_sharding, "y": x_sharding}, repl, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_sharded_eval_step(model, loss_fn: Callable, mesh: Mesh, shard_nodes: bool = False):
    node_axis = "node" if (shard_nodes and "node" in mesh.axis_names) else None
    x_sharding = NamedSharding(mesh, P("data", None, node_axis, None))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        partial(loss_fn, train=False),
        in_shardings=(repl, {"X": x_sharding, "y": x_sharding}),
        out_shardings=repl,
    )


def shard_batch(batch, mesh: Mesh, shard_nodes: bool = False):
    """Place a host batch dict onto the mesh with the step's input shardings."""
    node_axis = "node" if (shard_nodes and "node" in mesh.axis_names) else None
    sh = NamedSharding(mesh, P("data", None, node_axis, None))
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}
