"""Mesh construction, sharded train steps, and the driver entry points."""

import jax
import numpy as np
import pytest

from multistgraph_tpu.parallel import make_mesh


def test_make_mesh_shapes():
    m1 = make_mesh(8, axes=("data",))
    assert m1.devices.shape == (8,)
    m2 = make_mesh(8, axes=("data", "node"))
    assert m2.devices.shape == (2, 4)
    m3 = make_mesh(4, axes=("data", "node"))
    assert m3.devices.shape == (2, 2)
    with pytest.raises(ValueError):
        make_mesh(8, axes=("data",), shape=(3,))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape[1] == 6  # Tout


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_dp_step_matches_single_device():
    """The sharded step must be numerically equivalent to the local step."""
    import __graft_entry__ as ge
    from multistgraph_tpu.data.scalers import StandardScaler
    from multistgraph_tpu.executor.optimizers import build_optimizer
    from multistgraph_tpu.models import make_loss_fn
    from multistgraph_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch

    model, config, params, x, y = ge._tiny_setup()
    loss_fn = make_loss_fn(model, StandardScaler(mean=1.0, std=2.0))
    cfg = type("Cfg", (), {"get": lambda self, k, d=None: config.get(k, d)})()
    optimizer = build_optimizer(cfg)

    # single-device reference step
    from multistgraph_tpu.executor.optimizers import set_learning_rate

    def local_step(params, opt_state, batch, rng, lr):
        set_learning_rate(opt_state, lr)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng=rng, train=True)
        updates, opt_state = optimizer.update(grads["params"], opt_state, params["params"])
        new = jax.tree_util.tree_map(lambda p, u: p + u, params["params"], updates)
        return {"params": new}, opt_state, loss

    rng = jax.random.PRNGKey(7)
    batch = {"X": x, "y": y}
    p1, _, loss1 = jax.jit(local_step)(params, optimizer.init(params["params"]), batch, rng, 1e-3)

    mesh = make_mesh(4, axes=("data",))
    step = make_sharded_train_step(model, loss_fn, optimizer, mesh)
    sharded = shard_batch(batch, mesh)
    with mesh:
        p2, _, loss2 = step(params, optimizer.init(params["params"]), sharded, rng, 1e-3)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_initialize_distributed_single_host_noop():
    """Single host, no coordinator info -> no-op returning False (the
    multi-host path needs a real pod; this guards the wiring)."""
    import os

    from multistgraph_tpu.parallel.launch import initialize_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        assert var not in os.environ or os.environ.pop(var)
    assert initialize_distributed() is False
