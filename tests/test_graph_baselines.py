"""Graph baseline models (AGCRN, TGCN): shapes, gradients, learning, pipeline.

Reference counterpart: task_config.json:95-164 allows both names; the trimmed
repo ships no implementation (multistgraph_tpu/models/graph_baselines.py is
clean-room per the papers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.models.graph_baselines import AGCRN, TGCN, _sym_norm_adj

B, TIN, TOUT, N, F = 4, 12, 3, 5, 2


def _x(seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, TIN, N, F)).astype(np.float32))


def _adj(seed=1):
    rng = np.random.default_rng(seed)
    a = (rng.random((N, N)) < 0.4).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    return a


def test_agcrn_shapes_and_grads():
    model = AGCRN(num_nodes=N, output_window=TOUT, output_dim=1,
                  hidden_dim=8, embed_dim=4, cheb_k=2, num_layers=2)
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.mean(jnp.square(model.apply(p, x))))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    # every parameter participates — including the node embedding
    total = {k: float(jnp.abs(v).sum()) for k, v in g["params"].items()}
    assert total["node_emb"] > 0


def test_agcrn_rejects_wrong_node_count():
    model = AGCRN(num_nodes=N + 1, output_window=TOUT, output_dim=1,
                  hidden_dim=8, embed_dim=4)
    with pytest.raises(ValueError, match="nodes"):
        model.init(jax.random.PRNGKey(0), _x())


def test_tgcn_shapes_and_grads():
    model = TGCN(adj_norm=_sym_norm_adj(_adj()), output_window=TOUT,
                 output_dim=1, hidden_dim=8)
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    g = jax.grad(lambda p: jnp.mean(jnp.square(model.apply(p, x))))(params)
    total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_sym_norm_adj_properties():
    raw = _adj()
    sym = np.maximum(raw, raw.T)
    a = _sym_norm_adj(sym)
    assert np.allclose(a, a.T, atol=1e-6)  # symmetric input -> symmetric norm
    # row sums of D^-1/2 (A+I) D^-1/2 are <= 1 and the zero-degree guard holds
    z = _sym_norm_adj(np.zeros((3, 3), np.float32))
    np.testing.assert_allclose(z, np.eye(3), atol=1e-6)


@pytest.mark.parametrize("model_cls,kwargs,factor", [
    (AGCRN, dict(num_nodes=N, embed_dim=4, cheb_k=2, num_layers=1), 0.5),
    # the 2-hop shared-weight conv learns more slowly on a tiny random
    # graph; monotone descent is what's asserted
    (TGCN, dict(), 0.8),
])
def test_graph_baselines_learn(model_cls, kwargs, factor):
    """A few adam steps must reduce the loss on a learnable signal."""
    import optax

    if model_cls is TGCN:
        kwargs = dict(kwargs, adj_norm=_sym_norm_adj(_adj()))
    model = model_cls(output_window=TOUT, output_dim=1, hidden_dim=8, **kwargs)
    x = _x()
    y = jnp.tile(x[:, -1:, :, :1], (1, TOUT, 1, 1))  # persistence target
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply(p, x) - y))

    losses = []
    for _ in range(25):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < factor * losses[0], losses[::6]


@pytest.mark.parametrize("model_name", ["AGCRN", "TGCN"])
def test_graph_baseline_pipeline(model_name, synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name=model_name, dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "gbase_" + model_name,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "input_window": 12, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "rnn_units": 8, "embed_dim_node": 4, "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()
