"""Convolutional baselines (STGCN, GWNET): shapes, gradients, learning, pipeline.

Reference counterpart: task_config.json:96-99 allows both names; the trimmed
repo ships no implementation (multistgraph_tpu/models/conv_baselines.py is
clean-room per the papers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.models.conv_baselines import (
    GWNET,
    STGCN,
    _cheb_supports,
    _random_walk_supports,
)

B, TIN, TOUT, N, F = 4, 12, 3, 5, 2


def _x(seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, TIN, N, F)).astype(np.float32))


def _adj(seed=1):
    rng = np.random.default_rng(seed)
    a = (rng.random((N, N)) < 0.5).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    return a


def _stgcn(**kw):
    kwargs = dict(
        supports=_cheb_supports(_adj(), 3), output_window=TOUT, output_dim=1,
        input_dim=1, kt=3, channels=((8, 4, 8), (8, 4, 8)))
    kwargs.update(kw)
    return STGCN(**kwargs)


def _gwnet(**kw):
    kwargs = dict(
        supports=_random_walk_supports(_adj()), num_nodes=N, output_window=TOUT,
        output_dim=1, input_dim=1, residual_channels=8, dilation_channels=8,
        skip_channels=16, end_channels=16, blocks=2, layers=2, embed_dim=4,
        dropout=0.0)
    kwargs.update(kw)
    return GWNET(**kwargs)


@pytest.mark.parametrize("make", [_stgcn, _gwnet])
def test_shapes_and_grads(make):
    model = make()
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.mean(jnp.square(model.apply(p, x))))(params)
    total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_stgcn_rejects_too_short_window():
    model = _stgcn()
    x = jnp.zeros((B, 8, N, F))  # 2 blocks x 2 GLUs x (kt-1)=2 consume all 8
    with pytest.raises(ValueError, match="too short"):
        model.init(jax.random.PRNGKey(0), x)


def test_gwnet_pads_short_windows():
    """T below the receptive field is front-padded, not an error."""
    model = _gwnet(blocks=3)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, 4, N, F)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_gwnet_adaptive_only_mode():
    """adpadj='none' drops the adaptive support; empty predefined list works."""
    m_noadp = _gwnet(adaptive=False)
    x = _x()
    params = m_noadp.init(jax.random.PRNGKey(0), x)
    assert "adp_e1" not in params["params"]
    m_adp_only = _gwnet(supports=[])
    params = m_adp_only.init(jax.random.PRNGKey(0), x)
    out = m_adp_only.apply(params, x)
    assert np.isfinite(np.asarray(out)).all()


def test_cheb_supports_structure():
    sup = _cheb_supports(_adj(), 3)
    assert sup.shape == (3, N, N)
    np.testing.assert_allclose(sup[0], np.eye(N), atol=1e-6)


def test_random_walk_supports_are_stochastic():
    fwd, bwd = _random_walk_supports(_adj())
    for m in (fwd, bwd):
        rs = m.sum(axis=1)
        assert np.all((np.abs(rs - 1.0) < 1e-5) | (rs == 0.0))


@pytest.mark.parametrize("make,factor", [(_stgcn, 0.5), (_gwnet, 0.5)])
def test_conv_baselines_learn(make, factor):
    import optax

    model = make()
    x = _x()
    y = jnp.tile(x[:, -1:, :, :1], (1, TOUT, 1, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply(p, x) - y))

    losses = []
    for _ in range(30):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < factor * losses[0], losses[::6]


@pytest.mark.parametrize("model_name", ["STGCN", "GWNET"])
def test_conv_baseline_pipeline(model_name, synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name=model_name, dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "cbase_" + model_name,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "input_window": 12, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "residual_channels": 8, "dilation_channels": 8, "skip_channels": 16,
            "end_channels": 16, "blocks": 2,
            "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()
