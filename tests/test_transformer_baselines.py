"""STSGCN, STTN, GMAN: shapes, gradients, structure, learning, pipeline.

Reference counterpart: task_config.json:121,125,133 allows the names; the
trimmed repo ships no usable implementation (temp/ frozen torch variants are
dev history and were not consulted) — models/{stsgcn,sttn,gman}.py are
clean-room per the papers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.models.gman import GMAN, laplacian_positional_embedding
from multistgraph_tpu.models.graph_baselines import _sym_norm_adj
from multistgraph_tpu.models.stsgcn import STSGCN, build_sync_adjacency
from multistgraph_tpu.models.sttn import STTN

B, TIN, TOUT, N, F = 4, 12, 3, 5, 2


def _x(seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, TIN, N, F)).astype(np.float32))


def _adj(seed=1):
    rng = np.random.default_rng(seed)
    a = (rng.random((N, N)) < 0.5).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    return a


def _stsgcn(**kw):
    kwargs = dict(sync_adj=build_sync_adjacency(_adj()), num_nodes=N,
                  output_window=TOUT, output_dim=1, input_dim=F,
                  hidden_dim=8, gcn_depth=2, num_layers=2)
    kwargs.update(kw)
    return STSGCN(**kwargs)


def _sttn(**kw):
    kwargs = dict(adj_norm=_sym_norm_adj(_adj()), output_window=TOUT,
                  output_dim=1, input_dim=F, hidden_dim=8, num_heads=2,
                  num_blocks=2, ffn_dim=16)
    kwargs.update(kw)
    return STTN(**kwargs)


def _gman(**kw):
    kwargs = dict(spatial_emb=laplacian_positional_embedding(_adj(), 4),
                  output_window=TOUT, output_dim=1, input_dim=F,
                  num_heads=2, head_dim=4, num_blocks=1, time_index=1)
    kwargs.update(kw)
    return GMAN(**kwargs)


@pytest.mark.parametrize("make", [
    _stsgcn, _sttn, _gman,
    lambda: _gman(time_index=None),  # learned positional TE fallback
])
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


def test_sync_adjacency_structure():
    a = _adj()
    big = build_sync_adjacency(a, 3)
    assert big.shape == (3 * N, 3 * N)
    # rows are stochastic (normalized) and cross-step blocks connect
    # only identical nodes
    rs = big.sum(axis=1)
    np.testing.assert_allclose(rs[rs > 0], 1.0, atol=1e-5)
    blk01 = big[:N, N:2 * N]
    assert (blk01 * (1 - np.eye(N)) == 0).all()
    assert (np.diag(blk01) > 0).all()


def test_stsgcn_rejects_short_window():
    model = _stsgcn(num_layers=6)  # 6 layers * 2 steps = 12 >= TIN
    with pytest.raises(ValueError, match="too short"):
        model.init(jax.random.PRNGKey(0), _x())


def test_laplacian_positional_embedding_shape_and_pad():
    emb = laplacian_positional_embedding(_adj(), 4)
    assert emb.shape == (N, 4)
    wide = laplacian_positional_embedding(_adj(), N + 3)  # pads beyond N-1
    assert wide.shape == (N, N + 3)
    assert np.isfinite(wide).all()


def test_gman_future_te_wraps_midnight():
    """Future time-of-day fractions wrap mod 1 without NaN."""
    model = _gman()
    x = np.array(_x())  # writable copy
    x[:, :, :, 1] = np.linspace(0.9, 0.999, TIN)[None, :, None]  # near midnight
    x = jnp.asarray(x)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("make", [_stsgcn, _sttn, _gman])
def test_transformer_baselines_learn(make):
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
    assert losses[-1] < 0.5 * losses[0], losses[::6]


@pytest.mark.parametrize("model_name", ["STSGCN", "STTN", "GMAN"])
def test_pipeline(model_name, synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name=model_name, dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "tr_" + model_name,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "input_window": 12, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "rnn_units": 8, "num_heads": 2, "num_blocks": 1, "ffn_dim": 16,
            "head_dim": 4, "se_dim": 4, "gcn_depth": 2, "num_layers": 2,
            "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()


def test_stsgcn_module_types_differ_but_both_learnable():
    """"individual" allocates per-window-position kernels (paper default);
    "sharing" reuses one — parameter counts and outputs must differ."""
    x = _x()
    counts = {}
    for mt in ("individual", "sharing"):
        model = _stsgcn(module_type=mt)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (B, TOUT, N, 1)
        assert np.isfinite(np.asarray(out)).all()
        counts[mt] = sum(int(np.prod(l.shape))
                         for l in jax.tree_util.tree_leaves(params))
    assert counts["individual"] > counts["sharing"]
    # individual kernels carry the window-position axis: TIN-2 positions at
    # layer 0
    model = _stsgcn(module_type="individual")
    params = model.init(jax.random.PRNGKey(0), x)
    assert params["params"]["l0_g0_kernel"].shape[0] == TIN - 2
