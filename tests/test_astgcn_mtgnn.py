"""ASTGCN/MSTGCN and MTGNN: shapes, gradients, graph learning, learning, pipeline.

Reference counterpart: task_config.json:102,104 allows the names; the trimmed
repo ships no implementation (models/astgcn.py and models/mtgnn.py are
clean-room per the papers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.graph.laplacian import cheb_polynomials, scaled_laplacian
from multistgraph_tpu.models.astgcn import ASTGCN
from multistgraph_tpu.models.mtgnn import MTGNN, learned_adjacency

B, TIN, TOUT, N, F = 4, 12, 3, 5, 2


def _x(seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, TIN, N, F)).astype(np.float32))


def _sups(seed=1, k=3):
    rng = np.random.default_rng(seed)
    a = (rng.random((N, N)) < 0.5).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    sl = scaled_laplacian(a, lambda_max=None, undirected=True)
    return np.stack(cheb_polynomials(sl, k))


def _astgcn(**kw):
    kwargs = dict(supports=_sups(), output_window=TOUT, output_dim=1,
                  input_dim=F, nb_block=2, nb_filter=8, use_attention=True)
    kwargs.update(kw)
    return ASTGCN(**kwargs)


def _mtgnn(**kw):
    kwargs = dict(num_nodes=N, output_window=TOUT, output_dim=1, input_dim=F,
                  embed_dim=4, subgraph_size=3, conv_channels=8,
                  residual_channels=8, skip_channels=8, end_channels=8,
                  layers=2, dropout=0.0)
    kwargs.update(kw)
    return MTGNN(**kwargs)


@pytest.mark.parametrize("make", [
    _astgcn,
    lambda: _astgcn(use_attention=False),  # MSTGCN configuration
    _mtgnn,
    lambda: _mtgnn(use_gcn=False),
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


def test_mstgcn_has_no_attention_params():
    model = _astgcn(use_attention=False)
    params = model.init(jax.random.PRNGKey(0), _x())
    assert not any("_tat_" in k or "_sat_" in k for k in params["params"])


def test_mtgnn_learned_graph_topk():
    """The learned adjacency keeps at most subgraph_size entries per row."""
    model = _mtgnn(subgraph_size=2)
    params = model.init(jax.random.PRNGKey(0), _x())
    p = params["params"]
    adj = learned_adjacency(p["gl_e1"], p["gl_e2"], p["gl_w1"], p["gl_w2"],
                            model.alpha, 2)
    nnz_per_row = (np.asarray(adj) > 0).sum(axis=1)
    assert (nnz_per_row <= 2).all()
    # gradients flow into the graph-learning embeddings
    g = jax.grad(lambda p: jnp.mean(jnp.square(model.apply(p, _x()))))(params)
    assert float(jnp.abs(g["params"]["gl_e1"]).sum()) > 0


def test_mtgnn_short_window_padded():
    model = _mtgnn(layers=3)  # receptive field 1 + 3*6 = 19 > TIN
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("make", [_astgcn, _mtgnn])
def test_attention_models_learn(make):
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


@pytest.mark.parametrize("model_name", ["ASTGCN", "MSTGCN", "MTGNN"])
def test_pipeline(model_name, synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name=model_name, dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "attn_" + model_name,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "input_window": 12, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "nb_filter": 8, "conv_channels": 8, "residual_channels": 8,
            "skip_channels": 8, "end_channels": 8, "layers": 2,
            "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()
