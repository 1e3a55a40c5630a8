"""MultiATGCN model: shapes, ablation flags, gradients, and golden parity.

The parity test imports the reference PyTorch implementation directly from
/root/reference (read-only, used as a runtime oracle — nothing is copied),
transplants our parameters into it, and asserts forward-output allclose.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from multistgraph_tpu.models import build_multi_atgcn, make_loss_fn

REFERENCE_PATH = "/root/reference"

N = 8
TIN, TOUT = 24, 6
LEN_C, LEN_P, LEN_T = 2, 1, 1  # in input_window multiples


def _data_feature(with_static=False, seed=0):
    rng = np.random.default_rng(seed)
    adj = np.abs(rng.normal(size=(N, N))).astype(np.float32)
    np.fill_diagonal(adj, rng.uniform(2, 4, N))
    geo = pd.DataFrame(
        {
            "geo_id": np.arange(N),
            "type": "Point",
            "coordinates": [
                "[{:.5f}, {:.5f}]".format(-77 + 0.01 * i, 38.9 + 0.008 * i) for i in range(N)
            ],
        }
    )
    static = rng.normal(size=(N, 5)) if with_static else None
    return {
        "num_nodes": N,
        "adj_mx": adj,
        "static": static,
        "coordinate": geo,
        "ext_dim": 1,  # time_in_day
        "output_dim": 1,
        "len_closeness": LEN_C * TIN,
        "len_period": LEN_P * TIN,
        "len_trend": LEN_T * TIN,
        "scaler": None,
    }


def _config(**overrides):
    cfg = {
        "input_window": TIN,
        "output_window": TOUT,
        "start_dim": 0,
        "end_dim": 1,
        "rnn_units": 8,
        "num_layers": 2,
        "cheb_order": 2,
        "embed_dim_node": 4,
        "embed_dim_adj": 3,
        "adjtype": "cosine",
        "adpadj": "none",
        "add_time_in_day": True,
        "add_day_in_week": False,
        "load_dynamic": False,
        "gcn_off": False,
        "fnn_off": False,
        "node_specific_off": False,
        "batch_size": 4,
    }
    cfg.update(overrides)
    return cfg


def _input(batch=4, feature_dim=2, seed=0):
    rng = np.random.default_rng(seed)
    total = (LEN_C + LEN_P + LEN_T) * TIN
    x = rng.normal(size=(batch, total, N, feature_dim)).astype(np.float32)
    x[..., 1] = rng.uniform(size=(batch, total, N))  # time-in-day fraction
    return jnp.asarray(x)


def _init(model, x, seed=0):
    return model.init(jax.random.PRNGKey(seed), x, train=False)


def test_forward_shape_default():
    model = build_multi_atgcn(_config(), _data_feature())
    x = _input()
    params = _init(model, x)
    out = model.apply(params, x, train=False)
    assert out.shape == (4, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "adjtype,adpadj",
    [
        ("multi", "none"), ("multi", "unidirection"), ("multi", "bidirection"),
        ("od", "none"), ("od", "unidirection"), ("od", "bidirection"),
        ("dist", "none"), ("cosine", "none"), ("identity", "none"),
    ],
)
def test_all_graph_configs(adjtype, adpadj):
    model = build_multi_atgcn(_config(adjtype=adjtype, adpadj=adpadj), _data_feature(with_static=True))
    x = _input()
    params = _init(model, x)
    out = model.apply(params, x, train=False)
    assert out.shape == (4, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_support_counts():
    # cheb_ks bookkeeping (ref MultiATGCN.py:65-70)
    for adjtype, adpadj, cheb_k, want in [
        ("multi", "bidirection", 2, 5),
        ("multi", "none", 2, 4),
        ("od", "bidirection", 2, 2),
        ("od", "none", 3, 3),
        ("multi", "unidirection", 3, 9),
    ]:
        model = build_multi_atgcn(
            _config(adjtype=adjtype, adpadj=adpadj, cheb_order=cheb_k), _data_feature()
        )
        assert model.num_supports == want


@pytest.mark.parametrize("flag", ["gcn_off", "fnn_off", "node_specific_off"])
def test_ablation_flags(flag):
    model = build_multi_atgcn(_config(**{flag: True}), _data_feature())
    x = _input()
    params = _init(model, x)
    out = model.apply(params, x, train=False)
    assert out.shape == (4, TOUT, N, 1)
    if flag == "node_specific_off":
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = [jax.tree_util.keystr(p) for p, _ in flat]
        assert not any("node_emb" in s for s in names)


def test_static_path_uses_param():
    model = build_multi_atgcn(_config(), _data_feature(with_static=True))
    x = _input()
    params = _init(model, x)
    assert "static_gru_kernel" in params["params"]
    out = model.apply(params, x, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_flow():
    from multistgraph_tpu.data.scalers import StandardScaler

    model = build_multi_atgcn(_config(adjtype="multi", adpadj="bidirection"), _data_feature())
    x = _input()
    params = _init(model, x)
    y = jnp.abs(_input(seed=1))[:, :TOUT]
    loss_fn = make_loss_fn(model, StandardScaler(mean=1.0, std=2.0))
    loss, grads = jax.value_and_grad(loss_fn)(params, {"X": x, "y": y}, train=False)
    assert np.isfinite(float(loss))
    gnorms = {
        jax.tree_util.keystr(p): float(jnp.abs(g).sum())
        for p, g in jax.tree_util.tree_leaves_with_path(grads)
    }
    for key_fragment in ["node_emb", "weight_tsg", "l0_gate_pool", "end_conv_kernel", "weights_gru"]:
        matching = [v for k, v in gnorms.items() if key_fragment in k]
        assert matching and all(v > 0 for v in matching), key_fragment


def test_dropout_only_in_train_mode():
    model = build_multi_atgcn(_config(), _data_feature())
    x = _input()
    params = _init(model, x)
    out1 = model.apply(params, x, train=False)
    out2 = model.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    outs = [
        model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(s)})
        for s in (0, 1)
    ]
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_horizon_gating_disables_period_trend():
    # With output_window < 6 only closeness heads contribute (ref :379,387).
    feature = _data_feature()
    model = build_multi_atgcn(_config(output_window=3), feature)
    x = _input()
    params = _init(model, x)
    out_a = model.apply(params, x, train=False)
    x_mod = x.at[:, LEN_C * TIN :, :, 0].set(123.0)  # poke period+trend region
    out_b = model.apply(params, x_mod, train=False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


# ---------------------------------------------------------------------------
# Golden parity vs the reference PyTorch implementation
# ---------------------------------------------------------------------------

from torch_bridge import (  # noqa: E402
    to_torch_state_dict as _to_torch_state_dict,
    torch_reference_available as _torch_reference_available,
)


@pytest.mark.skipif(not _torch_reference_available(), reason="reference/torch unavailable")
@pytest.mark.parametrize(
    "adjtype,adpadj,with_static",
    [
        ("cosine", "none", False),
        ("multi", "none", False),
        ("multi", "bidirection", False),
        ("od", "unidirection", False),
        ("multi", "bidirection", True),
    ],
)
def test_forward_parity_with_reference(adjtype, adpadj, with_static):
    import torch

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from libcity.model.traffic_flow_prediction.MultiATGCN import MultiATGCN as TorchModel
    finally:
        sys.path.pop(0)

    if with_static:
        # torch.pca_lowrank is randomized, and SVD sign conventions differ
        # between backends; pin the oracle to the same numpy centered SVD our
        # initializers.pca_project uses so both sides project identically.
        def exact_pca(a, q, center=True, niter=2):
            a_np = a.detach().cpu().numpy().astype(np.float64)
            centered = a_np - a_np.mean(axis=0, keepdims=True)
            _, _, vt = np.linalg.svd(centered, full_matrices=False)
            v = torch.tensor(vt[:q].T.copy(), dtype=a.dtype)
            return None, None, v

        torch.pca_lowrank = exact_pca

    feature = _data_feature(with_static=with_static, seed=3)
    cfg = _config(adjtype=adjtype, adpadj=adpadj)
    model = build_multi_atgcn(cfg, feature)
    x = _input(seed=5)
    params = _init(model, x)
    ours = np.asarray(model.apply(params, x, train=False))

    torch_cfg = dict(cfg)
    torch_cfg["device"] = torch.device("cpu")
    torch_feature = dict(feature)
    torch_feature["coordinate"] = feature["coordinate"].copy()
    torch_model = TorchModel(torch_cfg, torch_feature)
    torch_model.load_state_dict(_to_torch_state_dict(params, model, torch_model))
    torch_model.eval()
    with torch.no_grad():
        theirs = torch_model({"X": torch.tensor(np.asarray(x))}).numpy()

    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not _torch_reference_available(), reason="reference/torch unavailable")
def test_per_layer_activation_parity():
    """BASELINE target: per-layer activation allclose vs the reference."""
    import torch

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from libcity.model.traffic_flow_prediction.MultiATGCN import MultiATGCN as TorchModel
    finally:
        sys.path.pop(0)

    feature = _data_feature(seed=11)
    cfg = _config(adjtype="multi", adpadj="bidirection")
    model = build_multi_atgcn(cfg, feature)
    x = _input(seed=13)
    params = _init(model, x)
    _, state = model.apply(params, x, train=False, mutable=["intermediates"])
    inter = state["intermediates"]

    torch_cfg = dict(cfg)
    torch_cfg["device"] = torch.device("cpu")
    torch_model = TorchModel(torch_cfg, dict(feature))
    torch_model.load_state_dict(_to_torch_state_dict(params, model, torch_model))
    torch_model.eval()

    captured = {}

    def hook(module, inputs, output):
        captured["encoder_input"] = inputs[0].detach().numpy()
        captured["encoder_output"] = output[0].detach().numpy()

    torch_model.encoder.register_forward_hook(hook)
    with torch.no_grad():
        torch_model({"X": torch.tensor(np.asarray(x))})

    np.testing.assert_allclose(
        np.asarray(inter["encoder_input"][0]), captured["encoder_input"], atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(inter["encoder_output"][0]), captured["encoder_output"], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(inter["encoder_layer_1"][0]), captured["encoder_output"], atol=2e-4, rtol=1e-3
    )
    assert "encoder_layer_0" in inter and "supports" in inter and "fused_temporal" in inter


def test_inconsistent_load_dynamic_raises_actionable_error():
    """load_external=true with load_dynamic omitted: the dataset fuses .ext
    columns (its default is True) while the model defaults to False — the
    reference crashes in a shape error deep inside the AGCN
    (traffic_state_datatset.py:35 vs MultiATGCN.py:312); we fail at build
    time with an actionable message instead."""
    feature = _data_feature()
    feature["ext_dim"] = 6  # 1 time_in_day + 5 fused .ext columns
    with pytest.raises(ValueError, match="load_dynamic"):
        build_multi_atgcn(_config(), feature)
    # explicit load_dynamic=True accepts the fused columns
    model = build_multi_atgcn(_config(load_dynamic=True), feature)
    assert model.ext_dim == 6 and model.feature_final == 7
