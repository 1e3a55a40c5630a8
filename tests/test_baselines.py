"""Baseline model family: shapes, gradients, and end-to-end pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.models.baselines import FNN, RNNModel, Seq2Seq

B, TIN, TOUT, N, F = 4, 12, 3, 5, 2


def _x(seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(B, TIN, N, F)).astype(np.float32))


@pytest.mark.parametrize("rnn_type", ["RNN", "GRU", "LSTM"])
def test_rnn_shapes_and_grads(rnn_type):
    model = RNNModel(output_window=TOUT, output_dim=1, hidden_dim=8, num_layers=2, rnn_type=rnn_type)
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    g = jax.grad(lambda p: jnp.mean(jnp.square(model.apply(p, x))))(params)
    total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_fnn_shapes():
    model = FNN(output_window=TOUT, output_dim=1, hidden_dim=8)
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)


def test_seq2seq_shapes():
    model = Seq2Seq(output_window=TOUT, output_dim=1, hidden_dim=8)
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("model_name", ["GRU", "LSTM", "FNN", "Seq2Seq"])
def test_baseline_pipeline(model_name, synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name=model_name, dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "base_" + model_name,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "input_window": 12, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "rnn_units": 8, "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()


def test_lstm_alias_sets_rnn_type(synthetic_dataset):
    from multistgraph_tpu.config import load_config

    cfg = load_config(
        "traffic_state_pred", "LSTM", "SYN_SMALL", other_args={"data_dir": synthetic_dataset}
    )
    assert cfg["model"] == "RNN"
    assert cfg["rnn_type"] == "LSTM"
    assert cfg["dataset_class"] == "TrafficStatePointDataset"