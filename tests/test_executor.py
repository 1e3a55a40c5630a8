"""Executor, optimizers/schedulers, evaluator, and the end-to-end pipeline."""

import glob
import os

import numpy as np
import pytest

from multistgraph_tpu.executor.optimizers import (
    LRScheduler,
    build_lr_scheduler,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)


class _Cfg(dict):
    def get(self, k, d=None):
        return dict.get(self, k, d)


def test_multistep_scheduler_matches_torch_semantics():
    s = LRScheduler("multisteplr", base_lr=1.0, milestones=[5, 10, 20, 30], decay_ratio=0.75)
    assert s.lr_for_epoch(0) == 1.0
    assert s.lr_for_epoch(4) == 1.0
    assert s.lr_for_epoch(5) == 0.75
    assert s.lr_for_epoch(10) == 0.75**2
    assert s.lr_for_epoch(29) == 0.75**3
    assert s.lr_for_epoch(30) == 0.75**4


def test_step_exp_cosine_schedulers():
    assert LRScheduler("steplr", 1.0, step_size=10, decay_ratio=0.5).lr_for_epoch(25) == 0.25
    assert LRScheduler("exponentiallr", 1.0, decay_ratio=0.9).lr_for_epoch(2) == pytest.approx(0.81)
    cos = LRScheduler("cosineannealinglr", 1.0, t_max=30, eta_min=0.1)
    assert cos.lr_for_epoch(0) == pytest.approx(1.0)
    assert cos.lr_for_epoch(30) == pytest.approx(0.1)


def test_plateau_scheduler():
    s = LRScheduler("reducelronplateau", 1.0, decay_ratio=0.1, patience=1, threshold=1e-4)
    s.step_plateau(1.0)
    assert s.lr_for_epoch(1) == 1.0
    s.step_plateau(1.0)  # no improvement -> bad_epochs 1
    s.step_plateau(1.0)  # bad_epochs > patience -> decay
    assert s.lr_for_epoch(3) == pytest.approx(0.1)


def test_build_scheduler_disabled():
    assert build_lr_scheduler(_Cfg(lr_decay=False)) is None
    assert build_lr_scheduler(_Cfg(lr_decay=True, lr_scheduler="bogus")) is None


def test_optimizer_lr_injection_and_step():
    import jax.numpy as jnp

    cfg = _Cfg(learner="adam", learning_rate=0.1, clip_grad_norm=True, max_grad_norm=5)
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    assert get_learning_rate(state) == pytest.approx(0.1)
    set_learning_rate(state, 0.05)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    # adam first step: update ~= -lr * sign(grad)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-2)


@pytest.mark.parametrize("learner", ["adam", "sgd", "adagrad", "rmsprop", "unknown"])
def test_all_optimizers_step(learner):
    import jax.numpy as jnp

    tx = build_optimizer(_Cfg(learner=learner, learning_rate=0.01, lr_momentum=0.9, weight_decay=1e-4))
    params = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((2, 2))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_evaluator_modes_and_artifacts(tmp_path, rng):
    from multistgraph_tpu.evaluator import TrafficStateEvaluator

    cfg = _Cfg(
        metrics=["MAE", "masked_MAE", "masked_RMSE", "masked_MAPE", "R2", "EVAR"],
        evaluator_mode="single", save_mode=["csv", "json"], model="M", dataset="D",
    )
    ev = TrafficStateEvaluator(cfg)
    y_true = np.abs(rng.normal(size=(10, 3, 4, 1))) + 1
    y_pred = y_true + rng.normal(scale=0.1, size=y_true.shape)
    ev.collect({"y_true": y_true, "y_pred": y_pred})
    result = ev.evaluate()
    assert "MAE@1" in result and "masked_RMSE@3" in result
    got = result["MAE@2"]
    want = np.abs(y_pred[:, 1] - y_true[:, 1]).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)
    df = ev.save_result(str(tmp_path))
    assert len(df) == 3
    assert glob.glob(str(tmp_path / "*.csv")) and glob.glob(str(tmp_path / "*.json"))

    ev2 = TrafficStateEvaluator(
        _Cfg(metrics=["MAE"], evaluator_mode="average", save_mode=[], model="M", dataset="D")
    )
    ev2.collect({"y_true": y_true, "y_pred": y_pred})
    avg = ev2.evaluate()
    np.testing.assert_allclose(
        avg["MAE@3"], np.abs(y_pred - y_true).mean(), rtol=1e-4
    )

    with pytest.raises(ValueError):
        TrafficStateEvaluator(_Cfg(metrics=["BOGUS"]))


def test_evaluate_model_standalone(tmp_path, rng):
    """Standalone helper mirrors libcity/evaluator/utils.py:81-157."""
    from multistgraph_tpu.evaluator import evaluate_model

    y_true = np.abs(rng.normal(size=(8, 4, 5, 1))) + 1
    y_pred = y_true + rng.normal(scale=0.1, size=y_true.shape)
    out = str(tmp_path / "m.csv")
    df = evaluate_model(y_pred, y_true, ["MAE", "masked_RMSE"], mode="single", path=out)
    assert list(df.columns) == ["MAE", "masked_RMSE"] and len(df) == 4
    np.testing.assert_allclose(
        df["MAE"][1], np.abs(y_pred[:, 1] - y_true[:, 1]).mean(), rtol=1e-4
    )
    assert os.path.exists(out)

    davg = evaluate_model(y_pred, y_true, ["MAE"], mode="average", path=None)
    np.testing.assert_allclose(
        davg["MAE"][3], np.abs(y_pred - y_true).mean(), rtol=1e-4
    )
    with pytest.raises(ValueError):
        evaluate_model(y_pred, y_true[:, :2], ["MAE"], path=None)
    with pytest.raises(ValueError):
        evaluate_model(y_pred, y_true, ["MAE"], mode="bogus", path=None)
    with pytest.raises(ValueError):
        evaluate_model(y_pred, y_true, ["BOGUS"], path=None)


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    """One small end-to-end run shared by several assertions."""
    from multistgraph_tpu.data.synthetic import make_synthetic_dataset
    from multistgraph_tpu.pipeline import run_model

    root = tmp_path_factory.mktemp("e2e")
    make_synthetic_dataset(str(root / "raw"), "SYN_E2E", num_nodes=6, len_time=24 * 30, seed=1)
    out_dir = str(root / "outputs")
    args = {
        "data_dir": str(root / "raw"),
        "output_dir": out_dir,
        "cache_dir": str(root / "cache"),
        "exp_id": "testexp",
        "max_epoch": 2,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 6,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4,
        "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 8, "embed_dim_node": 3, "embed_dim_adj": 3,
        "use_early_stop": False, "log_every": 1, "seed": 0,
    }
    result = run_model(
        task="traffic_state_pred", model_name="MultiATGCN", dataset_name="SYN_E2E",
        other_args=args,
    )
    return result, out_dir


def test_pipeline_end_to_end(pipeline_run):
    result, out_dir = pipeline_run
    # per-horizon table with 6 rows and the configured metric columns
    assert len(result) == 6
    assert "masked_MAE" in result.columns
    assert np.isfinite(result["masked_MAE"]).all()


def test_pipeline_artifacts(pipeline_run):
    _, out_dir = pipeline_run
    eval_dir = os.path.join(out_dir, "testexp", "evaluate_cache")
    assert glob.glob(os.path.join(eval_dir, "*_predictions.npz"))
    assert glob.glob(os.path.join(eval_dir, "*_trans.csv"))
    assert glob.glob(os.path.join(eval_dir, "*_predictions_trans.pkl"))
    model_dir = os.path.join(out_dir, "testexp", "model_cache")
    assert glob.glob(os.path.join(model_dir, "*_epoch*.msgpack"))
    assert glob.glob(os.path.join(model_dir, "MultiATGCN_SYN_E2E.m"))
    metrics_csv = os.path.join(out_dir, "testexp", "train_metrics.csv")
    assert os.path.exists(metrics_csv)
    with open(metrics_csv) as f:
        lines = [ln for ln in f.read().splitlines() if ln and not ln.startswith("epoch")]
    assert len(lines) == 2  # two epochs logged


def test_group_retransform_metrics_shape(pipeline_run):
    import pandas as pd

    _, out_dir = pipeline_run
    eval_dir = os.path.join(out_dir, "testexp", "evaluate_cache")
    trans = pd.read_csv(glob.glob(os.path.join(eval_dir, "*_trans.csv"))[0])
    assert list(trans.columns[1:]) == [
        "Model_name", "index", "Model_time", "MAE", "MSE", "RMSE", "R2", "EVAR", "MAPE"
    ]
    assert len(trans) == 6
    assert np.isfinite(trans["MAE"]).all()


@pytest.mark.parametrize("train_loss", ["mae", "masked_mae", "huber", "mse"])
def test_config_selected_train_loss(synthetic_dataset, tmp_path, train_loss):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name="MultiATGCN", dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "loss_" + train_loss,
            "train_loss": train_loss,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "len_closeness": 1, "len_period": 1, "len_trend": 1,
            "interval_period": 2, "interval_trend": 4,
            "input_window": 24, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
            "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()


def test_average_evaluator_mode_pipeline(synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name="MultiATGCN", dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out_avg"),
            "exp_id": "avgmode",
            "evaluator_mode": "average",
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "len_closeness": 1, "len_period": 1, "len_trend": 1,
            "interval_period": 2, "interval_trend": 4,
            "input_window": 24, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
            "use_early_stop": False, "seed": 0,
        },
    )
    assert len(result) == 3
    assert np.isfinite(result["masked_MAE"]).all()


def test_orbax_checkpoint_roundtrip(synthetic_dataset, tmp_path):
    import jax

    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor import get_executor
    from multistgraph_tpu.models import get_model

    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "orbax",
        "checkpoint_backend": "orbax",
        "max_epoch": 1,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
        "use_early_stop": False, "saved_model": False, "load_best_epoch": False,
        "seed": 0,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args)
    dataset = get_dataset(config)
    train, val, _ = dataset.get_data()
    feature = dataset.get_data_feature()
    ex = get_executor(config, get_model(config, feature), feature)
    ex.train(train, val)
    path = str(tmp_path / "model.m")
    ex.save_model(path)
    trained = jax.tree_util.tree_map(np.asarray, ex.params)

    ex2 = get_executor(config, get_model(config, feature), feature)
    ex2.load_model(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(trained), jax.tree_util.tree_leaves(ex2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_cached_model_reuse_train_false(synthetic_dataset, tmp_path):
    """run_model(train=False) must load the cached .m model and reproduce the
    training run's evaluation exactly (ref pipeline.py:55-60)."""
    from multistgraph_tpu.pipeline import run_model

    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out_reuse"),
        "exp_id": "reuse",
        "max_epoch": 1, "saved_model": True, "load_best_epoch": False,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
        "use_early_stop": False, "seed": 0,
    }
    first = run_model(task="traffic_state_pred", model_name="MultiATGCN",
                      dataset_name="SYN_SMALL", other_args=args)
    cache_file = tmp_path / "out_reuse" / "reuse" / "model_cache" / "MultiATGCN_SYN_SMALL.m"
    assert cache_file.exists()
    stamp = cache_file.stat().st_mtime
    second = run_model(task="traffic_state_pred", model_name="MultiATGCN",
                       dataset_name="SYN_SMALL", train=False, other_args=args)
    assert cache_file.stat().st_mtime == stamp  # no retrain, no resave
    np.testing.assert_allclose(
        first["masked_MAE"].to_numpy(), second["masked_MAE"].to_numpy(), rtol=1e-6
    )
