"""Checkpoint resume, ablation-flag pipelines, and plotting tools."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import get_dataset
from multistgraph_tpu.executor import get_executor
from multistgraph_tpu.models import get_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _args(synthetic_dataset, tmp_path, **overrides):
    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "resume",
        "max_epoch": 3,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 8, "embed_dim_node": 3, "embed_dim_adj": 3,
        "use_early_stop": False, "load_best_epoch": False, "seed": 0,
    }
    args.update(overrides)
    return args


def _setup(synthetic_dataset, tmp_path, **overrides):
    config = load_config(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
        other_args=_args(synthetic_dataset, tmp_path, **overrides),
    )
    dataset = get_dataset(config)
    train, val, test = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    return config, model, feature, train, val, test


def test_resume_from_epoch(synthetic_dataset, tmp_path):
    config, model, feature, train, val, _ = _setup(synthetic_dataset, tmp_path)
    ex = get_executor(config, model, feature)
    ex.train(train, val)
    ckpts = glob.glob(os.path.join(ex.cache_dir, "*_epoch*.msgpack"))
    assert ckpts
    last_epoch = max(int(p.split("epoch")[-1].split(".")[0]) for p in ckpts)

    # Resume: config['epoch'] = last_epoch, max_epoch extended
    config2, model2, feature2, train2, val2, _ = _setup(
        synthetic_dataset, tmp_path, epoch=last_epoch, max_epoch=5,
    )
    ex2 = get_executor(config2, model2, feature2)
    # parameters were restored from the checkpoint, not re-initialized
    restored = ex2.params["params"]["node_emb"]
    trained = ex.params["params"]["node_emb"]
    np.testing.assert_allclose(np.asarray(restored), np.asarray(trained), atol=1e-6)
    ex2.train(train2, val2)
    with open(ex2._metrics_log) as f:
        epochs_run = [ln.split(",")[0] for ln in f.read().splitlines() if ln and not ln.startswith("epoch")]
    assert epochs_run[-2:] == ["3", "4"]  # continued after the restored epoch


@pytest.mark.parametrize("flag", [{"gcn_off": True}, {"fnn_off": True}, {"use_3tu": False}])
def test_ablation_pipeline(synthetic_dataset, tmp_path, flag):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name="MultiATGCN", dataset_name="SYN_SMALL",
        other_args=_args(
            synthetic_dataset, tmp_path, exp_id="abl", max_epoch=1,
            saved_model=False, **flag,
        ),
    )
    assert np.isfinite(result["masked_MAE"]).all()


def test_plot_tools(tmp_path, rng):
    npz = tmp_path / "x_predictions.npz"
    pred = rng.normal(size=(40, 3, 5, 1))
    np.savez_compressed(npz, prediction=pred, truth=pred + rng.normal(scale=0.1, size=pred.shape))
    out = tmp_path / "ts.png"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_results.py"),
         "timeseries", str(npz), "--out", str(out), "--k", "2"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert out.exists() and out.stat().st_size > 0

    import pandas as pd

    summary = pd.DataFrame(
        {
            "Model_name": ["A", "A", "B", "B"],
            "horizon": [3, 6, 3, 6],
            "MAE_mean": [1.0, 1.2, 1.5, 1.9],
            "MAE_std": [0.1, 0.1, 0.2, 0.2],
        }
    )
    scsv = tmp_path / "summary.csv"
    summary.to_csv(scsv, index=False)
    out2 = tmp_path / "hz.png"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_results.py"),
         "horizons", str(scsv), "--out", str(out2)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert out2.exists()
