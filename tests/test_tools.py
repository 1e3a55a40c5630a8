"""Offline tooling: GeoJSON export, results aggregation, sweep entry."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd

from multistgraph_tpu.utils.visualize import geo_to_geojson

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_geo_to_geojson(synthetic_dataset, tmp_path):
    path = os.path.join(synthetic_dataset, "SYN_SMALL")
    out = str(tmp_path / "nodes.geojson")
    collection = geo_to_geojson(path, "SYN_SMALL", out_path=out, include_dyna_stats=True,
                                data_col=["Visits"])
    assert collection["type"] == "FeatureCollection"
    assert len(collection["features"]) == 8
    f0 = collection["features"][0]
    assert f0["geometry"]["type"] == "Point"
    assert {"geo_id", "mean", "max", "std"} <= set(f0["properties"])
    with open(out) as fh:
        assert json.load(fh)["features"]


def _fake_run(root, run_name, model, offset):
    d = os.path.join(root, run_name, "evaluate_cache")
    os.makedirs(d, exist_ok=True)
    rows = []
    for step in range(6):
        rows.append([model, step, "2026-01-01", 1.0 + offset + 0.1 * step,
                     2.0 + offset, 1.4 + offset, 0.9, 0.9, 0.2 + offset / 10])
    df = pd.DataFrame(rows, columns=["Model_name", "index", "Model_time",
                                     "MAE", "MSE", "RMSE", "R2", "EVAR", "MAPE"])
    df.to_csv(os.path.join(d, "x_{}_{}_trans.csv".format(model, run_name)))


def test_aggregate_results(tmp_path):
    root = str(tmp_path / "outputs")
    _fake_run(root, "runA_seed0", "MultiATGCN", 0.0)
    _fake_run(root, "runA_seed1", "MultiATGCN", 0.2)
    _fake_run(root, "runB_seed0", "Baseline", 1.0)
    out_csv = str(tmp_path / "summary.csv")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "aggregate_results.py"), root,
         "--horizons", "3", "6", "--reference", "MultiATGCN", "--out", out_csv],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    summary = pd.read_csv(out_csv)
    assert set(summary["Model_name"]) == {"MultiATGCN", "Baseline"}
    assert set(summary["horizon"]) == {3, 6}
    multi = summary[(summary.Model_name == "MultiATGCN") & (summary.horizon == 3)]
    assert abs(float(multi["MAE_mean"].iloc[0]) - 1.2) < 1e-6  # mean over 2 seeds of (1.1, 1.3)
    assert float(multi["MAE_std"].iloc[0]) > 0
    base = summary[(summary.Model_name == "Baseline") & (summary.horizon == 3)]
    assert float(base["MAE_vs_ref_pct"].iloc[0]) > 0  # worse than reference


def test_sweep_entry_help():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_model_parameter.py"), "--help"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0
    assert "--parameter" in proc.stdout and "--seeds" in proc.stdout


def test_timefeatures():
    from multistgraph_tpu.utils import timefeatures as tf

    ts = tf.parse_time(["2019-01-01T05:00:00Z", "2019-01-06T23:30:00Z"])
    assert tf.day_of_week(ts).tolist() == [1, 6]  # Tue, Sun
    assert tf.hour_of_day(ts).tolist() == [5, 23]
    frac = tf.time_in_day_fraction(ts)
    assert abs(frac[0] - 5 / 24) < 1e-9
    codes = tf.encode_time_codes(ts)
    assert codes.shape == (2, 31)
    assert codes[0, 1] == 1 and codes[0, 7 + 5] == 1


def test_quickstart_notebook_valid():
    import json

    nb = json.load(open(os.path.join(REPO, "examples", "quickstart.ipynb")))
    assert nb["nbformat"] == 4
    srcs = ["".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"]
    assert any("run_model" in s for s in srcs)
    for s in srcs:
        compile(s, "<nb>", "exec")  # cells are valid python
