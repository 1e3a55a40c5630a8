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


def test_trajectory_time_helpers():
    # Ref libcity/utils/dataset.py:18-50,91-154 — vectorized equivalents.
    import numpy as np

    from multistgraph_tpu.utils import timefeatures as tf

    ts = tf.parse_time(
        ["2019-01-01T05:30:00Z", "2019-01-05T18:00:00Z", "2019-01-06T23:59:00Z"]
    )  # Tue, Sat, Sun
    arr = tf.timestamp2array(ts, t=48)  # 30-min slots -> (3, 57)
    assert arr.shape == (3, 48 + 9)
    # Row 0: Tuesday -> dow one-hot at 1, weekday bit set, slot 11 (05:30),
    # night (05:30 < 06:00).
    assert arr[0, 1] == 1 and arr[0, 7] == 1
    assert arr[0, 8 + 11] == 1 and arr[0, 48 + 8] == 0
    # Row 1: Saturday -> weekend bit 0; 18:00 is night per the ref rule.
    assert arr[1, 5] == 1 and arr[1, 7] == 0 and arr[1, 48 + 8] == 0
    # Each row has exactly one dow bit and one slot bit.
    assert (arr[:, :7].sum(axis=1) == 1).all() and (arr[:, 8:56].sum(axis=1) == 1).all()

    vec = tf.timestamp2vec_origin(ts)
    assert vec.shape == (3, 8)
    assert vec[2, 6] == 1 and vec[2, 7] == 0  # Sunday, weekend

    base0 = tf.cal_basetime(ts, base_zero=True)
    assert str(base0[0]).startswith("2019-01-01T00:00:00")
    base12 = tf.cal_basetime(ts, base_zero=False)
    assert str(base12[0]).startswith("2019-01-01T00:00:00")  # 05:30 -> 00:00
    assert str(base12[1]).startswith("2019-01-05T12:00:00")  # 18:00 -> 12:00
    off = tf.cal_timeoff(ts, base12)
    assert np.allclose(off, [5.5, 6.0, 11.983333333333333])


def test_time_slot_similarity():
    # Ref dataset.py:53-75 semantics: Jaccard over each slot's location set,
    # including self-similarity 1 for non-empty slots and 0 rows for empty.
    import numpy as np

    from multistgraph_tpu.utils.timefeatures import time_slot_similarity

    data = {
        "tim_size": 4,
        "data": {
            "u1": [[(10, 0), (11, 0), (10, 1)]],  # slot0={10,11}, slot1={10}
            "u2": [[(11, 1), (12, 2)]],  # slot1+={11} -> {10,11}, slot2={12}
        },
    }
    sim = time_slot_similarity(data)
    assert sim.shape == (4, 4)
    assert sim[0, 0] == 1.0 and sim[0, 1] == 1.0  # identical sets {10,11}
    assert sim[0, 2] == 0.0  # disjoint
    assert (sim[3] == 0).all()  # empty slot
    assert np.allclose(sim, sim.T)


def test_quickstart_notebook_valid():
    import json

    nb = json.load(open(os.path.join(REPO, "examples", "quickstart.ipynb")))
    assert nb["nbformat"] == 4
    srcs = ["".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"]
    assert any("run_model" in s for s in srcs)
    for s in srcs:
        compile(s, "<nb>", "exec")  # cells are valid python


def test_visualizer_full_dispatch(tmp_path):
    """VisHelper-parity coverage: state, grid and trajectory GeoJSON
    conversion (ref libcity/utils/visualize.py:7-223)."""
    import json as _json

    import pandas as pd

    from multistgraph_tpu.utils.visualize import (
        dataset_to_geojson,
        grid_to_geojson,
        trajectory_to_geojson,
    )

    # --- state dataset (Point nodes + dyna means) through the dispatcher
    root = tmp_path / "raw" / "VIZ_STATE"
    root.mkdir(parents=True)
    pd.DataFrame({
        "geo_id": [1, 2], "type": ["Point", "Point"],
        "coordinates": ["[-77.0, 38.9]", "[-77.1, 38.8]"], "poi": [3, 4],
    }).to_csv(root / "VIZ_STATE.geo", index=False)
    pd.DataFrame({
        "dyna_id": range(4), "type": ["state"] * 4,
        "time": ["2019-01-01T00:00:00Z"] * 2 + ["2019-01-01T01:00:00Z"] * 2,
        "entity_id": [1, 2, 1, 2], "Visits": [1.0, 2.0, 3.0, 4.0],
    }).to_csv(root / "VIZ_STATE.dyna", index=False)
    (root / "config.json").write_text(_json.dumps(
        {"dyna": {"including_types": ["state"]}}
    ))
    out_dir = tmp_path / "viz"
    cols = dataset_to_geojson(str(tmp_path / "raw"), "VIZ_STATE", str(out_dir))
    assert len(cols) == 1
    feats = cols[0]["features"]
    assert feats[0]["properties"]["Visits"] == 2.0  # mean of 1, 3
    assert feats[0]["properties"]["poi"] == 3.0
    assert (out_dir / "VIZ_STATE_dyna.json").exists()

    # --- grid dataset (Polygon cells + grid means)
    groot = tmp_path / "raw" / "VIZ_GRID"
    groot.mkdir(parents=True)
    pd.DataFrame({
        "geo_id": [0, 1], "type": ["Polygon", "Polygon"],
        "coordinates": ["[[[0,0],[0,1],[1,1],[1,0],[0,0]]]"] * 2,
        "row_id": [0, 0], "column_id": [0, 1],
    }).to_csv(groot / "VIZ_GRID.geo", index=False)
    pd.DataFrame({
        "dyna_id": range(4), "type": ["state"] * 4,
        "time": ["2019-01-01T00:00:00Z"] * 2 + ["2019-01-01T01:00:00Z"] * 2,
        "row_id": [0, 0, 0, 0], "column_id": [0, 1, 0, 1],
        "inflow": [1.0, 10.0, 3.0, 20.0],
    }).to_csv(groot / "VIZ_GRID.grid", index=False)
    col = grid_to_geojson(str(groot / "VIZ_GRID.geo"), str(groot / "VIZ_GRID.grid"))
    assert col["features"][1]["properties"]["inflow"] == 15.0
    assert col["features"][0]["geometry"]["type"] == "Polygon"

    # --- GPS trajectory (LineString per entity/traj)
    troot = tmp_path / "raw" / "VIZ_TRAJ"
    troot.mkdir(parents=True)
    pd.DataFrame({
        "dyna_id": range(4), "type": ["trajectory"] * 4,
        "time": ["2019-01-01T00:00:00Z"] * 4,
        "entity_id": [7, 7, 7, 7], "traj_id": [0, 0, 1, 1],
        "coordinates": ["[0.0, 0.0]", "[1.0, 1.0]", "[2.0, 2.0]", "[3.0, 3.0]"],
    }).to_csv(troot / "VIZ_TRAJ.dyna", index=False)
    col = trajectory_to_geojson(str(troot / "VIZ_TRAJ.dyna"))
    assert len(col["features"]) == 2
    assert col["features"][0]["geometry"] == {
        "type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]
    }


def test_plot_families_s_small_params_ablation(tmp_path):
    """The three remaining reference figure families (result_plot.py:194-269)."""
    import numpy as np
    import pandas as pd

    sys_path_hack = str(tmp_path)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plot_results", "tools/plot_results.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    n = 400
    trans = pd.DataFrame({
        "ahead_step": rng.integers(0, 3, n),
        "truth_t": rng.uniform(0, 50, n),
        "prediction_t": rng.uniform(0, 50, n),
    })
    pkl = tmp_path / "t.pkl"
    trans.to_pickle(pkl)
    df = mod.plot_s_small(str(pkl), out=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()
    assert set(df["s_small"]) == set([1e-4] + list(range(1, 11)))
    # stricter filters keep larger truths -> MAPE must not increase
    mape = df.groupby("s_small")["MAPE"].mean()
    assert mape.loc[10] <= mape.loc[1e-4]

    sweep = pd.DataFrame({
        "value": [1, 1, 2, 2, 4, 4], "seed": [0, 1] * 3,
        "MAE": [3.0, 3.2, 2.0, 2.1, 2.5, 2.6],
    })
    sweep_csv = tmp_path / "sweep.csv"
    sweep.to_csv(sweep_csv, index=False)
    agg = mod.plot_params(str(sweep_csv), out=str(tmp_path / "p.png"))
    assert (tmp_path / "p.png").exists()
    assert float(agg.loc[agg["value"] == 2, "mean"].iloc[0]) == 2.05

    abl = pd.DataFrame({
        "label": ["full", "no_gcn", "no_3tu"], "MAE": [2.0, 2.4, 2.2],
    })
    abl_csv = tmp_path / "abl.csv"
    abl.to_csv(abl_csv, index=False)
    change = mod.plot_ablation(str(abl_csv), reference="full", out=str(tmp_path / "a.png"))
    assert (tmp_path / "a.png").exists()
    assert abs(change["no_gcn"] - 20.0) < 1e-6


def test_plot_raw_data_families(synthetic_dataset, tmp_path):
    """The exploratory raw-data figures (ref data_prepare/1.4-data_prepare_plot.py:1-342):
    all six families render from a dataset's atomic files alone."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_raw_data.py"),
         synthetic_dataset, "SYN_SMALL", "--out_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for fam in ("spatial", "daily", "weekly", "graph", "static", "external"):
        f = tmp_path / "SYN_SMALL_{}.png".format(fam)
        assert f.exists() and f.stat().st_size > 5000, fam
