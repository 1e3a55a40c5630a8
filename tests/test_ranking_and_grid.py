"""Ranking metrics + grid/OD atomic loaders."""

import numpy as np
import pandas as pd

from multistgraph_tpu.data import atomic
from multistgraph_tpu.ops import ranking


def test_precision_recall_f1(rng):
    preds = rng.normal(size=(4, 5, 5))
    labels = np.zeros((4, 5, 5))
    # make the top-2 predicted cells positive for half the samples
    for i in range(2):
        flat = preds[i].ravel()
        top2 = np.argsort(-flat)[:2]
        labels[i].ravel()[top2] = 1.0
    p = ranking.precision_at_k(preds, labels, topk=2)
    assert p == 0.5  # 2 perfect samples, 2 with no positives
    r = ranking.recall_at_k(preds, labels, topk=2)
    assert r == 1.0  # only samples with positives count; both fully recalled
    f1 = ranking.f1_at_k(preds, labels, topk=2)
    assert abs(f1 - (2 * 0.5 * 1.0 / 1.5)) < 1e-9


def test_map_perfect_and_zero(rng):
    preds = rng.normal(size=(1, 10))
    labels = np.zeros((1, 10))
    top3 = np.argsort(-preds[0])[:3]
    labels[0, top3] = 1
    assert ranking.map_at_k(preds, labels, topk=3) == 1.0
    assert ranking.map_at_k(preds, np.zeros((1, 10)), topk=3) == 0.0


def test_pcc_monotone(rng):
    preds = rng.normal(size=(8, 20))
    labels = preds * 2.0 + 1.0  # perfectly correlated
    assert abs(ranking.pcc_at_k(preds, labels, topk=5) - 1.0) < 1e-6


def test_top_k_hits():
    loc_pred = np.array([[0.1, 0.9, 0.5], [0.8, 0.1, 0.3]])
    loc_true = np.array([1, 2])
    hits, rank, dcg = ranking.top_k_hits(loc_pred, loc_true, topk=2)
    assert hits == 2
    # true idx 1 is rank 1 (rr=1), true idx 2 is rank 2 (rr=0.5)
    assert abs(rank - 1.5) < 1e-9
    assert abs(dcg - (1.0 + 1.0 / np.log2(3))) < 1e-9


def _write_grid_files(tmp_path, len_row=2, len_column=3, len_time=4):
    n = len_row * len_column
    geo = pd.DataFrame(
        {
            "geo_id": np.arange(n), "type": "Polygon", "coordinates": "[]",
            "row_id": np.repeat(np.arange(len_row), len_column),
            "column_id": np.tile(np.arange(len_column), len_row),
        }
    )
    geo_path = tmp_path / "g.geo"
    geo.to_csv(geo_path, index=False)
    times = pd.date_range("2019-01-01", periods=len_time, freq="h").strftime("%Y-%m-%dT%H:%M:%SZ")
    grid = pd.DataFrame(
        {
            "dyna_id": np.arange(n * len_time),
            "type": "state",
            "time": np.tile(times, n),
            "row_id": np.repeat(geo["row_id"].values, len_time),
            "column_id": np.repeat(geo["column_id"].values, len_time),
            "flow": np.arange(n * len_time, dtype=float),
        }
    )
    grid_path = tmp_path / "g.grid"
    grid.to_csv(grid_path, index=False)
    return geo_path, grid_path, n, len_time


def test_load_grid_3d_and_4d(tmp_path):
    geo_path, grid_path, n, len_time = _write_grid_files(tmp_path)
    geo = atomic.load_grid_geo(str(geo_path))
    assert geo.len_row == 2 and geo.len_column == 3
    d3 = atomic.load_grid(str(grid_path), geo, data_col=["flow"])
    assert d3.values.shape == (len_time, n, 1)
    # grid 0's series is the first len_time values
    np.testing.assert_array_equal(d3.values[:, 0, 0], np.arange(len_time))
    d4 = atomic.load_grid(str(grid_path), geo, data_col=["flow"], as_4d=True)
    assert d4.values.shape == (len_time, 2, 3, 1)
    np.testing.assert_array_equal(d4.values[:, 0, 1, 0], np.arange(len_time, 2 * len_time))


def test_grid_adjacency_8_neighbors():
    adj = atomic.grid_adjacency(3, 3)
    # center cell (1,1) -> idx 4 touches all 8 others
    assert adj[4].sum() == 8
    # corner (0,0) -> idx 0 touches 3
    assert adj[0].sum() == 3
    np.testing.assert_array_equal(adj, adj.T)


def test_load_od_4d(tmp_path):
    n, len_time = 3, 2
    geo = pd.DataFrame({"geo_id": np.arange(n), "type": "Point", "coordinates": "[]"})
    geo.to_csv(tmp_path / "o.geo", index=False)
    times = pd.date_range("2019-01-01", periods=len_time, freq="h").strftime("%Y-%m-%dT%H:%M:%SZ")
    rows = []
    k = 0
    for o in range(n):
        for d in range(n):
            for t in range(len_time):
                rows.append([k, "state", times[t], o, d, float(o * 100 + d * 10 + t)])
                k += 1
    od = pd.DataFrame(rows, columns=["dyna_id", "type", "time", "origin_id", "destination_id", "flow"])
    od.to_csv(tmp_path / "o.od", index=False)
    g = atomic.load_geo(str(tmp_path / "o.geo"))
    data = atomic.load_od_4d(str(tmp_path / "o.od"), g, data_col=["flow"])
    assert data.values.shape == (len_time, n, n, 1)
    assert data.values[1, 2, 1, 0] == 2 * 100 + 1 * 10 + 1
