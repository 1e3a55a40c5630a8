"""SafeGraph-schema ETL (data/prepare.py) -> atomic files -> dataset loads.

The reference's raw archives are missing blobs, so the ETL is exercised on a
small synthesized weekly-patterns extract with the exact public schema; the
output must load through the ordinary MTH dataset machinery.
"""

import numpy as np
import pandas as pd
import pytest

from multistgraph_tpu.data.prepare import (
    POI_CATEGORIES,
    assemble_atomic_files,
    build_od_rel,
    expand_hourly_visits,
    group_standardize,
    reclassify_naics,
    weekly_od_flows,
)


def test_naics_reclassification_rules():
    # the reference's category rules (1.1:70-87)
    assert reclassify_naics("445110") == "Retail"
    assert reclassify_naics("722511") == "Restaurant"   # 7225
    assert reclassify_naics("721110") == "Restaurant"   # 7211
    assert reclassify_naics("611110") == "Education"
    assert reclassify_naics("624410") == "Education"    # 6244 refines 62
    assert reclassify_naics("531110") == "Residential"  # 5311
    assert reclassify_naics("713940") == "Recreation"
    assert reclassify_naics("541330") == "Service"
    assert reclassify_naics("813110") == "Service"      # 8131
    assert reclassify_naics("236220") == "Others"       # 23
    assert reclassify_naics(None) == "Others"


@pytest.fixture()
def weekly_extract():
    """Two weeks x three POIs in two units, SafeGraph weekly-patterns schema."""
    rng = np.random.default_rng(3)
    pois = [
        ("sg/p1", "445110", "u1"),   # Retail in unit u1
        ("sg/p2", "722511", "u1"),   # Restaurant in u1
        ("sg/p3", "611110", "u2"),   # Education in u2
    ]
    rows = []
    for week_start in ("2019-01-07", "2019-01-14"):
        start = pd.Timestamp(week_start)
        for pid, naics, _unit in pois:
            rows.append({
                "safegraph_place_id": pid,
                "naics_code": naics,
                "date_range_start": start.strftime("%Y-%m-%dT00:00:00-05:00"),
                "date_range_end": (start + pd.Timedelta(days=7)).strftime(
                    "%Y-%m-%dT00:00:00-05:00"),
                "visits_by_each_hour": str([int(v) for v in rng.integers(0, 20, 168)]),
                "visitor_home_cbgs": str({"240054011001": 4, "240054011002": 7}),
            })
    weekly = pd.DataFrame(rows)
    poi_units = pd.DataFrame(
        {"safegraph_place_id": [p[0] for p in pois], "unit": [p[2] for p in pois]}
    )
    cbg_to_unit = {"240054011001": "u1", "240054011002": "u2"}
    return weekly, poi_units, cbg_to_unit


def test_hourly_expansion(weekly_extract):
    weekly, poi_units, _ = weekly_extract
    hourly = expand_hourly_visits(weekly, poi_units)
    # 2 weeks x 168 hours, u1 has Retail+Restaurant, u2 Education
    assert set(hourly["unit"]) == {"u1", "u2"}
    assert hourly[hourly["unit"] == "u2"]["category"].unique().tolist() == ["Education"]
    assert len(hourly["Time"].unique()) == 2 * 168
    # conservation: total visits equal the raw sum
    import ast
    raw_total = sum(sum(ast.literal_eval(v)) for v in weekly["visits_by_each_hour"])
    assert hourly["Visits"].sum() == raw_total


def test_od_flows_and_rel(weekly_extract):
    weekly, poi_units, cbg_to_unit = weekly_extract
    od = weekly_od_flows(weekly, cbg_to_unit, poi_units)
    # per destination unit: 2 origins x flows x (2 weeks x POIs in unit)
    u1 = od[od["destination"] == "u1"]
    assert set(u1["origin"]) == {"u1", "u2"}
    # u1 hosts 2 POIs x 2 weeks: flow 4 (cbg1) and 7 (cbg2) each
    assert u1.set_index("origin")["OD_flow"]["u1"] == 4 * 2 * 2
    rel = build_od_rel(od, ["u1", "u2"])
    assert len(rel) == 4  # cartesian
    # link_weight = volume / destination inflow: weights into u1 sum to 1
    into_u1 = rel[rel["destination_id"] == "u1"]["link_weight"]
    np.testing.assert_allclose(into_u1.sum(), 1.0)


def test_group_standardize_semantics():
    times = pd.date_range("2019-01-01", periods=100, freq="h")
    wide = pd.DataFrame({
        "unit": ["a"] * 100, "Time": times,
        "Retail": np.arange(100, dtype=float),
        "All": 2.0 * np.arange(100, dtype=float),
    })
    norm, mstd = group_standardize(wide, "unit", ["Retail", "All"], times[49])
    # stats come from the TRAIN period only (first 50 rows)
    train_all = 2.0 * np.arange(50)
    assert abs(mstd["All_m"].iloc[0] - train_all.mean()) < 1e-9
    assert abs(mstd["All_std"].iloc[0] - train_all.std(ddof=1)) < 1e-9
    # every column is normalized by All_std (the reference's rule, 1.3:117-119)
    expect = (np.arange(100) - np.arange(50).mean()) / train_all.std(ddof=1)
    np.testing.assert_allclose(norm["Retail"].to_numpy(), expect, rtol=1e-9)


def test_full_etl_loads_through_dataset(tmp_path, weekly_extract):
    weekly, poi_units, cbg_to_unit = weekly_extract
    hourly = expand_hourly_visits(weekly, poi_units)
    od = weekly_od_flows(weekly, cbg_to_unit, poi_units)
    coords = pd.DataFrame({"unit": ["u1", "u2"], "lng": [-76.6, -76.7], "lat": [39.3, 39.2]})
    static = pd.DataFrame({"unit": ["u1", "u2"], "pop": [1000, 2000], "income": [5.0, 7.0]})
    path = assemble_atomic_files(
        str(tmp_path / "raw"), "SG_ETL", hourly, od, coords,
        split_time="2019-01-14", holidays=["2019-01-21"], static=static,
    )
    # atomic files exist and are schema-valid for the standard loaders
    for suffix in (".dyna", ".geo", ".rel", ".ext", ".gbst", ".static"):
        assert (tmp_path / "raw" / "SG_ETL" / ("SG_ETL" + suffix)).exists(), suffix

    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset

    args = {
        "data_dir": str(tmp_path / "raw"),
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "etl", "dataset_class": "MTHDataset",
        "len_closeness": 1, "len_period": 1, "len_trend": 0,
        "interval_period": 2, "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.6, "eval_rate": 0.2,
        "seed": 0,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", "SG_ETL", other_args=args)
    dataset = get_dataset(config)
    train, val, test = dataset.get_data()
    feature = dataset.get_data_feature()
    assert feature["num_nodes"] == 2
    assert train.x.shape[-2] == 2
    assert np.isfinite(np.asarray(train.x)).all()
    assert feature["ct_visit_mstd"] is not None
