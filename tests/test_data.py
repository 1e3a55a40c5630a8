"""Data layer: atomic readers, windowing, splits, dataset orchestration."""

import numpy as np
import pytest

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import atomic, get_dataset, windows
from multistgraph_tpu.data.scalers import fit_scaler


def test_load_geo_and_rel(synthetic_dataset):
    import os

    path = os.path.join(synthetic_dataset, "SYN_SMALL")
    geo = atomic.load_geo(os.path.join(path, "SYN_SMALL.geo"))
    assert geo.num_nodes == 8
    adj = atomic.load_rel(
        os.path.join(path, "SYN_SMALL.rel"), geo,
        weight_col="link_weight", set_weight_link_or_dist="dist",
        init_weight_inf_or_zero="zero",
    )
    assert adj.shape == (8, 8)
    assert (np.diag(adj) > 0).all()  # synthetic data has self-flows
    assert np.isfinite(adj).all()


def test_load_dyna_shape_and_times(synthetic_dataset):
    import os

    path = os.path.join(synthetic_dataset, "SYN_SMALL")
    geo = atomic.load_geo(os.path.join(path, "SYN_SMALL.geo"))
    dyna = atomic.load_dyna(os.path.join(path, "SYN_SMALL.dyna"), geo, data_col=["Visits"])
    assert dyna.values.shape == (24 * 40, 8, 1)
    assert dyna.timestamps is not None and len(dyna.timestamps) == 24 * 40
    # hourly spacing
    deltas = np.diff(dyna.timestamps).astype("timedelta64[s]").astype(int)
    assert (deltas == 3600).all()


def test_mth_offsets_structure():
    x_off, y_off = windows.mth_offsets(
        input_window=24, output_window=24,
        len_closeness=2, len_period=1, len_trend=1,
        interval_period=7, interval_trend=28,
    )
    assert len(x_off) == 4 * 24
    # closeness blocks: farthest first: [-48..-25], then [-24..-1]
    np.testing.assert_array_equal(x_off[:24], np.arange(-48, -24))
    np.testing.assert_array_equal(x_off[24:48], np.arange(-24, 0))
    # period block: 7 days back
    np.testing.assert_array_equal(x_off[48:72], np.arange(-7 * 24, -7 * 24 + 24))
    # trend block: 28 days back
    np.testing.assert_array_equal(x_off[72:], np.arange(-28 * 24, -28 * 24 + 24))
    np.testing.assert_array_equal(y_off, np.arange(24))


def test_mth_starts_skip_incomplete_history():
    x_off, _ = windows.mth_offsets(24, 24, 2, 1, 1, 7, 28)
    starts = windows.mth_starts(24 * 40, 24, x_off)
    assert starts[0] == 28 * 24  # need 28 days of history
    assert starts[-1] == 24 * 40 - 24


def test_gather_windows_matches_loop(rng):
    series = rng.normal(size=(200, 3, 2))
    x_off, y_off = windows.mth_offsets(12, 6, 2, 0, 0, 7, 28)
    starts = windows.mth_starts(200, 12, x_off)
    x, y = windows.gather_windows(series, starts, x_off, y_off)
    for i, t in enumerate(starts[:5]):
        np.testing.assert_array_equal(x[i], series[t + x_off])
        np.testing.assert_array_equal(y[i], series[t : t + 6])


def test_chronological_split_round_sizes():
    x = np.arange(100)[:, None]
    tr, trY, va, vaY, te, teY = windows.chronological_split(x, x, 0.7, 0.15)
    assert len(tr) == 70 and len(va) == 15 and len(te) == 15
    np.testing.assert_array_equal(np.concatenate([tr, va, te]), x)


def test_pad_to_batch_multiple():
    x = np.arange(10)[:, None].astype(float)
    xp, yp = windows.pad_to_batch_multiple(x, x, 4)
    assert len(xp) == 12
    np.testing.assert_array_equal(xp[-3:], np.repeat(x[-1:], 3, axis=0))


def test_fit_scaler_semantics(rng):
    x = rng.normal(size=(100, 4)) * 3 + 1
    y = rng.normal(size=(100, 4)) * 3 + 1
    s = fit_scaler("standard", x, y)
    np.testing.assert_allclose(s.mean, x.mean())
    np.testing.assert_allclose(s.std, x.std())
    np.testing.assert_allclose(s.inverse_transform(s.transform(x)), x, rtol=1e-10)
    n = fit_scaler("normal", x, y)
    assert n.max == max(x.max(), y.max())
    with pytest.raises(ValueError):
        fit_scaler("bogus", x, y)


def _config(synthetic_dataset, tmp_path, **overrides):
    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "len_closeness": 2, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 5,
        "input_window": 24, "output_window": 6,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
    }
    args.update(overrides)
    return load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args)


def test_mth_dataset_end_to_end(synthetic_dataset, tmp_path):
    config = _config(synthetic_dataset, tmp_path)
    ds = get_dataset(config)
    train, val, test = ds.get_data()
    feature = ds.get_data_feature()
    assert feature["num_nodes"] == 8
    assert feature["feature_dim"] == 2  # Visits + time_in_day (load_dynamic False)
    assert feature["len_closeness"] == 48 and feature["len_period"] == 24 and feature["len_trend"] == 24
    batch = next(iter(train))
    assert batch["X"].shape == (4, 96, 8, 2)
    assert batch["y"].shape == (4, 6, 8, 2)
    # scaled target dims should be ~N(0,1); time_in_day untouched in [0,1)
    assert float(abs(batch["X"][..., 0].mean())) < 1.0
    assert 0.0 <= float(batch["X"][..., 1].min()) and float(batch["X"][..., 1].max()) < 1.0
    assert feature["ct_visit_mstd"] is not None
    assert test.num_batches > 0


def test_mth_dataset_cache_roundtrip(synthetic_dataset, tmp_path):
    config = _config(synthetic_dataset, tmp_path)
    ds1 = get_dataset(config)
    train1, _, _ = ds1.get_data()
    b1 = next(iter(ds1.get_data()[2]))
    ds2 = get_dataset(config)
    assert ds2.cache_file_name == ds1.cache_file_name
    import os

    assert os.path.exists(ds2.cache_file_name)
    b2 = next(iter(ds2.get_data()[2]))
    np.testing.assert_allclose(np.asarray(b1["X"]), np.asarray(b2["X"]), rtol=1e-6)


def test_dataset_load_dynamic_adds_ext_columns(synthetic_dataset, tmp_path):
    config = _config(synthetic_dataset, tmp_path, load_dynamic=True)
    ds = get_dataset(config)
    ds.get_data()
    # Visits + time_in_day + 5 ext cols
    assert ds.feature_dim == 7


def test_use_3tu_false_truncates(synthetic_dataset, tmp_path):
    config = _config(synthetic_dataset, tmp_path, use_3tu=False)
    ds = get_dataset(config)
    train, _, _ = ds.get_data()
    batch = next(iter(train))
    assert batch["X"].shape[1] == 24


def test_mth_rejects_output_longer_than_input(synthetic_dataset, tmp_path):
    import pytest as _pytest

    config = _config(synthetic_dataset, tmp_path, output_window=48)
    with _pytest.raises(ValueError, match="output_window"):
        get_dataset(config)


def test_pad_ragged_matches_batchpad_semantics():
    """Mirrors BatchPAD (libcity/data/batch.py:70-136): pad to batch max,
    cap at max_len, truncation keeps the sequence TAIL, origin lengths kept."""
    from multistgraph_tpu.data import pad_ragged

    seqs = [np.arange(3), np.arange(5), np.arange(2)]
    out, lens = pad_ragged(seqs, pad_value=-1.0)
    assert out.shape == (3, 5) and lens.tolist() == [3, 5, 2]
    np.testing.assert_array_equal(out[0], [0, 1, 2, -1, -1])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4])

    # max_len truncation drops the EARLIEST points (time series convention)
    out, lens = pad_ragged(seqs, pad_value=0.0, max_len=3)
    assert out.shape == (3, 3) and lens.tolist() == [3, 3, 2]
    np.testing.assert_array_equal(out[1], [2, 3, 4])

    # multi-feature trailing dims
    out, lens = pad_ragged([np.ones((2, 4)), np.ones((3, 4))])
    assert out.shape == (2, 3, 4) and lens.tolist() == [2, 3]

    with pytest.raises(ValueError):
        pad_ragged([])
    with pytest.raises(ValueError):
        pad_ragged([np.ones((2, 3)), np.ones((2, 4))])
