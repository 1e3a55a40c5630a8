"""The synthetic generator must produce horizon-dependent, graph-structured
series — otherwise quality tables can't discriminate models (round-1 lesson:
deterministic seasonality + iid noise made per-horizon MAE flat)."""

import numpy as np
import pandas as pd

from multistgraph_tpu.data.synthetic import make_synthetic_dataset


def _series(tmp_path, **kw):
    path = make_synthetic_dataset(
        str(tmp_path), "SYN_DYN", num_nodes=24, len_time=24 * 60, seed=11,
        groupstd_normalize=False, **kw
    )
    dyna = pd.read_csv(path + "/SYN_DYN.dyna")
    n = dyna["entity_id"].nunique()
    t = len(dyna) // n
    visits = dyna["Visits"].to_numpy().reshape(n, t)
    rel = pd.read_csv(path + "/SYN_DYN.rel")
    return visits, rel, dyna


def test_persistence_error_grows_with_horizon(tmp_path):
    visits, _rel, _ = _series(tmp_path)
    errs = {h: np.abs(visits[:, h:] - visits[:, :-h]).mean() for h in (1, 3, 12, 24)}
    # predictability decays with lead time within the day...
    assert errs[1] < 0.8 * errs[3] < 0.8 * errs[12]
    # ...and the 24h lag dips back down (daily seasonality) without beating
    # the 1h persistence — stochastic memory on top of the cycle
    assert errs[24] < errs[12]
    assert errs[1] < 0.8 * errs[24]


def test_seasonal_predictability_decays(tmp_path):
    """Weekly seasonality dominates (same hour LAST WEEK beats same hour
    yesterday — the drifting hour-of-week profile), and the weekly template
    itself decays over a month — i.e. stochastic medium-range memory, not a
    fixed template."""
    visits, _rel, _ = _series(tmp_path)
    day = np.abs(visits[:, 24:] - visits[:, :-24]).mean()
    week = np.abs(visits[:, 168:] - visits[:, :-168]).mean()
    month = np.abs(visits[:, 4 * 168:] - visits[:, : -4 * 168]).mean()
    assert week < day
    assert week < 0.95 * month


def test_neighbors_more_correlated_than_strangers(tmp_path):
    visits, rel, dyna = _series(tmp_path)
    ids = np.sort(dyna["entity_id"].unique())
    idx = {g: i for i, g in enumerate(ids)}
    resid = visits - visits.mean(axis=1, keepdims=True)
    resid /= np.maximum(resid.std(axis=1, keepdims=True), 1e-9)
    corr = resid @ resid.T / resid.shape[1]
    vol = np.zeros_like(corr)
    for _, row in rel.iterrows():
        vol[idx[row["origin_id"]], idx[row["destination_id"]]] = row["link_weight"]
    np.fill_diagonal(vol, 0)
    np.fill_diagonal(corr, np.nan)
    strong = vol > np.percentile(vol[vol > 0], 75)
    weak = vol == 0
    assert np.nanmean(corr[strong]) > np.nanmean(corr[weak]) + 0.02


def test_weekend_level_shift_present(tmp_path):
    visits, _rel, dyna = _series(tmp_path)
    t = visits.shape[1]
    times = pd.to_datetime(dyna["time"].iloc[:t].str.replace("Z", ""))
    weekend = (times.dt.dayofweek >= 5).to_numpy()
    assert visits[:, ~weekend].mean() > visits[:, weekend].mean() * 1.05


def test_week_lag_beats_month_lag(tmp_path):
    """The drifting hour-of-week profile makes same-hour-LAST-WEEK a
    strictly better predictor than same-hour-4-weeks-ago — the signal the
    7-day period head exists to exploit."""
    visits, _rel, _ = _series(tmp_path)
    week = np.abs(visits[:, 168:] - visits[:, :-168]).mean()
    month = np.abs(visits[:, 4 * 168:] - visits[:, : -4 * 168]).mean()
    assert week < 0.9 * month
