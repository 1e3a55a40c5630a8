"""Synthetic atomic-dataset generator.

The reference repo ships only dataset config.json files — the raw archives are
missing large blobs — so tests and benchmarks synthesize statistically-matched
data: per-node hourly series with daily/weekly seasonality anchored to
configurable per-node mean/std tables (the shape of the DC dataset: 237 nodes,
hourly, 2019-01-01..05-31, mean 30.169 / std 84.023, README.md:44-53), written
in the exact atomic-file schemas the loaders consume
(ref: raw_data/201901010601_DC_SG_CTractFIPS_Hourly_Single_GP/config.json).
"""

import json
import os
import numpy as np
import pandas as pd

from multistgraph_tpu.utils import ensure_dir


def make_synthetic_dataset(
    out_dir: str,
    name: str,
    num_nodes: int = 8,
    len_time: int = 24 * 40,
    start_time: str = "2019-01-01T00:00:00Z",
    node_mean: float = 30.0,
    node_std: float = 15.0,
    seed: int = 0,
    groupstd_normalize: bool = True,
    node_stats=None,
) -> str:
    """Write a full synthetic dataset under `out_dir/name/`; returns its path.

    Produces .geo/.rel/.dyna/.ext/.static/.gbst + config.json matching the
    reference DC schema (data_col=['Visits'], ext cols holiday/weekend/temp/
    rain/snow, link_weight = destination-normalized OD fractions). When
    `groupstd_normalize` is True the .dyna values are per-node z-scored by
    the .gbst All_std/All_m like the reference's offline prep
    (ref: data_prepare/1.3-data_libcity_format.py:99-130).

    `node_stats` (DataFrame or CSV path with All_m/All_std columns) anchors
    the per-node marginals to the reference's real per-node statistics
    (other_data/*_visit_mstd.pkl → data/stats/*.csv); bootstrapped when the
    row count differs from num_nodes.
    """
    rng = np.random.default_rng(seed)
    path = os.path.join(out_dir, name)
    ensure_dir(path)

    geo_ids = np.arange(11001000100, 11001000100 + num_nodes)
    lng = -77.0 + rng.uniform(-0.2, 0.2, num_nodes)
    lat = 38.9 + rng.uniform(-0.2, 0.2, num_nodes)
    geo = pd.DataFrame(
        {
            "geo_id": geo_ids,
            "type": "Point",
            "coordinates": ["[{:.6f}, {:.6f}]".format(x, y) for x, y in zip(lng, lat)],
        }
    )
    geo.to_csv(os.path.join(path, name + ".geo"), index=False)

    # OD flows: distance-decayed random volumes with strong self-flow diagonal.
    d2 = (lng[:, None] - lng[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    volume = rng.poisson(50 * np.exp(-d2 / 0.02)) + np.diag(rng.integers(100, 200, num_nodes))
    src, dst = np.nonzero(volume)
    # link_weight is the DESTINATION-NORMALIZED fraction Volume/Inflow, the
    # reference prep's semantics (data_prepare/1.3-data_libcity_format.py:
    # 161-164: CTS_OD['link_weight'] = Volume / destination Inflow) — NOT the
    # raw volume. Raw volumes (the round-1..4 behavior) made every entry
    # 1-264 while models that mix the adjacency with unit-weight self/
    # temporal links (TGCN's A+I, STSGCN's localized ST graph) expect
    # fractions <=1; at raw scale those unit links are crushed by
    # normalization, which mis-measured both models (RESULTS_DIAG_TGCN).
    inflow = np.maximum(volume.sum(axis=0, keepdims=True), 1)  # per-destination
    frac = volume / inflow
    rel = pd.DataFrame(
        {
            "rel_id": np.arange(len(src)),
            "type": "geo",
            "origin_id": geo_ids[src],
            "destination_id": geo_ids[dst],
            "link_weight": frac[src, dst].astype(float),
        }
    )
    rel.to_csv(os.path.join(path, name + ".rel"), index=False)

    # Hourly series with the statistical structure real crowd-flow data has,
    # so forecast difficulty actually GROWS with horizon and every model
    # component is exercised (a pure sinusoid + iid noise is equally
    # predictable at every horizon, which made per-horizon tables flat):
    #   * sharp two-harmonic daily profile with per-node phase (closeness
    #     heads + time-of-day feature),
    #   * weekday/weekend level shift + weekly harmonic (period heads, dow),
    #   * slow per-node trend + 28-day cycle (trend heads),
    #   * AR(1) dynamics (phi=0.96, ~24h memory) with NODE-CORRELATED
    #     innovations mixed through the row-normalized OD matrix — recent
    #     history and neighbors are informative, and that information decays
    #     with lead time (graph conv + horizon-dependent error),
    #   * slow AR amplitude modulation of the daily peak (multi-day memory),
    #   * iid observation noise (irreducible floor).
    times = np.datetime64(start_time.replace("T", " ").replace("Z", "")) + np.arange(
        len_time
    ) * np.timedelta64(3600, "s")
    hours = np.arange(len_time)
    if node_stats is not None:
        # anchor per-node marginals to the REAL distributions the reference
        # ships (other_data/*_visit_mstd.pkl, mirrored under data/stats/):
        # real crowd-flow node means are heavy-tailed (DC: mean 29.5, max
        # 458) — a normal draw misses the hub tracts entirely
        stats = node_stats if hasattr(node_stats, "columns") else pd.read_csv(node_stats)
        m = stats["All_m"].to_numpy(np.float64)
        s = stats["All_std"].to_numpy(np.float64)
        if len(m) != num_nodes:  # bootstrap to the requested size
            pick = rng.integers(0, len(m), num_nodes)
            m, s = m[pick], s[pick]
        means = np.maximum(m, 1.0)
        stds = np.maximum(s, 0.5)
    else:
        means = np.maximum(rng.normal(node_mean, node_mean / 2, num_nodes), 1.0)
        stds = np.maximum(rng.normal(node_std, node_std / 3, num_nodes), 0.5)
    phase = rng.uniform(0, 2 * np.pi, num_nodes)
    daily = (
        np.sin(2 * np.pi * hours[None, :] / 24 + phase[:, None])
        + 0.5 * np.sin(4 * np.pi * hours[None, :] / 24 + 2 * phase[:, None])
    )
    day_idx = times.astype("datetime64[D]").astype(np.int64)
    weekday_series = (day_idx + 3) % 7  # 2019-01-01 was a Tuesday
    weekend = (weekday_series >= 5).astype(float)
    weekly = -0.5 * weekend[None, :] + 0.25 * np.sin(
        2 * np.pi * hours[None, :] / (24 * 7) + phase[:, None]
    )
    slope = rng.normal(0, 0.4, num_nodes)
    trend = slope[:, None] * (hours[None, :] / max(len_time - 1, 1)) + 0.3 * np.sin(
        2 * np.pi * hours[None, :] / (24 * 28) + phase[:, None]
    )
    # OD-mixed AR(1): innovations are half own, half neighborhood average
    # (diagonal removed — self-flow would swamp the cross-node coupling)
    w_od = volume.astype(np.float64).copy()
    np.fill_diagonal(w_od, 0.0)
    w_od = w_od / np.maximum(w_od.sum(axis=1, keepdims=True), 1e-9)
    ar = np.zeros((num_nodes, len_time), np.float64)
    amp = np.zeros((num_nodes, len_time), np.float64)
    phi, phi_amp = 0.96, 0.995
    sig_ar = np.sqrt(1.0 - phi**2)      # unit-variance stationary AR
    sig_amp = np.sqrt(1.0 - phi_amp**2)
    state = rng.normal(0, 1, num_nodes)
    state_amp = rng.normal(0, 1, num_nodes)
    for t in range(len_time):
        white = rng.normal(0, 1, num_nodes)
        state = phi * state + sig_ar * (0.5 * white + 0.5 * (w_od @ white))
        state_amp = phi_amp * state_amp + sig_amp * rng.normal(0, 1, num_nodes)
        ar[:, t] = state
        amp[:, t] = state_amp
    # Hour-of-week profile that DRIFTS week to week (random walk): the best
    # predictor of this component is the SAME HOUR LAST WEEK, which is
    # exactly what the 7-day period head samples — so multi-temporal fusion
    # measurably beats a closeness-only model. Smoothed over hours so it
    # doesn't just raise the short-lag noise floor.
    n_weeks = len_time // (24 * 7) + 2
    kernel = np.exp(-0.5 * ((np.arange(-8, 9)) / 3.0) ** 2)
    kernel /= kernel.sum()

    def smooth168(a):
        """Circular smoothing over the hour-of-week axis, renormalized to
        unit variance (plain smoothing would shrink the component into the
        noise floor)."""
        ext = np.concatenate([a[..., -16:], a, a[..., :16]], axis=-1)
        sm = np.apply_along_axis(lambda v: np.convolve(v, kernel, mode="same"), -1, ext)
        sm = sm[..., 16:-16]
        return sm / max(sm.std(), 1e-9)

    # weekly AR(1) on the profile (phi=0.85): week-to-week correlation 0.85,
    # 4-weeks 0.52 — same-hour-last-week stays the clearly better predictor
    phi_w = 0.85

    def how_innov():
        # node-correlated like the AR innovations: half own, half OD-mixed,
        # renormalized to unit variance (mixing averages variance away)
        raw = smooth168(rng.normal(0, 1.0, (num_nodes, 168)))
        mixed = 0.5 * raw + 0.5 * (w_od @ raw)
        return mixed / max(mixed.std(), 1e-9)

    profile = np.empty((n_weeks, num_nodes, 168))
    profile[0] = how_innov()
    for w in range(1, n_weeks):
        profile[w] = phi_w * profile[w - 1] + np.sqrt(1 - phi_w**2) * how_innov()
    week_idx = hours // 168
    how_idx = hours % 168
    how_comp = profile[week_idx, :, how_idx].T                # (N, T)

    noise = rng.normal(0, 0.15, (num_nodes, len_time))
    visits = np.maximum(
        means[:, None]
        + stds[:, None]
        * (
            0.55 * daily * (1.0 + 0.4 * amp)
            + weekly
            + 0.5 * trend
            + 0.6 * how_comp
            + 0.7 * ar
            + noise
        ),
        0.0,
    )

    gbst = pd.DataFrame(
        {
            "geo_id": geo_ids,
            "All_m": visits.mean(axis=1),
            "All_std": np.maximum(visits.std(axis=1), 1e-6),
        }
    )
    gbst.to_csv(os.path.join(path, name + ".gbst"), index=False)
    if groupstd_normalize:
        visits = (visits - 0.0) / gbst["All_std"].to_numpy()[:, None]

    time_strs = np.datetime_as_string(times, unit="s")
    time_strs = np.char.add(np.char.replace(time_strs, " ", "T"), "Z")
    dyna = pd.DataFrame(
        {
            "dyna_id": np.arange(num_nodes * len_time),
            "type": "state",
            "time": np.tile(time_strs, num_nodes),
            "entity_id": np.repeat(geo_ids, len_time),
            "Visits": visits.reshape(-1),
        }
    )
    dyna.to_csv(os.path.join(path, name + ".dyna"), index=False)

    days = times.astype("datetime64[D]").astype(np.int64)
    weekday = (days + 3) % 7
    ext = pd.DataFrame(
        {
            "ext_id": np.arange(len_time),
            "time": time_strs,
            "holiday": (rng.uniform(size=len_time) < 0.03).astype(float),
            "weekend": (weekday >= 5).astype(float),
            "temp": rng.normal(0, 1, len_time),
            "rain": np.maximum(rng.normal(-0.5, 1, len_time), 0),
            "snow": np.maximum(rng.normal(-1.5, 1, len_time), 0),
            "New_cases": np.zeros(len_time),
        }
    )
    ext.to_csv(os.path.join(path, name + ".ext"), index=False)

    static = pd.DataFrame(
        rng.normal(0, 1, (num_nodes, 6)),
        columns=["pop", "income", "poi_retail", "poi_rest", "poi_edu", "poi_rec"],
    )
    static.insert(0, "geo_id", geo_ids)
    static.to_csv(os.path.join(path, name + ".static"), index=False)

    config = {
        "geo": {"including_types": ["Point"], "Point": {}},
        "rel": {"including_types": ["geo"], "geo": {"link_weight": "num"}},
        "dyna": {"including_types": ["state"], "state": {"entity_id": "geo_id", "Visits": "num"}},
        "ext": {
            "ext_id": "num", "time": "other", "holiday": "num", "weekend": "num",
            "temp": "num", "rain": "num", "snow": "num", "New_cases": "num",
        },
        "info": {
            "data_col": ["Visits"],
            "weight_col": "link_weight",
            "ext_col": ["holiday", "weekend", "temp", "rain", "snow"],
            "data_files": [name],
            "geo_file": name,
            "rel_file": name,
            "ext_file": name,
            "output_dim": 1,
            "time_intervals": 3600,
            "init_weight_inf_or_zero": "zero",
            "set_weight_link_or_dist": "dist",
            "calculate_weight_adj": False,
            "weight_adj_epsilon": 0.1,
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f)
    return path
