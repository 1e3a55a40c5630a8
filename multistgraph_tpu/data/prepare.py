"""SafeGraph-style ETL: weekly-patterns records -> LibCity atomic files.

Behavioral re-implementation of the reference's offline data preparation
(ref: data_prepare/1.1-data_population_inflow.py:67-222,
1.2-data_external_variable.py:1-102, 1.3-data_libcity_format.py:21-281),
runnable on any data matching the public SafeGraph weekly-patterns schema:

  1.1 — NAICS -> 7-category POI reclassification; `visits_by_each_hour`
        expansion to hourly visit counts aggregated per spatial unit x
        category; `visitor_home_cbgs` dicts -> weekly OD flows per unit.
  1.2 — external variables: weekend/holiday calendar + z-scored weather.
  1.3 — atomic-file assembly: .dyna (7-type or 'Single' all-visits),
        offline GROUP z-score (per-unit mean/std from the train split only
        -> .gbst; series normalized by the unit's All_std), .geo centroids,
        .rel (train-period OD volume / destination inflow), .ext, .static.

The reference's geopandas shapefile joins assign each POI to census units;
raw shapefiles are not shipped, so that step is abstracted: callers provide
the poi -> unit assignment (a DataFrame), exactly what the join produces.
The synthetic-data path (data/synthetic.py) remains the test-data source;
this module is for real SafeGraph-schema extracts.
"""

import ast
import json
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from multistgraph_tpu.utils import ensure_dir

POI_CATEGORIES = ["Education", "Others", "Recreation", "Residential", "Restaurant",
                  "Retail", "Service"]

# NAICS -> category rules (ref 1.1:70-87). Order matters: 4-digit rules
# refine 2-digit assignments, later rules overwrite earlier ones.
_NAICS2 = {
    "Others": ["00", "11", "21", "22", "23", "31", "32", "33", "48", "49", "51", "55"],
    "Service": ["52", "54", "56", "92"],
    "Retail": ["42", "44", "45"],
    "Education": ["61"],
    "Recreation": ["71"],
}
_NAICS4 = {
    "Service": ["5321", "5322", "5323", "5324", "5331", "8111", "8112", "8113",
                "8114", "8121", "8122", "8123", "8129", "8131", "8132", "8133",
                "8134", "8139", "8141", "6211", "6212", "6213", "6221", "6222",
                "6223", "6231", "6214", "6215", "6216", "6219", "6232", "6233",
                "6239", "6241", "6242", "6243", "0624"],
    "Residential": ["5311", "5312", "5313"],
    "Education": ["6244"],
    "Restaurant": ["7211", "7212", "7213", "7223", "7224", "7225"],
}


def reclassify_naics(naics_code) -> str:
    """7-category POI type from a NAICS code (ref 1.1:70-87)."""
    code = str(naics_code).zfill(6)
    n2, n4 = code[:2], code[:4]
    category = "Others"
    for cat, codes in _NAICS2.items():
        if n2 in codes:
            category = cat
    for cat, codes in _NAICS4.items():
        if n4 in codes:
            category = cat
    return category


def expand_hourly_visits(weekly: pd.DataFrame, poi_units: pd.DataFrame,
                         unit_col: str = "unit") -> pd.DataFrame:
    """Weekly-patterns rows -> hourly visits per (unit, category, time).

    weekly columns (SafeGraph schema): safegraph_place_id, date_range_start,
    date_range_end, visits_by_each_hour (JSON list of 168 ints), naics_code.
    poi_units: safegraph_place_id -> unit assignment (the spatial join's
    output, ref 1.1:54-56). Returns a long frame [unit, category, Time,
    Visits] (ref 1.1:166-186).
    """
    weekly = weekly.merge(poi_units, on="safegraph_place_id")
    weekly["category"] = weekly["naics_code"].map(reclassify_naics)
    frames = []
    for (start, _end), grp in weekly.groupby(["date_range_start", "date_range_end"]):
        counts = np.stack([
            np.asarray(ast.literal_eval(v), dtype=np.int64)
            for v in grp["visits_by_each_hour"]
        ])
        hours = pd.date_range(str(start).split("T")[0], periods=counts.shape[1], freq="h")
        frame = pd.DataFrame(counts, columns=hours)
        frame[unit_col] = grp[unit_col].to_numpy()
        frame["category"] = grp["category"].to_numpy()
        agg = frame.groupby([unit_col, "category"]).sum()
        long = agg.reset_index().melt(
            id_vars=[unit_col, "category"], var_name="Time", value_name="Visits"
        )
        frames.append(long)
    out = pd.concat(frames, ignore_index=True)
    return out.groupby([unit_col, "category", "Time"])["Visits"].sum().reset_index()


def weekly_od_flows(weekly: pd.DataFrame, cbg_to_unit: Dict[str, str],
                    poi_units: pd.DataFrame, unit_col: str = "unit") -> pd.DataFrame:
    """visitor_home_cbgs dicts -> per-unit OD flow rows [origin, destination,
    OD_flow] (ref 1.1:193-214). Unassignable origin CBGs count as 0-flow
    (the reference fillna(0)s them)."""
    weekly = weekly.merge(poi_units, on="safegraph_place_id")
    rows = []
    for rec in weekly.itertuples():
        home = rec.visitor_home_cbgs
        home = ast.literal_eval(home) if isinstance(home, str) else (home or {})
        dest = getattr(rec, unit_col)
        for cbg, flow in home.items():
            origin = cbg_to_unit.get(str(cbg).zfill(12))
            if origin is not None:
                rows.append((origin, dest, int(flow)))
    od = pd.DataFrame(rows, columns=["origin", "destination", "OD_flow"])
    return od.groupby(["origin", "destination"])["OD_flow"].sum().reset_index()


def build_od_rel(od: pd.DataFrame, units: List) -> pd.DataFrame:
    """OD volumes -> .rel rows: link_weight = volume / destination inflow,
    full cartesian fill with 0, sorted by (origin, destination)
    (ref 1.3:153-176)."""
    inflow = od.groupby("destination")["OD_flow"].sum().rename("Inflow").reset_index()
    od = od.merge(inflow, on="destination")
    od["link_weight"] = od["OD_flow"] / od["Inflow"]
    full = pd.DataFrame({
        "origin": np.asarray(list(units) * len(units)),
        "destination": np.repeat(np.asarray(list(units)), len(units)),
    })
    rel = full.merge(od[["origin", "destination", "link_weight"]],
                     on=["origin", "destination"], how="left").fillna(0.0)
    rel = rel.sort_values(["origin", "destination"]).reset_index(drop=True)
    rel.insert(0, "rel_id", np.arange(len(rel)))
    rel.insert(1, "type", "geo")
    rel.columns = ["rel_id", "type", "origin_id", "destination_id", "link_weight"]
    return rel


def group_standardize(hourly_wide: pd.DataFrame, unit_col: str,
                      value_cols: List[str], split_time) -> (pd.DataFrame, pd.DataFrame):
    """Offline group z-score (ref 1.3:100-119): per-unit mean/std of each
    column over the TRAIN period only; every column normalized as
    (x - x_m) / All_std (the 'All' column's std); NaNs -> 0.

    Returns (normalized frame, mstd table [unit, <col>_m, <col>_std...]).
    """
    train = hourly_wide[pd.to_datetime(hourly_wide["Time"]) <= pd.to_datetime(split_time)]
    mean = train.groupby(unit_col)[value_cols].mean()
    std = train.groupby(unit_col)[value_cols].std()
    mstd = mean.add_suffix("_m").join(std.add_suffix("_std")).reset_index()
    out = hourly_wide.merge(mstd, on=unit_col)
    for col in value_cols:
        out[col] = (out[col] - out[col + "_m"]) / out["All_std"]
    out = out.fillna(0.0)
    return out[[unit_col, "Time"] + value_cols], mstd


def build_ext(times: pd.DatetimeIndex, weather: Optional[pd.DataFrame] = None,
              holidays: Optional[List] = None) -> pd.DataFrame:
    """Calendar + z-scored weather externals (ref 1.2:1-102, 1.3:179-200):
    holiday flag, weekend flag, and each weather column z-scored over the
    full span (outliers/NaNs forward-filled then zero-filled)."""
    holidays = {pd.Timestamp(h).date() for h in (holidays or [])}
    ext = pd.DataFrame({
        "time": times,
        "holiday": [1.0 if t.date() in holidays else 0.0 for t in times],
        "weekend": (times.dayofweek >= 5).astype(float),
    })
    if weather is not None:
        weather = weather.set_index("time").reindex(times)
        for col in weather.columns:
            series = weather[col].ffill().fillna(0.0)
            std = series.std()
            ext[col] = (series - series.mean()) / (std if std > 0 else 1.0)
        ext = ext.reset_index(drop=True)
    return ext


def assemble_atomic_files(
    out_dir: str,
    name: str,
    hourly: pd.DataFrame,
    od: pd.DataFrame,
    unit_coords: pd.DataFrame,
    split_time,
    weather: Optional[pd.DataFrame] = None,
    holidays: Optional[List] = None,
    static: Optional[pd.DataFrame] = None,
    unit_col: str = "unit",
    single: bool = True,
) -> str:
    """Write the full atomic dataset (ref 1.3:21-281): .dyna (Single
    'Visits' = the All channel when `single`, else the 7 POI channels),
    .gbst, .geo, .rel, .ext, .static, config.json. Values are group-
    z-scored offline exactly like the reference's GP variants. Returns the
    dataset directory."""
    path = os.path.join(out_dir, name)
    ensure_dir(path)

    wide = hourly.pivot_table(index=[unit_col, "Time"], columns="category",
                              values="Visits", fill_value=0, aggfunc="sum").reset_index()
    for cat in POI_CATEGORIES:
        if cat not in wide:
            wide[cat] = 0
    wide["All"] = wide[POI_CATEGORIES].sum(axis=1)
    # complete the unit x time grid (ref 1.1:180-186)
    units = sorted(wide[unit_col].unique())
    times = pd.to_datetime(sorted(wide["Time"].unique()))
    grid = pd.MultiIndex.from_product([units, times], names=[unit_col, "Time"])
    wide = wide.set_index([unit_col, "Time"]).reindex(grid, fill_value=0).reset_index()

    value_cols = POI_CATEGORIES + ["All"]
    norm, mstd = group_standardize(wide, unit_col, value_cols, split_time)

    gbst = mstd[[unit_col, "All_m", "All_std"]].copy()
    gbst.columns = ["geo_id", "All_m", "All_std"]
    gbst.to_csv(os.path.join(path, name + ".gbst"), index=False)

    time_strs = pd.to_datetime(norm["Time"]).dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    data_cols = ["Visits"] if single else POI_CATEGORIES
    dyna = pd.DataFrame({
        "dyna_id": np.arange(len(norm)), "type": "state",
        "time": time_strs, "entity_id": norm[unit_col],
    })
    if single:
        dyna["Visits"] = norm["All"]
    else:
        for cat in POI_CATEGORIES:
            dyna[cat] = norm[cat]
    dyna = dyna.sort_values(["entity_id", "time"]).reset_index(drop=True)
    dyna["dyna_id"] = np.arange(len(dyna))
    dyna.to_csv(os.path.join(path, name + ".dyna"), index=False)

    geo = pd.DataFrame({
        "geo_id": units, "type": "Point",
        "coordinates": [
            "[{:.6f}, {:.6f}]".format(
                float(unit_coords.loc[unit_coords[unit_col] == u, "lng"].iloc[0]),
                float(unit_coords.loc[unit_coords[unit_col] == u, "lat"].iloc[0]),
            ) for u in units
        ],
    })
    geo.to_csv(os.path.join(path, name + ".geo"), index=False)

    build_od_rel(od, units).to_csv(os.path.join(path, name + ".rel"), index=False)

    ext = build_ext(times, weather=weather, holidays=holidays)
    ext.insert(0, "ext_id", np.arange(len(ext)))
    ext["time"] = pd.to_datetime(ext["time"]).dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    ext.to_csv(os.path.join(path, name + ".ext"), index=False)

    if static is not None:
        # z-score static features (ref 1.2:100-102)
        st = static.copy()
        for col in st.columns:
            if col == unit_col:
                continue
            std = st[col].std()
            st[col] = (st[col] - st[col].mean()) / (std if std > 0 else 1.0)
        st = st.rename(columns={unit_col: "geo_id"})
        st.to_csv(os.path.join(path, name + ".static"), index=False)

    ext_cols = [c for c in ext.columns if c not in ("ext_id", "time")]
    config = {
        "geo": {"including_types": ["Point"], "Point": {}},
        "rel": {"including_types": ["geo"], "geo": {"link_weight": "num"}},
        "dyna": {"including_types": ["state"],
                 "state": {"entity_id": "geo_id", **{c: "num" for c in data_cols}}},
        "ext": {"ext_id": "num", "time": "other", **{c: "num" for c in ext_cols}},
        "info": {
            "data_col": data_cols,
            "weight_col": "link_weight",
            "ext_col": ext_cols,
            "data_files": [name], "geo_file": name, "rel_file": name, "ext_file": name,
            "output_dim": len(data_cols),
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
