"""GeoJSON export of atomic datasets (ref: libcity/utils/visualize.py:7-223).

Full capability parity with the reference VisHelper: dataset-type dispatch
from config.json (state / grid / trajectory / geo), Point-node state maps
with per-node series means, grid-cell geometry with grid-file means, and
LineString trajectories (GPS coordinate rows or .geo location lookups).
Coordinates are parsed with ast.literal_eval (the reference uses eval on
untrusted CSV text, ref visualize.py:100,132 — not reproduced).
"""

import ast
import json
import os
from typing import Optional

import numpy as np
import pandas as pd

from multistgraph_tpu.data import atomic
from multistgraph_tpu.graph.geometry import parse_coordinates
from multistgraph_tpu.utils.logging import ensure_dir

GEO_RESERVED = ["type", "coordinates"]
DYNA_RESERVED = ["dyna_id", "type", "time", "entity_id", "traj_id", "coordinates"]
GRID_RESERVED = ["dyna_id", "type", "time", "row_id", "column_id"]


def _feature(geom_type, coordinates, properties):
    return {
        "type": "Feature",
        "geometry": {"type": geom_type, "coordinates": coordinates},
        "properties": properties,
    }


def _clean(props):
    return {
        k: (float(v) if isinstance(v, (int, float, np.floating, np.integer)) else str(v))
        for k, v in props.items()
    }


def _save(collection, save_path, source_file):
    if save_path is None:
        return
    ensure_dir(save_path)
    name = "_".join(os.path.basename(source_file).split(".")) + ".json"
    with open(os.path.join(save_path, name), "w", encoding="utf-8") as f:
        json.dump(collection, f, ensure_ascii=False, indent=4)


def geo_file_to_geojson(geo_path: str, save_path: Optional[str] = None) -> Optional[dict]:
    """Plain .geo -> FeatureCollection keeping every non-reserved column as a
    property (ref _visualize_geo)."""
    geo = pd.read_csv(geo_path)
    if "coordinates" not in geo.columns:
        return None
    extra = [c for c in geo.columns if c not in GEO_RESERVED]
    features = []
    for _, row in geo.iterrows():
        coords = ast.literal_eval(row["coordinates"])
        if len(coords) == 0:
            return None
        features.append(_feature(row["type"], coords, _clean(row[extra].to_dict())))
    collection = {"type": "FeatureCollection", "features": features}
    _save(collection, save_path, geo_path)
    return collection


def state_to_geojson(geo_path: str, dyna_path: str, save_path: Optional[str] = None) -> dict:
    """.geo nodes + per-entity means of every non-reserved .dyna column
    (ref _visualize_state)."""
    geo = pd.read_csv(geo_path)
    dyna = pd.read_csv(dyna_path)
    extra_geo = [c for c in geo.columns if c not in GEO_RESERVED]
    extra_dyna = [c for c in dyna.columns if c not in DYNA_RESERVED]
    means = dyna.groupby("entity_id")[extra_dyna].mean()
    features = []
    for _, row in geo.iterrows():
        props = _clean(row[extra_geo].to_dict())
        if row["geo_id"] in means.index:
            props.update({c: float(means.loc[row["geo_id"], c]) for c in extra_dyna})
        features.append(
            _feature(row["type"], ast.literal_eval(row["coordinates"]), props)
        )
    collection = {"type": "FeatureCollection", "features": features}
    _save(collection, save_path, dyna_path)
    return collection


def grid_to_geojson(geo_path: str, grid_path: str, save_path: Optional[str] = None) -> dict:
    """Grid-cell .geo (row_id/column_id) + per-cell means of the .grid file
    (ref _visualize_grid)."""
    geo = pd.read_csv(geo_path)
    grid = pd.read_csv(grid_path)
    extra_geo = [c for c in geo.columns if c not in GEO_RESERVED + ["row_id", "column_id"]]
    extra_grid = [c for c in grid.columns if c not in GRID_RESERVED]
    means = grid.groupby(["row_id", "column_id"])[extra_grid].mean()
    features = []
    for _, row in geo.iterrows():
        props = _clean(row[extra_geo].to_dict())
        props["row_id"] = int(row["row_id"])
        props["column_id"] = int(row["column_id"])
        key = (row["row_id"], row["column_id"])
        if key in means.index:
            props.update({c: float(means.loc[key, c]) for c in extra_grid})
        features.append(
            _feature(row["type"], ast.literal_eval(row["coordinates"]), props)
        )
    collection = {"type": "FeatureCollection", "features": features}
    _save(collection, save_path, grid_path)
    return collection


def trajectory_to_geojson(
    dyna_path: str, geo_path: Optional[str] = None, save_path: Optional[str] = None
) -> dict:
    """Trajectory .dyna -> LineString per (entity[, traj]) — GPS rows carry
    their own coordinates; otherwise points come from .geo row lookups by
    'location' (ref _visualize_trajectory, incl. its first-row handling of
    segment geometry: segment rows contribute their end point, the first row
    also its start point)."""
    dyna = pd.read_csv(dyna_path)
    gps = "coordinates" in dyna.columns
    geo = pd.read_csv(geo_path) if not gps else None

    def line_coords(rows):
        coords = []
        if gps:
            for _, r in rows.iterrows():
                coords.append(ast.literal_eval(r["coordinates"]))
        else:
            for k, (_, r) in enumerate(rows.iterrows()):
                seg = ast.literal_eval(geo.loc[r["location"]]["coordinates"])
                if k == 0:
                    coords.append(seg[0])
                coords.append(seg[1])
        return coords

    features = []
    for entity_id, entity_rows in dyna.groupby("entity_id"):
        if "traj_id" in dyna.columns:
            for traj_id, traj_rows in entity_rows.groupby("traj_id"):
                features.append(_feature(
                    "LineString", line_coords(traj_rows),
                    {"usr_id": int(entity_id), "traj_id": int(traj_id)},
                ))
        else:
            features.append(_feature(
                "LineString", line_coords(entity_rows), {"usr_id": int(entity_id)}
            ))
    collection = {"type": "FeatureCollection", "features": features}
    _save(collection, save_path, dyna_path)
    return collection


def dataset_to_geojson(data_path: str, dataset: str, save_path: Optional[str] = None):
    """VisHelper-equivalent entry: read the dataset's config.json, dispatch on
    its type, convert every matching file (ref visualize.py:18-74). Returns
    the list of FeatureCollections produced."""
    root = os.path.join(data_path, dataset)
    with open(os.path.join(root, "config.json")) as f:
        cfg = json.load(f)
    if "dyna" in cfg and cfg["dyna"].get("including_types") == ["state"]:
        kind = "state"
    elif "grid" in cfg and cfg["grid"].get("including_types") == ["state"]:
        kind = "grid"
    elif "dyna" in cfg and cfg["dyna"].get("including_types") == ["trajectory"]:
        kind = "trajectory"
    else:
        kind = "geo"
    files = sorted(os.listdir(root))
    geo_files = [f for f in files if f.endswith(".geo")]
    dyna_files = [f for f in files if f.endswith(".dyna")]
    grid_files = [f for f in files if f.endswith(".grid")]
    geo_path = os.path.join(root, geo_files[0]) if geo_files else None

    out = []
    if kind == "state":
        for d in dyna_files:
            out.append(state_to_geojson(geo_path, os.path.join(root, d), save_path))
    elif kind == "grid":
        for g in grid_files:
            out.append(grid_to_geojson(geo_path, os.path.join(root, g), save_path))
    elif kind == "trajectory":
        if geo_path:
            out.append(geo_file_to_geojson(geo_path, save_path))
        for d in dyna_files:
            out.append(trajectory_to_geojson(
                os.path.join(root, d), geo_path=geo_path, save_path=save_path
            ))
    else:
        out.append(geo_file_to_geojson(geo_path, save_path))
    return [c for c in out if c is not None]


def geo_to_geojson(
    data_path: str,
    dataset: str,
    out_path: Optional[str] = None,
    include_dyna_stats: bool = False,
    data_col=None,
) -> dict:
    """Point-node FeatureCollection with optional per-node series statistics
    (mean/max/std) — the Point-specific fast path kept from round 1."""
    geo = atomic.load_geo(os.path.join(data_path, dataset + ".geo"))
    lng, lat = parse_coordinates(geo.df)
    stats = None
    if include_dyna_stats:
        dyna = atomic.load_dyna(
            os.path.join(data_path, dataset + ".dyna"), geo, data_col=data_col
        )
        series = dyna.values[..., 0]  # (T, N)
        stats = {
            "mean": np.nanmean(series, axis=0),
            "max": np.nanmax(series, axis=0),
            "std": np.nanstd(series, axis=0),
        }

    features = []
    for i, geo_id in enumerate(sorted(geo.geo_ids)):
        props = {"geo_id": int(geo_id) if np.isreal(geo_id) else str(geo_id)}
        if stats is not None:
            idx = geo.geo_to_ind[geo_id]
            props.update(
                mean=float(stats["mean"][idx]),
                max=float(stats["max"][idx]),
                std=float(stats["std"][idx]),
            )
        features.append(_feature("Point", [float(lng[i]), float(lat[i])], props))
    collection = {"type": "FeatureCollection", "features": features}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(collection, f)
    return collection
