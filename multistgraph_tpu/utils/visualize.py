"""GeoJSON export of atomic datasets (ref: libcity/utils/visualize.py:7-223).

Converts .geo node geometry (plus optional per-node series statistics from a
.dyna file) into a GeoJSON FeatureCollection for map rendering.
"""

import json
import os
from typing import Optional

import numpy as np

from multistgraph_tpu.data import atomic
from multistgraph_tpu.graph.geometry import parse_coordinates


def geo_to_geojson(
    data_path: str,
    dataset: str,
    out_path: Optional[str] = None,
    include_dyna_stats: bool = False,
    data_col=None,
) -> dict:
    """Build a FeatureCollection of Point features; optionally attach per-node
    mean/max of the dynamic series as properties."""
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
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [float(lng[i]), float(lat[i])]},
                "properties": props,
            }
        )
    collection = {"type": "FeatureCollection", "features": features}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(collection, f)
    return collection
