"""Geographic geometry helpers (host-side, build-time).

Reference math:
  * haversine distance on a 6371 km sphere (ref: MultiATGCN.py:41-48)
  * Gaussian-kernel distance adjacency w = exp(-(d/std)^2), thresholded
    (ref: MultiATGCN.py:51-56 and traffic_state_datatset.py:210-223)
"""

import ast
from typing import Tuple

import numpy as np
import pandas as pd


def haversine(lat1, lng1, lat2, lng2) -> np.ndarray:
    """Great-circle distance in km; inputs in degrees, broadcastable arrays."""
    lat1, lng1, lat2, lng2 = map(np.radians, (lat1, lng1, lat2, lng2))
    avg_earth_radius = 6371.0
    dlat = lat2 - lat1
    dlng = lng2 - lng1
    d = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng * 0.5) ** 2
    return 2 * avg_earth_radius * np.arcsin(np.sqrt(d))


def gaussian_kernel_adjacency(dist_mx: np.ndarray, epsilon: float = 0.0) -> np.ndarray:
    """w_ij = exp(-(d_ij/std)^2) with entries < epsilon zeroed.

    std is taken over finite entries only (inf means 'no edge').
    """
    dist_mx = np.asarray(dist_mx, dtype=np.float64)
    finite = dist_mx[~np.isinf(dist_mx)].flatten()
    std = finite.std()
    adj = np.exp(-np.square(dist_mx / std))
    adj[adj < epsilon] = 0.0
    return adj.astype(np.float32)


def parse_coordinates(geo_df: pd.DataFrame) -> Tuple[np.ndarray, np.ndarray]:
    """Extract (lng, lat) arrays from a .geo DataFrame's 'coordinates' column.

    Coordinates are stored as '[lng, lat]' strings (ref: MultiATGCN.py:253-255
    parses them with string surgery; here we use ast.literal_eval). Rows are
    returned in geo_id-sorted order to match the reference's pandas pivot,
    which sorts its index (ref: MultiATGCN.py:260).
    """
    df = geo_df.sort_values("geo_id")
    coords = np.array([ast.literal_eval(str(c)) for c in df["coordinates"]], dtype=np.float64)
    return coords[:, 0], coords[:, 1]  # lng (x), lat (y)


def haversine_distance_matrix(geo_df: pd.DataFrame) -> np.ndarray:
    """Pairwise haversine distances between all nodes of a .geo table."""
    lng, lat = parse_coordinates(geo_df)
    return haversine(lat[:, None], lng[:, None], lat[None, :], lng[None, :])
