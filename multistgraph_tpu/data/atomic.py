"""Readers for LibCity-style atomic files: .geo/.rel/.dyna/.ext/.static/.gbst.

Same file formats and column-selection rules as the reference, but fully
vectorized — the reference's per-row Python loops over the .rel table
(traffic_state_datatset.py:171-181) and the chunked .dyna reshape loop
(traffic_state_datatset.py:277-285) become numpy indexing/reshape.

Formats:
  .geo    CSV [geo_id, type, coordinates, properties...]          (ref :94-106)
  .rel    CSV [rel_id, type, origin_id, destination_id, props...] (ref :126-187)
  .dyna   CSV [dyna_id, type, time, entity_id, properties...]     (ref :244-287)
  .ext    CSV [ext_id, time, properties...]                       (ref :545-576)
  .static CSV [id, features...]                                   (ref :972-975)
  .gbst   CSV per-node group stats incl. geo_id/All_m/All_std     (ref :978-980)
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd


@dataclass
class GeoTable:
    df: pd.DataFrame
    geo_ids: List = field(default_factory=list)
    geo_to_ind: Dict = field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return len(self.geo_ids)


def load_geo(path: str) -> GeoTable:
    df = pd.read_csv(path)
    geo_ids = list(df["geo_id"])
    return GeoTable(df=df, geo_ids=geo_ids, geo_to_ind={g: i for i, g in enumerate(geo_ids)})


def load_rel(
    path: str,
    geo: GeoTable,
    weight_col: Union[str, List[str], None] = "",
    set_weight_link_or_dist: str = "dist",
    init_weight_inf_or_zero: str = "zero",
    bidir_adj_mx: bool = False,
    calculate_weight_adj: bool = False,
    weight_adj_epsilon: float = 0.1,
    distance_inverse: bool = False,
) -> np.ndarray:
    """Build the dense N x N adjacency from a .rel file.

    Column-selection rules (ref: traffic_state_datatset.py:148-166):
      * explicit weight_col wins (a 1-element list is unwrapped);
      * 4 columns -> link/0-1 semantics with zero init;
      * 5 columns -> last column is the weight;
      * otherwise -> error.
    Weight rules (ref :168-187): 'link' -> 0/1; 'dist' -> raw weights with
    'inf' or 'zero' init for absent edges; optional Gaussian-kernel
    sparsification or inverse-distance transform.
    """
    rel = pd.read_csv(path)
    if isinstance(weight_col, list):
        if len(weight_col) != 1:
            raise ValueError("`weight_col` parameter must be only one column!")
        weight_col = weight_col[0]
    if weight_col:
        edges = rel.loc[~rel[weight_col].isna(), ["origin_id", "destination_id", weight_col]]
    else:
        if len(rel.columns) > 5 or len(rel.columns) < 4:
            raise ValueError("Don't know which column to be loaded! Please set `weight_col`!")
        if len(rel.columns) == 4:
            calculate_weight_adj = False
            set_weight_link_or_dist = "link"
            init_weight_inf_or_zero = "zero"
            edges = rel[["origin_id", "destination_id"]].copy()
            edges["__w__"] = 1.0
            weight_col = "__w__"
        else:
            weight_col = rel.columns[-1]
            edges = rel.loc[~rel[weight_col].isna(), ["origin_id", "destination_id", weight_col]]

    n = geo.num_nodes
    link_mode = set_weight_link_or_dist.lower() == "link"
    adj = np.zeros((n, n), dtype=np.float32)
    if init_weight_inf_or_zero.lower() == "inf" and not link_mode:
        adj[:] = np.inf

    src = edges["origin_id"].map(geo.geo_to_ind)
    dst = edges["destination_id"].map(geo.geo_to_ind)
    keep = src.notna() & dst.notna()
    src = src[keep].astype(int).to_numpy()
    dst = dst[keep].astype(int).to_numpy()
    w = np.ones(len(src), dtype=np.float32) if link_mode else edges.loc[keep, weight_col].to_numpy(np.float32)
    adj[src, dst] = w
    if bidir_adj_mx:
        adj[dst, src] = w

    if not link_mode:
        if distance_inverse:
            with np.errstate(divide="ignore"):
                adj = (1.0 / adj).astype(np.float32)
            adj[np.isinf(adj)] = 1.0
        elif calculate_weight_adj:
            finite = adj[~np.isinf(adj)].flatten()
            std = finite.std()
            adj = np.exp(-np.square(adj / std)).astype(np.float32)
            adj[adj < weight_adj_epsilon] = 0.0
    return adj


@dataclass
class DynaData:
    values: np.ndarray            # (len_time, num_nodes, feature_dim)
    timestamps: Optional[np.ndarray]  # datetime64[ns] of length len_time, or None


def load_dyna(
    path: str,
    geo: GeoTable,
    data_col: Union[str, Sequence[str], None] = "",
) -> DynaData:
    """Load a .dyna file into (len_time, num_nodes, feature_dim).

    Rows are entity-major (all timesteps of node 0, then node 1, ...), in the
    same node order as the .geo file — identical assumption to the reference's
    chunked reshape (traffic_state_datatset.py:277-285).
    """
    df = pd.read_csv(path)
    if data_col:
        cols = list(data_col) if isinstance(data_col, (list, tuple)) else [data_col]
        df = df[["time", "entity_id"] + cols]
    else:
        df = df[df.columns[2:]]

    n = geo.num_nodes
    len_time = df.shape[0] // n
    time_series = df["time"][:len_time]
    timestamps = None
    if not time_series.isna().any():
        cleaned = time_series.astype(str).str.replace("T", " ", regex=False).str.replace("Z", "", regex=False)
        timestamps = cleaned.to_numpy(dtype="datetime64[ns]")

    feature_cols = [c for c in df.columns if c not in ("time", "entity_id")]
    values = df[feature_cols].to_numpy(np.float64).reshape(n, len_time, len(feature_cols))
    values = values.swapaxes(0, 1)
    return DynaData(values=values, timestamps=timestamps)


@dataclass
class GridGeoTable(GeoTable):
    len_row: int = 0
    len_column: int = 0


def load_grid_geo(path: str) -> GridGeoTable:
    """.geo with row_id/column_id grid coordinates (ref :108-124)."""
    df = pd.read_csv(path)
    geo_ids = list(df["geo_id"])
    return GridGeoTable(
        df=df,
        geo_ids=geo_ids,
        geo_to_ind={g: i for i, g in enumerate(geo_ids)},
        len_row=int(df["row_id"].max()) + 1,
        len_column=int(df["column_id"].max()) + 1,
    )


def grid_adjacency(len_row: int, len_column: int) -> np.ndarray:
    """8-neighbor grid adjacency (ref: traffic_state_datatset.py:189-208)."""
    n = len_row * len_column
    adj = np.zeros((n, n), dtype=np.float32)
    rows, cols = np.meshgrid(np.arange(len_row), np.arange(len_column), indexing="ij")
    idx = (rows * len_column + cols).ravel()
    for dr, dc in ((0, 1), (1, 0), (-1, 0), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)):
        nr, nc = rows + dr, cols + dc
        valid = ((nr >= 0) & (nr < len_row) & (nc >= 0) & (nc < len_column)).ravel()
        nidx = (nr * len_column + nc).ravel()
        adj[idx[valid], nidx[valid]] = 1.0
        adj[nidx[valid], idx[valid]] = 1.0
    return adj


def _timestamps_from(series: pd.Series) -> Optional[np.ndarray]:
    if series.isna().any():
        return None
    cleaned = series.astype(str).str.replace("T", " ", regex=False).str.replace("Z", "", regex=False)
    return cleaned.to_numpy(dtype="datetime64[ns]")


def _select_columns(df: pd.DataFrame, data_col, key_cols: List[str]) -> pd.DataFrame:
    if data_col:
        cols = list(data_col) if isinstance(data_col, (list, tuple)) else [data_col]
        return df[key_cols + cols]
    return df[df.columns[2:]]


def load_grid(
    path: str, geo: GridGeoTable, data_col=None, as_4d: bool = False
) -> DynaData:
    """.grid file -> (T, num_grids, F) or (T, len_row, len_column, F) when
    as_4d (ref :289-383). Rows are grid-major (row*len_column+col), then time."""
    df = pd.read_csv(path)
    df = _select_columns(df, data_col, ["time", "row_id", "column_id"])
    n = geo.num_nodes
    len_time = df.shape[0] // n
    timestamps = _timestamps_from(df["time"][:len_time])
    feature_cols = [c for c in df.columns if c not in ("time", "row_id", "column_id")]
    values = df[feature_cols].to_numpy(np.float64).reshape(n, len_time, len(feature_cols))
    values = values.swapaxes(0, 1)  # (T, num_grids, F)
    if as_4d:
        values = values.reshape(len_time, geo.len_row, geo.len_column, len(feature_cols))
    return DynaData(values=values, timestamps=timestamps)


def load_od_4d(path: str, geo: GeoTable, data_col=None) -> DynaData:
    """.od file -> (T, N, N, F) (ref :385-431). Rows are origin-major, then
    destination, then time."""
    df = pd.read_csv(path)
    df = _select_columns(df, data_col, ["time", "origin_id", "destination_id"])
    n = geo.num_nodes
    len_time = df.shape[0] // (n * n)
    timestamps = _timestamps_from(df["time"][:len_time])
    feature_cols = [
        c for c in df.columns if c not in ("time", "origin_id", "destination_id")
    ]
    values = df[feature_cols].to_numpy(np.float64).reshape(n, n, len_time, len(feature_cols))
    values = values.transpose(2, 0, 1, 3)
    return DynaData(values=values, timestamps=timestamps)


def load_grid_od(
    path: str, geo: GridGeoTable, data_col=None, as_6d: bool = False
) -> DynaData:
    """.gridod file -> (T, G, G, F) or (T, lr, lc, lr, lc, F) when as_6d
    (ref :433-543). Rows: origin-grid-major, destination-grid, time."""
    df = pd.read_csv(path)
    key_cols = ["time", "origin_row_id", "origin_column_id",
                "destination_row_id", "destination_column_id"]
    df = _select_columns(df, data_col, key_cols)
    n = geo.num_nodes
    len_time = df.shape[0] // (n * n)
    timestamps = _timestamps_from(df["time"][:len_time])
    feature_cols = [c for c in df.columns if c not in key_cols]
    values = df[feature_cols].to_numpy(np.float64).reshape(n, n, len_time, len(feature_cols))
    values = values.transpose(2, 0, 1, 3)  # (T, G, G, F)
    if as_6d:
        lr, lc = geo.len_row, geo.len_column
        values = values.reshape(len_time, lr, lc, lr, lc, len(feature_cols))
    return DynaData(values=values, timestamps=timestamps)


@dataclass
class ExtData:
    values: np.ndarray            # (len_time_ext, ext_dim)
    timestamps: Optional[np.ndarray]


def load_ext(path: str, ext_col: Union[str, Sequence[str], None] = "") -> ExtData:
    df = pd.read_csv(path)
    if ext_col:
        cols = list(ext_col) if isinstance(ext_col, (list, tuple)) else [ext_col]
        df = df[["time"] + cols]
    else:
        df = df[df.columns[1:]]
    time_series = df["time"]
    timestamps = None
    if not time_series.isna().any():
        cleaned = time_series.astype(str).str.replace("T", " ", regex=False).str.replace("Z", "", regex=False)
        timestamps = cleaned.to_numpy(dtype="datetime64[ns]")
    feature_cols = [c for c in df.columns if c != "time"]
    return ExtData(values=df[feature_cols].to_numpy(np.float64), timestamps=timestamps)


def load_static(path: str) -> np.ndarray:
    """Load .static, dropping the leading id column (ref :972-975)."""
    df = pd.read_csv(path)
    return df.iloc[:, 1:].to_numpy(np.float64)


def load_gbst(path: str) -> pd.DataFrame:
    """Load .gbst per-node group stats sorted by geo_id (ref :978-980)."""
    return pd.read_csv(path).sort_values(by="geo_id").reset_index(drop=True)
