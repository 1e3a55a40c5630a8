"""Multi-view adjacency construction for Multi-ATGCN (host-side, build-time).

Builds the three predefined graph views and the support stack the model
consumes (ref: MultiATGCN.py:237-283):

  * OD view:        column-normalize the raw OD matrix by its diagonal
                    (destination self-flow), clip at 1.
  * semantic view:  inverse euclidean distance between static node features
                    (zero distances -> 1); identity when no static features.
  * distance view:  haversine distances + Gaussian kernel (epsilon=0.1).
  * support pairs:  each selected view contributes [I, scaled_laplacian(A)]
                    with lambda_max=2; adjtype='multi' keeps all three.

The result is returned both as a list of [I, L~] pairs (mirroring the
reference structure) and as a single stacked dense tensor ready for device
upload (the TPU-native representation: the model contracts it with one
einsum instead of a Python loop over views).
"""

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from scipy.spatial.distance import cdist

from multistgraph_tpu.graph.geometry import gaussian_kernel_adjacency, haversine_distance_matrix
from multistgraph_tpu.graph.laplacian import scaled_laplacian

VALID_ADJTYPES = ("multi", "od", "dist", "cosine", "identity")


def od_view(adj_mx: np.ndarray) -> np.ndarray:
    """Column-normalized OD adjacency, clipped at 1 (ref: MultiATGCN.py:238-241)."""
    adj = np.asarray(adj_mx, dtype=np.float32)
    diag = np.diag(adj).copy()
    with np.errstate(divide="ignore", invalid="ignore"):
        out = adj / diag[None, :]
    out[out > 1] = 1.0
    return out


def semantic_view(static: Optional[np.ndarray], num_nodes: int) -> np.ndarray:
    """Inverse-euclidean similarity of static features (ref: MultiATGCN.py:244-250)."""
    if static is None:
        return np.eye(num_nodes, dtype=np.float32)
    euc = cdist(static, static, metric="euclidean")
    euc[euc == 0] = 1.0
    return (1.0 / euc).astype(np.float32)


def distance_view(geo_df: pd.DataFrame, epsilon: float = 0.1) -> np.ndarray:
    """Gaussian-kernel haversine adjacency (ref: MultiATGCN.py:252-261)."""
    dist = haversine_distance_matrix(geo_df)
    return gaussian_kernel_adjacency(dist, epsilon)


def build_views(
    adj_mx: Optional[np.ndarray],
    static: Optional[np.ndarray],
    geo_df: Optional[pd.DataFrame],
    num_nodes: int,
    adjtype: str,
) -> Tuple[np.ndarray, List[List[np.ndarray]]]:
    """Select the base adjacency + support pairs for a given adjtype.

    Returns (base_adj, supports) where supports is a list of [I, L~] pairs in
    the reference's order: [od, dist, cosine] for 'multi'
    (ref: MultiATGCN.py:263-283).
    """
    if adjtype not in VALID_ADJTYPES:
        raise ValueError("adjtype must be one of {}, got {!r}".format(VALID_ADJTYPES, adjtype))
    identity = np.eye(num_nodes, dtype=np.float32)

    adj_od = od_view(adj_mx) if adj_mx is not None else identity
    adj_cos = semantic_view(static, num_nodes)
    adj_dis = distance_view(geo_df) if geo_df is not None else identity

    def pair(adj):
        return [identity, scaled_laplacian(adj).astype(np.float32)]

    if adjtype == "multi":
        return adj_od, [pair(adj_od), pair(adj_dis), pair(adj_cos)]
    if adjtype == "od":
        return adj_od, [pair(adj_od)]
    if adjtype == "dist":
        return adj_dis, [pair(adj_dis)]
    if adjtype == "cosine":
        return adj_cos, [pair(adj_cos)]
    return identity, [[identity, identity]]


def stack_static_supports(
    supports: List[List[np.ndarray]], cheb_k: int
) -> np.ndarray:
    """Expand support pairs with the Chebyshev recursion and stack densely.

    The reference rebuilds this list every AGCN forward (MultiATGCN.py:94-101):
    out = [I] + for each view the Chebyshev terms T_1..T_{K-1} of its L~.
    All of that is static per graph, so the TPU build precomputes the stacked
    tensor once: shape (1 + num_views*(cheb_k-1), N, N). The adaptive view
    (when enabled) is prepended at run time by the model.
    """
    n = supports[0][0].shape[0]
    out = [np.eye(n, dtype=np.float32)]
    for view in supports:
        terms = [m.astype(np.float32) for m in view]
        for _ in range(2, cheb_k):
            terms.append(2.0 * terms[1] @ terms[-1] - terms[-2])
        out.extend(terms[1:])
    return np.stack(out, axis=0)
