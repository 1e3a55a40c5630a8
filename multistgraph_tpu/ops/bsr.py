"""Block-sparse (BSR) graph representation for TPU kernels.

The reference materializes dense N x N supports (fine at N<=403, impossible at
the 50k/1M-node synthetic scale of BASELINE.json configs 4-5). The TPU-native
sparse format is Block-CSR with MXU-aligned dense tiles:

  * nodes padded to a multiple of `block` (default 128, the MXU/lane width);
  * nonzero (row_block, col_block) tiles stored densely:
      values  (nnz_blocks, block, block) float32
      row_of  (nnz_blocks,) int32   — row-block index, sorted ascending
      col_of  (nnz_blocks,) int32   — col-block index
  * row-major block order so SpMM output tiles are revisited contiguously.

Host-side construction from COO edges or a dense matrix; the arrays ship to
device once per graph.
"""

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class BSRGraph:
    values: np.ndarray   # (nnz_blocks, block, block)
    row_of: np.ndarray   # (nnz_blocks,)
    col_of: np.ndarray   # (nnz_blocks,)
    num_nodes: int       # un-padded node count
    block: int
    # node permutation applied at construction (new_id = position of old id),
    # or None. Feature matrices must be reordered with apply_node_order /
    # undone with invert_node_order to stay consistent with the graph.
    perm: np.ndarray = None

    @property
    def padded_nodes(self) -> int:
        return -(-self.num_nodes // self.block) * self.block

    @property
    def num_row_blocks(self) -> int:
        return self.padded_nodes // self.block

    @property
    def nnz_blocks(self) -> int:
        return int(self.values.shape[0])

    @property
    def nnz_edges(self) -> int:
        return int((self.values != 0).sum())

    def to_dense(self) -> np.ndarray:
        n = self.padded_nodes
        out = np.zeros((n, n), dtype=self.values.dtype)
        b = self.block
        for v, r, c in zip(self.values, self.row_of, self.col_of):
            out[r * b : (r + 1) * b, c * b : (c + 1) * b] = v
        return out[: self.num_nodes, : self.num_nodes]


def rcm_order(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee node ordering of the symmetrized edge set.

    Scattered (power-law) graphs fill 128x128 BSR tiles pathologically
    (~0.04% at 1M nodes, docs/DESIGN.md §4); RCM clusters connected nodes
    into nearby ids so edges concentrate near the diagonal and far fewer
    tiles are touched. Returns old node ids in new order (perm[new] = old).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ones = np.ones(len(src) * 2, np.float32)
    sym = coo_matrix(
        (ones, (np.concatenate([src, dst]), np.concatenate([dst, src]))),
        shape=(num_nodes, num_nodes),
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(sym, symmetric_mode=True), dtype=np.int64)


def community_order(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    rounds: int = 10,
    native: bool = None,
) -> np.ndarray:
    """Community-clustering node order via synchronous label propagation.

    RCM minimizes bandwidth, which is the right objective for spatially-local
    graphs; for hub-dominated / community-structured graphs (power-law
    BASELINE configs 4-5) grouping each community's nodes into contiguous id
    ranges concentrates intra-community edges into dense diagonal tiles that
    RCM's breadth-first layering splits apart. Pure-numpy label propagation:
    each round every node adopts the most frequent label among its
    (symmetrized) neighbors — O(E log E) per round via sorted run counting,
    a few seconds at 16M edges; early-exits on convergence. Returns old node ids in new order
    (perm[new] = old): communities sorted by size (largest first), nodes
    within a community by degree (hubs lead their tile rows).

    ``native=None`` auto-uses the C++ kernel (multistgraph_tpu/native) when
    available — bit-identical result, ~20x faster at 1M nodes; ``False``
    forces this numpy path, ``True`` requires the native library.
    """
    if native is None:
        from multistgraph_tpu import native as _native_mod
        native = _native_mod.available()
    if native:
        from multistgraph_tpu.native import community_order_native
        return community_order_native(
            np.asarray(src, np.int64), np.asarray(dst, np.int64),
            num_nodes, rounds)
    u = np.concatenate([src, dst]).astype(np.int64)
    v = np.concatenate([dst, src]).astype(np.int64)
    labels = np.arange(num_nodes, dtype=np.int64)
    degree = np.bincount(u, minlength=num_nodes)
    for _ in range(rounds):
        key = u * num_nodes + labels[v]
        uniq, counts = np.unique(key, return_counts=True)
        uu = uniq // num_nodes
        ll = uniq % num_nodes
        # per node, the neighbor label with the highest count: stable sort by
        # (node, count) and keep the last run entry per node
        order = np.lexsort((counts, uu))
        uu_s, ll_s = uu[order], ll[order]
        last = np.r_[uu_s[1:] != uu_s[:-1], True]
        new_labels = labels.copy()
        new_labels[uu_s[last]] = ll_s[last]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    # canonicalize labels to 0..C-1, order communities by size descending
    _, labels = np.unique(labels, return_inverse=True)
    sizes = np.bincount(labels)
    comm_rank = np.empty_like(sizes)
    comm_rank[np.argsort(-sizes, kind="stable")] = np.arange(len(sizes))
    return np.lexsort((-degree, comm_rank[labels])).astype(np.int64)


_ORDERINGS = {"rcm": rcm_order, "community": community_order}


def apply_node_order(x: np.ndarray, perm: np.ndarray, axis: int = 0) -> np.ndarray:
    """Reorder a feature array's node axis to match a permuted graph
    (x_new[i] = x_old[perm[i]]); pads beyond len(perm) are left in place."""
    idx = [slice(None)] * x.ndim
    idx[axis] = perm
    out = x.copy()
    sel = [slice(None)] * x.ndim
    sel[axis] = slice(0, len(perm))
    out[tuple(sel)] = x[tuple(idx)]
    return out


def invert_node_order(y: np.ndarray, perm: np.ndarray, axis: int = 0) -> np.ndarray:
    """Undo apply_node_order on an output array (y_old[perm[i]] = y_new[i])."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return apply_node_order(y, inv, axis)


def bsr_from_coo(
    src: np.ndarray,
    dst: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block: int = 128,
    reorder: str = None,
    native: bool = None,
) -> BSRGraph:
    """Build BSR from COO edges (duplicate edges accumulate).

    reorder='rcm' relabels nodes by reverse Cuthill-McKee before tiling
    (bandwidth-minimizing — best for spatially-local graphs);
    reorder='community' groups label-propagation communities into contiguous
    id ranges (best for hub/community-structured power-law graphs). Use for
    scattered graphs where raw tiles are nearly empty; the applied
    permutation is recorded on the graph (reorder features with
    apply_node_order).

    ``native=None`` auto-uses the C++ builder (multistgraph_tpu/native) when
    available — bit-identical values (same accumulation order as np.add.at),
    ~4x faster at 1M nodes / 8M edges; ``False`` forces numpy, ``True``
    requires the native library."""
    perm = None
    if reorder is not None:
        if reorder not in _ORDERINGS:
            raise ValueError(
                "unknown reorder {!r}; options: {}".format(
                    reorder, sorted(_ORDERINGS)))
        perm = _ORDERINGS[reorder](src, dst, num_nodes)
        inv = np.empty(num_nodes, np.int64)
        inv[perm] = np.arange(num_nodes)
        src, dst = inv[src], inv[dst]
    if native is None:
        from multistgraph_tpu import native as _native_mod
        native = _native_mod.available() and 0 < block <= 256
    if native:
        from multistgraph_tpu.native import BsrPlan
        plan = BsrPlan(np.asarray(src, np.int64), np.asarray(dst, np.int64),
                       num_nodes, block)
        values = plan.fill(weights)
        graph = BSRGraph(values=values, row_of=plan.row_of, col_of=plan.col_of,
                         num_nodes=num_nodes, block=block, perm=perm)
        plan.close()
        return graph
    rb = src // block
    cb = dst // block
    n_blocks = -(-num_nodes // block)
    key = rb.astype(np.int64) * n_blocks + cb
    uniq, inverse = np.unique(key, return_inverse=True)
    values = np.zeros((len(uniq), block, block), dtype=np.float32)
    np.add.at(values, (inverse, src % block, dst % block), weights.astype(np.float32))
    return BSRGraph(
        values=values,
        row_of=(uniq // n_blocks).astype(np.int32),
        col_of=(uniq % n_blocks).astype(np.int32),
        num_nodes=num_nodes,
        block=block,
        perm=perm,
    )


def bsr_from_dense(adj: np.ndarray, block: int = 128) -> BSRGraph:
    """Build BSR from a dense adjacency, keeping only nonzero tiles."""
    n = adj.shape[0]
    pad = -(-n // block) * block
    padded = np.zeros((pad, pad), dtype=np.float32)
    padded[:n, :n] = adj
    nb = pad // block
    tiles = padded.reshape(nb, block, nb, block).transpose(0, 2, 1, 3)
    mask = np.abs(tiles).sum(axis=(2, 3)) > 0
    rows, cols = np.nonzero(mask)
    return BSRGraph(
        values=tiles[rows, cols].astype(np.float32),
        row_of=rows.astype(np.int32),
        col_of=cols.astype(np.int32),
        num_nodes=n,
        block=block,
    )


def random_spatial_graph(
    num_nodes: int,
    avg_degree: int = 16,
    locality: int = 256,
    num_hubs: int = 8,
    hub_fraction: float = 0.05,
    seed: int = 0,
    block: int = 128,
    split: str = None,
) -> Tuple["BSRGraph", int]:
    """Spatially-local graph + a few hub nodes (power-law-ish degree).

    Mirrors real geographic graphs: most edges connect nearby node ids
    (|dst - src| < locality), a small fraction lands on global hub nodes.
    This keeps BSR tiles dense — the right benchmark shape; a scattered
    power-law pattern makes 128x128 tiles ~0.04% full and BSR pathological
    (use ordering/clustering preprocessing for such graphs).

    split='hub' | 'tail' returns the hybrid-partitioned form instead
    (ops/hybrid.py — HybridGraph / TailGraph; build_sparse_atgcn and
    spmm_hybrid / spmm_tail_hybrid consume either).
    """
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    n_local = int(num_edges * (1 - hub_fraction))
    src_local = rng.integers(0, num_nodes, n_local)
    offset = rng.integers(-locality, locality + 1, n_local)
    dst_local = np.clip(src_local + offset, 0, num_nodes - 1)
    n_hub = num_edges - n_local
    src_hub = rng.integers(0, num_nodes, n_hub)
    hubs = rng.integers(0, num_nodes, num_hubs)
    dst_hub = hubs[rng.integers(0, num_hubs, n_hub)]
    src = np.concatenate([src_local, src_hub])
    dst = np.concatenate([dst_local, dst_hub])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    if split == "hub":
        from multistgraph_tpu.ops.hybrid import split_hub_columns

        return split_hub_columns(src, dst, w, num_nodes, block), num_edges
    if split == "tail":
        from multistgraph_tpu.ops.hybrid import split_scattered_tail

        return split_scattered_tail(src, dst, w, num_nodes, block), num_edges
    if split == "band":
        from multistgraph_tpu.ops.band import split_band

        return split_band(src, dst, w, num_nodes, block), num_edges
    graph = bsr_from_coo(src, dst, w, num_nodes, block)
    return graph, num_edges


def random_powerlaw_graph(
    num_nodes: int, avg_degree: int = 16, seed: int = 0, block: int = 128
) -> Tuple[BSRGraph, int]:
    """Synthetic power-law-degree graph (BASELINE.json configs 4-5).

    Preferential-attachment-style destination sampling via a Zipf-distributed
    popularity; returns (graph, num_edges).
    """
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    src = rng.integers(0, num_nodes, num_edges)
    # Zipf popularity ranking with random permutation of node ids.
    ranks = rng.zipf(1.5, num_edges).astype(np.int64) % num_nodes
    perm = rng.permutation(num_nodes)
    dst = perm[ranks]
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    graph = bsr_from_coo(src, dst, w, num_nodes, block)
    return graph, num_edges
