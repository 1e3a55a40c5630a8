"""Boundary-exchange multi-chip SpMM: send only the node features peers need.

The north-star communication pattern (BASELINE.json config 5): the graph is
edge-partitioned by destination row across the 'node' mesh axis; instead of
all-gathering the full feature matrix (ops/spmm_sharded.py), each shard
exchanges exactly the column blocks its peers reference — a static, per-graph
boundary set — via one `lax.all_to_all`. The local-edge aggregation depends
only on resident features, so XLA can overlap it with the exchange; the
remote-edge aggregation consumes the received buffer and the two partial
results add.

All indexing is precomputed host-side by the partitioner (static shapes,
SPMD-identical program on every shard). Beyond the raw `boundary_spmm`,
`boundary_aggregate` is the model-facing op: ONE feature exchange amortized
over the identity view, the static support, and the adaptive
SDDMM->masked-row-softmax->SpMM view (the sparse analogue of the reference's
dense softmax(relu(E1 E2^T)) adjacency, MultiATGCN.py:80-83), all under a
single shard_map so a whole SparseATGCN training step runs edge-partitioned.
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from multistgraph_tpu.ops.bsr import BSRGraph
from multistgraph_tpu.ops.spmm import sddmm_relu, spmm


@dataclass(frozen=True)
class BoundaryShardedBSR:
    """Per-shard arrays stacked on a leading shard axis S.

    The PATTERN (rows/cols/masks/exchange plan) is shared by every support
    that lives on this graph; `local_values`/`remote_values` hold the static
    support's weights at the pattern's slots. Padded slots have mask 0,
    row = per-1 and col = 0 with zero values (safe no-ops for SpMM; the
    adaptive path masks them out explicitly).
    """

    # local-edge blocks (col owned by the shard): col index into x_local
    local_values: np.ndarray   # (S, max_local, b, b)
    local_row: np.ndarray      # (S, max_local) — shard-local row-block ids
    local_col: np.ndarray      # (S, max_local) — shard-LOCAL col-block ids
    local_gcol: np.ndarray     # (S, max_local) — GLOBAL col-block ids
    local_mask: np.ndarray     # (S, max_local) float32, 1 = real edge block
    # remote-edge blocks: col index into the received boundary buffer
    remote_values: np.ndarray  # (S, max_remote, b, b)
    remote_row: np.ndarray     # (S, max_remote)
    remote_col: np.ndarray     # (S, max_remote) — slot in recv buffer
    remote_gcol: np.ndarray    # (S, max_remote) — GLOBAL col-block ids
    remote_mask: np.ndarray    # (S, max_remote) float32
    # exchange plan: for each (src, dst), which of src's local blocks to send
    send_idx: np.ndarray       # (S, S, max_send) — row-block ids local to src
    row_blocks_per_shard: int
    max_send: int
    block: int
    num_shards: int
    boundary_fraction: float   # exchanged blocks / all column blocks
    # hub-split extension (ops/hybrid.py): dense skinny hub columns of the
    # static support. Hub columns are exactly the edges every shard needs,
    # so extracting them shrinks the boundary exchange ~3x (DESIGN §5); the
    # hub features are rebuilt with ONE (H, F) psum of masked local gathers.
    hub_values: Optional[np.ndarray] = None   # (S, per*b, H) row-sharded
    hub_lidx: Optional[np.ndarray] = None     # (S, H) owner-local row ids
    hub_lmask: Optional[np.ndarray] = None    # (S, H) 1 where shard owns hub
    # scattered-tail extension (ops/hybrid.py TailGraph, round 4): singleton
    # COO edges partitioned by DESTINATION row shard. Unlike the BSR
    # boundary (whole 128-row column blocks), the tail exchanges individual
    # x ROWS — a scattered edge must not inflate the exchange by 128x. Local
    # edges read resident rows; remote edges read a row all_to_all'd from
    # its owner. Padding slots carry weight 0 (a no-op contribution) and the
    # max row id so the sorted-segment-sum invariant survives padding.
    tail_local_w: Optional[np.ndarray] = None    # (S, max_tl) f32
    tail_local_src: Optional[np.ndarray] = None  # (S, max_tl) shard-local out rows, sorted
    tail_local_dst: Optional[np.ndarray] = None  # (S, max_tl) shard-local col node ids
    tail_remote_w: Optional[np.ndarray] = None   # (S, max_tr) f32
    tail_remote_src: Optional[np.ndarray] = None # (S, max_tr) shard-local out rows, sorted
    tail_remote_dst: Optional[np.ndarray] = None # (S, max_tr) slot in tail recv buffer
    tail_send_idx: Optional[np.ndarray] = None   # (S, S, max_tsend) owner-local node ids
    # band extension (ops/band.py BandGraph, round 4): offset diagonals are a
    # STENCIL — a shard's band tiles reference at most `band_radius` blocks
    # past each end of its own rows, so the exchange is a neighbor halo
    # (two ppermutes), not an all_to_all. band_offsets stays host-side
    # static (it selects slice positions under jit).
    band_values: Optional[np.ndarray] = None     # (S, O, per, b, b) row-sharded
    band_offsets: Optional[Tuple[int, ...]] = None  # STATIC block offsets
    band_radius: int = 0

    def graph_arrays(self) -> Dict[str, np.ndarray]:
        """The stacked arrays a model stores in its 'graph' variable
        collection (shipped to device as ARGUMENTS, leading axis sharded
        over the node mesh axis — never baked in as compile-time constants)."""
        arrs = {
            "local_values": self.local_values, "local_row": self.local_row,
            "local_col": self.local_col, "local_gcol": self.local_gcol,
            "local_mask": self.local_mask,
            "remote_values": self.remote_values, "remote_row": self.remote_row,
            "remote_col": self.remote_col, "remote_gcol": self.remote_gcol,
            "remote_mask": self.remote_mask, "send_idx": self.send_idx,
        }
        if self.hub_values is not None:
            arrs.update(hub_values=self.hub_values, hub_lidx=self.hub_lidx,
                        hub_lmask=self.hub_lmask)
        if self.tail_local_w is not None:
            arrs.update(
                tail_local_w=self.tail_local_w,
                tail_local_src=self.tail_local_src,
                tail_local_dst=self.tail_local_dst,
                tail_remote_w=self.tail_remote_w,
                tail_remote_src=self.tail_remote_src,
                tail_remote_dst=self.tail_remote_dst,
                tail_send_idx=self.tail_send_idx,
            )
        if self.band_values is not None:
            arrs.update(band_values=self.band_values)
        return arrs


def _partition_tail(tail_src, tail_dst, tail_w, num_shards: int,
                    per_nodes: int) -> Dict[str, np.ndarray]:
    """Partition COO tail edges (Y[src] += w * X[dst]) by destination-row
    shard. Returns the padded per-shard arrays of BoundaryShardedBSR's tail
    fields: local edges index resident x rows; remote edges index the slot
    the owner's row lands in after the tail all_to_all (tail_send_idx)."""
    S = num_shards
    tail_src = np.asarray(tail_src, np.int64)
    tail_dst = np.asarray(tail_dst, np.int64)
    tail_w = np.asarray(tail_w, np.float32)
    owner = tail_src // per_nodes      # shard that outputs the row
    col_owner = tail_dst // per_nodes  # shard that holds the source feature
    is_local = owner == col_owner

    # rows that must travel: per destination shard, the unique remote cols
    # (np.unique is sorted, so per source shard they are a contiguous run)
    needed = [np.unique(tail_dst[(owner == s) & ~is_local]) for s in range(S)]
    send_sets = [[needed[dst][needed[dst] // per_nodes == src]
                  for dst in range(S)] for src in range(S)]
    max_tsend = max(max((len(s) for row in send_sets for s in row), default=0), 1)

    def pack(local: bool):
        per_lists = []
        for s in range(S):
            sel = (owner == s) & (is_local if local else ~is_local)
            order = np.argsort(tail_src[sel], kind="stable")
            rows = tail_src[sel][order] - s * per_nodes
            cols = tail_dst[sel][order]
            if local:
                cols = cols - s * per_nodes
            else:
                # recv slot: (source shard j) * max_tsend + rank within what
                # j sends to us (send_sets[j][s] is sorted — searchsorted)
                slots = np.empty(len(cols), np.int64)
                j_of = cols // per_nodes
                for j in range(S):
                    m = j_of == j
                    slots[m] = j * max_tsend + np.searchsorted(
                        send_sets[j][s], cols[m])
                cols = slots
            per_lists.append((tail_w[sel][order], rows, cols))
        max_n = max(max((len(w) for w, _, _ in per_lists), default=0), 1)
        ws = np.zeros((S, max_n), np.float32)
        srcs = np.full((S, max_n), per_nodes - 1, np.int32)  # pad keeps sorted
        dsts = np.zeros((S, max_n), np.int32)
        for s, (w, r, c) in enumerate(per_lists):
            n = len(w)
            ws[s, :n], srcs[s, :n], dsts[s, :n] = w, r, c
        return ws, srcs, dsts

    tl_w, tl_src, tl_dst = pack(local=True)
    tr_w, tr_src, tr_dst = pack(local=False)

    tail_send_idx = np.zeros((S, S, max_tsend), np.int32)
    for src in range(S):
        for dst in range(S):
            cs = send_sets[src][dst]
            tail_send_idx[src, dst, :len(cs)] = cs - src * per_nodes
    return dict(
        tail_local_w=tl_w, tail_local_src=tl_src, tail_local_dst=tl_dst,
        tail_remote_w=tr_w, tail_remote_src=tr_src, tail_remote_dst=tr_dst,
        tail_send_idx=tail_send_idx,
    )


def partition_bsr_boundary(graph, num_shards: int) -> BoundaryShardedBSR:
    """graph: BSRGraph; HybridGraph (ops/hybrid.py) to edge-partition the
    hub-split remainder and row-shard the dense hub columns; TailGraph to
    additionally route scattered COO edges through a per-row tail exchange;
    or BandGraph (ops/band.py) — the offset diagonals become a row-sharded
    stencil with neighbor-halo exchange and the COO remainder is hub/tail
    split exactly as build_sparse_atgcn does single-chip."""
    from multistgraph_tpu.ops.band import BandGraph
    from multistgraph_tpu.ops.bsr import BSRGraph, bsr_from_coo
    from multistgraph_tpu.ops.hybrid import HybridGraph, TailGraph, split_hub_columns

    hub_cols = hub_vals_full = None
    tail_parts = band_kwargs = None
    if isinstance(graph, BandGraph):
        per = graph.num_row_blocks // num_shards
        radius = int(max((abs(int(o)) for o in graph.offsets), default=0))
        if graph.num_row_blocks % num_shards:
            raise ValueError("num_row_blocks {} not divisible by {} shards"
                             .format(graph.num_row_blocks, num_shards))
        if radius > per:
            raise ValueError(
                "band radius {} exceeds {} row blocks per shard — the halo "
                "exchange only reaches immediate neighbors; use fewer shards "
                "or a narrower band".format(radius, per))
        O, R, b, _ = graph.band_values.shape
        band_kwargs = dict(
            band_values=np.ascontiguousarray(
                graph.band_values.reshape(O, num_shards, per, b, b)
                .transpose(1, 0, 2, 3, 4)),
            band_offsets=tuple(int(o) for o in graph.offsets),
            band_radius=radius,
        )
        # COO remainder: same hub/tail decomposition as the single-chip
        # builder (models/sparse_atgcn.py build_sparse_atgcn)
        hy = split_hub_columns(graph.rest_src, graph.rest_dst, graph.rest_w,
                               graph.num_nodes, graph.block)
        if hy.num_hubs > 0:
            hub_cols, hub_vals_full = hy.hub_cols, hy.hub_values
        non_hub = ~np.isin(graph.rest_dst, hy.hub_cols)
        tail_parts = (graph.rest_src[non_hub], graph.rest_dst[non_hub],
                      graph.rest_w[non_hub])
        # no BSR component: the pack() below pads a single zero slot per shard
        graph = bsr_from_coo(np.zeros(0, np.int64), np.zeros(0, np.int64),
                             np.zeros(0, np.float32), graph.num_nodes,
                             graph.block)
    elif isinstance(graph, TailGraph):
        tail_parts = (graph.tail_src, graph.tail_dst, graph.tail_w)
        graph = graph.bsr
    elif isinstance(graph, HybridGraph):
        if graph.num_hubs > 0:
            hub_cols, hub_vals_full = graph.hub_cols, graph.hub_values
        graph = graph.bsr
    elif not isinstance(graph, BSRGraph):
        raise TypeError(
            "partition_bsr_boundary supports BSRGraph, HybridGraph, TailGraph "
            "and BandGraph; got {}".format(type(graph).__name__))
    if graph.num_row_blocks % num_shards:
        raise ValueError(
            "num_row_blocks {} not divisible by {} shards".format(
                graph.num_row_blocks, num_shards
            )
        )
    per = graph.num_row_blocks // num_shards
    S = num_shards
    b = graph.block

    # Per-shard edge lists split into local/remote by column ownership.
    local: List[List] = [[] for _ in range(S)]    # (values, local_row, local_col, global_col)
    remote: List[List] = [[] for _ in range(S)]   # (values, local_row, global_col)
    needed = [set() for _ in range(S)]             # remote col blocks per shard
    for v, r, c in zip(graph.values, graph.row_of, graph.col_of):
        s = r // per
        if s * per <= c < (s + 1) * per:
            local[s].append((v, r - s * per, c - s * per, c))
        else:
            remote[s].append((v, r - s * per, c))
            needed[s].add(int(c))

    # Exchange plan: send_sets[src][dst] = sorted cols owned by src, needed by dst.
    send_sets = [[sorted(c for c in needed[dst] if src * per <= c < (src + 1) * per)
                  for dst in range(S)] for src in range(S)]
    max_send = max((len(s) for row in send_sets for s in row), default=0)
    max_send = max(max_send, 1)

    # recv buffer layout for shard dst: slot (src, p) -> send_sets[src][dst][p]
    recv_pos = [dict() for _ in range(S)]
    for dst in range(S):
        for src in range(S):
            for p, c in enumerate(send_sets[src][dst]):
                recv_pos[dst][c] = src * max_send + p

    def pack(edge_lists, col_lookup=None, coverage_rows=True):
        """edge entries: (values, local_row, col, global_col?) where col is
        translated through col_lookup when given; padding/coverage entries
        get mask 0."""
        if coverage_rows:
            # each shard holds its edges PLUS one zero block per uncovered
            # row — size the buffer for the sum, not the max of the two
            # (a shard with many edges over partial row coverage needs both)
            totals = [len(edges) + per - len({e[1] for e in edges})
                      for edges in edge_lists]
            max_n = max(max(totals, default=0), 1)
        else:
            max_n = max(max((len(e) for e in edge_lists), default=0), 1)
        vals = np.zeros((S, max_n, b, b), np.float32)
        rows = np.full((S, max_n), per - 1, np.int32)
        cols = np.zeros((S, max_n), np.int32)
        gcols = np.zeros((S, max_n), np.int32)
        masks = np.zeros((S, max_n), np.float32)
        for s, edges in enumerate(edge_lists):
            edges = [e if len(e) == 4 else (e[0], e[1], e[2], e[2]) for e in edges]
            r_arr = np.array([e[1] for e in edges], np.int32)
            if coverage_rows:
                # zero blocks for uncovered rows (revisited-output init)
                missing = np.setdiff1d(np.arange(per, dtype=np.int32), r_arr)
                edges = edges + [
                    (np.zeros((b, b), np.float32), int(m), None, None) for m in missing
                ]
            edges.sort(key=lambda e: e[1])
            for i, (v, r, c, gc) in enumerate(edges):
                vals[s, i] = v
                rows[s, i] = r
                cols[s, i] = 0 if c is None else (col_lookup[s][c] if col_lookup else c)
                gcols[s, i] = 0 if gc is None else gc
                masks[s, i] = 0.0 if c is None else 1.0
        return vals, rows, cols, gcols, masks

    local_vals, local_rows, local_cols, local_gcols, local_masks = pack(local)
    remote_vals, remote_rows, remote_cols, remote_gcols, remote_masks = pack(
        remote, col_lookup=recv_pos
    )

    send_idx = np.zeros((S, S, max_send), np.int32)
    for src in range(S):
        for dst in range(S):
            for p, c in enumerate(send_sets[src][dst]):
                send_idx[src, dst, p] = c - src * per  # local block id at src

    total_cols = graph.num_row_blocks * S  # worst case: every shard needs all
    exchanged = sum(len(s) for row in send_sets for s in row)

    hub_kwargs = {}
    if hub_cols is not None:
        per_nodes = per * b
        owner = np.asarray(hub_cols, np.int64) // per_nodes
        hub_lidx = np.zeros((S, len(hub_cols)), np.int32)
        hub_lmask = np.zeros((S, len(hub_cols)), np.float32)
        for s in range(S):
            own = owner == s
            hub_lidx[s, own] = (hub_cols[own] - s * per_nodes).astype(np.int32)
            hub_lmask[s, own] = 1.0
        hub_kwargs = dict(
            hub_values=np.ascontiguousarray(
                hub_vals_full.reshape(S, per_nodes, -1)),
            hub_lidx=hub_lidx, hub_lmask=hub_lmask,
        )

    tail_kwargs = {}
    if tail_parts is not None:
        tail_kwargs = _partition_tail(*tail_parts, num_shards=S,
                                      per_nodes=per * b)
    if band_kwargs is None:
        band_kwargs = {}

    return BoundaryShardedBSR(
        local_values=local_vals, local_row=local_rows, local_col=local_cols,
        local_gcol=local_gcols, local_mask=local_masks,
        remote_values=remote_vals, remote_row=remote_rows, remote_col=remote_cols,
        remote_gcol=remote_gcols, remote_mask=remote_masks,
        send_idx=send_idx, row_blocks_per_shard=per, max_send=max_send,
        block=b, num_shards=S,
        boundary_fraction=exchanged / max(total_cols, 1),
        **hub_kwargs, **tail_kwargs, **band_kwargs,
    )


def _exchange(x_blocks, send_idx, axis: str, max_send: int, num_shards: int):
    """Pack outgoing boundary blocks and all_to_all them; returns the flat
    receive buffer (S * max_send * b, feat): slot (j, p) holds block p of
    what shard j sent to us."""
    b, feat = x_blocks.shape[1], x_blocks.shape[2]
    outgoing = x_blocks[send_idx.reshape(-1)].reshape(num_shards, max_send, b, feat)
    received = jax.lax.all_to_all(outgoing, axis, split_axis=0, concat_axis=0, tiled=False)
    return received.reshape(num_shards * max_send * b, feat)


def boundary_adaptive_values(
    arrs: Dict[str, jnp.ndarray],
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    mesh: Mesh,
    axis: str = "node",
    block: int = 128,
    interpret: bool = False,
    dense_corrected: bool = False,
    num_nodes: int = 0,
):
    """Adaptive-view edge weights at the partition's pattern slots.

    The sparse analogue of the reference's dense softmax(relu(E1 E2^T))
    adjacency (MultiATGCN.py:80-83), computed shard-locally: SDDMM at the
    shard's own (global-id) block slots, then a masked sparse row softmax —
    rows never straddle shards, so normalization needs NO collective.
    Returns (vals_local (S, max_local, b, b), vals_remote (S, max_remote,
    b, b), background), sharded over `axis`; background is None for the
    sampled softmax, or the (S, per*b) rank-1 exp(0) term of the EXACT
    dense reference semantics when dense_corrected (see
    ops/spmm.py:sparse_row_softmax_dense_corrected). Called ONCE per
    forward; the per-step aggregation reuses the values. Differentiable
    w.r.t. E1/E2 (replicated inputs — shard_map's transpose inserts the
    gradient psum).
    """
    S = mesh.shape[axis]

    def shard_fn(arrs, e1, e2):
        a = {k: v[0] for k, v in arrs.items()}
        n_per = e1.shape[0] // (block * S)  # row blocks per shard
        my_shard = jax.lax.axis_index(axis)
        grow_l = a["local_row"] + my_shard * n_per
        grow_r = a["remote_row"] + my_shard * n_per
        raw_l = sddmm_relu(e1, e2, grow_l, a["local_gcol"], block=block, interpret=interpret)
        raw_r = sddmm_relu(e1, e2, grow_r, a["remote_gcol"], block=block, interpret=interpret)
        # masked row normalization with padding slots excluded (masks);
        # sampled: exp over real positive scores / their row sum;
        # dense_corrected: (exp-1)/Z with Z = N + row sum (exact reference).
        f = jnp.expm1 if dense_corrected else jnp.exp
        exp_l = jnp.where(raw_l > 0, f(raw_l), 0.0) * a["local_mask"][:, None, None]
        exp_r = jnp.where(raw_r > 0, f(raw_r), 0.0) * a["remote_mask"][:, None, None]
        totals = (
            jax.ops.segment_sum(exp_l.sum(axis=2), a["local_row"], num_segments=n_per)
            + jax.ops.segment_sum(exp_r.sum(axis=2), a["remote_row"], num_segments=n_per)
        )
        if dense_corrected:
            z = num_nodes + totals
            vals_l = exp_l / z[a["local_row"]][:, :, None]
            vals_r = exp_r / z[a["remote_row"]][:, :, None]
            return vals_l[None], vals_r[None], (1.0 / z).reshape(1, -1)
        vals_l = exp_l / jnp.maximum(totals[a["local_row"]], 1e-9)[:, :, None]
        vals_r = exp_r / jnp.maximum(totals[a["remote_row"]], 1e-9)[:, :, None]
        return vals_l[None], vals_r[None], jnp.zeros((1, n_per * block), e1.dtype)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=({k: P(axis) for k in arrs}, P(None, None), P(None, None)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    vals_l, vals_r, background = fn(arrs, e1, e2)
    return vals_l, vals_r, (background if dense_corrected else None)


def boundary_adaptive_band_values(
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    mesh: Mesh,
    axis: str = "node",
    block: int = 128,
    band_offsets: Tuple[int, ...] = (),
    dense_corrected: bool = False,
    num_nodes: int = 0,
):
    """Adaptive-view weights sampled at the BAND's diagonal pattern,
    computed shard-locally (round 4).

    E1/E2 are replicated parameters, so every shard can score its own
    diagonal tiles with ZERO communication: score_o[r] =
    relu(E1[rows of r] @ E2[:, cols of r+o]), masked to in-range diagonals,
    then the masked row softmax (rows never straddle shards). Returns
    (S, O, per, b, b) values sharded over `axis` (+ the (S, per*b)
    rank-1 background when dense_corrected), consumable by the band leg of
    boundary_aggregate. Differentiable w.r.t. E1/E2 (shard_map's transpose
    inserts the psum for the replicated inputs)."""
    S = mesh.shape[axis]
    offs = tuple(int(o) for o in band_offsets)
    n_total_blocks = e1.shape[0] // block
    per = n_total_blocks // S
    radius = max((abs(o) for o in offs), default=0)

    def shard_fn(e1, e2):
        my = jax.lax.axis_index(axis)
        d = e1.shape[1]
        e1b = e1.reshape(n_total_blocks, block, d)
        e1_loc = jax.lax.dynamic_slice_in_dim(e1b, my * per, per, axis=0)
        # zero-pad E2's block axis by radius so offset slices stay in range
        e2b = e2.reshape(d, n_total_blocks, block)
        e2p = jnp.pad(e2b, ((0, 0), (radius, radius), (0, 0)))
        scores = []
        for o in offs:
            e2s = jax.lax.dynamic_slice_in_dim(
                e2p, my * per + o + radius, per, axis=1)  # (d, per, b)
            scores.append(jnp.einsum("rid,drj->rij", e1_loc, e2s,
                                     preferred_element_type=jnp.float32))
        raw = jnp.stack(scores)  # (O, per, b, b)
        # validity: global col block 0 <= my*per + r + o < n_total_blocks
        r_idx = jnp.arange(per)
        valid = jnp.stack([
            (my * per + r_idx + o >= 0) & (my * per + r_idx + o < n_total_blocks)
            for o in offs])  # (O, per)
        f = jnp.expm1 if dense_corrected else jnp.exp
        exp = jnp.where((raw > 0) & valid[:, :, None, None], f(raw), 0.0)
        totals = exp.sum(axis=(0, 3))  # (per, b) row sums over offsets+cols
        if dense_corrected:
            z = num_nodes + totals
            vals = exp / z[None, :, :, None]
            return vals[None], (1.0 / z).reshape(1, -1)
        vals = exp / jnp.maximum(totals, 1e-9)[None, :, :, None]
        return vals[None], jnp.zeros((1, per * block), e1.dtype)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(None, None)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    vals, background = fn(e1, e2)
    return vals, (background if dense_corrected else None)


def boundary_aggregate(
    arrs: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "node",
    block: int = 128,
    adaptive_values: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    interpret: bool = False,
    band_offsets: Optional[Tuple[int, ...]] = None,
    band_radius: int = 0,
    adaptive_band: Optional[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = None,
):
    """(K, N_pad, F) stack [identity, static support, adaptive?] @ X with ONE
    boundary feature exchange shared by every view.

    arrs: the dict from BoundaryShardedBSR.graph_arrays() as device arrays
    (leading shard axis sharded over `axis`); x (N_pad, F) sharded over rows;
    adaptive_values: optional (vals_local, vals_remote, background) from
    boundary_adaptive_values — when background is present (dense-corrected
    softmax) its rank-1 term consumes ONE psum'd column sum of x. The
    local-edge SpMM depends only on resident features (XLA overlaps it with
    the all_to_all); the remote-edge SpMM consumes the receive buffer and
    the partials add. Differentiable w.r.t. x and adaptive_values.
    """
    S = mesh.shape[axis]
    per = x.shape[0] // S // block    # row blocks per shard
    max_send = arrs["send_idx"].shape[-1]
    has_adaptive = adaptive_values is not None
    has_background = has_adaptive and adaptive_values[2] is not None
    has_band_adp = adaptive_band is not None

    def shard_fn(arrs, x_shard, *opt):
        a = {k: v[0] for k, v in arrs.items()}
        feat = x_shard.shape[-1]
        recv_flat = _exchange(
            x_shard.reshape(per, block, feat), a["send_idx"], axis, max_send, S
        )

        def dual_spmm(lvals, rvals):
            y_local = spmm(lvals, a["local_row"], a["local_col"], x_shard,
                           block=block, interpret=interpret, out_blocks=per)
            y_remote = spmm(rvals, a["remote_row"], a["remote_col"], recv_flat,
                            block=block, interpret=interpret, out_blocks=per)
            return y_local + y_remote

        y_static = dual_spmm(jax.lax.stop_gradient(a["local_values"]),
                             jax.lax.stop_gradient(a["remote_values"]))
        if "hub_values" in a:
            # hub-split static support: rebuild the (H, F) hub feature rows
            # with one psum of masked owner-local gathers, then add the
            # dense skinny hub matmul (differentiable w.r.t. x through the
            # gather + psum transpose)
            hub_x = jax.lax.psum(
                jnp.take(x_shard, jax.lax.stop_gradient(a["hub_lidx"]), axis=0)
                * jax.lax.stop_gradient(a["hub_lmask"])[:, None],
                axis)
            y_static = y_static + jax.lax.stop_gradient(a["hub_values"]) @ hub_x
        if "tail_local_w" in a:
            # scattered COO tail (round 4): local edges read resident rows;
            # remote edges read their source row from a per-ROW all_to_all
            # (a scattered edge must not ride the 128-row block exchange).
            # Differentiable w.r.t. x: gather/segment-sum transpose to each
            # other, all_to_all transposes to the reverse all_to_all.
            sg = jax.lax.stop_gradient
            per_n = x_shard.shape[0]
            y_static = y_static + jax.ops.segment_sum(
                sg(a["tail_local_w"])[:, None]
                * jnp.take(x_shard, sg(a["tail_local_dst"]), axis=0),
                sg(a["tail_local_src"]), num_segments=per_n,
                indices_are_sorted=True).astype(y_static.dtype)
            max_tsend = a["tail_send_idx"].shape[-1]
            sent = jnp.take(x_shard, sg(a["tail_send_idx"]).reshape(-1),
                            axis=0).reshape(S, max_tsend, feat)
            recv = jax.lax.all_to_all(sent, axis, split_axis=0,
                                      concat_axis=0, tiled=False)
            recv = recv.reshape(S * max_tsend, feat)
            y_static = y_static + jax.ops.segment_sum(
                sg(a["tail_remote_w"])[:, None]
                * jnp.take(recv, sg(a["tail_remote_dst"]), axis=0),
                sg(a["tail_remote_src"]), num_segments=per_n,
                indices_are_sorted=True).astype(y_static.dtype)
        if "band_values" in a:
            # band stencil (round 4): a shard's offset diagonals reach at
            # most band_radius blocks past its own rows — exchange a
            # neighbor HALO via two ppermutes, then run the shared band
            # custom-VJP einsum on the locally padded x (ops/band.py).
            from multistgraph_tpu.ops.band import _band_vjp

            xb = x_shard.reshape(per, block, feat)
            if band_radius:
                my = jax.lax.axis_index(axis)
                fwd = [(i, (i + 1) % S) for i in range(S)]
                bwd = [(i, (i - 1) % S) for i in range(S)]
                left = jax.lax.ppermute(xb[-band_radius:], axis, fwd)
                right = jax.lax.ppermute(xb[:band_radius], axis, bwd)
                left = jnp.where(my == 0, 0.0, left)       # no wraparound
                right = jnp.where(my == S - 1, 0.0, right)
                xp = jnp.concatenate([left, xb, right], axis=0)
            else:
                xp = xb
            # use_xla=True: pin the einsum form inside shard_map — Pallas
            # under the multichip partitioner cannot be hardware-validated
            # on the single attached chip (ops/band.py:_pallas_mode)
            y_band = _band_vjp(jax.lax.stop_gradient(a["band_values"]), xp,
                               band_offsets, band_radius, True)
            y_static = y_static + y_band.reshape(per * block, feat).astype(
                y_static.dtype)
            band_opt = opt[n_bsr_opt:]
            if band_opt:
                # adaptive view sampled at the band pattern (round 4):
                # same halo'd xp, values from boundary_adaptive_band_values
                # (differentiable w.r.t. the values through the custom VJP)
                y_adp = _band_vjp(band_opt[0][0].astype(xp.dtype), xp,
                                  band_offsets, band_radius, True
                                  ).reshape(per * block, feat)
                if len(band_opt) == 2:  # dense-corrected rank-1 background
                    colsum = jax.lax.psum(
                        x_shard.sum(axis=0, keepdims=True), axis)
                    y_adp = y_adp + band_opt[1][0][:, None] * colsum
                y_band_adaptive = y_adp
        outs = [x_shard, y_static]
        bsr_opt = opt[:n_bsr_opt]
        if bsr_opt:
            y = dual_spmm(bsr_opt[0][0], bsr_opt[1][0])
            if len(bsr_opt) == 3:
                colsum = jax.lax.psum(x_shard.sum(axis=0, keepdims=True), axis)
                y = y + bsr_opt[2][0][:, None] * colsum
            outs.append(y)
        if has_band_adp:
            outs.append(y_band_adaptive.astype(x_shard.dtype))
        return jnp.stack(outs, axis=0)

    extra = ()
    extra_specs = ()
    if has_adaptive:
        extra = (adaptive_values[0], adaptive_values[1])
        extra_specs = (P(axis), P(axis))
        if has_background:
            extra = extra + (adaptive_values[2],)
            extra_specs = extra_specs + (P(axis),)
    n_bsr_opt = len(extra)
    if has_band_adp:
        extra = extra + (adaptive_band[0],)
        extra_specs = extra_specs + (P(axis),)
        if adaptive_band[1] is not None:
            extra = extra + (adaptive_band[1],)
            extra_specs = extra_specs + (P(axis),)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=({k: P(axis) for k in arrs}, P(axis, None)) + extra_specs,
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return fn(arrs, x, *extra)


def boundary_spmm(
    sharded: BoundaryShardedBSR, x, mesh: Mesh, axis: str = "node", interpret: bool = False
):
    """Y = A @ X with boundary exchange; x sharded P(axis, None) by rows.

    Standalone-op form (arrays captured as constants — fine for one-off use;
    models should route graph_arrays() through a variable collection and call
    boundary_aggregate so the arrays stay program arguments)."""
    arrs = {k: jnp.asarray(v) for k, v in sharded.graph_arrays().items()}
    out = boundary_aggregate(
        arrs, x, mesh, axis=axis, block=sharded.block, interpret=interpret
    )
    return out[1]
