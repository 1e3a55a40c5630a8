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
SPMD-identical program on every shard).
"""

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from multistgraph_tpu.ops.bsr import BSRGraph
from multistgraph_tpu.ops.spmm import spmm


@dataclass(frozen=True)
class BoundaryShardedBSR:
    """Per-shard arrays stacked on a leading shard axis S."""

    # local-edge blocks (col owned by the shard): col index into x_local
    local_values: np.ndarray   # (S, max_local, b, b)
    local_row: np.ndarray      # (S, max_local)
    local_col: np.ndarray      # (S, max_local) — LOCAL col-block indices
    # remote-edge blocks: col index into the received boundary buffer
    remote_values: np.ndarray  # (S, max_remote, b, b)
    remote_row: np.ndarray     # (S, max_remote)
    remote_col: np.ndarray     # (S, max_remote) — index into recv buffer
    # exchange plan: for each (src, dst), which of src's local blocks to send
    send_idx: np.ndarray       # (S, S, max_send) — row-block ids local to src
    row_blocks_per_shard: int
    max_send: int
    block: int
    num_shards: int
    boundary_fraction: float   # exchanged blocks / all column blocks


def partition_bsr_boundary(graph: BSRGraph, num_shards: int) -> BoundaryShardedBSR:
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
    local: List[List] = [[] for _ in range(S)]    # (values, local_row, local_col)
    remote: List[List] = [[] for _ in range(S)]   # (values, local_row, global_col)
    needed = [set() for _ in range(S)]             # remote col blocks per shard
    for v, r, c in zip(graph.values, graph.row_of, graph.col_of):
        s = r // per
        if s * per <= c < (s + 1) * per:
            local[s].append((v, r - s * per, c - s * per))
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
        max_n = max(max((len(e) for e in edge_lists), default=0), 1)
        if coverage_rows:
            max_n = max(max_n, per)  # room for one zero block per row
        vals = np.zeros((S, max_n, b, b), np.float32)
        rows = np.full((S, max_n), per - 1, np.int32)
        cols = np.zeros((S, max_n), np.int32)
        for s, edges in enumerate(edge_lists):
            r_arr = np.array([e[1] for e in edges], np.int32)
            if coverage_rows:
                # zero blocks for uncovered rows (revisited-output init)
                missing = np.setdiff1d(np.arange(per, dtype=np.int32), r_arr)
                edges = edges + [(np.zeros((b, b), np.float32), int(m), None) for m in missing]
            edges.sort(key=lambda e: e[1])
            for i, (v, r, c) in enumerate(edges):
                vals[s, i] = v
                rows[s, i] = r
                cols[s, i] = 0 if c is None else (col_lookup[s][c] if col_lookup else c)
        return vals, rows, cols

    local_vals, local_rows, local_cols = pack(local)
    remote_lookup = recv_pos
    remote_vals, remote_rows, remote_cols = pack(remote, col_lookup=remote_lookup)

    send_idx = np.zeros((S, S, max_send), np.int32)
    for src in range(S):
        for dst in range(S):
            for p, c in enumerate(send_sets[src][dst]):
                send_idx[src, dst, p] = c - src * per  # local block id at src

    total_cols = graph.num_row_blocks * S  # worst case: every shard needs all
    exchanged = sum(len(s) for row in send_sets for s in row)
    return BoundaryShardedBSR(
        local_values=local_vals, local_row=local_rows, local_col=local_cols,
        remote_values=remote_vals, remote_row=remote_rows, remote_col=remote_cols,
        send_idx=send_idx, row_blocks_per_shard=per, max_send=max_send,
        block=b, num_shards=S,
        boundary_fraction=exchanged / max(total_cols, 1),
    )


def boundary_spmm(
    sharded: BoundaryShardedBSR, x, mesh: Mesh, axis: str = "node", interpret: bool = False
):
    """Y = A @ X with boundary exchange; x sharded P(axis, None) by rows."""
    per = sharded.row_blocks_per_shard
    b = sharded.block
    S = sharded.num_shards

    def shard_fn(lv, lr, lc, rv, rr, rc, send_idx, x_shard):
        lv, lr, lc = lv[0], lr[0], lc[0]
        rv, rr, rc = rv[0], rr[0], rc[0]
        send_idx = send_idx[0]  # (S, max_send) local block ids to send to each dst
        feat = x_shard.shape[-1]
        x_blocks = x_shard.reshape(per, b, feat)

        # Pack outgoing boundary features and exchange: slot j of the result
        # holds what shard j sent to us.
        outgoing = x_blocks[send_idx.reshape(-1)].reshape(S, sharded.max_send, b, feat)
        received = jax.lax.all_to_all(outgoing, axis, split_axis=0, concat_axis=0, tiled=False)
        recv_flat = received.reshape(S * sharded.max_send * b, feat)

        # Local aggregation uses only resident features — overlappable with
        # the all_to_all; remote aggregation consumes the received buffer.
        y_local = spmm(lv, lr, lc, x_shard, block=b, interpret=interpret)
        y_remote = spmm(rv, rr, rc, recv_flat, block=b, interpret=interpret)
        return y_local[: per * b] + y_remote[: per * b]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(
        jnp.asarray(sharded.local_values), jnp.asarray(sharded.local_row),
        jnp.asarray(sharded.local_col), jnp.asarray(sharded.remote_values),
        jnp.asarray(sharded.remote_row), jnp.asarray(sharded.remote_col),
        jnp.asarray(sharded.send_idx), x,
    )
