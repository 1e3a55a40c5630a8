"""Multi-chip SpMM: row-partitioned BSR graph over a device mesh.

BASELINE.json config 5: million-node synthetic graph, edge-partitioned across
N>=2 hosts. Design (TPU-first, no NCCL-style hand-rolled comms):

  * row-blocks of the BSR graph are partitioned contiguously across the
    'node' mesh axis — each device owns its output rows and the blocks that
    produce them (edge partition by destination row);
  * node features are sharded by row; each device all-gathers the feature
    shards over ICI (XLA collective from shard_map), then runs the
    single-chip Pallas SpMM on its local blocks;
  * shards are padded to a common nnz_blocks count with zero-value blocks so
    the compiled program is identical on every device (SPMD).

The all-gather exchanges the full X once per SpMM — the simplest correct
program, used as the baseline; ops/spmm_boundary.py implements the
boundary-set-optimized exchange (send only the column blocks each peer
references, overlappable with local aggregation).
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
class ShardedBSR:
    """Device-stacked shard arrays, leading axis = shard index."""

    values: np.ndarray    # (S, max_nnz, block, block)
    row_of: np.ndarray    # (S, max_nnz) — LOCAL row-block indices
    col_of: np.ndarray    # (S, max_nnz) — GLOBAL col-block indices
    row_blocks_per_shard: int
    block: int
    num_shards: int
    boundary_fraction: float  # mean fraction of remote column blocks referenced


def partition_bsr(graph: BSRGraph, num_shards: int) -> ShardedBSR:
    """Contiguous row-block partition with equal-size zero padding per shard."""
    if graph.num_row_blocks % num_shards:
        raise ValueError(
            "num_row_blocks {} not divisible by {} shards".format(
                graph.num_row_blocks, num_shards
            )
        )
    per = graph.num_row_blocks // num_shards
    values: List[np.ndarray] = []
    rows: List[np.ndarray] = []
    cols: List[np.ndarray] = []
    remote_frac = []
    for s in range(num_shards):
        mask = (graph.row_of >= s * per) & (graph.row_of < (s + 1) * per)
        v = graph.values[mask]
        r = graph.row_of[mask] - s * per
        c = graph.col_of[mask]
        own = (c >= s * per) & (c < (s + 1) * per)
        remote_frac.append(1.0 - own.mean() if len(own) else 0.0)
        # Guarantee every local row block appears at least once: the Pallas
        # kernel's revisited-output pattern only zero-initializes rows it
        # visits, so uncovered rows would return uninitialized tiles.
        missing = np.setdiff1d(np.arange(per, dtype=np.int32), r)
        if len(missing):
            v = np.concatenate([v, np.zeros((len(missing), graph.block, graph.block), np.float32)])
            c = np.concatenate([c, np.zeros(len(missing), np.int32)])
            r = np.concatenate([r, missing])
            order = np.argsort(r, kind="stable")
            v, r, c = v[order], r[order], c[order]
        values.append(v)
        rows.append(r)
        cols.append(c)
    max_nnz = max(max(len(v) for v in values), 1)
    S = num_shards
    b = graph.block
    out_v = np.zeros((S, max_nnz, b, b), dtype=np.float32)
    out_r = np.zeros((S, max_nnz), dtype=np.int32)
    out_c = np.zeros((S, max_nnz), dtype=np.int32)
    for s in range(S):
        n = len(values[s])
        out_v[s, :n] = values[s]
        out_r[s, :n] = rows[s]
        out_c[s, :n] = cols[s]
        # zero-value padding accumulates nothing; park it on the shard's last
        # row so the revisited-output predicate stays monotone.
        out_r[s, n:] = per - 1
        out_c[s, n:] = 0
    return ShardedBSR(
        values=out_v, row_of=out_r, col_of=out_c,
        row_blocks_per_shard=per, block=b, num_shards=S,
        boundary_fraction=float(np.mean(remote_frac)),
    )


def sharded_spmm(sharded: ShardedBSR, x, mesh: Mesh, axis: str = "node", interpret: bool = False):
    """Y = A @ X with A row-partitioned over `axis` and X row-sharded.

    x: (padded_nodes, feat) logically; passed sharded P(axis, None).
    Returns y with the same sharding.
    """
    n_shards = sharded.num_shards
    block = sharded.block

    def shard_fn(values, row_of, col_of, x_shard):
        # values (1, max_nnz, b, b) etc. — drop the shard axis
        values = values[0]
        row_of = row_of[0]
        col_of = col_of[0]
        x_full = jax.lax.all_gather(x_shard, axis, axis=0, tiled=True)
        return spmm(values, row_of, col_of, x_full, block=block, interpret=interpret)[
            : sharded.row_blocks_per_shard * block
        ]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis, None)),
        out_specs=P(axis, None),
        # pallas_call can't express varying-mesh-axes metadata yet
        check_vma=False,
    )
    return fn(
        jnp.asarray(sharded.values),
        jnp.asarray(sharded.row_of),
        jnp.asarray(sharded.col_of),
        x,
    )


def sharded_spmm_reference(graph: BSRGraph, x: np.ndarray) -> np.ndarray:
    dense = graph.to_dense()
    n = graph.padded_nodes
    full = np.zeros((n, n), dtype=np.float32)
    full[: graph.num_nodes, : graph.num_nodes] = dense
    return full @ x
