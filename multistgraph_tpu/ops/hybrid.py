"""Hybrid BSR + skinny-dense SpMM for hub-dominated graphs.

Reference counterpart: none — the reference is dense-only (N<=403); this is
the TPU sparse scale path (BASELINE configs 4-5, docs/DESIGN.md §4/§9).

Why: a high-fan-in column ("hub" node everyone points at) places one
almost-empty 128x128 tile in nearly EVERY row block of a BSR matrix. At the
1M-node spatial benchmark the 8 hub nodes account for ~5% of edges but the
majority of streamed tile bytes — the measured reason the SpMM sits at ~68%
of the HBM ceiling (docs/DESIGN.md §9). Extracting those columns into a
dense SKINNY matrix turns their contribution into

    y += A[:, hubs] @ x[hubs]        # (P, H) @ (H, F) — one MXU matmul

whose traffic is P*H*4 bytes total instead of one block^2 tile per
(row block, hub) pair: ~block^2/H fewer bytes per hub edge, and the matmul
is dense-MXU work instead of sparse streaming.

Break-even per column: extraction costs padded_nodes floats; keeping it in
BSR costs (touched row blocks) * block^2 floats. Extract when
touched_row_blocks > padded_nodes / block^2 = num_row_blocks / block.
"""

from dataclasses import dataclass

import numpy as np

from multistgraph_tpu.ops.bsr import BSRGraph, bsr_from_coo

__all__ = [
    "HybridGraph",
    "TailGraph",
    "split_hub_columns",
    "split_scattered_tail",
    "spmm_hybrid",
    "spmm_tail",
    "spmm_tail_hybrid",
]


@dataclass(frozen=True)
class HybridGraph:
    bsr: BSRGraph          # the low-fan-in remainder
    hub_cols: np.ndarray   # (H,) int32 column node ids (original id space)
    hub_values: np.ndarray  # (padded_nodes, H) float32 = A[:, hub_cols]

    @property
    def num_hubs(self) -> int:
        return int(self.hub_cols.shape[0])

    @property
    def nnz_edges(self) -> int:
        return self.bsr.nnz_edges + int((self.hub_values != 0).sum())

    @property
    def padded_nodes(self) -> int:
        return self.bsr.padded_nodes

    @property
    def block(self) -> int:
        return self.bsr.block


def split_hub_columns(
    src: np.ndarray,
    dst: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block: int = 128,
    max_hubs: int = 64,
    min_row_blocks: int = None,
    native: bool = None,
) -> HybridGraph:
    """Partition COO edges into (BSR remainder, dense hub columns).

    A column is extracted when more than `min_row_blocks` distinct row
    blocks reference it (default num_row_blocks // block — the byte
    break-even above), capped at the `max_hubs` highest-fan-in columns
    (the dense part is (padded_nodes, H): keep H small).
    Duplicate edges accumulate, same as bsr_from_coo.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(weights, np.float32)
    n_blocks = -(-num_nodes // block)
    padded = n_blocks * block
    if min_row_blocks is None:
        min_row_blocks = max(1, n_blocks // block)

    # per column: how many DISTINCT row blocks touch it
    pair = (src // block) * padded + dst
    uniq = np.unique(pair)
    touched = np.bincount(uniq % padded, minlength=num_nodes)[:num_nodes]
    hubs = np.flatnonzero(touched > min_row_blocks)
    if len(hubs) > max_hubs:
        hubs = hubs[np.argsort(-touched[hubs], kind="stable")[:max_hubs]]
        hubs = np.sort(hubs)

    if len(hubs) == 0:
        bsr = bsr_from_coo(src, dst, w, num_nodes, block, native=native)
        return HybridGraph(
            bsr=bsr,
            hub_cols=np.zeros((0,), np.int32),
            hub_values=np.zeros((bsr.padded_nodes, 0), np.float32),
        )

    pos = np.full(num_nodes, -1, np.int64)
    pos[hubs] = np.arange(len(hubs))
    is_hub = pos[dst] >= 0
    hub_values = np.zeros((padded, len(hubs)), np.float32)
    np.add.at(hub_values, (src[is_hub], pos[dst[is_hub]]), w[is_hub])
    rest = ~is_hub
    bsr = bsr_from_coo(src[rest], dst[rest], w[rest], num_nodes, block,
                       native=native)
    return HybridGraph(bsr=bsr, hub_cols=hubs.astype(np.int32),
                       hub_values=hub_values)


@dataclass(frozen=True)
class TailGraph:
    """BSR for well-filled tiles + a COO tail for scattered singleton edges.

    Hub extraction (above) handles concentrated COLUMNS; this handles the
    complementary disease — edges scattered uniformly so each lands alone in
    its 128x128 tile. A scrambled planted-partition graph at 1M nodes needs
    >50 GB of value tiles under ANY node ordering because its ~10%
    cross-community edges are uniform random (tools/bench_reorder.py
    --family planted); routing exactly those edges through a gather +
    sorted-segment-sum makes the graph representable and leaves BSR only
    the tiles worth streaming.
    """

    bsr: BSRGraph
    tail_src: np.ndarray  # (E,) int32 row node ids, sorted ascending
    tail_dst: np.ndarray  # (E,) int32 column node ids
    tail_w: np.ndarray    # (E,) float32

    @property
    def num_tail_edges(self) -> int:
        return int(self.tail_w.shape[0])

    @property
    def nnz_edges(self) -> int:
        return self.bsr.nnz_edges + self.num_tail_edges

    @property
    def padded_nodes(self) -> int:
        return self.bsr.padded_nodes

    @property
    def block(self) -> int:
        return self.bsr.block


def split_scattered_tail(
    src: np.ndarray,
    dst: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block: int = 128,
    min_fill: int = None,
    native: bool = None,
) -> TailGraph:
    """Partition COO edges into (BSR of dense-enough tiles, COO tail).

    A tile keeps its edges in BSR when it holds at least `min_fill` of them;
    the rest become tail edges. Byte break-even per tile at feature width F:
    streaming it costs (block^2 + block*F)*4 bytes while a tail edge moves
    ~2*F*4 bytes (one x-row gather + one y-row update), so the ideal
    threshold is (block^2 + block*F) / (2F) ~= `block` when F == block.
    The default `block // 2` is deliberately below that: the segment-sum
    tail pays scatter overhead above its ideal byte cost, and a too-eager
    tail also shrinks the MXU work the BSR part amortizes its DMAs with.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(weights, np.float32)
    n_blocks = -(-num_nodes // block)
    if min_fill is None:
        min_fill = block // 2

    tile = (src // block) * n_blocks + dst // block
    _, inverse, counts = np.unique(tile, return_inverse=True,
                                   return_counts=True)
    in_tail = counts[inverse] < min_fill

    order = np.argsort(src[in_tail], kind="stable")
    keep = ~in_tail
    bsr = bsr_from_coo(src[keep], dst[keep], w[keep], num_nodes, block,
                       native=native)
    return TailGraph(
        bsr=bsr,
        tail_src=src[in_tail][order].astype(np.int32),
        tail_dst=dst[in_tail][order].astype(np.int32),
        tail_w=w[in_tail][order],
    )


def spmm_tail(tail_w, tail_src, tail_dst, x, num_out: int):
    """Y[tail_src] += tail_w * X[tail_dst] — the COO tail as one gather,
    one elementwise scale, and one sorted segment-sum. All native XLA ops,
    so autodiff handles it (the transpose of a gather is the scatter-add and
    vice versa)."""
    import jax
    import jax.numpy as jnp

    contrib = tail_w[:, None] * jnp.take(x, tail_dst, axis=0)
    return jax.ops.segment_sum(contrib, tail_src, num_segments=num_out,
                               indices_are_sorted=True)


def spmm_tail_hybrid(values, row_of, col_of, tail_w, tail_src, tail_dst, x,
                     block: int = 128, interpret: bool = False, kernel=None):
    """Y = A @ X for a tail-split graph: Pallas BSR SpMM on the dense-enough
    tiles plus the COO tail path. Differentiable w.r.t. values, tail_w,
    and x. `kernel` overrides the BSR kernel (e.g. ops.spmm.spmm_jax
    off-TPU)."""
    import jax.numpy as jnp

    from multistgraph_tpu.ops.spmm import spmm

    if kernel is None:
        kernel = lambda v, r, c, xx: spmm(v, r, c, xx, block=block,
                                          interpret=interpret)
    if values.shape[0] > 0:
        y = kernel(values, row_of, col_of, x)
    else:
        y = jnp.zeros((x.shape[0],) + x.shape[1:], x.dtype)
    if tail_w.shape[0] > 0:
        y = y + spmm_tail(tail_w, tail_src, tail_dst, x, x.shape[0]).astype(
            y.dtype)
    return y


def spmm_hybrid(values, row_of, col_of, hub_values, hub_cols, x,
                block: int = 128, interpret: bool = False, kernel=None):
    """Y = A @ X for a split graph: Pallas BSR SpMM on the remainder plus
    one skinny dense matmul for the hub columns. Differentiable w.r.t.
    values, hub_values, and x (the SpMM carries a custom VJP; the hub part
    is native XLA ops).

    `kernel` overrides the BSR kernel (e.g. ops.spmm.spmm_jax off-TPU).
    """
    import jax.numpy as jnp

    from multistgraph_tpu.ops.spmm import spmm

    if kernel is None:
        kernel = lambda v, r, c, xx: spmm(v, r, c, xx, block=block,
                                          interpret=interpret)
    if values.shape[0] > 0:
        y = kernel(values, row_of, col_of, x)
    else:
        y = jnp.zeros((x.shape[0],) + x.shape[1:], x.dtype)
    if hub_values.shape[1] > 0:
        y = y + hub_values @ jnp.take(x, jnp.asarray(hub_cols), axis=0)
    return y
