"""Row-streaming BSR SpMM: one grid step per OUTPUT row block.

The baseline kernel (ops/spmm.py) runs one grid step per NONZERO block —
measured ~12% of matmul peak at 50k nodes because each 128x128x128 MXU dot
pays a full grid-step's pipeline overhead and the output tile is re-staged
on row changes. This kernel instead assigns each grid step one output row
block and STREAMS that row's (value tile, x tile) pairs from HBM with
double-buffered `pltpu.make_async_copy` DMAs, accumulating in a VMEM
register tile:

    grid = (num_row_blocks,)
    for i in row_ptr[r] .. row_ptr[r+1]:          # dynamic trip count
        acc += values[i] @ x[col_of[i]]           # overlapped with next DMA

Advantages over the block-grid kernel:
  * output tile stays resident for its whole row (no revisit write-backs);
  * rows with no edges emit zeros naturally (no coverage padding blocks);
  * DMA issue overlaps the MXU dot (double buffering), so throughput
    approaches the HBM stream of the value tiles.

CSR-of-blocks layout: `row_ptr` (num_row_blocks+1,) int32 prefix offsets
into the row-major-sorted nnz arrays (build with `row_ptr_from_rows`).
Forward-only building block (benches use it directly; the training path's
custom VJP composes it the same way as ops/spmm.py when enabled).

Measured (v5e, 49,152-node spatial power-law graph, deg 16, feat 128,
4,946 nnz blocks, tools/bench_spmm_stream.py):
  block-grid baseline  3.33 ms  (195 GB/s effective)
  stream n_buf=2       3.46 ms
  stream n_buf=4       2.77 ms
  stream n_buf=8       2.65 ms  (245 GB/s effective, 1.26x) <- default
  stream n_buf=16      2.68 ms
  HBM stream floor     0.79 ms  @ 819 GB/s
Output is bit-exact vs the block-grid kernel. The remaining 3.3x over the
floor is split between per-DMA issue overhead (~10k independent 64 KB
copies; the x tiles are a random gather, so they cannot be coalesced) and
MXU latency on serialized 128^3 dots (weight-load + drain per dot dominates
the 128-cycle MAC pass at this tile size).

Two further variants attack each term (same file, same measurement setup):
  * chunk>0: one values DMA per `chunk` contiguous tiles (they are
    row-major-adjacent in nnz order). 50k f32: 2.67 -> 2.57 ms (chunk=2);
    larger chunks regress — the gather DMAs still bound the pipe.
  * pin_x=True: the ENTIRE x array resident in VMEM via a constant-index
    BlockSpec (fetched once for the whole grid), gathers become VMEM reads,
    only values stream from HBM. Needs x <= ~13 MB (`can_pin_x`):
    f32 24k nodes: 1.92 -> 1.78 ms; bf16 50k nodes: 2.43 -> 1.97 ms.
Note the model's training-path aggregations flatten time*batch into the
feature axis (feat in the thousands), where per-tile dots already saturate
the MXU and x far exceeds VMEM — these variants target the serving-shaped
feat<=256 calls.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def row_ptr_from_rows(row_of: np.ndarray, num_row_blocks: int) -> np.ndarray:
    """CSR offsets from a row-major-sorted row index array."""
    return np.searchsorted(
        np.asarray(row_of), np.arange(num_row_blocks + 1), side="left"
    ).astype(np.int32)


def _stream_kernel(row_ptr_ref, col_of_ref, values_hbm, x_hbm, out_ref, *,
                   block, feat, n_buf):
    r = pl.program_id(0)
    start = row_ptr_ref[r]
    end = row_ptr_ref[r + 1]

    def body(vals_scratch, x_scratch, sem_v, sem_x):
        def dma_v(slot, i):
            return pltpu.make_async_copy(values_hbm.at[i], vals_scratch.at[slot],
                                         sem_v.at[slot])

        def dma_x(slot, i):
            return pltpu.make_async_copy(x_hbm.at[col_of_ref[i]], x_scratch.at[slot],
                                         sem_x.at[slot])

        for w in range(n_buf - 1):
            @pl.when(start + w < end)
            def _(w=w):
                dma_v(w, start + w).start()
                dma_x(w, start + w).start()

        def loop(i, acc):
            slot = jax.lax.rem(i - start, n_buf)
            nxt = jax.lax.rem(i - start + (n_buf - 1), n_buf)

            @pl.when(i + (n_buf - 1) < end)
            def _():
                dma_v(nxt, i + (n_buf - 1)).start()
                dma_x(nxt, i + (n_buf - 1)).start()

            dma_v(slot, i).wait()
            dma_x(slot, i).wait()
            return acc + jax.lax.dot_general(
                vals_scratch[slot], x_scratch[slot],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            start, end, loop, jnp.zeros((block, feat), jnp.float32)
        )
        out_ref[...] = acc[None]

    pl.run_scoped(
        body,
        vals_scratch=pltpu.VMEM((n_buf, block, block), values_hbm.dtype),
        x_scratch=pltpu.VMEM((n_buf, block, feat), x_hbm.dtype),
        sem_v=pltpu.SemaphoreType.DMA((n_buf,)),
        sem_x=pltpu.SemaphoreType.DMA((n_buf,)),
    )


def _stream_kernel_chunked(row_ptr_ref, col_of_ref, values_hbm, x_hbm, out_ref,
                           *, block, feat, chunk, n_buf):
    """Chunked variant: one VALUES DMA fetches `chunk` contiguous tiles (they
    are row-major-contiguous in nnz order), cutting the DMA issue count from
    2/tile to (1/chunk + 1)/tile and quadrupling the values transfer size.
    Row tails are handled branch-free: the chunk fetch start is clamped to
    nnz-chunk (always in bounds), x-tile DMAs clamp their nnz index, and
    out-of-row contributions are discarded with a select — stale scratch is
    never a NaN hazard because select discards, it does not multiply."""
    r = pl.program_id(0)
    start = row_ptr_ref[r]
    end = row_ptr_ref[r + 1]
    nnz = values_hbm.shape[0]
    nc = (end - start + chunk - 1) // chunk  # chunks in this row (dynamic)

    def body(vals_scratch, x_scratch, sem_v, sem_x):
        def chunk_dmas(slot, c):
            i0 = start + c * chunk
            i_c = jnp.minimum(i0, nnz - chunk)
            pltpu.make_async_copy(
                values_hbm.at[pl.ds(i_c, chunk)], vals_scratch.at[slot],
                sem_v.at[slot],
            ).start()
            for j in range(chunk):
                i = jnp.minimum(i0 + j, nnz - 1)
                pltpu.make_async_copy(
                    x_hbm.at[col_of_ref[i]], x_scratch.at[slot, j],
                    sem_x.at[slot, j],
                ).start()

        def chunk_waits(slot):
            pltpu.make_async_copy(
                values_hbm.at[pl.ds(0, chunk)], vals_scratch.at[slot], sem_v.at[slot]
            ).wait()
            for j in range(chunk):
                pltpu.make_async_copy(
                    x_hbm.at[0], x_scratch.at[slot, j], sem_x.at[slot, j]
                ).wait()

        for w in range(n_buf - 1):
            @pl.when(w < nc)
            def _(w=w):
                chunk_dmas(w, w)

        def loop(c, acc):
            slot = jax.lax.rem(c, n_buf)

            @pl.when(c + (n_buf - 1) < nc)
            def _():
                chunk_dmas(jax.lax.rem(c + (n_buf - 1), n_buf), c + (n_buf - 1))

            chunk_waits(slot)
            i0 = start + c * chunk
            d = i0 - jnp.minimum(i0, nnz - chunk)  # in-chunk shift at array end
            for j in range(chunk):
                contrib = jax.lax.dot_general(
                    vals_scratch[slot, d + j], x_scratch[slot, j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + jnp.where(i0 + j < end, contrib, 0.0)
            return acc

        acc = jax.lax.fori_loop(0, nc, loop, jnp.zeros((block, feat), jnp.float32))
        out_ref[...] = acc[None]

    pl.run_scoped(
        body,
        vals_scratch=pltpu.VMEM((n_buf, chunk, block, block), values_hbm.dtype),
        x_scratch=pltpu.VMEM((n_buf, chunk, block, feat), x_hbm.dtype),
        sem_v=pltpu.SemaphoreType.DMA((n_buf,)),
        sem_x=pltpu.SemaphoreType.DMA((n_buf, chunk)),
    )


def _stream_kernel_pinned(row_ptr_ref, col_of_ref, values_hbm, x_vmem, out_ref,
                          *, block, feat, chunk, n_buf):
    """Pinned-x variant: the WHOLE x array lives in VMEM (loaded once for the
    entire grid by a constant-index BlockSpec), so the random x-tile gather
    DMAs — half the DMA issue count and all of the non-contiguous traffic —
    disappear. Values stream from HBM in `chunk`-tile contiguous copies.
    Requires n_pad*feat*itemsize to fit the ~16 MB VMEM budget (f32 up to
    ~24k nodes at feat=128; bf16 up to ~49k). Tail handling identical to the
    chunked kernel: clamp the fetch start, discard out-of-row terms."""
    r = pl.program_id(0)
    start = row_ptr_ref[r]
    end = row_ptr_ref[r + 1]
    nnz = values_hbm.shape[0]
    nc = (end - start + chunk - 1) // chunk

    def body(vals_scratch, sem_v):
        def dma_chunk(slot, c):
            i0 = start + c * chunk
            i_c = jnp.minimum(i0, nnz - chunk)
            return pltpu.make_async_copy(
                values_hbm.at[pl.ds(i_c, chunk)], vals_scratch.at[slot],
                sem_v.at[slot],
            )

        for w in range(n_buf - 1):
            @pl.when(w < nc)
            def _(w=w):
                dma_chunk(w, w).start()

        def loop(c, acc):
            slot = jax.lax.rem(c, n_buf)

            @pl.when(c + (n_buf - 1) < nc)
            def _():
                dma_chunk(jax.lax.rem(c + (n_buf - 1), n_buf),
                          c + (n_buf - 1)).start()

            dma_chunk(slot, c).wait()
            i0 = start + c * chunk
            d = i0 - jnp.minimum(i0, nnz - chunk)
            for j in range(chunk):
                i = jnp.minimum(i0 + j, nnz - 1)
                contrib = jax.lax.dot_general(
                    vals_scratch[slot, d + j], x_vmem[col_of_ref[i]],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + jnp.where(i0 + j < end, contrib, 0.0)
            return acc

        acc = jax.lax.fori_loop(0, nc, loop, jnp.zeros((block, feat), jnp.float32))
        out_ref[...] = acc[None]

    pl.run_scoped(
        body,
        vals_scratch=pltpu.VMEM((n_buf, chunk, block, block), values_hbm.dtype),
        sem_v=pltpu.SemaphoreType.DMA((n_buf,)),
    )


def can_pin_x(n_pad: int, feat: int, itemsize: int,
              budget_bytes: int = 13 * 2**20) -> bool:
    """True when the whole x array fits the pinned-x kernel's VMEM budget
    (~16 MB physical minus scratch/output headroom)."""
    return n_pad * feat * itemsize <= budget_bytes


@functools.partial(jax.jit, static_argnames=("block", "out_blocks", "interpret",
                                             "n_buf", "chunk", "pin_x"))
def spmm_stream(values, row_ptr, col_of, x, block: int = 128,
                out_blocks=None, interpret: bool = False, n_buf: int = 8,
                chunk: int = 0, pin_x: bool = False):
    """Y = A @ X; values (nnz, b, b), row_ptr (rows+1,), col_of (nnz,),
    x (n_pad, feat). Forward row-streaming kernel (see module docstring).

    chunk>0 selects the chunked-DMA variant (one values DMA per `chunk`
    contiguous tiles; requires nnz >= chunk); chunk=0 the per-tile variant.
    pin_x=True holds ALL of x in VMEM (caller must check `can_pin_x`) and
    streams only values — fastest when it fits; implies chunking (chunk
    defaults to 8 if unset)."""
    n_pad, feat = x.shape
    n_rows = out_blocks if out_blocks is not None else n_pad // block
    if pin_x:
        chunk = chunk or 8
        chunk = min(chunk, max(values.shape[0], 1))
        kernel = functools.partial(_stream_kernel_pinned, block=block,
                                   feat=feat, chunk=chunk, n_buf=n_buf)
        x_spec = pl.BlockSpec((n_pad // block, block, feat),
                              lambda r, row_ptr, col_of: (0, 0, 0))
    elif chunk > 0 and values.shape[0] >= chunk:
        kernel = functools.partial(_stream_kernel_chunked, block=block,
                                   feat=feat, chunk=chunk, n_buf=n_buf)
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        kernel = functools.partial(_stream_kernel, block=block, feat=feat,
                                   n_buf=n_buf)
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # values stay in HBM
            x_spec,                                 # x: HBM, or whole-array VMEM
        ],
        out_specs=pl.BlockSpec((1, block, feat), lambda r, row_ptr, col_of: (r, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, block, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * values.shape[0] * block * block * feat,
            bytes_accessed=values.shape[0] * (block * block + block * feat) * values.dtype.itemsize,
            transcendentals=0,
        ),
    )(row_ptr, col_of, values, x.reshape(n_pad // block, block, feat))
    return out.reshape(n_rows * block, feat)
