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
floor is per-DMA issue overhead on ~10k independent 64 KB copies (the x
tiles are a random gather, so they cannot be coalesced; x is 25 MB at this
size, above the ~16 MB VMEM budget, so it cannot be pinned on-chip either).
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


@functools.partial(jax.jit, static_argnames=("block", "out_blocks", "interpret",
                                             "n_buf"))
def spmm_stream(values, row_ptr, col_of, x, block: int = 128,
                out_blocks=None, interpret: bool = False, n_buf: int = 8):
    """Y = A @ X; values (nnz, b, b), row_ptr (rows+1,), col_of (nnz,),
    x (n_pad, feat). Forward row-streaming kernel (see module docstring)."""
    n_pad, feat = x.shape
    n_rows = out_blocks if out_blocks is not None else n_pad // block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # values stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, block, feat), lambda r, row_ptr, col_of: (r, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_stream_kernel, block=block, feat=feat, n_buf=n_buf),
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
