"""Banded-dense SpMM: turn block-band sparsity into offset-diagonal matmuls.

Reference counterpart: none — the reference is dense-only (N<=403); this is
the TPU sparse scale path (BASELINE configs 4-5, docs/DESIGN.md §4).

After hub extraction, the spatial-family graph's remainder is a block BAND:
every nonzero 128x128 tile sits at a small block-offset |col - row| <= R
(locality-bounded edges). A band needs NO gather: for each offset o the
tiles form one diagonal, and

    y[r] += V_o[r] @ x[r + o]            for every row block r at once

is a single BATCHED (R_blocks, b, b) @ (R_blocks, b, F) matmul whose x
operand is a plain SLICE of a zero-padded x — sequential addressing XLA
fuses into the dot, instead of the Pallas kernel's per-tile gather DMAs
(the measured 1M limiter, docs/DESIGN.md §9). All native XLA ops, so
autodiff closes over it; bf16 tiles halve the dominant value stream.

Storage: offsets whose diagonal would be mostly empty do not pay for the
full (R_blocks, b, b) plane — `split_band` only densifies offsets whose
tile population clears `min_fill_frac`, leaving the rest in COO for the
hub/tail machinery.

Training: `spmm_band` carries a `jax.custom_vjp` (round 4). Round 3 found
that AUTODIFF through the stacked-slice einsum inside SparseATGCN's
remat'd recurrence compiles pathologically on TPU (~2 min at 12k nodes,
>20 min at 49k, while forward-only compiled in seconds — the cotangent of
the O stacked x-slices is a chain of overlapping pad-and-adds that XLA's
fusion planner chokes on in the full-model context). The custom VJP hides
that region from autodiff entirely — the same discipline as the Pallas
kernels (ops/spmm.py) — and its backward closes under band algebra:

    dX[r+o] += V_o[r]^T dY[r]   — one batched matmul per call
                                   ("orij,rif->orjf") + O static
                                   shifted adds into a padded buffer;
    dV_o[r]  = dY[r] X[r+o]^T   — one sampled outer-product einsum
                                   ("rif,orjf->orij") over the SAME
                                   stacked x-slices as the forward.

With it, band-form training compiles in seconds at 49k nodes (measured
round 4, docs/DESIGN.md §4) and the fastest 1M representation trains.
"""

import functools
import os
from dataclasses import dataclass

import jax
import numpy as np

__all__ = ["BandGraph", "split_band", "spmm_band", "pack_band_rows",
           "spmm_band_packed"]

# Pallas band kernels (round 4): the stacked-einsum form materializes O
# sliced copies of x (write + re-read: ~1.3 GB extra HBM round-trip at 1M
# nodes) and XLA schedules the per-offset dots as separate loop nests. The
# kernels below stream each (b, b) diagonal tile and its x slice exactly
# once, revisiting the VMEM-resident output tile across offsets (the
# standard Pallas reduction pattern, innermost grid dim = offsets).
# MEASURED OUTCOME (round 4): the per-tile kernels LOSE to the einsum on
# chip — serving 18.3 vs 12.8 ms at 1M, training 0.225 vs 0.204 s at 49k
# — one tile per grid step pays ~450 ns of grid/DMA overhead against
# 21 ns of MXU work. The einsum form is therefore the default dispatch
# everywhere (_pallas_mode); the kernels remain opt-in (MSG_BAND_PALLAS=1)
# and parity-tested, and the slab-granular packed-band kernel
# (band_fwd_slab_pallas) is the candidate that amortizes the overhead.


@dataclass(frozen=True)
class BandGraph:
    """Dense offset-diagonals + the COO remainder that did not fit a band."""

    band_values: np.ndarray   # (O, R_blocks, b, b) float32
    offsets: np.ndarray       # (O,) int64 block offsets (col_block - row_block)
    num_nodes: int
    block: int
    rest_src: np.ndarray      # (E_rest,) int64 — leftover edges (original ids)
    rest_dst: np.ndarray
    rest_w: np.ndarray

    @property
    def padded_nodes(self) -> int:
        return -(-self.num_nodes // self.block) * self.block

    @property
    def num_row_blocks(self) -> int:
        return self.padded_nodes // self.block

    @property
    def nnz_edges(self) -> int:
        return int((self.band_values != 0).sum()) + int(self.rest_w.shape[0])


def split_band(
    src: np.ndarray,
    dst: np.ndarray,
    weights: np.ndarray,
    num_nodes: int,
    block: int = 128,
    max_offsets: int = 8,
    min_fill_frac: float = 0.25,
) -> BandGraph:
    """Partition COO edges into (dense offset-diagonals, COO remainder).

    An offset diagonal is densified when it holds tiles in at least
    `min_fill_frac` of the row blocks (a sparse diagonal would waste its
    (R_blocks, b, b) plane), keeping at most the `max_offsets` most
    populous offsets. Duplicate edges accumulate.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(weights, np.float32)
    n_blocks = -(-num_nodes // block)

    rb, cb = src // block, dst // block
    off = cb - rb
    # tiles per offset: count DISTINCT row blocks present on each diagonal
    uniq_pairs = np.unique(off * np.int64(n_blocks) + rb)
    off_of_pair = uniq_pairs // n_blocks
    # (floor division of negatives is fine: off*n_blocks + rb is monotone in
    # (off, rb) because 0 <= rb < n_blocks)
    cand, counts = np.unique(off_of_pair, return_counts=True)
    keep = cand[counts >= max(1, int(min_fill_frac * n_blocks))]
    if len(keep) > max_offsets:
        order = np.argsort(-counts[np.isin(cand, keep)], kind="stable")
        keep = keep[order[:max_offsets]]
        keep = np.sort(keep)

    in_band = np.isin(off, keep)
    offsets = np.sort(keep)
    pos = {int(o): i for i, o in enumerate(offsets)}
    band_values = np.zeros((len(offsets), n_blocks, block, block), np.float32)
    if in_band.any():
        oi = np.array([pos[int(o)] for o in off[in_band]], np.int64)
        np.add.at(
            band_values,
            (oi, rb[in_band], src[in_band] % block, dst[in_band] % block),
            w[in_band],
        )
    rest = ~in_band
    return BandGraph(
        band_values=band_values, offsets=offsets.astype(np.int64),
        num_nodes=num_nodes, block=block,
        rest_src=src[rest], rest_dst=dst[rest], rest_w=w[rest],
    )


# Peak bytes allowed for the (O, n_blocks, b, Fc) stacked intermediate.
# ONE stacked einsum over all diagonals is the form XLA compiles well (the
# per-offset-sum loop compiles pathologically in the full-model context —
# ~10 min at 49k nodes, re-measured round 4 even WITH the custom VJP); but
# at 1M nodes with the T-hoisted feature width the full stack is 4.8-9.5 GB.
# Chunking the FEATURE axis keeps the stacked structure (compile-friendly)
# at a bounded footprint: chunks are independent columns, so the forward
# concatenates and the backward's shifted adds never overlap across chunks.
_STACK_BYTE_CAP = 1 << 30


def _chunk_width(n_offs, n_blocks, block, feat, itemsize):
    per_col = n_offs * n_blocks * block * itemsize
    fc = max(int(_STACK_BYTE_CAP // max(per_col, 1)), 1)
    if fc >= feat:
        return feat
    return max((fc // 128) * 128, min(feat, 128))


def _pallas_mode(force_xla=False):
    """None (einsum form, the DEFAULT everywhere) | 'real' | 'interpret'.

    Measured on chip (round 4): the per-tile Pallas kernels LOSE to the
    stacked einsum both serving (18.3 vs 12.8 ms at the 1M primitive —
    ~450 ns grid overhead per 21 ns MXU dot) and training (0.225 vs
    0.204 s at 49k, docs/bench/band49k_train_adp_einsum_r4.log), so the
    einsum form is the default on every backend and the kernels stay
    opt-in for experiments: MSG_BAND_PALLAS=1 forces them, 'interpret'
    forces interpreter mode (CPU parity tests), 0 pins einsum explicitly.
    force_xla pins einsum regardless — the distributed boundary backend
    passes it through `_band_vjp`'s static args (Pallas inside shard_map
    cannot be hardware-validated on a single attached chip)."""
    if force_xla:
        return None
    flag = os.environ.get("MSG_BAND_PALLAS", "auto")
    if flag == "1":
        return "real"
    if flag in ("interpret", "slab", "slab-interpret"):
        return flag
    return None


def band_fwd_pallas(band_values, xp, offs, radius, interpret=False):
    """y[r] = sum_o V[o, r] @ xp[r + radius + o] — grid (R, O), offsets
    innermost so the f32 output tile accumulates in VMEM across the band
    and each V tile / x slice streams from HBM exactly once."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_off, n_blocks_v, block, _ = band_values.shape
    n_blocks = xp.shape[0] - 2 * radius
    feat = xp.shape[-1]
    shifted = jnp.asarray([radius + o for o in offs], jnp.int32)

    def kernel(offs_ref, v_ref, x_ref, out_ref):
        del offs_ref

        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += jnp.dot(v_ref[0, 0], x_ref[0],
                                preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_off),
        in_specs=[
            pl.BlockSpec((1, 1, block, block), lambda r, o, offs: (o, r, 0, 0)),
            pl.BlockSpec((1, block, feat), lambda r, o, offs: (r + offs[o], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, feat), lambda r, o, offs: (r, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_off * n_blocks * block * block * feat,
            bytes_accessed=band_values.size * band_values.dtype.itemsize
            + n_off * n_blocks * block * feat * xp.dtype.itemsize
            + n_blocks * block * feat * 4,
            transcendentals=0,
        ),
    )(shifted, band_values, xp)
    return out.astype(xp.dtype)


def pack_band_rows(band_values, offs, radius):
    """(O, R, b, b) diagonals -> (R, b, W) packed band matrix, W=(2r+1)b:
    row block r's dense in-band row is V_cat[r] = [V_{-r}..V_{+r}][r] with
    absent offsets zero. Then y[r] = V_cat[r] @ xp[r : r+2r+1].reshape(W,F)
    — ONE MXU dot per output tile against a CONTIGUOUS window of the
    padded x slab (the slab kernel below). Works on numpy or jnp arrays."""
    import jax.numpy as jnp

    is_np = isinstance(band_values, np.ndarray)
    xnp = np if is_np else jnp
    n_off, r_blocks, b, _ = band_values.shape
    w = (2 * radius + 1) * b
    packed = xnp.zeros((r_blocks, b, w), band_values.dtype)
    for i, o in enumerate(offs):
        sl = (o + radius) * b
        if is_np:
            packed[:, :, sl:sl + b] = band_values[i]
        else:
            packed = packed.at[:, :, sl:sl + b].set(band_values[i])
    return packed


def pack_band_rows_transposed(band_values, offs, radius):
    """Packed form of A^T for the dX leg: A^T's diagonal at offset -o holds
    V_o[r']^T shifted to source row r' = r + o. Slot layout matches
    pack_band_rows, so the same slab kernel computes dxp_core = A^T @ dy."""
    import jax.numpy as jnp

    is_np = isinstance(band_values, np.ndarray)
    xnp = np if is_np else jnp
    n_off, r_blocks, b, _ = band_values.shape
    w = (2 * radius + 1) * b
    packed = xnp.zeros((r_blocks, b, w), band_values.dtype)
    for i, o in enumerate(offs):
        # A^T[r', r' - o] = A[r' - o, r' ]^T  with r = r' - o in [0, R)
        lo, hi = max(0, o), min(r_blocks, r_blocks + o)
        src = band_values[i, lo - o if o < 0 else 0: r_blocks - o if o > 0 else r_blocks]
        src = xnp.transpose(src, (0, 2, 1))
        sl = (-o + radius) * b
        if is_np:
            packed[lo:hi, :, sl:sl + b] = src
        else:
            packed = packed.at[lo:hi, :, sl:sl + b].set(src)
    return packed


def band_fwd_slab_pallas(v_packed, xp, radius, chunk_rows=8, n_buf=2,
                         batched=False, interpret=False):
    """Slab-granular band SpMM: y[r] = V_cat[r] @ xp[r : r+2r+1] — one dot
    per output tile, C=chunk_rows output tiles per grid step, in-kernel
    double-buffered DMA of the contiguous value slab + x window (the
    per-tile BlockSpec kernel above pays ~450 ns grid overhead per 21 ns
    dot and LOSES to the einsum form at 1M; this is the fixed design —
    probed in tools/probe_band_stream.py). `batched=True` issues one
    batched dot per slab instead of C serial dots."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_blocks, block, w = v_packed.shape
    feat = xp.shape[-1]
    n_off = 2 * radius + 1
    cr = min(chunk_rows, r_blocks)
    if r_blocks % cr:
        # pad the row dimension so the grid tiles evenly (zero rows emit
        # zero output rows that the caller slices off)
        pad_r = cr - r_blocks % cr
        v_packed = jnp.concatenate(
            [v_packed, jnp.zeros((pad_r, block, w), v_packed.dtype)], axis=0)
        xp = jnp.concatenate(
            [xp, jnp.zeros((pad_r, block, feat), xp.dtype)], axis=0)
        r_pad = r_blocks + pad_r
    else:
        pad_r = 0
        r_pad = r_blocks

    def kernel(v_hbm, x_hbm, out_ref, v_s, x_s, sem_v, sem_x):
        c = pl.program_id(0)
        slot = jax.lax.rem(c, n_buf)

        def dma_v(s, cc):
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(cc * cr, cr)], v_s.at[s], sem_v.at[s])

        def dma_x(s, cc):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(cc * cr, cr + 2 * radius)], x_s.at[s],
                sem_x.at[s])

        @pl.when(c == 0)
        def _():
            dma_v(slot, c).start()
            dma_x(slot, c).start()

        @pl.when(c + 1 < pl.num_programs(0))
        def _():
            nxt = jax.lax.rem(c + 1, n_buf)
            dma_v(nxt, c + 1).start()
            dma_x(nxt, c + 1).start()

        dma_v(slot, c).wait()
        dma_x(slot, c).wait()
        if batched:
            win = jnp.stack([x_s[slot, j:j + n_off].reshape(w, feat)
                             for j in range(cr)])
            out_ref[...] = jax.lax.dot_general(
                v_s[slot], win, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            for j in range(cr):
                out_ref[j] = jnp.dot(
                    v_s[slot, j], x_s[slot, j:j + n_off].reshape(w, feat),
                    preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(r_pad // cr,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((cr, block, feat), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, block, feat), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_buf, cr, block, w), v_packed.dtype),
            pltpu.VMEM((n_buf, cr + 2 * radius, block, feat), xp.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * r_blocks * block * w * feat,
            bytes_accessed=v_packed.size * v_packed.dtype.itemsize
            + xp.size * xp.dtype.itemsize + r_blocks * block * feat * 4,
            transcendentals=0,
        ),
    )(v_packed, xp)
    return out[:r_blocks]


def band_dv_pallas(dy, xp, offs, radius, out_dtype, interpret=False):
    """dV[o, r] = dY[r] @ xp[r + radius + o]^T — one (b, b) tile per grid
    step, contraction over the full feature axis (no chunking: nothing
    O-stacked ever materializes)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks, block, feat = dy.shape
    n_off = len(offs)
    shifted = jnp.asarray([radius + o for o in offs], jnp.int32)

    def kernel(offs_ref, dy_ref, x_ref, out_ref):
        del offs_ref
        acc = jax.lax.dot_general(
            dy_ref[0], x_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[...] = acc.astype(out_ref.dtype)[None, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_off, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block, feat), lambda o, r, offs: (r, 0, 0)),
            pl.BlockSpec((1, block, feat), lambda o, r, offs: (r + offs[o], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block, block),
                               lambda o, r, offs: (o, r, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_off, n_blocks, block, block),
                                       out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_off * n_blocks * block * block * feat,
            bytes_accessed=2 * n_off * n_blocks * block * feat * dy.dtype.itemsize
            + n_off * n_blocks * block * block * 4,
            transcendentals=0,
        ),
    )(shifted, dy, xp)


def band_dx_pallas(band_values, dy, offs, radius, out_dtype, interpret=False):
    """dxp[radius + s] = sum_o V[o, s - o]^T @ dY[s - o] — the transposed
    band (negated offsets). Out-of-range source rows are masked with
    @pl.when (their DMA index is clamped; the load lands but never
    accumulates). Only the central R blocks are computed — the caller
    discards the pad region's cotangent anyway."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks, block, feat = dy.shape
    n_off = len(offs)
    offs_arr = jnp.asarray(list(offs), jnp.int32)

    def kernel(offs_ref, v_ref, dy_ref, out_ref):
        o = pl.program_id(1)
        r_src = pl.program_id(0) - offs_ref[o]

        @pl.when(o == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when((r_src >= 0) & (r_src < n_blocks))
        def _():
            out_ref[...] += jax.lax.dot_general(
                v_ref[0, 0], dy_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    def clamp(i):
        return jnp.clip(i, 0, n_blocks - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_off),
        in_specs=[
            pl.BlockSpec((1, 1, block, block),
                         lambda s, o, offs: (o, clamp(s - offs[o]), 0, 0)),
            pl.BlockSpec((1, block, feat),
                         lambda s, o, offs: (clamp(s - offs[o]), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, feat), lambda s, o, offs: (s, 0, 0)),
    )
    dx_core = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, feat), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_off * n_blocks * block * block * feat,
            bytes_accessed=band_values.size * band_values.dtype.itemsize
            + n_off * n_blocks * block * feat * dy.dtype.itemsize
            + n_blocks * block * feat * 4,
            transcendentals=0,
        ),
    )(offs_arr, band_values, dy)
    dxp = jnp.zeros((n_blocks + 2 * radius, block, feat), jnp.float32)
    dxp = jax.lax.dynamic_update_slice(dxp, dx_core, (radius, 0, 0))
    return dxp.astype(out_dtype)


def _tile_kernels_for_training(n_blocks):
    """HBM-driven training dispatch (auto mode, TPU backend): at the 1M
    scale the feature-chunked einsum's stacked intermediates push the
    remat'd training step's temp to 16.0G and OOM the chip, while the
    per-tile Pallas kernels fit and step at 2.29 s; at 49k the einsum
    fits comfortably and is 10% faster (0.204 vs 0.225 s). Cross over on
    row-block count (4096 blocks = ~0.5M nodes). Both measured:
    docs/bench/train1m_band_t8_einsum_r4.log (OOM),
    band49k_train_adp_einsum_r4.log."""
    return (n_blocks >= 4096
            and os.environ.get("MSG_BAND_PALLAS", "auto") == "auto"
            and jax.default_backend() == "tpu")


def band_fwd_slab(v, xp, offs, radius, interpret=False):
    """Slab forward from per-offset diagonal planes: packs in-program,
    then `band_fwd_slab_packed`. CAVEAT (measured, P4 probes in
    docs/bench/probe_band_integration_r4c.log): XLA does NOT hoist the
    ~1.3 GB pack out of surrounding loops (memory-pressure LICM), so the
    in-program pack costs ~6.5 ms per iteration at 1M — store values
    PACKED (`pack_band_rows` once on host) and call
    `spmm_band_packed` for the fast path (3.97 vs the einsum's 8.76 ms)."""
    v_pack = pack_band_rows(v, offs, radius)
    return band_fwd_slab_packed(v_pack, xp, radius, interpret=interpret)


def band_fwd_slab_packed(v_pack, xp, radius, interpret=False):
    """Feature-chunked, VMEM-bounded slab forward on PRE-PACKED values
    (R, b, (2r+1)b) — the measured-fastest band SpMM on chip: 3.97 ms vs
    the einsum's 8.76 at the 1M band shape (P4, in-jit slope)."""
    import jax.numpy as jnp

    feat = xp.shape[-1]
    block = xp.shape[1]
    w = v_pack.shape[-1]
    fc = min(feat, 512)
    for cr in (16, 8, 4, 2):
        if _slab_vmem(cr, block, w, radius, fc,
                      xp.dtype.itemsize, v_pack.dtype.itemsize) \
                <= _SLAB_VMEM_BUDGET:
            break
    outs = []
    for lo in range(0, feat, fc):
        outs.append(band_fwd_slab_pallas(
            v_pack, xp[:, :, lo:lo + fc], radius, chunk_rows=cr,
            interpret=interpret))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return y.astype(xp.dtype)


# ONE budget for both the dispatch gate (_packed_slab_ok) and the
# chunk-size selection (band_fwd_slab_packed): the gate must never admit a
# shape the chunk loop cannot satisfy at its smallest chunking (ADVICE r4).
_SLAB_VMEM_BUDGET = 12 * 2**20


def _slab_vmem(cr, block, w, radius, fc, itemsize_x, itemsize_v):
    """Scratch bytes of the slab kernel at chunk_rows=cr: 2 double-buffered
    value slabs + 2 double-buffered x slabs + the f32 output slab."""
    return (2 * cr * block * w * itemsize_v
            + 2 * (cr + 2 * radius) * block * fc * itemsize_x
            + cr * block * fc * 4)


def _packed_slab_ok(radius, feat, block, itemsize_x, itemsize_v):
    """Slab-kernel viability for the PACKED form (all 2r+1 slots stored, so
    fill is moot): Mosaic's in-kernel DMA needs the trailing dim 128-aligned,
    and the double-buffered scratch must fit VMEM at the smallest chunking
    (cr=2, feature chunk <=512) — the exact bound the chunk loop enforces."""
    if radius == 0 or feat % 128:
        return False
    w = (2 * radius + 1) * block
    fc = min(feat, 512)
    return _slab_vmem(2, block, w, radius, fc,
                      itemsize_x, itemsize_v) <= _SLAB_VMEM_BUDGET


def _band_packed_apply(v_pack, xp, radius, interpret):
    """Forward dispatch on the packed layout: slab kernel (interpret when
    forced, real on TPU when 128-aligned + VMEM-viable), else the stacked
    einsum directly on the (R, b, O, b)-viewed packed matrix (includes the
    zero slots of absent offsets — fallback-path waste only)."""
    import jax.numpy as jnp

    if interpret:
        return band_fwd_slab_packed(v_pack, xp, radius, interpret=True)
    feat = xp.shape[-1]
    block = xp.shape[1]
    if jax.default_backend() == "tpu":
        # Mosaic's in-kernel DMA needs the trailing dim 128-aligned: PAD the
        # feature axis rather than fall back — the value-slab stream
        # (R*b*(2r+1)b bytes) dominates the kernel, so padded x/output
        # columns are minor waste while the einsum form's O stacked x
        # copies are the measured loser (docs/DESIGN.md §4 serving table)
        fpad = -feat % 128
        feat_p = feat + fpad
        if _packed_slab_ok(radius, feat_p, block, xp.dtype.itemsize,
                           v_pack.dtype.itemsize):
            import jax.numpy as _jnp

            if fpad:
                xp = _jnp.pad(xp, ((0, 0), (0, 0), (0, fpad)))
            y = band_fwd_slab_packed(v_pack, xp, radius)
            return y[..., :feat] if fpad else y
    n_off = 2 * radius + 1
    n_blocks = xp.shape[0] - 2 * radius
    vr = v_pack.reshape(n_blocks, block, n_off, block)
    ed = jnp.float32 if (v_pack.dtype == jnp.bfloat16
                         and jax.default_backend() != "tpu") else xp.dtype
    fc = _chunk_width(n_off, n_blocks, block, feat, xp.dtype.itemsize)
    outs = []
    for lo in range(0, feat, fc):
        xs = jnp.stack([xp[j : j + n_blocks, :, lo:lo + fc]
                        for j in range(n_off)])
        outs.append(jnp.einsum("rijw,jrwf->rif", vr.astype(ed), xs.astype(ed),
                               preferred_element_type=jnp.float32))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return y.astype(xp.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _band_packed_vjp(v_pack, xp, radius, interpret):
    return _band_packed_apply(v_pack, xp, radius, interpret)


def _band_packed_fwd(v_pack, xp, radius, interpret):
    return _band_packed_apply(v_pack, xp, radius, interpret), (v_pack, xp)


def _band_packed_bwd(radius, interpret, res, dy):
    """Band-algebra backward in the PACKED layout (mirrors `_band_bwd`):
    dV_pack[r,i,(j,w)] = sum_f dY[r,i,f] Xp[r+j,w,f]  — one sampled
    outer-product einsum over the same stacked x windows as the forward;
    dXp[j:j+R]        += V_view[:, :, j]^T dY         — 2r+1 static shifted
    adds of feature-chunked batched matmuls. Keeps autodiff out of the
    overlapping pad-and-add chain, same discipline as `_band_bwd`."""
    import jax.numpy as jnp

    v_pack, xp = res
    n_blocks = xp.shape[0] - 2 * radius
    block = xp.shape[1]
    feat = xp.shape[-1]
    n_off = 2 * radius + 1
    dyc = dy.astype(xp.dtype)
    vr = v_pack.reshape(n_blocks, block, n_off, block).astype(xp.dtype)
    ed = jnp.float32 if (v_pack.dtype == jnp.bfloat16
                         and jax.default_backend() != "tpu") else xp.dtype
    fc = _chunk_width(n_off, n_blocks, block, feat, xp.dtype.itemsize)
    dv = None
    dxp = jnp.zeros(xp.shape, jnp.float32)
    for lo in range(0, feat, fc):
        dy_c = dyc[:, :, lo:lo + fc]
        xs = jnp.stack([xp[j : j + n_blocks, :, lo:lo + fc]
                        for j in range(n_off)])
        dv_c = jnp.einsum("rif,jrwf->rijw", dy_c.astype(ed), xs.astype(ed),
                          preferred_element_type=jnp.float32)
        dv = dv_c if dv is None else dv + dv_c
        contrib = jnp.einsum("rijw,rif->jrwf", vr.astype(ed), dy_c.astype(ed),
                             preferred_element_type=jnp.float32)
        for j in range(n_off):
            dxp = dxp.at[j : j + n_blocks, :, lo:lo + fc].add(contrib[j])
    dv = dv.reshape(n_blocks, block, n_off * block)
    return dv.astype(v_pack.dtype), dxp.astype(xp.dtype)


_band_packed_vjp.defvjp(_band_packed_fwd, _band_packed_bwd)


def spmm_band_packed(v_pack, radius, x, block: int = 128, interpret=False):
    """Y = A_band @ X from the PACKED band matrix (R, b, (2r+1)b) — the
    serving fast path (store packed once via `pack_band_rows`; slab kernel
    measured 2.2x the einsum form on chip at the 1M band shape, P4 probes
    in docs/bench/probe_band_integration_r4c.log). Differentiable w.r.t.
    v_pack and x through a hand-written packed-layout custom VJP; on
    non-TPU backends (and non-128-aligned features) the forward falls back
    to the stacked einsum on the packed view. Training at scale keeps the
    custom-VJP `spmm_band` on per-offset planes (HBM-dispatch table in
    docs/DESIGN.md §4)."""
    import jax.numpy as jnp

    n_pad, feat = x.shape
    n_blocks = n_pad // block
    xb = x.reshape(n_blocks, block, feat)
    if radius:
        pad = jnp.zeros((radius, block, feat), x.dtype)
        xp = jnp.concatenate([pad, xb, pad], axis=0)
    else:
        xp = xb
    y = _band_packed_vjp(v_pack.astype(x.dtype), xp, int(radius), interpret)
    return y.reshape(n_pad, feat).astype(x.dtype)


def _band_apply(band_values, xp, offs, radius, use_xla=False,
                grad_path=False):
    import jax.numpy as jnp

    n_blocks = xp.shape[0] - 2 * radius
    feat = xp.shape[-1]
    v = band_values.astype(xp.dtype)
    mode = _pallas_mode(use_xla)
    if mode is None and grad_path and _tile_kernels_for_training(n_blocks):
        mode = "real"
    if mode in ("slab", "slab-interpret"):
        return band_fwd_slab(v, xp, offs, radius,
                             interpret=mode == "slab-interpret")
    if mode is not None:
        return band_fwd_pallas(v, xp, offs, radius,
                               interpret=mode == "interpret")
    # CPU's XLA cannot execute BATCHED bf16 x bf16 -> f32 dots (DotThunk);
    # upcast the einsum there. On TPU (force_xla distributed path) the
    # batched bf16 dot is native — keep it narrow.
    ed = jnp.float32 if (v.dtype == jnp.bfloat16
                         and jax.default_backend() != "tpu") else xp.dtype
    fc = _chunk_width(len(offs), n_blocks, xp.shape[1], feat, xp.dtype.itemsize)
    outs = []
    for lo in range(0, feat, fc):
        xs = jnp.stack([xp[radius + o : radius + o + n_blocks, :, lo:lo + fc]
                        for o in offs])
        outs.append(jnp.einsum("orij,orjf->rif", v.astype(ed), xs.astype(ed),
                               preferred_element_type=jnp.float32))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return y.astype(xp.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _band_vjp(band_values, xp, offs, radius, use_xla=False):
    return _band_apply(band_values, xp, offs, radius, use_xla)


def _band_fwd(band_values, xp, offs, radius, use_xla=False):
    return (_band_apply(band_values, xp, offs, radius, use_xla,
                        grad_path=True),
            (band_values, xp))


def _band_bwd(offs, radius, use_xla, res, dy):
    """Hand-written band-algebra backward (module docstring):
    dV_o[r] = dY[r] X[r+o]^T (sampled outer-product einsum over the same
    stacked x-slices as the forward, summed over feature chunks) and
    dX[r+o] += V_o[r]^T dY[r] (O static shifted adds into the padded
    buffer, chunked along features). Hides autodiff's pathological
    overlapping pad-and-add chain from XLA entirely."""
    import jax.numpy as jnp

    band_values, xp = res
    n_blocks = xp.shape[0] - 2 * radius
    feat = xp.shape[-1]
    dyc = dy.astype(xp.dtype)
    v = band_values.astype(xp.dtype)
    mode = _pallas_mode(use_xla)
    if mode in ("slab", "slab-interpret"):
        mode = None  # slab is a FORWARD fast path; backward is einsum algebra
    if mode is None and _tile_kernels_for_training(n_blocks):
        mode = "real"
    if mode is not None:
        interp = mode == "interpret"
        dv = band_dv_pallas(dyc, xp, offs, radius, band_values.dtype,
                            interpret=interp)
        dxp = band_dx_pallas(v, dyc, offs, radius, xp.dtype,
                             interpret=interp)
        return dv, dxp
    fc = _chunk_width(len(offs), n_blocks, xp.shape[1], feat, xp.dtype.itemsize)
    # same CPU batched-bf16-dot limitation as _band_apply
    ed = jnp.float32 if (v.dtype == jnp.bfloat16
                         and jax.default_backend() != "tpu") else xp.dtype
    dv = None
    dxp = jnp.zeros(xp.shape, jnp.float32)
    for lo in range(0, feat, fc):
        dy_c = dyc[:, :, lo:lo + fc]
        xs = jnp.stack([xp[radius + o : radius + o + n_blocks, :, lo:lo + fc]
                        for o in offs])
        dv_c = jnp.einsum("rif,orjf->orij", dy_c.astype(ed), xs.astype(ed),
                          preferred_element_type=jnp.float32)
        dv = dv_c if dv is None else dv + dv_c
        contrib = jnp.einsum("orij,rif->orjf", v.astype(ed), dy_c.astype(ed),
                             preferred_element_type=jnp.float32)
        for i, o in enumerate(offs):
            dxp = dxp.at[radius + o : radius + o + n_blocks,
                         :, lo:lo + fc].add(contrib[i])
    return dv.astype(band_values.dtype), dxp.astype(xp.dtype)


_band_vjp.defvjp(_band_fwd, _band_bwd)


def spmm_band(band_values, offsets, x, block: int = 128):
    """Y = A_band @ X: one batched matmul per offset diagonal over a sliced,
    zero-padded X. offsets must be the host-side numpy array (static under
    jit — it selects slice positions). Differentiable w.r.t. band_values
    and x through the hand-written custom VJP (module docstring)."""
    import jax.numpy as jnp

    n_pad, feat = x.shape
    n_blocks = n_pad // block
    offs = tuple(int(o) for o in np.asarray(offsets))
    if not offs:
        return jnp.zeros_like(x)
    radius = max(abs(o) for o in offs)
    xb = x.reshape(n_blocks, block, feat)
    if radius:
        pad = jnp.zeros((radius, block, feat), x.dtype)
        xp = jnp.concatenate([pad, xb, pad], axis=0)
    else:
        xp = xb
    y = _band_vjp(band_values, xp, offs, radius)
    return y.reshape(n_pad, feat).astype(x.dtype)
