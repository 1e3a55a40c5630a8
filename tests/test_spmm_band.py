"""Banded-dense SpMM (ops/band.py): offset-diagonal batched matmuls.

Reference counterpart: none (dense-only reference); TPU sparse scale path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops.band import (
    band_dv_pallas,
    band_dx_pallas,
    band_fwd_pallas,
    split_band,
    spmm_band,
)

N = 1000
BLOCK = 128


def _band_graph(rng, num_edges=9000, locality=200, noise_frac=0.1):
    n_local = int(num_edges * (1 - noise_frac))
    src_l = rng.integers(0, N, n_local)
    dst_l = np.clip(src_l + rng.integers(-locality, locality + 1, n_local), 0, N - 1)
    src_n = rng.integers(0, N, num_edges - n_local)
    dst_n = rng.integers(0, N, num_edges - n_local)
    src = np.concatenate([src_l, src_n])
    dst = np.concatenate([dst_l, dst_n])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    return src, dst, w


def _dense(src, dst, w):
    padded = -(-N // BLOCK) * BLOCK
    a = np.zeros((padded, padded), np.float32)
    np.add.at(a, (src, dst), w)
    return a


def test_split_band_partitions_edges_exactly(rng):
    src, dst, w = _band_graph(rng)
    bg = split_band(src, dst, w, N, BLOCK)
    assert len(bg.offsets) > 0 and bg.rest_w.shape[0] > 0
    # every edge lands exactly once: band planes + rest rebuild full dense
    full = _dense(src, dst, w)
    rebuilt = np.zeros_like(full)
    nb = bg.num_row_blocks
    for i, o in enumerate(bg.offsets):
        for r in range(nb):
            c = r + int(o)
            if 0 <= c < nb:
                rebuilt[r * BLOCK:(r + 1) * BLOCK, c * BLOCK:(c + 1) * BLOCK] \
                    += bg.band_values[i, r]
            else:
                # out-of-range diagonals hold no edges by construction
                assert not bg.band_values[i, r].any()
    np.add.at(rebuilt, (bg.rest_src, bg.rest_dst), bg.rest_w)
    np.testing.assert_allclose(rebuilt, full, atol=1e-6)


def test_spmm_band_matches_dense(rng):
    src, dst, w = _band_graph(rng, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    assert bg.rest_w.shape[0] == 0  # pure band at locality 200 < 2 blocks
    full = _dense(src, dst, w)
    x = rng.normal(size=(full.shape[0], 16)).astype(np.float32)
    got = spmm_band(jnp.asarray(bg.band_values), bg.offsets, jnp.asarray(x),
                    block=BLOCK)
    np.testing.assert_allclose(np.asarray(got), full @ x, atol=2e-4, rtol=2e-4)


def test_spmm_band_gradients(rng):
    src, dst, w = _band_graph(rng, num_edges=4000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = jnp.asarray(_dense(src, dst, w))
    x = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))

    def loss(xx):
        return jnp.sum(spmm_band(jnp.asarray(bg.band_values), bg.offsets, xx,
                                 block=BLOCK) * t)

    gx = jax.grad(loss)(x)
    gx_dense = jax.grad(lambda xx: jnp.sum((full @ xx) * t))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_dense),
                               atol=2e-4, rtol=2e-4)


def test_sparse_offsets_stay_in_rest(rng):
    # one far-away edge: its diagonal covers a single row block, far below
    # min_fill_frac — it must stay COO, not allocate a whole dense plane
    src = np.concatenate([np.arange(N - 1), [0]])
    dst = np.concatenate([np.arange(1, N), [N - 1]])
    w = np.ones(N, np.float32)
    bg = split_band(src, dst, w, N, BLOCK)
    assert bg.rest_w.shape[0] == 1 and bg.rest_dst[0] == N - 1
    assert all(abs(int(o)) <= 1 for o in bg.offsets)


def test_spmm_band_value_gradients(rng):
    # the custom VJP's dV leg (round 4): gradient w.r.t. the dense offset
    # diagonals must match the dense-matrix gradient at the band slots
    src, dst, w = _band_graph(rng, num_edges=4000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = _dense(src, dst, w)
    x = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))

    def loss(vals):
        return jnp.sum(spmm_band(vals, bg.offsets, x, block=BLOCK) * t)

    gv = jax.grad(loss)(jnp.asarray(bg.band_values))
    # dense gradient dA = t @ x^T, read back at each band tile position
    ga = np.asarray(t @ x.T)
    nb = bg.num_row_blocks
    for i, o in enumerate(bg.offsets):
        for r in range(nb):
            c = r + int(o)
            want = (ga[r * BLOCK:(r + 1) * BLOCK, c * BLOCK:(c + 1) * BLOCK]
                    if 0 <= c < nb else np.zeros((BLOCK, BLOCK), np.float32))
            np.testing.assert_allclose(np.asarray(gv[i, r]), want,
                                       atol=2e-3, rtol=2e-3)


def _padded_inputs(rng, bg, feat=16, dtype=np.float32):
    radius = max(abs(int(o)) for o in bg.offsets)
    nb = bg.num_row_blocks
    x = rng.normal(size=(bg.padded_nodes, feat)).astype(dtype)
    xb = x.reshape(nb, BLOCK, feat)
    pad = np.zeros((radius, BLOCK, feat), dtype)
    xp = np.concatenate([pad, xb, pad], axis=0)
    offs = tuple(int(o) for o in bg.offsets)
    return x, jnp.asarray(xp), offs, radius


def test_band_pallas_forward_matches_einsum(rng):
    """The Pallas band kernel (TPU fast path, interpret mode here) computes
    the same y as the stacked-einsum form, at f32 and bf16."""
    src, dst, w = _band_graph(rng, num_edges=4000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = _dense(src, dst, w)
    for dtype in (np.float32, jnp.bfloat16):
        x, xp, offs, radius = _padded_inputs(rng, bg, dtype=np.float32)
        xp = xp.astype(dtype)
        v = jnp.asarray(bg.band_values).astype(dtype)
        got = band_fwd_pallas(v, xp, offs, radius, interpret=True)
        want = (full @ np.asarray(x, np.float32)).reshape(
            bg.num_row_blocks, BLOCK, -1)
        tol = 3e-2 if dtype == jnp.bfloat16 else 2e-4
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=tol * 10, rtol=tol)


def test_band_pallas_backward_legs_match_einsum(rng):
    """dV (sampled outer product) and dX (transposed band) kernels equal
    the einsum backward's results tile-for-tile."""
    src, dst, w = _band_graph(rng, num_edges=4000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    x, xp, offs, radius = _padded_inputs(rng, bg, feat=8)
    nb = bg.num_row_blocks
    dy = jnp.asarray(rng.normal(size=(nb, BLOCK, 8)).astype(np.float32))
    v = jnp.asarray(bg.band_values)

    dv = band_dv_pallas(dy, xp, offs, radius, jnp.float32, interpret=True)
    dxp = band_dx_pallas(v, dy, offs, radius, jnp.float32, interpret=True)

    # einsum references (the pre-pallas backward algebra)
    xs = jnp.stack([xp[radius + o: radius + o + nb] for o in offs])
    dv_ref = jnp.einsum("rif,orjf->orij", dy, xs)
    dxp_ref = np.zeros(xp.shape, np.float32)
    contrib = np.asarray(jnp.einsum("orij,rif->orjf", v, dy))
    for i, o in enumerate(offs):
        dxp_ref[radius + o: radius + o + nb] += contrib[i]
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               atol=2e-4, rtol=2e-4)
    # the kernel only fills the central blocks; the pad cotangent is
    # discarded by the caller — compare the central region
    np.testing.assert_allclose(np.asarray(dxp)[radius: radius + nb],
                               dxp_ref[radius: radius + nb],
                               atol=2e-4, rtol=2e-4)


def test_band_pallas_dispatch_through_spmm_band(rng, monkeypatch):
    """MSG_BAND_PALLAS=interpret routes spmm_band (forward AND both custom-
    VJP legs) through the Pallas kernels; results match the einsum form."""
    src, dst, w = _band_graph(rng, num_edges=2000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = jnp.asarray(_dense(src, dst, w))
    x = jnp.asarray(rng.normal(size=(bg.padded_nodes, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(bg.padded_nodes, 8)).astype(np.float32))
    v = jnp.asarray(bg.band_values)

    def run():
        def loss(vals, xx):
            return jnp.sum(spmm_band(vals, bg.offsets, xx, block=BLOCK) * t)

        y = spmm_band(v, bg.offsets, x, block=BLOCK)
        gv, gx = jax.grad(loss, argnums=(0, 1))(v, x)
        return np.asarray(y), np.asarray(gv), np.asarray(gx)

    monkeypatch.setenv("MSG_BAND_PALLAS", "0")  # einsum baseline
    y0, gv0, gx0 = run()
    monkeypatch.setenv("MSG_BAND_PALLAS", "interpret")
    y1, gv1, gx1 = run()
    np.testing.assert_allclose(y0, np.asarray(full @ x), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(y1, y0, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(gv1, gv0, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(gx1, gx0, atol=2e-4, rtol=2e-4)


def test_spmm_band_grads_bf16_path(rng):
    # mixed-precision path: bf16 x / f32 values — custom VJP must return
    # cotangents in the primal dtypes (dV f32, dX bf16)
    src, dst, w = _band_graph(rng, num_edges=2000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    x = jnp.asarray(rng.normal(size=(bg.padded_nodes, 4))).astype(jnp.bfloat16)

    def loss(vals, xx):
        return jnp.sum(spmm_band(vals, bg.offsets, xx, block=BLOCK)
                       .astype(jnp.float32))

    gv, gx = jax.grad(loss, argnums=(0, 1))(jnp.asarray(bg.band_values), x)
    assert gv.dtype == jnp.float32 and gx.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(gv).all())


def test_band_slab_kernel_matches_dense(rng):
    """Slab-granular packed-band kernel (one dot per output tile against a
    contiguous x window): forward matches dense, both dot modes, including
    a row count not divisible by chunk_rows."""
    from multistgraph_tpu.ops.band import (
        band_fwd_slab_pallas, pack_band_rows, pack_band_rows_transposed)

    src, dst, w = _band_graph(rng, num_edges=4000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = _dense(src, dst, w)
    x, xp, offs, radius = _padded_inputs(rng, bg, feat=16)
    nb = bg.num_row_blocks
    assert nb % 3 != 0  # exercise the pad-to-chunk path with chunk_rows=3

    v_pack = jnp.asarray(pack_band_rows(bg.band_values, offs, radius))
    want = (full @ x).reshape(nb, BLOCK, -1)
    for batched in (False, True):
        got = band_fwd_slab_pallas(v_pack, xp, radius, chunk_rows=3,
                                   batched=batched, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4,
                                   rtol=2e-4)

    # transposed packing computes A^T @ dy through the SAME kernel
    dy = rng.normal(size=(nb, BLOCK, 16)).astype(np.float32)
    dyp = np.concatenate([np.zeros((radius, BLOCK, 16), np.float32), dy,
                          np.zeros((radius, BLOCK, 16), np.float32)])
    vt_pack = jnp.asarray(pack_band_rows_transposed(
        bg.band_values, offs, radius))
    got_t = band_fwd_slab_pallas(vt_pack, jnp.asarray(dyp), radius,
                                 chunk_rows=4, interpret=True)
    want_t = (full.T @ dy.reshape(-1, 16)).reshape(nb, BLOCK, -1)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=2e-4,
                               rtol=2e-4)


def test_band_slab_dispatch_through_spmm_band(rng, monkeypatch):
    """MSG_BAND_PALLAS=slab-interpret routes spmm_band's FORWARD through
    the packed-band slab kernel (the measured-fastest form on chip);
    gradients flow through the einsum backward unchanged."""
    src, dst, w = _band_graph(rng, num_edges=2000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = jnp.asarray(_dense(src, dst, w))
    x = jnp.asarray(rng.normal(size=(bg.padded_nodes, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(bg.padded_nodes, 8)).astype(np.float32))
    v = jnp.asarray(bg.band_values)

    monkeypatch.setenv("MSG_BAND_PALLAS", "slab-interpret")
    y = spmm_band(v, bg.offsets, x, block=BLOCK)
    np.testing.assert_allclose(np.asarray(y), np.asarray(full @ x),
                               atol=2e-4, rtol=2e-4)

    def loss(vals, xx):
        return jnp.sum(spmm_band(vals, bg.offsets, xx, block=BLOCK) * t)

    gv, gx = jax.grad(loss, argnums=(0, 1))(v, x)
    gx_dense = jax.grad(lambda xx: jnp.sum((full @ xx) * t))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_dense),
                               atol=2e-4, rtol=2e-4)
    assert np.isfinite(np.asarray(gv)).all()


def test_spmm_band_packed_matches_dense(rng):
    """spmm_band_packed (pre-packed serving fast path) equals dense."""
    from multistgraph_tpu.ops.band import pack_band_rows, spmm_band_packed

    src, dst, w = _band_graph(rng, num_edges=3000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = _dense(src, dst, w)
    radius = max(abs(int(o)) for o in bg.offsets)
    v_pack = jnp.asarray(pack_band_rows(
        bg.band_values, tuple(int(o) for o in bg.offsets), radius))
    x = jnp.asarray(rng.normal(size=(bg.padded_nodes, 16)).astype(np.float32))
    got = spmm_band_packed(v_pack, radius, x, block=BLOCK, interpret=True)
    np.testing.assert_allclose(np.asarray(got), full @ np.asarray(x),
                               atol=2e-4, rtol=2e-4)
    # default dispatch on CPU = packed-layout einsum fallback
    got2 = spmm_band_packed(v_pack, radius, x, block=BLOCK)
    np.testing.assert_allclose(np.asarray(got2), full @ np.asarray(x),
                               atol=2e-4, rtol=2e-4)


def test_spmm_band_packed_gradients(rng):
    """The packed-layout custom VJP (hand-written band algebra in the slab
    layout) matches dense autodiff for BOTH cotangent legs; the dV leg is
    checked by scattering the dense dA onto the packed slots."""
    from multistgraph_tpu.ops.band import pack_band_rows, spmm_band_packed

    src, dst, w = _band_graph(rng, num_edges=3000, noise_frac=0.0)
    bg = split_band(src, dst, w, N, BLOCK)
    full = jnp.asarray(_dense(src, dst, w))
    offs = tuple(int(o) for o in bg.offsets)
    radius = max(abs(o) for o in offs)
    v_pack = jnp.asarray(pack_band_rows(bg.band_values, offs, radius))
    x = jnp.asarray(rng.normal(size=(bg.padded_nodes, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(bg.padded_nodes, 8)).astype(np.float32))

    def loss(vp, xx):
        return jnp.sum(spmm_band_packed(vp, radius, xx, block=BLOCK) * t)

    gv, gx = jax.grad(loss, argnums=(0, 1))(v_pack, x)
    gx_dense, ga_dense = jax.grad(
        lambda xx, aa: jnp.sum((aa @ xx) * t), argnums=(0, 1))(x, full)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_dense),
                               atol=2e-4, rtol=2e-4)
    # dense dA -> packed layout: slot j of row block r is dA[rb, rb + j - radius]
    nb = bg.num_row_blocks
    ga = np.asarray(ga_dense).reshape(nb, BLOCK, nb, BLOCK)
    want_gv = np.zeros((nb, BLOCK, (2 * radius + 1) * BLOCK), np.float32)
    for r in range(nb):
        for j in range(2 * radius + 1):
            c = r + j - radius
            if 0 <= c < nb:
                want_gv[r, :, j * BLOCK:(j + 1) * BLOCK] = ga[r, :, c]
    np.testing.assert_allclose(np.asarray(gv), want_gv, atol=2e-4, rtol=2e-4)
