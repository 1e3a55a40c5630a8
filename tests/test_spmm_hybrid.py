"""Hybrid BSR + skinny-dense hub-column SpMM (ops/hybrid.py).

Reference counterpart: none (dense-only reference); TPU sparse scale path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops.bsr import bsr_from_coo
from multistgraph_tpu.ops.hybrid import (split_hub_columns,
                                         split_scattered_tail, spmm_hybrid,
                                         spmm_tail_hybrid)
from multistgraph_tpu.ops.spmm import spmm_jax

N = 1000
BLOCK = 128


def _hub_graph(rng, num_hubs=4, num_edges=8000):
    """Spatially-local edges + heavy fan-in hubs, like random_spatial_graph."""
    n_local = int(num_edges * 0.7)
    src_local = rng.integers(0, N, n_local)
    dst_local = np.clip(src_local + rng.integers(-40, 41, n_local), 0, N - 1)
    hubs = rng.choice(N, num_hubs, replace=False)
    src_hub = rng.integers(0, N, num_edges - n_local)
    dst_hub = hubs[rng.integers(0, num_hubs, num_edges - n_local)]
    src = np.concatenate([src_local, src_hub])
    dst = np.concatenate([dst_local, dst_hub])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    return src, dst, w, hubs


def _dense(src, dst, w):
    padded = -(-N // BLOCK) * BLOCK
    a = np.zeros((padded, padded), np.float32)
    np.add.at(a, (src, dst), w)
    return a


def test_split_identifies_hubs_and_preserves_edges(rng):
    src, dst, w, hubs = _hub_graph(rng)
    hy = split_hub_columns(src, dst, w, N, BLOCK, min_row_blocks=2)
    assert set(hubs) <= set(hy.hub_cols.tolist())
    # every edge lands exactly once: hybrid dense == full dense
    full = _dense(src, dst, w)
    rebuilt = np.zeros_like(full)
    rebuilt[: hy.bsr.num_nodes, : hy.bsr.num_nodes] = hy.bsr.to_dense()
    rebuilt[:, hy.hub_cols] += hy.hub_values[:, :]
    np.testing.assert_allclose(rebuilt, full, atol=1e-6)
    # the remainder's BSR must be much smaller than the unsplit tiling
    plain = bsr_from_coo(src, dst, w, N, BLOCK)
    assert hy.bsr.nnz_blocks < plain.nnz_blocks


def test_spmm_hybrid_matches_dense(rng):
    src, dst, w, _hubs = _hub_graph(rng)
    hy = split_hub_columns(src, dst, w, N, BLOCK, min_row_blocks=2)
    full = _dense(src, dst, w)
    x = rng.normal(size=(full.shape[0], 16)).astype(np.float32)
    got = spmm_hybrid(
        jnp.asarray(hy.bsr.values), jnp.asarray(hy.bsr.row_of),
        jnp.asarray(hy.bsr.col_of), jnp.asarray(hy.hub_values),
        hy.hub_cols, jnp.asarray(x), block=BLOCK, kernel=spmm_jax)
    np.testing.assert_allclose(np.asarray(got), full @ x, atol=2e-4, rtol=2e-4)


def test_spmm_hybrid_gradients_match_dense(rng):
    src, dst, w, _hubs = _hub_graph(rng, num_edges=3000)
    hy = split_hub_columns(src, dst, w, N, BLOCK, min_row_blocks=2)
    full = jnp.asarray(_dense(src, dst, w))
    x = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))

    def loss_hybrid(xx, hv):
        y = spmm_hybrid(
            jnp.asarray(hy.bsr.values), jnp.asarray(hy.bsr.row_of),
            jnp.asarray(hy.bsr.col_of), hv, hy.hub_cols, xx,
            block=BLOCK, kernel=spmm_jax)
        return jnp.sum(y * t)

    gx, ghv = jax.grad(loss_hybrid, argnums=(0, 1))(x, jnp.asarray(hy.hub_values))
    gx_dense = jax.grad(lambda xx: jnp.sum((full @ xx) * t))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_dense),
                               atol=2e-4, rtol=2e-4)
    # d/dA[:, hub] of sum((A@x)*t) = t @ x[hub]^T restricted to hub columns
    want_ghv = np.asarray(t) @ np.asarray(x)[hy.hub_cols].T
    np.testing.assert_allclose(np.asarray(ghv), want_ghv, atol=2e-4, rtol=2e-4)


def test_no_hubs_degenerates_to_plain_bsr(rng):
    # purely local edges: nothing crosses the break-even, split is a no-op
    # (threshold = all 8 row blocks; a local column is touched by at most 2)
    src = rng.integers(0, N, 3000)
    dst = np.clip(src + rng.integers(-30, 31, 3000), 0, N - 1)
    w = rng.uniform(0.1, 1.0, 3000).astype(np.float32)
    hy = split_hub_columns(src, dst, w, N, BLOCK, min_row_blocks=8)
    assert hy.num_hubs == 0
    plain = bsr_from_coo(src, dst, w, N, BLOCK)
    assert hy.bsr.nnz_blocks == plain.nnz_blocks
    x = jnp.asarray(rng.normal(size=(hy.bsr.padded_nodes, 8)).astype(np.float32))
    got = spmm_hybrid(
        jnp.asarray(hy.bsr.values), jnp.asarray(hy.bsr.row_of),
        jnp.asarray(hy.bsr.col_of), jnp.asarray(hy.hub_values), hy.hub_cols,
        x, block=BLOCK, kernel=spmm_jax)
    want = spmm_jax(jnp.asarray(plain.values), jnp.asarray(plain.row_of),
                    jnp.asarray(plain.col_of), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def _scattered_graph(rng, num_edges=9000, noise_frac=0.3):
    """A dense diagonal band plus uniform-random scatter: the band tiles
    fill well, the scatter lands ~one edge per tile (the planted-partition
    disease at scale, tools/bench_reorder.py --family planted)."""
    n_band = int(num_edges * (1 - noise_frac))
    src_band = rng.integers(0, N, n_band)
    dst_band = np.clip(src_band + rng.integers(-20, 21, n_band), 0, N - 1)
    src_noise = rng.integers(0, N, num_edges - n_band)
    dst_noise = rng.integers(0, N, num_edges - n_band)
    src = np.concatenate([src_band, src_noise])
    dst = np.concatenate([dst_band, dst_noise])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    return src, dst, w


def test_tail_split_preserves_edges_and_shrinks_bsr(rng):
    src, dst, w = _scattered_graph(rng)
    tg = split_scattered_tail(src, dst, w, N, BLOCK, min_fill=100)
    assert tg.num_tail_edges > 0
    # every edge lands exactly once: BSR + tail rebuild == full dense
    full = _dense(src, dst, w)
    rebuilt = np.zeros_like(full)
    rebuilt[: tg.bsr.num_nodes, : tg.bsr.num_nodes] = tg.bsr.to_dense()
    np.add.at(rebuilt, (tg.tail_src, tg.tail_dst), tg.tail_w)
    np.testing.assert_allclose(rebuilt, full, atol=1e-6)
    # the scatter noise is what the tail absorbed: far fewer BSR tiles
    plain = bsr_from_coo(src, dst, w, N, BLOCK)
    assert tg.bsr.nnz_blocks < plain.nnz_blocks // 2
    # tail is sorted by row for segment_sum(indices_are_sorted=True)
    assert np.all(np.diff(tg.tail_src) >= 0)


def test_spmm_tail_hybrid_matches_dense(rng):
    src, dst, w = _scattered_graph(rng)
    tg = split_scattered_tail(src, dst, w, N, BLOCK, min_fill=100)
    full = _dense(src, dst, w)
    x = rng.normal(size=(full.shape[0], 16)).astype(np.float32)
    got = spmm_tail_hybrid(
        jnp.asarray(tg.bsr.values), jnp.asarray(tg.bsr.row_of),
        jnp.asarray(tg.bsr.col_of), jnp.asarray(tg.tail_w),
        jnp.asarray(tg.tail_src), jnp.asarray(tg.tail_dst),
        jnp.asarray(x), block=BLOCK, kernel=spmm_jax)
    np.testing.assert_allclose(np.asarray(got), full @ x, atol=2e-4, rtol=2e-4)


def test_spmm_tail_hybrid_gradients_match_dense(rng):
    src, dst, w = _scattered_graph(rng, num_edges=4000)
    tg = split_scattered_tail(src, dst, w, N, BLOCK, min_fill=100)
    full = jnp.asarray(_dense(src, dst, w))
    x = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(full.shape[0], 8)).astype(np.float32))

    def loss_hybrid(xx, tw):
        y = spmm_tail_hybrid(
            jnp.asarray(tg.bsr.values), jnp.asarray(tg.bsr.row_of),
            jnp.asarray(tg.bsr.col_of), tw, jnp.asarray(tg.tail_src),
            jnp.asarray(tg.tail_dst), xx, block=BLOCK, kernel=spmm_jax)
        return jnp.sum(y * t)

    gx, gtw = jax.grad(loss_hybrid, argnums=(0, 1))(x, jnp.asarray(tg.tail_w))
    gx_dense = jax.grad(lambda xx: jnp.sum((full @ xx) * t))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_dense),
                               atol=2e-4, rtol=2e-4)
    # d/dw of sum((A@x)*t) for edge (s, d) = t[s] . x[d]
    want_gtw = np.einsum(
        "ef,ef->e", np.asarray(t)[tg.tail_src], np.asarray(x)[tg.tail_dst])
    np.testing.assert_allclose(np.asarray(gtw), want_gtw, atol=2e-4, rtol=2e-4)


def test_all_tail_degenerates_to_pure_coo(rng):
    # min_fill above every tile's population: BSR empties out entirely and
    # the segment-sum path must carry the whole product alone
    src, dst, w = _scattered_graph(rng, num_edges=2000, noise_frac=1.0)
    tg = split_scattered_tail(src, dst, w, N, BLOCK, min_fill=10 ** 6)
    assert tg.bsr.nnz_blocks == 0 and tg.num_tail_edges == 2000
    full = _dense(src, dst, w)
    x = rng.normal(size=(full.shape[0], 8)).astype(np.float32)
    got = spmm_tail_hybrid(
        jnp.asarray(tg.bsr.values), jnp.asarray(tg.bsr.row_of),
        jnp.asarray(tg.bsr.col_of), jnp.asarray(tg.tail_w),
        jnp.asarray(tg.tail_src), jnp.asarray(tg.tail_dst),
        jnp.asarray(x), block=BLOCK, kernel=spmm_jax)
    np.testing.assert_allclose(np.asarray(got), full @ x, atol=2e-4, rtol=2e-4)
