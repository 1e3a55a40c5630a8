"""Block-sparse format + Pallas SpMM/SDDMM kernels (interpret mode on CPU)."""

import numpy as np
import pytest

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm import sddmm_relu, sparse_row_softmax, spmm

BLOCK = 128


def test_bsr_from_dense_roundtrip(rng):
    n = 300
    dense = (rng.uniform(size=(n, n)) < 0.01).astype(np.float32) * rng.normal(size=(n, n)).astype(np.float32)
    g = bsr.bsr_from_dense(dense, block=BLOCK)
    np.testing.assert_allclose(g.to_dense(), dense, atol=1e-6)
    assert g.padded_nodes == 384
    assert g.row_of.shape == g.col_of.shape == (g.nnz_blocks,)
    # row-major ordering
    key = g.row_of.astype(np.int64) * g.num_row_blocks + g.col_of
    assert (np.diff(key) > 0).all()


def test_bsr_from_coo_accumulates(rng):
    n = 200
    src = np.array([0, 0, 150, 199])
    dst = np.array([5, 5, 150, 0])
    w = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    g = bsr.bsr_from_coo(src, dst, w, n, block=BLOCK)
    dense = g.to_dense()
    assert dense[0, 5] == 3.0  # duplicate edge accumulated
    assert dense[150, 150] == 3.0
    assert dense[199, 0] == 4.0


def test_random_powerlaw_graph():
    g, num_edges = bsr.random_powerlaw_graph(1024, avg_degree=8, seed=1)
    assert g.num_nodes == 1024
    assert num_edges == 1024 * 8
    assert g.nnz_edges <= num_edges  # duplicates accumulate
    # power-law: top block column should be dense-ish (hub nodes)
    assert g.nnz_blocks > 0


def _random_bsr(rng, n=384, density=0.05):
    dense = (rng.uniform(size=(n, n)) < density).astype(np.float32) * rng.normal(size=(n, n)).astype(
        np.float32
    )
    return bsr.bsr_from_dense(dense, block=BLOCK), dense


def test_spmm_matches_dense(rng):
    g, dense = _random_bsr(rng)
    x = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)
    y = np.asarray(spmm(g.values, g.row_of, g.col_of, x, interpret=True))
    want = np.zeros_like(x)
    want[: g.num_nodes] = dense @ x[: g.num_nodes]
    np.testing.assert_allclose(y, want, atol=1e-3, rtol=1e-3)


def test_spmm_empty_rows_are_zero(rng):
    # graph whose later row-blocks have no edges: their outputs must be zero
    # (zero-initialized aliased output covers unvisited rows)
    n = 384
    dense = np.zeros((n, n), dtype=np.float32)
    dense[:100, :100] = rng.normal(size=(100, 100)).astype(np.float32)
    g = bsr.bsr_from_dense(dense, block=BLOCK)
    x = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)
    y = np.asarray(spmm(g.values, g.row_of, g.col_of, x, interpret=True))
    np.testing.assert_allclose(y, dense @ x[:384], atol=1e-3, rtol=1e-3)


def test_spmm_gradients_match_dense(rng):
    import jax
    import jax.numpy as jnp

    g, dense = _random_bsr(rng, n=256, density=0.08)
    x = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)
    dy_seed = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)

    def loss_sparse(values, xx):
        y = spmm(values, g.row_of, g.col_of, xx, interpret=True)
        return jnp.sum(y * dy_seed)

    dvals, dx = jax.grad(loss_sparse, argnums=(0, 1))(jnp.asarray(g.values), jnp.asarray(x))
    # dense references: dX = A^T dY ; dA = dY X^T (sampled at blocks)
    want_dx = g.to_dense().T @ dy_seed[: g.num_nodes]
    np.testing.assert_allclose(np.asarray(dx)[: g.num_nodes], want_dx, atol=1e-2, rtol=1e-2)
    want_da_full = dy_seed @ x.T
    for b in range(min(g.nnz_blocks, 3)):
        r, c = g.row_of[b], g.col_of[b]
        np.testing.assert_allclose(
            np.asarray(dvals)[b],
            want_da_full[r * BLOCK : (r + 1) * BLOCK, c * BLOCK : (c + 1) * BLOCK],
            atol=1e-2, rtol=1e-2,
        )


def test_sddmm_gradients_match_dense(rng):
    import jax
    import jax.numpy as jnp

    g, _ = _random_bsr(rng, n=256, density=0.08)
    d = 128
    e1 = rng.normal(size=(g.padded_nodes, d)).astype(np.float32)
    e2 = rng.normal(size=(d, g.padded_nodes)).astype(np.float32)
    seed = rng.normal(size=(g.nnz_blocks, BLOCK, BLOCK)).astype(np.float32)

    def loss_sparse(a, b):
        return jnp.sum(sddmm_relu(a, b, g.row_of, g.col_of, interpret=True) * seed)

    de1, de2 = jax.grad(loss_sparse, argnums=(0, 1))(jnp.asarray(e1), jnp.asarray(e2))

    def loss_dense(a, b):
        full = jnp.maximum(a @ b, 0.0)
        total = 0.0
        for i in range(g.nnz_blocks):
            r, c = int(g.row_of[i]), int(g.col_of[i])
            total += jnp.sum(full[r * BLOCK : (r + 1) * BLOCK, c * BLOCK : (c + 1) * BLOCK] * seed[i])
        return total

    want1, want2 = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(e1), jnp.asarray(e2))
    np.testing.assert_allclose(np.asarray(de1), np.asarray(want1), atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(de2), np.asarray(want2), atol=1e-2, rtol=1e-2)


def test_sddmm_matches_dense(rng):
    g, dense = _random_bsr(rng, density=0.02)
    d = 128
    e1 = rng.normal(size=(g.padded_nodes, d)).astype(np.float32)
    e2 = rng.normal(size=(d, g.padded_nodes)).astype(np.float32)
    vals = np.asarray(sddmm_relu(e1, e2, g.row_of, g.col_of, interpret=True))
    assert vals.shape == (g.nnz_blocks, BLOCK, BLOCK)
    full = np.maximum(e1 @ e2, 0.0)
    for b in range(min(g.nnz_blocks, 4)):
        r, c = g.row_of[b], g.col_of[b]
        np.testing.assert_allclose(
            vals[b], full[r * BLOCK : (r + 1) * BLOCK, c * BLOCK : (c + 1) * BLOCK],
            atol=1e-3, rtol=1e-3,
        )


def test_sparse_row_softmax_normalizes(rng):
    g, _ = _random_bsr(rng, density=0.05)
    scores = np.abs(rng.normal(size=(g.nnz_blocks, BLOCK, BLOCK))).astype(np.float32)
    normed = np.asarray(sparse_row_softmax(scores, g.row_of, g.num_row_blocks))
    # each global row's total over all its blocks should be 1 (where nonzero)
    import collections

    rows = collections.defaultdict(float)
    for b in range(g.nnz_blocks):
        for i in range(BLOCK):
            rows[(g.row_of[b], i)] += normed[b, i].sum()
    sums = np.array(list(rows.values()))
    sums = sums[sums > 1e-6]
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_rcm_reorder_reduces_blocks_and_preserves_spmm(rng):
    """RCM preprocessing (bsr_from_coo(reorder='rcm')) must cut the touched
    128x128 tiles on a scattered power-law graph and compute the same
    aggregation after feature reordering."""
    import numpy as np

    from multistgraph_tpu.ops.bsr import (
        apply_node_order,
        bsr_from_coo,
        invert_node_order,
    )

    n = 4096
    num_edges = n * 4
    src = rng.integers(0, n, num_edges)
    ranks = rng.zipf(1.5, num_edges).astype(np.int64) % n
    perm0 = rng.permutation(n)
    dst = perm0[ranks]
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)

    plain = bsr_from_coo(src, dst, w, n)
    rcm = bsr_from_coo(src, dst, w, n, reorder="rcm")
    assert rcm.perm is not None
    assert rcm.nnz_blocks < 0.8 * plain.nnz_blocks, (
        "RCM did not concentrate the pattern: {} vs {}".format(
            rcm.nnz_blocks, plain.nnz_blocks
        )
    )
    # numerics: (A x) computed on the reordered graph, mapped back, matches
    x = rng.normal(size=(plain.padded_nodes, 8)).astype(np.float32)
    import jax.numpy as jnp

    from multistgraph_tpu.ops.spmm import spmm as spmm_op

    y_plain = np.asarray(spmm_op(
        jnp.asarray(plain.values), jnp.asarray(plain.row_of), jnp.asarray(plain.col_of),
        jnp.asarray(x), interpret=True,
    ))
    x_r = apply_node_order(x, rcm.perm)
    y_r = np.asarray(spmm_op(
        jnp.asarray(rcm.values), jnp.asarray(rcm.row_of), jnp.asarray(rcm.col_of),
        jnp.asarray(x_r), interpret=True,
    ))
    y_back = invert_node_order(y_r, rcm.perm)
    np.testing.assert_allclose(y_back[:n], y_plain[:n], atol=1e-3, rtol=1e-3)


def test_spmm_bf16_operands(rng):
    """The Pallas kernels are dtype-polymorphic: bf16 tiles with f32
    accumulation (preferred_element_type) — the 2x-bandwidth sparse mode."""
    import jax.numpy as jnp

    from multistgraph_tpu.ops import bsr
    from multistgraph_tpu.ops.spmm import spmm as spmm_op

    n = 512
    dense = (rng.uniform(size=(n, n)) < 0.2).astype(np.float32) * rng.normal(
        size=(n, n)
    ).astype(np.float32)
    g = bsr.bsr_from_dense(dense, block=128)
    x = rng.normal(size=(n, 64)).astype(np.float32)
    y32 = np.asarray(spmm_op(
        jnp.asarray(g.values), jnp.asarray(g.row_of), jnp.asarray(g.col_of),
        jnp.asarray(x), interpret=True,
    ))
    y16 = np.asarray(spmm_op(
        jnp.asarray(g.values, jnp.bfloat16), jnp.asarray(g.row_of),
        jnp.asarray(g.col_of), jnp.asarray(x, jnp.bfloat16), interpret=True,
    ))
    assert y16.dtype == np.float32  # accumulation stays f32
    rel = np.abs(y16 - y32).max() / np.abs(y32).max()
    assert rel < 0.02


def test_spmm_jax_matches_pallas(rng):
    import jax.numpy as jnp

    from multistgraph_tpu.ops import bsr
    from multistgraph_tpu.ops.spmm import spmm as spmm_op, spmm_jax

    n = 384
    dense = (rng.uniform(size=(n, n)) < 0.3).astype(np.float32) * rng.normal(
        size=(n, n)
    ).astype(np.float32)
    g = bsr.bsr_from_dense(dense, block=128)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    args = (jnp.asarray(g.values), jnp.asarray(g.row_of), jnp.asarray(g.col_of),
            jnp.asarray(x))
    y_pallas = np.asarray(spmm_op(*args, interpret=True))
    y_jax = np.asarray(spmm_jax(*args))
    np.testing.assert_allclose(y_jax, y_pallas, atol=1e-4, rtol=1e-4)


def test_spmm_stream_matches_block_grid(rng):
    """Row-streaming kernel (in-kernel DMA pipeline) is exact vs baseline."""
    import jax.numpy as jnp

    from multistgraph_tpu.ops import bsr
    from multistgraph_tpu.ops.spmm import spmm as spmm_op
    from multistgraph_tpu.ops.spmm_stream import row_ptr_from_rows, spmm_stream

    n = 640  # 5 row blocks; leave one row block empty to hit the zero path
    dense = (rng.uniform(size=(n, n)) < 0.05).astype(np.float32) * rng.normal(
        size=(n, n)
    ).astype(np.float32)
    dense[128:256, :] = 0.0
    g = bsr.bsr_from_dense(dense, block=128)
    x = rng.normal(size=(g.padded_nodes, 64)).astype(np.float32)
    row_ptr = row_ptr_from_rows(g.row_of, g.num_row_blocks)
    assert row_ptr[1] == row_ptr[2]  # empty row block present
    args32 = (jnp.asarray(g.values), jnp.asarray(g.row_of), jnp.asarray(g.col_of),
              jnp.asarray(x))
    y_base = np.asarray(spmm_op(*args32, interpret=True))
    y_stream = np.asarray(
        spmm_stream(jnp.asarray(g.values), jnp.asarray(row_ptr),
                    jnp.asarray(g.col_of), jnp.asarray(x), interpret=True)
    )
    np.testing.assert_allclose(y_stream, y_base, atol=0, rtol=0)


def test_spmm_stream_chunked_and_pinned_variants(rng):
    """chunk>0 (contiguous multi-tile values DMAs with clamped tails) and
    pin_x=True (whole x resident in VMEM) are bit-exact vs the per-tile
    streaming kernel, including empty rows and the end-of-nnz clamp."""
    import jax.numpy as jnp

    from multistgraph_tpu.ops import bsr
    from multistgraph_tpu.ops.spmm_stream import (can_pin_x, row_ptr_from_rows,
                                                  spmm_stream)

    n = 640
    dense = (rng.uniform(size=(n, n)) < 0.05).astype(np.float32) * rng.normal(
        size=(n, n)
    ).astype(np.float32)
    dense[128:256, :] = 0.0      # empty row block
    dense[512:, 512:] = 0.0      # thin final row -> exercises the nnz clamp
    g = bsr.bsr_from_dense(dense, block=128)
    x = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)
    row_ptr = row_ptr_from_rows(g.row_of, g.num_row_blocks)
    args = (jnp.asarray(g.values), jnp.asarray(row_ptr), jnp.asarray(g.col_of),
            jnp.asarray(x))
    y_base = np.asarray(spmm_stream(*args, interpret=True))
    assert can_pin_x(g.padded_nodes, 128, 4)
    for kw in (dict(chunk=2, n_buf=2), dict(chunk=4, n_buf=3),
               dict(pin_x=True, chunk=4, n_buf=2),
               dict(pin_x=True, chunk=64, n_buf=2)):  # chunk > nnz clamps
        y = np.asarray(spmm_stream(*args, interpret=True, **kw))
        np.testing.assert_allclose(y, y_base, atol=0, rtol=0, err_msg=str(kw))


def test_spmm_pret_matches_spmm_and_grads(rng):
    """spmm_pret (hoisted-A^T variant): forward identical to spmm, backward
    steered by the caller-precomputed transpose gives the same gradients,
    and the transpose operand's own cotangent is exactly zero."""
    import jax
    import jax.numpy as jnp

    from multistgraph_tpu.ops.spmm import bsr_transpose, spmm_pret

    g, dense = _random_bsr(rng, n=256, density=0.08)
    x = jnp.asarray(rng.normal(size=(g.padded_nodes, 128)).astype(np.float32))
    dy_seed = jnp.asarray(rng.normal(size=(g.padded_nodes, 128)).astype(np.float32))
    vals = jnp.asarray(g.values)
    row, col = jnp.asarray(g.row_of), jnp.asarray(g.col_of)
    pre_t = bsr_transpose(vals, row, col, g.padded_nodes // BLOCK)

    y_plain = spmm(vals, row, col, x, interpret=True)
    y_pret = spmm_pret(vals, pre_t, row, col, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pret), np.asarray(y_plain), atol=1e-5)

    def loss(fn, values, xx):
        return jnp.sum(fn(values, xx) * dy_seed)

    d_plain = jax.grad(lambda v, xx: loss(
        lambda vv, q: spmm(vv, row, col, q, interpret=True), v, xx),
        argnums=(0, 1))(vals, x)
    d_pret = jax.grad(lambda v, xx: loss(
        lambda vv, q: spmm_pret(vv, pre_t, row, col, q, interpret=True), v, xx),
        argnums=(0, 1))(vals, x)
    np.testing.assert_allclose(np.asarray(d_pret[0]), np.asarray(d_plain[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_pret[1]), np.asarray(d_plain[1]), atol=1e-4)

    # the transpose is a backward-only hint: its cotangent must be zero
    dvt = jax.grad(lambda vt: jnp.sum(spmm_pret(
        vals, (vt, pre_t[1], pre_t[2]), row, col, x, interpret=True)))(pre_t[0])
    assert float(jnp.abs(dvt).max()) == 0.0
