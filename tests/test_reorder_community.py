"""Community (label-propagation) reordering for BSR construction.

Reference counterpart: none — the reference is dense-only (N<=403); this is
part of the TPU-native sparse scale path (BASELINE configs 4-5,
docs/DESIGN.md §10). Complements the RCM ordering test in tests/test_spmm.py.
"""

import numpy as np
import pytest

from multistgraph_tpu.ops.bsr import (
    apply_node_order,
    bsr_from_coo,
    community_order,
    invert_node_order,
)


def planted_partition(num_nodes=4096, num_comms=8, deg_in=12, deg_out=0.125, seed=0):
    """Graph with clear communities but ids scrambled across the range —
    the worst case for raw tiling, the best case for clustering."""
    rng = np.random.default_rng(seed)
    comm_of = rng.permutation(np.arange(num_nodes) % num_comms)
    members = [np.flatnonzero(comm_of == c) for c in range(num_comms)]
    src_parts, dst_parts = [], []
    for c in range(num_comms):
        m = members[c]
        src_parts.append(m[rng.integers(0, len(m), len(m) * deg_in)])
        dst_parts.append(members[c][rng.integers(0, len(m), len(m) * deg_in)])
    n_out = int(num_nodes * deg_out)
    src_parts.append(rng.integers(0, num_nodes, n_out))
    dst_parts.append(rng.integers(0, num_nodes, n_out))
    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    w = rng.uniform(0.1, 1.0, len(src)).astype(np.float32)
    return src, dst, w


def test_community_order_is_permutation():
    src, dst, _ = planted_partition(num_nodes=512, num_comms=8)
    perm = community_order(src, dst, 512)
    assert sorted(perm.tolist()) == list(range(512))


def test_community_reorder_reduces_blocks_below_rcm():
    n = 4096
    src, dst, w = planted_partition(num_nodes=n)
    plain = bsr_from_coo(src, dst, w, n)
    rcm = bsr_from_coo(src, dst, w, n, reorder="rcm")
    comm = bsr_from_coo(src, dst, w, n, reorder="community")
    # scrambled planted partition: clustering must crush the tile count
    assert comm.nnz_blocks < 0.5 * plain.nnz_blocks, (comm.nnz_blocks, plain.nnz_blocks)
    # and beat bandwidth-minimizing RCM on community structure
    assert comm.nnz_blocks <= rcm.nnz_blocks, (comm.nnz_blocks, rcm.nnz_blocks)


def test_community_reorder_preserves_aggregation():
    import jax.numpy as jnp

    from multistgraph_tpu.ops.spmm import spmm_jax

    n = 512
    src, dst, w = planted_partition(num_nodes=n, num_comms=8, seed=3)
    plain = bsr_from_coo(src, dst, w, n)
    comm = bsr_from_coo(src, dst, w, n, reorder="community")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(plain.padded_nodes, 32)).astype(np.float32)

    y_plain = np.asarray(spmm_jax(
        jnp.asarray(plain.values), jnp.asarray(plain.row_of),
        jnp.asarray(plain.col_of), jnp.asarray(x),
        out_blocks=plain.num_row_blocks))

    x_r = apply_node_order(x, comm.perm)
    y_r = np.asarray(spmm_jax(
        jnp.asarray(comm.values), jnp.asarray(comm.row_of),
        jnp.asarray(comm.col_of), jnp.asarray(x_r),
        out_blocks=comm.num_row_blocks))
    y_back = invert_node_order(y_r, comm.perm)
    np.testing.assert_allclose(y_back[:n], y_plain[:n], rtol=1e-5, atol=1e-5)


def test_unknown_reorder_raises():
    src, dst, w = planted_partition(num_nodes=256, num_comms=4)
    with pytest.raises(ValueError, match="unknown reorder"):
        bsr_from_coo(src, dst, w, 256, reorder="metis")
