"""Boundary-exchange multi-device SpMM on the virtual CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm_boundary import boundary_spmm, partition_bsr_boundary
from multistgraph_tpu.parallel import make_mesh

BLOCK = 128


def _graph(rng, n_blocks=8, density=0.12):
    n = n_blocks * BLOCK
    dense = (rng.uniform(size=(n, n)) < density).astype(np.float32) * rng.normal(size=(n, n)).astype(
        np.float32
    )
    return bsr.bsr_from_dense(dense, block=BLOCK), dense


def test_partition_boundary_stats(rng):
    g, _ = _graph(rng)
    sh = partition_bsr_boundary(g, 4)
    assert 0 < sh.boundary_fraction <= 1
    assert sh.send_idx.shape[:2] == (4, 4)
    # a shard never "sends to itself" anything (own cols are local edges)
    for s in range(4):
        # send set to self must be empty (padded zeros only)
        assert (sh.send_idx[s, s] == 0).all()


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_boundary_spmm_matches_dense(rng, n_dev):
    g, dense = _graph(rng)
    sh = partition_bsr_boundary(g, n_dev)
    x = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)
    mesh = make_mesh(n_dev, axes=("node",))
    with mesh:
        y = np.asarray(boundary_spmm(sh, jnp.asarray(x), mesh, interpret=True))
    want = np.zeros_like(x)
    want[: g.num_nodes] = dense @ x[: g.num_nodes]
    np.testing.assert_allclose(y, want, atol=1e-3, rtol=1e-3)


def test_boundary_spmm_local_only_graph(rng):
    # block-diagonal graph: zero boundary, no features exchanged beyond padding
    n_blocks, n_dev = 8, 4
    n = n_blocks * BLOCK
    dense = np.zeros((n, n), np.float32)
    per = n // n_dev
    for s in range(n_dev):
        blockvals = rng.normal(size=(per, per)).astype(np.float32)
        dense[s * per : (s + 1) * per, s * per : (s + 1) * per] = blockvals
    g = bsr.bsr_from_dense(dense, block=BLOCK)
    sh = partition_bsr_boundary(g, n_dev)
    assert sh.boundary_fraction == 0.0
    x = rng.normal(size=(n, 128)).astype(np.float32)
    mesh = make_mesh(n_dev, axes=("node",))
    with mesh:
        y = np.asarray(boundary_spmm(sh, jnp.asarray(x), mesh, interpret=True))
    np.testing.assert_allclose(y, dense @ x, atol=1e-3, rtol=1e-3)


def test_boundary_cheaper_than_allgather_on_local_graphs(rng):
    # spatially local graph: boundary fraction must be far below 1 (the
    # all-gather equivalent), which is the point of the exchange plan
    g, _ = bsr.random_spatial_graph(8 * BLOCK, avg_degree=8, locality=100, num_hubs=1, seed=0)
    sh = partition_bsr_boundary(g, 4)
    assert sh.boundary_fraction < 0.3


def test_partition_buffer_sizing_with_partial_coverage():
    """Regression: pack() sized its buffers as max(num_edges, rows_per_shard),
    but a shard holds its edges PLUS one zero coverage block per uncovered
    row — a dense-ish shard with partial row coverage overflowed the buffer
    (IndexError at 49k nodes / 4 shards). The plan must build and preserve
    every edge."""
    g, _ = bsr.random_spatial_graph(
        49152, 16, locality=256, num_hubs=8, seed=0)
    plan = partition_bsr_boundary(g, 4)
    # all edges preserved: masked local+remote block values reproduce the sum
    total = float(np.abs(g.values).sum())
    kept = float(
        (np.abs(plan.local_values) * plan.local_mask[..., None, None]).sum()
        + (np.abs(plan.remote_values) * plan.remote_mask[..., None, None]).sum())
    np.testing.assert_allclose(kept, total, rtol=1e-6)
