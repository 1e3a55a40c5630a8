"""Edge-partitioned multi-device SpMM on the virtual CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm_sharded import partition_bsr, sharded_spmm, sharded_spmm_reference
from multistgraph_tpu.parallel import make_mesh

BLOCK = 128


def _graph(rng, n_blocks=8, density=0.15):
    n = n_blocks * BLOCK
    dense = (rng.uniform(size=(n, n)) < density).astype(np.float32) * rng.normal(size=(n, n)).astype(
        np.float32
    )
    return bsr.bsr_from_dense(dense, block=BLOCK)


def test_partition_bsr_shapes(rng):
    g = _graph(rng)
    sh = partition_bsr(g, 4)
    assert sh.values.shape[0] == 4
    assert sh.row_of.max() < g.num_row_blocks // 4
    assert 0.0 <= sh.boundary_fraction <= 1.0
    with pytest.raises(ValueError):
        partition_bsr(g, 3)  # 8 row blocks not divisible by 3


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_spmm_matches_dense(rng, n_dev):
    g = _graph(rng)
    sh = partition_bsr(g, n_dev)
    x = rng.normal(size=(g.padded_nodes, 128)).astype(np.float32)
    mesh = make_mesh(n_dev, axes=("node",))
    with mesh:
        y = np.asarray(sharded_spmm(sh, jnp.asarray(x), mesh, interpret=True))
    want = sharded_spmm_reference(g, x)
    np.testing.assert_allclose(y, want, atol=1e-3, rtol=1e-3)


def test_sharded_spmm_uneven_shards_padded(rng):
    # heavily skewed graph: one shard gets most blocks, padding must be benign
    n_blocks = 4
    n = n_blocks * BLOCK
    dense = np.zeros((n, n), dtype=np.float32)
    dense[:BLOCK] = rng.normal(size=(BLOCK, n)).astype(np.float32)  # all edges in shard 0
    g = bsr.bsr_from_dense(dense, block=BLOCK)
    sh = partition_bsr(g, 2)
    x = rng.normal(size=(n, 128)).astype(np.float32)
    mesh = make_mesh(2, axes=("node",))
    with mesh:
        y = np.asarray(sharded_spmm(sh, jnp.asarray(x), mesh, interpret=True))
    np.testing.assert_allclose(y, dense @ x, atol=1e-3, rtol=1e-3)
