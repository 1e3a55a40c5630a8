"""Multi-chip SparseATGCN (boundary-exchange backend) vs single-chip numerics.

The north-star config (BASELINE.json config 5): edge-partitioned graph,
boundary all_to_all feature exchange, node-sharded activations. These tests
prove the distributed backend computes the SAME forward, loss, gradients and
optimizer update as the verified single-chip sparse model — parameter trees
are identical by construction, so params transplant directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multistgraph_tpu.models.sparse_atgcn import (
    build_sparse_atgcn,
    build_sparse_atgcn_dist,
    init_with_graph,
)
from multistgraph_tpu.ops import bsr
from multistgraph_tpu.parallel import make_mesh

BLOCK = 128
N_BLOCKS = 8
N_PAD = N_BLOCKS * BLOCK


def _graph(rng, density=0.10):
    dense = (rng.uniform(size=(N_PAD, N_PAD)) < density).astype(np.float32) * rng.normal(
        size=(N_PAD, N_PAD)
    ).astype(np.float32)
    return bsr.bsr_from_dense(dense, block=BLOCK)


def _config(**overrides):
    cfg = {
        "output_window": 2, "output_dim": 1, "rnn_units": 8, "num_layers": 2,
        "embed_dim_adj": 4, "adpadj": "none", "node_conditioned": "off",
        "embed_dim_node": 4,
    }
    cfg.update(overrides)
    return cfg


def _setup(rng, n_dev, **cfg_overrides):
    graph = _graph(rng)
    cfg = _config(**cfg_overrides)
    mesh = make_mesh(n_dev, axes=("node",))
    single = build_sparse_atgcn(graph, cfg, interpret=True)
    dist = build_sparse_atgcn_dist(graph, cfg, mesh, interpret=True)
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    params_s = init_with_graph(single, jax.random.PRNGKey(0), x)
    params_d = init_with_graph(dist, jax.random.PRNGKey(0), x)
    # identical parameter trees by construction — transplant to be exact
    assert set(params_s["params"]) == set(params_d["params"])
    params_d = {"params": params_s["params"], "graph": params_d["graph"]}
    x_sharded = jax.device_put(x, NamedSharding(mesh, P(None, None, "node", None)))
    return single, dist, params_s, params_d, x, x_sharded, mesh


@pytest.mark.parametrize("n_dev", [2, 4])
def test_forward_matches_single_chip(rng, n_dev):
    single, dist, ps, pd, x, x_sh, mesh = _setup(rng, n_dev)
    want = np.asarray(single.apply(ps, x, train=False))
    got = np.asarray(jax.jit(lambda p, xx: dist.apply(p, xx, train=False))(pd, x_sh))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_forward_matches_with_adaptive_and_factored(rng):
    single, dist, ps, pd, x, x_sh, mesh = _setup(
        rng, 4, adpadj="unidirection", node_conditioned="factored"
    )
    want = np.asarray(single.apply(ps, x, train=False))
    got = np.asarray(jax.jit(lambda p, xx: dist.apply(p, xx, train=False))(pd, x_sh))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_train_step_matches_single_chip(rng):
    """One full loss->grad->adam update must agree across backends, proving
    gradient flow through all_to_all + local/remote SpMM + SDDMM softmax."""
    single, dist, ps, pd, x, x_sh, mesh = _setup(rng, 4, adpadj="unidirection")
    y = jnp.asarray(np.abs(rng.normal(size=(2, 2, N_PAD, 1))).astype(np.float32))
    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, None, "node", None)))
    opt = optax.adam(1e-3)

    def make_step(model):
        def loss_fn(trainable, graph, xx, yy):
            pred = model.apply({"params": trainable, "graph": graph}, xx, train=False)
            return jnp.abs(pred - yy).mean()

        def step(params, opt_state, xx, yy):
            loss, grads = jax.value_and_grad(loss_fn)(params["params"], params["graph"], xx, yy)
            updates, opt_state = opt.update(grads, opt_state, params["params"])
            new = optax.apply_updates(params["params"], updates)
            return loss, grads, new

        return jax.jit(step)

    opt_state = opt.init(ps["params"])
    loss_s, grads_s, new_s = make_step(single)(ps, opt_state, x, y)
    loss_d, grads_d, new_d = make_step(dist)(pd, opt_state, x_sh, y_sh)

    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=1e-5, rtol=1e-5)
    for key in grads_s:
        np.testing.assert_allclose(
            np.asarray(grads_d[key]), np.asarray(grads_s[key]),
            atol=5e-4, rtol=5e-3, err_msg="grad mismatch for {}".format(key),
        )
    for key in new_s:
        np.testing.assert_allclose(
            np.asarray(new_d[key]), np.asarray(new_s[key]),
            atol=5e-4, rtol=5e-3, err_msg="update mismatch for {}".format(key),
        )
    # adaptive embeddings receive gradient through the distributed path
    assert np.abs(np.asarray(grads_d["node_vec1"])).sum() > 0


def test_dist_graph_arrays_are_node_sharded(rng):
    _single, dist, _ps, pd, _x, _x_sh, mesh = _setup(rng, 4)
    for key, arr in pd["graph"].items():
        spec = arr.sharding.spec
        assert spec and spec[0] == "node", "{} not sharded over node axis".format(key)


def _hub_split_graph(rng, num_edges=6000, num_hubs=3):
    from multistgraph_tpu.ops.hybrid import split_hub_columns

    n_local = int(num_edges * 0.75)
    src_l = rng.integers(0, N_PAD, n_local)
    dst_l = np.clip(src_l + rng.integers(-30, 31, n_local), 0, N_PAD - 1)
    hubs = rng.choice(N_PAD, num_hubs, replace=False)
    src_h = rng.integers(0, N_PAD, num_edges - n_local)
    dst_h = hubs[rng.integers(0, num_hubs, num_edges - n_local)]
    src = np.concatenate([src_l, src_h])
    dst = np.concatenate([dst_l, dst_h])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    return split_hub_columns(src, dst, w, N_PAD, BLOCK, min_row_blocks=1)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_hub_split_dist_matches_single_chip(rng, n_dev):
    """Hub-split HybridGraph through the DISTRIBUTED backend: the remainder
    edge-partitions (3x smaller boundary exchange, DESIGN §5) and the hub
    features rebuild via one (H, F) psum; a full train step must equal the
    single-chip hub-split model."""
    hy = _hub_split_graph(rng)
    assert hy.num_hubs > 0
    cfg = _config(adpadj="unidirection")
    mesh = make_mesh(n_dev, axes=("node",))
    single = build_sparse_atgcn(hy, cfg, interpret=True)
    dist = build_sparse_atgcn_dist(hy, cfg, mesh, interpret=True)
    assert dist.dist_plan.hub_values is not None
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    ps = init_with_graph(single, jax.random.PRNGKey(0), x)
    pd = init_with_graph(dist, jax.random.PRNGKey(0), x)
    assert set(ps["params"]) == set(pd["params"])
    pd = {"params": ps["params"], "graph": pd["graph"]}
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None, "node", None)))
    y = jnp.asarray(np.abs(rng.normal(size=(2, 2, N_PAD, 1))).astype(np.float32))
    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, None, "node", None)))

    def loss_grads(model, params, xx, yy):
        def loss_fn(trainable):
            pred = model.apply({"params": trainable, "graph": params["graph"]},
                               xx, train=False)
            return jnp.abs(pred - yy).mean()

        return jax.jit(jax.value_and_grad(loss_fn))(params["params"])

    loss_s, grads_s = loss_grads(single, ps, x, y)
    loss_d, grads_d = loss_grads(dist, pd, x_sh, y_sh)
    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=1e-5, rtol=1e-5)
    for key in grads_s:
        np.testing.assert_allclose(
            np.asarray(grads_d[key]), np.asarray(grads_s[key]),
            atol=5e-4, rtol=5e-3, err_msg="grad mismatch for {}".format(key))


def _tail_split_graph(rng, num_edges=9000):
    """Block-diagonal structured edges (stay BSR) + uniform scattered edges
    (route through the per-row tail exchange)."""
    from multistgraph_tpu.ops.hybrid import split_scattered_tail

    n_struct = int(num_edges * 0.6)
    src_s = rng.integers(0, N_PAD, n_struct)
    dst_s = (src_s // BLOCK) * BLOCK + rng.integers(0, BLOCK, n_struct)
    src_u = rng.integers(0, N_PAD, num_edges - n_struct)
    dst_u = rng.integers(0, N_PAD, num_edges - n_struct)
    src = np.concatenate([src_s, src_u])
    dst = np.concatenate([dst_s, dst_u])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    # default min_fill (block//2): the ~56-edges/tile scattered part tails,
    # the ~675-edges/tile block-diagonal part stays BSR
    return split_scattered_tail(src, dst, w, N_PAD, BLOCK)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_tail_split_dist_matches_single_chip(rng, n_dev):
    """TailGraph through the DISTRIBUTED backend (round 4): scattered COO
    edges partitioned by destination-row shard, cross-shard source rows
    riding a per-ROW all_to_all. A full loss+grad must equal the verified
    single-chip tail model — the planted-partition 1M family's tractable
    form is now trainable distributed (VERDICT r3 item 3)."""
    tg = _tail_split_graph(rng)
    assert tg.num_tail_edges > 0 and tg.bsr.nnz_blocks > 0
    cfg = _config(adpadj="unidirection")
    mesh = make_mesh(n_dev, axes=("node",))
    single = build_sparse_atgcn(tg, cfg, interpret=True)
    dist = build_sparse_atgcn_dist(tg, cfg, mesh, interpret=True)
    plan = dist.dist_plan
    assert plan.tail_local_w is not None
    assert float(plan.tail_remote_w.sum()) > 0  # cross-shard tail edges exist
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    ps = init_with_graph(single, jax.random.PRNGKey(0), x)
    pd = init_with_graph(dist, jax.random.PRNGKey(0), x)
    assert set(ps["params"]) == set(pd["params"])
    pd = {"params": ps["params"], "graph": pd["graph"]}
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None, "node", None)))
    y = jnp.asarray(np.abs(rng.normal(size=(2, 2, N_PAD, 1))).astype(np.float32))
    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, None, "node", None)))

    def loss_grads(model, params, xx, yy):
        def loss_fn(trainable):
            pred = model.apply({"params": trainable, "graph": params["graph"]},
                               xx, train=False)
            return jnp.abs(pred - yy).mean()

        return jax.jit(jax.value_and_grad(loss_fn))(params["params"])

    loss_s, grads_s = loss_grads(single, ps, x, y)
    loss_d, grads_d = loss_grads(dist, pd, x_sh, y_sh)
    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=1e-5, rtol=1e-5)
    for key in grads_s:
        np.testing.assert_allclose(
            np.asarray(grads_d[key]), np.asarray(grads_s[key]),
            atol=5e-4, rtol=5e-3, err_msg="grad mismatch for {}".format(key))


def _band_split_graph(rng, num_edges=9000):
    from multistgraph_tpu.ops.band import split_band

    n_local = int(num_edges * 0.9)
    src_l = rng.integers(0, N_PAD, n_local)
    dst_l = np.clip(src_l + rng.integers(-150, 151, n_local), 0, N_PAD - 1)
    src_u = rng.integers(0, N_PAD, num_edges - n_local)
    dst_u = rng.integers(0, N_PAD, num_edges - n_local)
    src = np.concatenate([src_l, src_u])
    dst = np.concatenate([dst_l, dst_u])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    # max_offsets=3 keeps the band radius at 1 block so the neighbor-halo
    # constraint (radius <= per-shard blocks) holds at 4 shards of this
    # 8-block toy graph; at real scale per-shard blocks >> radius always
    return split_band(src, dst, w, N_PAD, BLOCK, max_offsets=3)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_band_dist_matches_single_chip(rng, n_dev):
    """BandGraph through the DISTRIBUTED backend (round 4): offset diagonals
    row-sharded with a neighbor-halo ppermute exchange; the COO remainder
    hub/tail splits exactly as single-chip. Loss + gradients must match."""
    bg = _band_split_graph(rng)
    assert len(bg.offsets) > 0 and bg.rest_w.shape[0] > 0
    cfg = _config(adpadj="none")
    mesh = make_mesh(n_dev, axes=("node",))
    single = build_sparse_atgcn(bg, cfg, interpret=True)
    dist = build_sparse_atgcn_dist(bg, cfg, mesh, interpret=True)
    plan = dist.dist_plan
    assert plan.band_values is not None and plan.band_radius >= 1
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    ps = init_with_graph(single, jax.random.PRNGKey(0), x)
    pd = init_with_graph(dist, jax.random.PRNGKey(0), x)
    assert set(ps["params"]) == set(pd["params"])
    pd = {"params": ps["params"], "graph": pd["graph"]}
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None, "node", None)))
    y = jnp.asarray(np.abs(rng.normal(size=(2, 2, N_PAD, 1))).astype(np.float32))
    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, None, "node", None)))

    def loss_grads(model, params, xx, yy):
        def loss_fn(trainable):
            pred = model.apply({"params": trainable, "graph": params["graph"]},
                               xx, train=False)
            return jnp.abs(pred - yy).mean()

        return jax.jit(jax.value_and_grad(loss_fn))(params["params"])

    loss_s, grads_s = loss_grads(single, ps, x, y)
    loss_d, grads_d = loss_grads(dist, pd, x_sh, y_sh)
    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=1e-5, rtol=1e-5)
    for key in grads_s:
        np.testing.assert_allclose(
            np.asarray(grads_d[key]), np.asarray(grads_s[key]),
            atol=5e-4, rtol=5e-3, err_msg="grad mismatch for {}".format(key))


@pytest.mark.parametrize("softmax", ["sampled", "dense_corrected"])
def test_band_dist_adaptive_matches_single_chip(rng, softmax):
    """Adaptive view at the band pattern, distributed (round 4): scored
    shard-locally from the replicated E1/E2 (zero communication), applied
    through the same halo'd band custom VJP. Loss + gradients — including
    node_vec1/2 through the shard_map transpose psum — must equal the
    single-chip band model for both softmax semantics."""
    bg = _band_split_graph(rng)
    cfg = _config(adpadj="unidirection", adaptive_softmax=softmax)
    mesh = make_mesh(4, axes=("node",))
    single = build_sparse_atgcn(bg, cfg, interpret=True)
    dist = build_sparse_atgcn_dist(bg, cfg, mesh, interpret=True)
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    ps = init_with_graph(single, jax.random.PRNGKey(0), x)
    pd = init_with_graph(dist, jax.random.PRNGKey(0), x)
    assert set(ps["params"]) == set(pd["params"])
    pd = {"params": ps["params"], "graph": pd["graph"]}
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None, "node", None)))
    y = jnp.asarray(np.abs(rng.normal(size=(2, 2, N_PAD, 1))).astype(np.float32))
    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, None, "node", None)))

    def loss_grads(model, params, xx, yy):
        def loss_fn(trainable):
            pred = model.apply({"params": trainable, "graph": params["graph"]},
                               xx, train=False)
            return jnp.abs(pred - yy).mean()

        return jax.jit(jax.value_and_grad(loss_fn))(params["params"])

    loss_s, grads_s = loss_grads(single, ps, x, y)
    loss_d, grads_d = loss_grads(dist, pd, x_sh, y_sh)
    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=1e-5, rtol=1e-5)
    for key in grads_s:
        np.testing.assert_allclose(
            np.asarray(grads_d[key]), np.asarray(grads_s[key]),
            atol=5e-4, rtol=5e-3, err_msg="grad mismatch for {}".format(key))
    assert np.abs(np.asarray(grads_d["node_vec1"])).sum() > 0


def test_partition_rejects_unknown_graph_type():
    from multistgraph_tpu.ops.spmm_boundary import partition_bsr_boundary

    with pytest.raises(TypeError, match="BandGraph"):
        partition_bsr_boundary(object(), 2)


def test_dist_bf16_matches_single_chip_bf16(rng):
    """compute_dtype='bfloat16' through the DISTRIBUTED backend (round 5):
    the boundary aggregation accumulates f32 and must fold back to the
    compute dtype before re-entering the scan — without that cast the carry
    promotes to f32 and the scan fails to trace (the bug found AOT-compiling
    the 1M multi-chip workload, tools/aot_multichip_1m.py). Loss must match
    the single-chip bf16 model to bf16 tolerance."""
    graph = _graph(rng)
    cfg = _config(adpadj="unidirection", compute_dtype="bfloat16", remat=True)
    mesh = make_mesh(4, axes=("node",))
    single = build_sparse_atgcn(graph, cfg, interpret=True)
    dist = build_sparse_atgcn_dist(graph, cfg, mesh, interpret=True)
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    ps = init_with_graph(single, jax.random.PRNGKey(0), x)
    pd = init_with_graph(dist, jax.random.PRNGKey(0), x)
    pd = {"params": ps["params"], "graph": pd["graph"]}
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None, "node", None)))
    y = jnp.asarray(np.abs(rng.normal(size=(2, 2, N_PAD, 1))).astype(np.float32))
    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, None, "node", None)))

    def loss_of(model, params, xx, yy):
        def loss_fn(trainable):
            pred = model.apply({"params": trainable, "graph": params["graph"]},
                               xx, train=False)
            return jnp.abs(pred - yy).mean()

        return jax.jit(jax.value_and_grad(loss_fn))(params["params"])

    loss_s, grads_s = loss_of(single, ps, x, y)
    loss_d, grads_d = loss_of(dist, pd, x_sh, y_sh)
    # bf16 compute: forward/backward round differently through the exchange
    # order, so tolerances are bf16-scale, not f32-scale
    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=2e-2, rtol=2e-2)
    gn_s = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                              for g in jax.tree_util.tree_leaves(grads_s))))
    gn_d = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                              for g in jax.tree_util.tree_leaves(grads_d))))
    assert abs(gn_d - gn_s) <= 5e-2 + 5e-2 * gn_s, (gn_d, gn_s)
