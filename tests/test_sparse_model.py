"""SparseATGCN: numeric cross-check against a dense emulation + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.models.sparse_atgcn import build_sparse_atgcn, init_with_graph
from multistgraph_tpu.ops import bsr

BLOCK = 128
N_PAD = 2 * BLOCK


def _graph(rng, density=0.05):
    dense = (rng.uniform(size=(N_PAD, N_PAD)) < density).astype(np.float32) * rng.normal(
        size=(N_PAD, N_PAD)
    ).astype(np.float32)
    return bsr.bsr_from_dense(dense, block=BLOCK), dense


def _config(**overrides):
    cfg = {
        "output_window": 3, "output_dim": 1, "rnn_units": 8, "num_layers": 2,
        "embed_dim_adj": 4, "adpadj": "none", "node_conditioned": "off",
        "embed_dim_node": 4,
    }
    cfg.update(overrides)
    return cfg


def _dense_emulation(params, dense_adj, x, cfg, node_emb=None):
    """Re-derive the sparse model's math with plain numpy (shared weights)."""
    b, t, n, f = x.shape
    h = cfg["rnn_units"]
    supports = [np.eye(n, dtype=np.float32), dense_adj]

    def aggregate(v):  # v (N, B, C) -> (K, N, B, C)
        return np.stack([s @ v.reshape(n, -1) for s in supports]).reshape(2, n, *v.shape[1:])

    def mix(stack, pool, bias):  # stack (K,N,B,C)
        return np.einsum("knbi,kio->nbo", stack, pool) + bias[0][None, None]

    cur = x.transpose(1, 2, 0, 3)  # (T,N,B,C)
    p = params["params"]
    for layer in range(cfg["num_layers"]):
        pg, bg = np.asarray(p["l{}_gate_pool".format(layer)]), np.asarray(p["l{}_gate_bias".format(layer)])
        pu, bu = np.asarray(p["l{}_update_pool".format(layer)]), np.asarray(p["l{}_update_bias".format(layer)])
        state = np.zeros((n, b, h), np.float32)
        outs = []
        for ti in range(t):
            xt = cur[ti]
            ax = aggregate(xt)
            ah = aggregate(state)
            zr = 1 / (1 + np.exp(-mix(np.concatenate([ax, ah], -1), pg, bg)))
            z, r = zr[..., :h], zr[..., h:]
            azh = aggregate(z * state)
            hc = np.tanh(mix(np.concatenate([ax, azh], -1), pu, bu))
            state = r * state + (1 - r) * hc
            outs.append(state)
        cur = np.stack(outs)
    last = cur[-1]
    out = last @ np.asarray(p["end_kernel"]) + np.asarray(p["end_bias"])[0]
    out = out.reshape(n, b, cfg["output_window"], cfg["output_dim"])
    return out.transpose(1, 2, 0, 3)


def test_sparse_matches_dense_emulation(rng):
    graph, dense = _graph(rng)
    cfg = _config()
    model = build_sparse_atgcn(graph, cfg, interpret=True)
    x = jnp.asarray(rng.normal(size=(2, 4, N_PAD, 1)).astype(np.float32))
    params = init_with_graph(model, jax.random.PRNGKey(0), x)
    got = np.asarray(model.apply(params, x, train=False))
    pad_dense = np.zeros((N_PAD, N_PAD), np.float32)
    pad_dense[: graph.num_nodes, : graph.num_nodes] = dense
    want = _dense_emulation(params, pad_dense, np.asarray(x), cfg)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_adaptive_path_runs_and_grads(rng):
    graph, _ = _graph(rng)
    cfg = _config(adpadj="unidirection")
    model = build_sparse_atgcn(graph, cfg, interpret=True)
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    params = init_with_graph(model, jax.random.PRNGKey(0), x)
    assert "node_vec1" in params["params"]

    def loss(trainable):
        return jnp.mean(jnp.square(
            model.apply({"params": trainable, "graph": params["graph"]}, x, train=False)
        ))

    val, grads = jax.value_and_grad(loss)(params["params"])
    assert np.isfinite(float(val))
    g1 = np.abs(np.asarray(grads["node_vec1"])).sum()
    assert g1 > 0  # adaptive embedding receives gradient through SDDMM+softmax+SpMM


def test_factored_node_conditioning(rng):
    graph, _ = _graph(rng)
    cfg = _config(node_conditioned="factored", embed_dim_node=4)
    model = build_sparse_atgcn(graph, cfg, interpret=True)
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    params = init_with_graph(model, jax.random.PRNGKey(0), x)
    assert params["params"]["l0_gate_pool"].shape[0] == 4  # expert dim leads
    out = model.apply(params, x, train=False)
    assert out.shape == (2, 3, N_PAD, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_remat_matches_plain(rng):
    graph, _ = _graph(rng)
    x = jnp.asarray(rng.normal(size=(1, 3, N_PAD, 1)).astype(np.float32))
    m1 = build_sparse_atgcn(graph, _config(), interpret=True)
    params = init_with_graph(m1, jax.random.PRNGKey(0), x)
    m2 = build_sparse_atgcn(graph, _config(remat=True), interpret=True)
    o1 = np.asarray(m1.apply(params, x, train=False))
    o2 = np.asarray(m2.apply(params, x, train=False))
    np.testing.assert_allclose(o1, o2, atol=1e-5)


def _hub_edges(rng, num_edges=4000, num_hubs=3):
    n_local = int(num_edges * 0.75)
    src_l = rng.integers(0, N_PAD, n_local)
    dst_l = np.clip(src_l + rng.integers(-30, 31, n_local), 0, N_PAD - 1)
    hubs = rng.choice(N_PAD, num_hubs, replace=False)
    src_h = rng.integers(0, N_PAD, num_edges - n_local)
    dst_h = hubs[rng.integers(0, num_hubs, num_edges - n_local)]
    src = np.concatenate([src_l, src_h])
    dst = np.concatenate([dst_l, dst_h])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    return src, dst, w


def test_hub_split_support_matches_plain_bsr(rng):
    """A hub-split HybridGraph support must be numerically the same operator
    as the unsplit BSR of the same edges (BSR remainder + skinny hub matmul
    sum to the identical matrix)."""
    from multistgraph_tpu.ops.hybrid import split_hub_columns

    src, dst, w = _hub_edges(rng)
    plain = bsr.bsr_from_coo(src, dst, w, N_PAD, BLOCK)
    hy = split_hub_columns(src, dst, w, N_PAD, BLOCK, min_row_blocks=1)
    assert hy.num_hubs > 0 and hy.bsr.nnz_blocks < plain.nnz_blocks
    cfg = _config()
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    m_plain = build_sparse_atgcn(plain, cfg, interpret=True)
    p_plain = init_with_graph(m_plain, jax.random.PRNGKey(0), x)
    m_hy = build_sparse_atgcn(hy, cfg, interpret=True)
    p_hy = init_with_graph(m_hy, jax.random.PRNGKey(0), x)
    o_plain = np.asarray(m_plain.apply(p_plain, x, train=False))
    o_hy = np.asarray(m_hy.apply(
        {"params": p_plain["params"], "graph": p_hy["graph"]}, x, train=False))
    np.testing.assert_allclose(o_hy, o_plain, atol=2e-4, rtol=2e-4)


def test_tail_split_support_matches_plain_bsr(rng):
    from multistgraph_tpu.ops.hybrid import split_scattered_tail

    src, dst, w = _hub_edges(rng)
    plain = bsr.bsr_from_coo(src, dst, w, N_PAD, BLOCK)
    tg = split_scattered_tail(src, dst, w, N_PAD, BLOCK, min_fill=400)
    assert tg.num_tail_edges > 0
    cfg = _config()
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    m_plain = build_sparse_atgcn(plain, cfg, interpret=True)
    p_plain = init_with_graph(m_plain, jax.random.PRNGKey(0), x)
    m_tg = build_sparse_atgcn(tg, cfg, interpret=True)
    p_tg = init_with_graph(m_tg, jax.random.PRNGKey(0), x)
    o_plain = np.asarray(m_plain.apply(p_plain, x, train=False))
    o_tg = np.asarray(m_tg.apply(
        {"params": p_plain["params"], "graph": p_tg["graph"]}, x, train=False))
    np.testing.assert_allclose(o_tg, o_plain, atol=2e-4, rtol=2e-4)


def test_hybrid_support_trains(rng):
    """Gradients flow through the hybrid aggregation (graph arrays are
    constants; trainable params still receive cotangents through the hub
    matmul and segment-sum tail)."""
    from multistgraph_tpu.ops.hybrid import split_hub_columns

    src, dst, w = _hub_edges(rng, num_edges=2000)
    hy = split_hub_columns(src, dst, w, N_PAD, BLOCK, min_row_blocks=1)
    cfg = _config(adpadj="unidirection")
    x = jnp.asarray(rng.normal(size=(1, 3, N_PAD, 1)).astype(np.float32))
    model = build_sparse_atgcn(hy, cfg, interpret=True)
    params = init_with_graph(model, jax.random.PRNGKey(0), x)

    def loss(trainable):
        return jnp.mean(jnp.square(model.apply(
            {"params": trainable, "graph": params["graph"]}, x, train=False)))

    val, grads = jax.value_and_grad(loss)(params["params"])
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(grads["l0_gate_pool"])).sum() > 0


def test_band_decomposition_support_matches_plain_bsr(rng):
    """A BandGraph support (band diagonals + hub columns + COO tail,
    ops/band.py) must be numerically the same operator as the unsplit BSR
    of the same edges, including under the adaptive view (whose pattern is
    the band's block pattern — asserted a superset of the plain tiling)."""
    from multistgraph_tpu.ops.band import split_band

    src, dst, w = _hub_edges(rng, num_edges=6000)
    plain = bsr.bsr_from_coo(src, dst, w, N_PAD, BLOCK)
    bg = split_band(src, dst, w, N_PAD, BLOCK, min_fill_frac=1.0)
    assert len(bg.offsets) > 0 and bg.rest_w.shape[0] > 0
    cfg = _config()
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    m_plain = build_sparse_atgcn(plain, cfg, interpret=True)
    p_plain = init_with_graph(m_plain, jax.random.PRNGKey(0), x)
    m_band = build_sparse_atgcn(bg, cfg, interpret=True)
    p_band = init_with_graph(m_band, jax.random.PRNGKey(0), x)
    assert set(p_plain["params"]) == set(p_band["params"])
    o_plain = np.asarray(m_plain.apply(p_plain, x, train=False))
    o_band = np.asarray(m_band.apply(
        {"params": p_plain["params"], "graph": p_band["graph"]}, x, train=False))
    np.testing.assert_allclose(o_band, o_plain, atol=2e-4, rtol=2e-4)
    # adaptive view runs and takes gradients on the band pattern
    m_ad = build_sparse_atgcn(bg, _config(adpadj="unidirection"), interpret=True)
    p_ad = init_with_graph(m_ad, jax.random.PRNGKey(0), x)

    def loss(trainable):
        return jnp.mean(jnp.square(m_ad.apply(
            {"params": trainable, "graph": p_ad["graph"]}, x, train=False)))

    val, grads = jax.value_and_grad(loss)(p_ad["params"])
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(grads["node_vec1"])).sum() > 0


def test_band_packed_support_matches_unpacked(rng):
    """graph_band_packed=True stores the band PRE-PACKED (R, b, (2r+1)b)
    and serves it through spmm_band_packed (the measured 1M slab fast
    path, ops/band.py); predictions and gradients must match the
    per-offset-plane band model exactly — same param tree, so checkpoints
    move freely between the two storage forms."""
    from multistgraph_tpu.ops.band import split_band

    src, dst, w = _hub_edges(rng, num_edges=6000)
    bg = split_band(src, dst, w, N_PAD, BLOCK, min_fill_frac=1.0)
    assert len(bg.offsets) > 0
    cfg = _config(adpadj="unidirection")
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))
    m_plane = build_sparse_atgcn(bg, cfg, interpret=True)
    p_plane = init_with_graph(m_plane, jax.random.PRNGKey(0), x)
    m_pack = build_sparse_atgcn(bg, {**cfg, "graph_band_packed": True},
                                interpret=True)
    p_pack = init_with_graph(m_pack, jax.random.PRNGKey(0), x)
    assert set(p_plane["params"]) == set(p_pack["params"])
    assert "support0_band_packed" in p_pack["graph"]
    assert "support0_band_values" not in p_pack["graph"]

    def loss(model, graph, trainable):
        return jnp.mean(jnp.square(model.apply(
            {"params": trainable, "graph": graph}, x, train=False)))

    v_plane, g_plane = jax.value_and_grad(
        lambda t: loss(m_plane, p_plane["graph"], t))(p_plane["params"])
    v_pack, g_pack = jax.value_and_grad(
        lambda t: loss(m_pack, p_pack["graph"], t))(p_plane["params"])
    np.testing.assert_allclose(float(v_pack), float(v_plane),
                               atol=2e-5, rtol=2e-5)
    for k in g_plane:
        np.testing.assert_allclose(
            np.asarray(g_pack[k]), np.asarray(g_plane[k]),
            atol=2e-4, rtol=2e-3, err_msg=k)


def test_bf16_compute_dtype_trains_close_to_f32(rng):
    """compute_dtype='bfloat16' (the 1M-HBM-fit mode, docs/DESIGN.md §4):
    graph arrays are STORED bf16, activations/pools stream bf16, params and
    the prediction stay f32, and one training step tracks the f32 step."""
    graph, _ = _graph(rng)
    x = jnp.asarray(rng.normal(size=(2, 3, N_PAD, 1)).astype(np.float32))

    def one_step(cfg):
        model = build_sparse_atgcn(graph, cfg, interpret=True)
        params = init_with_graph(model, jax.random.PRNGKey(0), x)

        def loss(trainable):
            pred = model.apply(
                {"params": trainable, "graph": params["graph"]}, x, train=False)
            assert pred.dtype == jnp.float32
            return jnp.mean(jnp.square(pred))

        return jax.value_and_grad(loss)(params["params"]), params

    (v32, g32), _ = one_step(_config(adpadj="unidirection"))
    (v16, g16), p16 = one_step(
        _config(adpadj="unidirection", compute_dtype="bfloat16"))
    # graph value arrays actually stored in bf16 (footprint, not just stream)
    assert p16["graph"]["support0_values"].dtype == jnp.bfloat16
    assert abs(float(v16) - float(v32)) < 3e-2 * max(1.0, abs(float(v32)))
    n1 = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g16, jnp.float32(0)))
    assert np.isfinite(n1) and n1 > 0


def test_band_graph_honors_compute_dtype(rng):
    """Regression (round 4): the BandGraph branch of build_sparse_atgcn
    silently dropped compute_dtype — 'bf16' band benches ran f32
    activations, and the f32 backward accumulators OOM'd the 1M training
    point (docs/bench/train1m_band_t8_noadp_r4_OOM_f32bug.log)."""
    from multistgraph_tpu.ops.band import split_band

    n = 512
    src = rng.integers(0, n, 3000)
    dst = np.clip(src + rng.integers(-100, 101, 3000), 0, n - 1)
    w = rng.uniform(0.1, 1.0, 3000).astype(np.float32)
    bg = split_band(src, dst, w, n, BLOCK)
    model = build_sparse_atgcn(
        bg, _config(compute_dtype="bfloat16", remat=True), interpret=True)
    assert model.compute_dtype == "bfloat16"
    x = jnp.asarray(rng.normal(size=(1, 3, bg.padded_nodes, 1)).astype(np.float32))
    params = init_with_graph(model, jax.random.PRNGKey(0), x)
    assert params["graph"]["support0_band_values"].dtype == jnp.bfloat16

    def loss(tr):
        return jnp.mean(jnp.square(model.apply(
            {"params": tr, "graph": params["graph"]}, x, train=False)))

    val, grads = jax.value_and_grad(loss)(params["params"])
    assert np.isfinite(float(val))
    total = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), grads, jnp.float32(0)))
    assert np.isfinite(total) and total > 0


def test_adaptive_max_blocks_subsamples_pattern(rng):
    """adaptive_max_blocks caps the adaptive pattern to the K heaviest
    blocks (the 1M-scale HBM knob); K >= nnz leaves the pattern untouched,
    and the capped model still trains (finite loss + grads)."""
    n_pad = 512
    dense = (rng.uniform(size=(n_pad, n_pad)) < 0.2).astype(np.float32) \
        * rng.normal(size=(n_pad, n_pad)).astype(np.float32)
    graph = bsr.bsr_from_dense(dense, block=128)
    cfg = {"output_window": 2, "output_dim": 1, "rnn_units": 8,
           "num_layers": 1, "embed_dim_adj": 4, "adpadj": "unidirection"}
    full = build_sparse_atgcn(graph, dict(cfg), interpret=True)
    assert full.adaptive_pattern[0].shape[0] == graph.nnz_blocks

    k = graph.nnz_blocks // 2
    capped = build_sparse_atgcn(graph, dict(cfg, adaptive_max_blocks=k),
                                interpret=True)
    rows, cols = (np.asarray(a) for a in capped.adaptive_pattern)
    assert rows.shape[0] == k
    # capped pattern is a subset of the full pattern, still row-major sorted
    full_set = set(zip(np.asarray(graph.row_of), np.asarray(graph.col_of)))
    assert set(zip(rows, cols)) <= full_set
    assert all((rows[i], cols[i]) <= (rows[i + 1], cols[i + 1])
               for i in range(len(rows) - 1))
    # K >= nnz: untouched
    uncapped = build_sparse_atgcn(
        graph, dict(cfg, adaptive_max_blocks=graph.nnz_blocks + 5),
        interpret=True)
    assert uncapped.adaptive_pattern[0].shape[0] == graph.nnz_blocks

    x = jnp.asarray(rng.normal(size=(2, 3, n_pad, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 2, n_pad, 1)).astype(np.float32))
    params = init_with_graph(capped, jax.random.PRNGKey(0), x)

    def loss_fn(trainable):
        pred = capped.apply({"params": trainable,
                             "graph": params["graph"]}, x, train=False)
        return jnp.abs(pred - y).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params["params"])
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["node_vec1"]).sum()) > 0
