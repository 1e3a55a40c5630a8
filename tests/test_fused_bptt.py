"""fused_atgru_layer's hand-written BPTT must equal plain autodiff exactly.

The fused layer (models/multi_atgcn.py:fused_atgru_layer) restructures the
backward pass to avoid per-step accumulation of the expanded weight
cotangent; these tests compare value AND every input gradient against
jax.grad of the same recurrence expressed with the plain scan, plus the
full model forward/grad with fused_bptt on vs off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models.multi_atgcn import (
    _atgru_step_forward,
    build_multi_atgcn,
    fused_atgru_layer,
    make_loss_fn,
)

T, B, N, H, K = 5, 3, 7, 4, 2


def _inputs(rng):
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.5
    return dict(
        gate_x=f(T, B, N, 2 * H), upd_x=f(T, B, N, H),
        rg_x=f(T, B, N, 2 * H), ru_x=f(T, B, N, H),
        w_seq=jax.nn.sigmoid(f(T)), supports=f(K, N, N) / np.sqrt(N),
        wg_h=f(N, K, H, 2 * H) * 0.3, wu_h=f(N, K, H, H) * 0.3,
        bg=f(N, 2 * H), bu=f(N, H),
        rg_h=f(H, 2 * H), ru_h=f(H, H), rg_b=f(2 * H), ru_b=f(H),
        state0=f(B, N, H),
    )


def _reference_layer(**kw):
    def step(h, xs):
        h_new, _ = _atgru_step_forward(
            h, xs, kw["supports"], kw["wg_h"], kw["wu_h"], kw["bg"], kw["bu"],
            kw["rg_h"], kw["ru_h"], kw["rg_b"], kw["ru_b"]
        )
        return h_new, h_new

    _, states = jax.lax.scan(
        step, kw["state0"], (kw["gate_x"], kw["upd_x"], kw["rg_x"], kw["ru_x"], kw["w_seq"])
    )
    return states


ARG_ORDER = ("gate_x", "upd_x", "rg_x", "ru_x", "w_seq", "supports", "wg_h",
             "wu_h", "bg", "bu", "rg_h", "ru_h", "rg_b", "ru_b", "state0")


def test_forward_matches(rng):
    kw = _inputs(rng)
    got = fused_atgru_layer(None, *[kw[k] for k in ARG_ORDER])
    want = _reference_layer(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_bf16_compute_dtype_close(rng):
    kw = _inputs(rng)
    got = fused_atgru_layer(jnp.bfloat16, *[kw[k] for k in ARG_ORDER])
    want = _reference_layer(**kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05)

    def loss(args):
        return jnp.mean(jnp.square(fused_atgru_layer(jnp.bfloat16, *args)))

    g = jax.grad(loss)(tuple(kw[k] for k in ARG_ORDER))
    for k, a in zip(ARG_ORDER, g):
        assert np.isfinite(np.asarray(a, np.float32)).all(), k


def test_all_gradients_match_autodiff(rng):
    kw = _inputs(rng)
    keys = ("gate_x", "upd_x", "rg_x", "ru_x", "w_seq", "supports", "wg_h",
            "wu_h", "bg", "bu", "rg_h", "ru_h", "rg_b", "ru_b", "state0")
    # weight the output so every cotangent position is distinct
    wts = jnp.asarray(rng.normal(size=(T, B, N, H)).astype(np.float32))

    def loss_fused(args):
        return jnp.sum(fused_atgru_layer(None, *args) * wts)

    def loss_ref(args):
        return jnp.sum(_reference_layer(**dict(zip(keys, args))) * wts)

    args = tuple(kw[k] for k in keys)
    v1, g1 = jax.value_and_grad(loss_fused)(args)
    v2, g2 = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for k, a, b in zip(keys, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4,
            err_msg="gradient mismatch for {}".format(k),
        )


def _tiny_model_setup(_unused, fused):
    import pandas as pd

    rng = np.random.default_rng(5)  # identical build-time constants per call
    n = 6
    adj = np.abs(rng.normal(size=(n, n))).astype(np.float32)
    geo = pd.DataFrame({
        "geo_id": np.arange(n), "type": "Point",
        "coordinates": ["[{:.4f}, {:.4f}]".format(-77 + 0.01 * i, 38.9) for i in range(n)],
    })
    feature = {
        "num_nodes": n, "adj_mx": adj, "static": rng.normal(size=(n, 4)),
        "coordinate": geo, "ext_dim": 1, "output_dim": 1,
        "len_closeness": 24, "len_period": 24, "len_trend": 24, "scaler": None,
    }
    config = {
        "input_window": 24, "output_window": 6, "start_dim": 0, "end_dim": 1,
        "rnn_units": 4, "num_layers": 2, "cheb_order": 2,
        "embed_dim_node": 3, "embed_dim_adj": 3,
        "adjtype": "multi", "adpadj": "bidirection",
        "add_time_in_day": True, "load_dynamic": False,
        "fused_bptt": fused,
    }
    return build_multi_atgcn(config, feature), feature


def test_full_model_identical_with_and_without_fusion(rng):
    m_fused, _ = _tiny_model_setup(rng, True)
    m_plain, _ = _tiny_model_setup(rng, False)
    x = jnp.asarray(rng.normal(size=(2, 72, 6, 2)).astype(np.float32))
    y = jnp.abs(jnp.asarray(rng.normal(size=(2, 6, 6, 2)).astype(np.float32)))
    params = m_fused.init(jax.random.PRNGKey(0), x, train=False)

    class _Scaler:
        def inverse_transform(self, v):
            return v * 2.0 + 1.0

    lf_fused = make_loss_fn(m_fused, _Scaler())
    lf_plain = make_loss_fn(m_plain, _Scaler())
    batch = {"X": x, "y": y}
    v1, g1 = jax.value_and_grad(lambda p: lf_fused(p, batch, train=False))(params)
    v2, g2 = jax.value_and_grad(lambda p: lf_plain(p, batch, train=False))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    key = lambda item: jax.tree_util.keystr(item[0])  # noqa: E731
    for (k1, a), (k2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g2), key=key),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4,
            err_msg="model grad mismatch at {}".format(jax.tree_util.keystr(k1)),
        )


def test_full_model_bf16_close_to_f32(rng):
    """compute_dtype='bfloat16' (pool-side gate fold + direct bf16 expansion,
    models/multi_atgcn.py:_cell_weights) must stay close to exact f32 on the
    full model with adjtype='multi' — covers the gate-broadcast reshape and
    the bf16 hoisted-preactivation casts end to end."""
    m_f32, _ = _tiny_model_setup(rng, True)
    m_bf16 = m_f32.clone(compute_dtype="bfloat16")
    x = jnp.asarray(rng.normal(size=(2, 72, 6, 2)).astype(np.float32))
    y = jnp.abs(jnp.asarray(rng.normal(size=(2, 6, 6, 2)).astype(np.float32)))
    params = m_f32.init(jax.random.PRNGKey(0), x, train=False)
    out32 = m_f32.apply(params, x, train=False)
    out16 = m_bf16.apply(params, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=0.05, rtol=0.05
    )

    class _Scaler:
        def inverse_transform(self, v):
            return v * 2.0 + 1.0

    batch = {"X": x, "y": y}
    v32, g32 = jax.value_and_grad(
        lambda p: make_loss_fn(m_f32, _Scaler())(p, batch, train=False)
    )(params)
    v16, g16 = jax.value_and_grad(
        lambda p: make_loss_fn(m_bf16, _Scaler())(p, batch, train=False)
    )(params)
    np.testing.assert_allclose(float(v16), float(v32), rtol=0.05, atol=0.02)
    key = lambda item: jax.tree_util.keystr(item[0])  # noqa: E731
    for (k1, a), (k2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g16), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g32), key=key),
    ):
        assert a.dtype == b.dtype, "param cotangent dtype changed at {}".format(
            jax.tree_util.keystr(k1)
        )
        denom = np.maximum(np.abs(np.asarray(b)), 1e-2)
        rel = np.abs(np.asarray(a, np.float32) - np.asarray(b)) / denom
        assert float(np.median(rel)) < 0.15, "bf16 grads diverge at {}: median rel {}".format(
            jax.tree_util.keystr(k1), float(np.median(rel))
        )


def test_fused_q8_matches_exact_path_on_dequantized_weights():
    """fused_atgru_layer_q8 == fused_atgru_layer evaluated at the
    DEQUANTIZED weights (per-(n,o) scales commute with the contraction, and
    the STE backward equals autodiff of the quantized-weight function), to
    bf16 tolerance. Covers forward + every input/param cotangent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multistgraph_tpu.models.multi_atgcn import (
        fused_atgru_layer,
        fused_atgru_layer_q8,
    )
    from multistgraph_tpu.ops.node_apply import quantize_node_weights

    rng = np.random.default_rng(7)
    T, B, N, H, K = 5, 3, 16, 8, 2
    dt = jnp.bfloat16
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    gate_x, upd_x = f(T, B, N, 2 * H), f(T, B, N, H)
    rg_x, ru_x = f(T, B, N, 2 * H), f(T, B, N, H)
    w_seq = jnp.asarray(rng.uniform(0.2, 0.8, T).astype(np.float32))
    supports = f(K, N, N) * 0.2
    wg_h, wu_h = f(N, K, H, 2 * H) * 0.3, f(N, K, H, H) * 0.3
    bg, bu = f(N, 2 * H), f(N, H)
    rg_h, ru_h = f(H, 2 * H) * 0.3, f(H, H) * 0.3
    rg_b, ru_b = f(2 * H), f(H)
    state0 = f(B, N, H)

    wgq, wgs = quantize_node_weights(wg_h.reshape(N, K * H, 2 * H))
    wuq, wus = quantize_node_weights(wu_h.reshape(N, K * H, H))
    wg_dq = (wgq.astype(jnp.float32) * wgs).reshape(N, K, H, 2 * H)
    wu_dq = (wuq.astype(jnp.float32) * wus).reshape(N, K, H, H)

    nmaj = lambda a: jnp.transpose(a, (0, 2, 1, 3))
    cast = lambda a: a.astype(dt)

    def run_q8(args):
        (gx, ux, rgx, rux, sup, wg, wu) = args
        return fused_atgru_layer_q8(
            dt, cast(nmaj(gx)), cast(nmaj(ux)), cast(nmaj(rgx)),
            cast(nmaj(rux)), w_seq, sup, wg, wu, bg, bu,
            rg_h, ru_h, rg_b, ru_b, jnp.transpose(state0, (1, 0, 2)),
        ).transpose(0, 2, 1, 3)

    def run_ref(args):
        (gx, ux, rgx, rux, sup, wg, wu) = args
        return fused_atgru_layer(
            dt, cast(gx), cast(ux), cast(rgx), cast(rux), w_seq, sup,
            wg, wu, bg, bu, rg_h, ru_h, rg_b, ru_b, state0,
        )

    args_q8 = (gate_x, upd_x, rg_x, ru_x, supports, wg_h, wu_h)
    args_ref = (gate_x, upd_x, rg_x, ru_x, supports, wg_dq, wu_dq)
    out_q8 = run_q8(args_q8)
    out_ref = run_ref(args_ref)
    np.testing.assert_allclose(np.asarray(out_q8, np.float32),
                               np.asarray(out_ref, np.float32),
                               atol=3e-2, rtol=3e-2)

    g_q8 = jax.grad(lambda a: jnp.sum(run_q8(a) ** 2))(args_q8)
    g_ref = jax.grad(lambda a: jnp.sum(run_ref(a) ** 2))(args_ref)
    names = ["gate_x", "upd_x", "rg_x", "ru_x", "supports", "wg_h", "wu_h"]
    for nm, a, b in zip(names, g_q8, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2, err_msg="cotangent mismatch: " + nm)
