"""STGODE and STG-NCDE: DTW graph build, shapes, gradients, learning,
pipeline.

Reference counterpart: none in the repo — these two round out the paper's
comparison set (SURVEY.md §6 "(+STGODE, STG-NCDE in paper)"); both are
clean-room per the papers (Fang et al. KDD 2021; Choi et al. AAAI 2022).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.models.stgncde import STGNCDE
from multistgraph_tpu.models.stgode import (
    STGODE,
    _sym_norm_with_self_loops,
    dtw_profile_distances,
    semantic_adjacency_from_dtw,
)

B, TIN, TOUT, N, F = 4, 12, 3, 5, 2


def _x(seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, TIN, N, F)).astype(np.float32))


def _adj(seed=1):
    rng = np.random.default_rng(seed)
    a = (rng.random((N, N)) < 0.5).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    return a


def _stgode(**kw):
    profiles = np.random.default_rng(2).normal(size=(N, 8)).astype(np.float32)
    dist = dtw_profile_distances(profiles, band=3)
    sem = semantic_adjacency_from_dtw(dist, sparsity=0.3)
    supports = np.stack([_sym_norm_with_self_loops(_adj()),
                         _sym_norm_with_self_loops(sem)])
    kwargs = dict(supports=supports, output_window=TOUT, output_dim=1,
                  input_dim=F, hidden_dim=8, kt=3, num_blocks=2, ode_steps=3,
                  head_dim=16)
    kwargs.update(kw)
    return STGODE(**kwargs)


def _stgncde(**kw):
    kwargs = dict(num_nodes=N, output_window=TOUT, output_dim=1, input_dim=F,
                  hidden_dim=8, field_dim=8, embed_dim=4, cheb_k=2, substeps=2)
    kwargs.update(kw)
    return STGNCDE(**kwargs)


# ---------------------------------------------------------------- DTW graph

def _dtw_bruteforce(a, b):
    """Unbanded reference DP for one pair."""
    p, q = len(a), len(b)
    dp = np.full((p, q), np.inf)
    for i in range(p):
        for j in range(q):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i, j] = c
            else:
                prev = min(
                    dp[i - 1, j] if i > 0 else np.inf,
                    dp[i, j - 1] if j > 0 else np.inf,
                    dp[i - 1, j - 1] if i > 0 and j > 0 else np.inf,
                )
                dp[i, j] = c + prev
    return dp[-1, -1]


def test_dtw_matches_bruteforce_with_wide_band():
    rng = np.random.default_rng(0)
    profiles = rng.normal(size=(4, 6)).astype(np.float32)
    d = dtw_profile_distances(profiles, band=6)
    for i in range(4):
        for j in range(4):
            expect = 0.5 * (_dtw_bruteforce(profiles[i], profiles[j])
                            + _dtw_bruteforce(profiles[j], profiles[i]))
            np.testing.assert_allclose(d[i, j], expect, rtol=1e-5)
    assert (np.diag(d) == 0).all()
    np.testing.assert_allclose(d, d.T)


def test_dtw_prefers_time_shifted_copies():
    """A 1-step-shifted copy must be DTW-closer than an unrelated profile —
    the property that makes DTW the right semantic-similarity measure."""
    t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    base = np.sin(t).astype(np.float32)
    shifted = np.roll(base, 1)
    noise = np.random.default_rng(3).normal(size=16).astype(np.float32)
    d = dtw_profile_distances(np.stack([base, shifted, noise]), band=3)
    assert d[0, 1] < d[0, 2]
    # and closer than the plain Euclidean alignment would be
    assert d[0, 1] < np.abs(base - shifted).sum()


def test_semantic_adjacency_density_and_symmetry():
    rng = np.random.default_rng(1)
    profiles = rng.normal(size=(20, 8)).astype(np.float32)
    d = dtw_profile_distances(profiles, band=4)
    a = semantic_adjacency_from_dtw(d, sparsity=0.2)
    assert (np.diag(a) == 0).all()
    np.testing.assert_allclose(a, a.T, atol=1e-7)
    density = (a > 0).sum() / (20 * 19)
    assert 0.1 <= density <= 0.3
    assert (a >= 0).all()


def test_sym_norm_spectral_radius_bounded():
    a = _sym_norm_with_self_loops(_adj())
    eig = np.max(np.abs(np.linalg.eigvals(a)))
    assert eig <= 1.0 + 1e-5


# ------------------------------------------------------------------ models

@pytest.mark.parametrize("make", [
    _stgode, _stgncde,
    lambda: _stgncde(cheb_k=3, substeps=1),
])
def test_shapes_and_grads(make):
    model = make()
    x = _x()
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (B, TOUT, N, 1)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.mean(jnp.square(model.apply(p, x))))(params)
    total = sum(float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_stgode_rejects_short_window():
    model = _stgode(kt=3)
    short = _x()[:, :4]  # 4 <= 2*(kt-1)
    with pytest.raises(ValueError, match="too short"):
        model.init(jax.random.PRNGKey(0), short)


def test_stgode_spectral_matches_rk4():
    """The default 'spectral' solver is the CLOSED-FORM solution of the
    linear restart ODE in the static graph's eigenbasis (2 matmuls instead
    of RK4's 24 graph matvecs). A fine-step RK4 run with the same params
    must converge to it — proving the rewrite changed the cost, not the
    semantics."""
    spec = _stgode()  # ode_solver='spectral' default
    rk4 = _stgode(ode_solver="rk4", ode_steps=64)
    x = _x()
    params = spec.init(jax.random.PRNGKey(0), x)
    out_s = np.asarray(spec.apply(params, x))
    out_r = np.asarray(rk4.apply(params, x))
    np.testing.assert_allclose(out_s, out_r, atol=2e-5, rtol=2e-5)
    # gradients agree too (alpha gets its gradient through exp/phi1 now)
    gs = jax.grad(lambda p: jnp.mean(jnp.square(spec.apply(p, x))))(params)
    gr = jax.grad(lambda p: jnp.mean(jnp.square(rk4.apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_stgode_asymmetric_support_falls_back_to_rk4(rng):
    """A directed spatial graph has no orthogonal eigenbasis; the spectral
    path must detect the asymmetry at trace time and integrate that view
    with RK4 instead (same result as forcing ode_solver='rk4')."""
    asym = rng.uniform(size=(N, N)).astype(np.float32)  # NOT symmetric
    asym = asym / asym.sum(axis=1, keepdims=True)
    supports = np.stack([asym, asym])
    kwargs = dict(supports=supports, output_window=TOUT, output_dim=1,
                  input_dim=F, hidden_dim=8, kt=3, num_blocks=2, ode_steps=3,
                  head_dim=16)
    auto = STGODE(**kwargs)
    forced = STGODE(ode_solver="rk4", **kwargs)
    x = _x()
    params = auto.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(auto.apply(params, x)), np.asarray(forced.apply(params, x)),
        atol=1e-6)


def test_stgode_ode_is_stable_over_many_steps():
    """RK4 on the non-expansive field must not blow up with a long horizon."""
    model = _stgode(ode_steps=64)
    params = model.init(jax.random.PRNGKey(0), _x())
    out = model.apply(params, 100.0 * _x())
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("make", [_stgode, _stgncde])
def test_ode_models_learn(make):
    import optax

    model = make()
    x = _x()
    y = jnp.tile(x[:, -1:, :, :1], (1, TOUT, 1, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p):
        return jnp.mean(jnp.square(model.apply(p, x) - y))

    losses = []
    for _ in range(30):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_node_profiles_in_data_feature(synthetic_dataset, tmp_path):
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset

    config = load_config(
        "traffic_state_pred", "STGODE", "SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset, "cache_dir": str(tmp_path / "c"),
            "output_dir": str(tmp_path / "o"), "input_window": 12,
            "output_window": 3, "load_external": True, "load_dynamic": False,
            "add_time_in_day": True, "batch_size": 4, "seed": 0,
        },
    )
    dataset = get_dataset(config)
    dataset.get_data()
    feature = dataset.get_data_feature()
    profiles = feature["node_profiles"]
    assert profiles is not None and profiles.shape == (feature["num_nodes"], 24)
    assert np.isfinite(profiles).all()
    # daily profiles must differ across nodes (not a degenerate constant)
    assert profiles.std(axis=0).mean() > 0


@pytest.mark.parametrize("model_name", ["STGODE", "STGNCDE"])
def test_pipeline(model_name, synthetic_dataset, tmp_path):
    from multistgraph_tpu.pipeline import run_model

    result = run_model(
        task="traffic_state_pred", model_name=model_name, dataset_name="SYN_SMALL",
        other_args={
            "data_dir": synthetic_dataset,
            "cache_dir": str(tmp_path / "cache"),
            "output_dir": str(tmp_path / "out"),
            "exp_id": "ode_" + model_name,
            "max_epoch": 1, "saved_model": False, "load_best_epoch": False,
            "input_window": 12, "output_window": 3,
            "load_external": True, "load_dynamic": False, "add_time_in_day": True,
            "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
            "rnn_units": 8, "stgode_blocks": 1, "ode_steps": 2,
            "stgode_head_dim": 8, "ncde_field_dim": 8, "embed_dim_node": 4,
            "use_early_stop": False, "seed": 0,
        },
    )
    assert np.isfinite(result["masked_MAE"]).all()


# ------------------------------------------------------- cubic spline control

def test_natural_cubic_coeffs_properties():
    from multistgraph_tpu.models.stgncde import natural_cubic_coeffs

    rng = np.random.default_rng(4)
    xx = jnp.asarray(rng.normal(size=(2, 9, 3, 2)).astype(np.float32))
    b, c, d = map(np.asarray, natural_cubic_coeffs(xx))
    y = np.transpose(np.asarray(xx), (1, 0, 2, 3))
    # interpolation: X(i+1) - X(i) = b + c + d on every interval
    np.testing.assert_allclose(b + c + d, y[1:] - y[:-1], atol=1e-5)
    # C1 continuity at interior knots: Ẋ_i(1) == Ẋ_{i+1}(0)
    np.testing.assert_allclose(b[1:], b[:-1] + 2 * c[:-1] + 3 * d[:-1], atol=1e-4)
    # C2 continuity: 2c_{i+1} == 2c_i + 6d_i
    np.testing.assert_allclose(c[1:], c[:-1] + 3 * d[:-1], atol=1e-4)
    # natural boundary: X''(0) = 2c_0 = 0 and X''(T-1) = 2c_last + 6d_last = 0
    np.testing.assert_allclose(c[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(c[-1] + 3 * d[-1], 0.0, atol=1e-4)


def test_cubic_coeffs_linear_data_degenerate():
    from multistgraph_tpu.models.stgncde import natural_cubic_coeffs

    t = jnp.arange(6.0)[None, :, None, None]
    xx = jnp.broadcast_to(3.0 * t + 1.0, (2, 6, 4, 1))
    b, c, d = map(np.asarray, natural_cubic_coeffs(xx))
    np.testing.assert_allclose(b, 3.0, atol=1e-5)
    np.testing.assert_allclose(c, 0.0, atol=1e-5)
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_stgncde_gfield_reassociation_is_exact(rng):
    """The spatial field's contraction was reassociated to fold the node
    embedding into the activations (one dense (B·N, K·I·D) @ (K·I·D, Dh²)
    matmul) instead of materializing the (N, K, I, Dh²) per-node pool —
    497 MB at DC-237 defaults, streamed at every RK4 stage. Same multilinear
    map, so the two orders must agree to float rounding."""
    b_, k_, n_, i_, d_, o_ = 3, 2, 7, 5, 4, 9
    yg = rng.normal(size=(b_, k_, n_, i_)).astype(np.float32)
    emb = rng.normal(size=(n_, d_)).astype(np.float32)
    pool = rng.normal(size=(d_, k_, i_, o_)).astype(np.float32)
    naive = np.einsum("bkni,nkio->bno", yg, np.einsum("nd,dkio->nkio", emb, pool))
    pool_mat = np.transpose(pool, (1, 2, 0, 3)).reshape(k_ * i_ * d_, o_)
    yge = np.einsum("bkni,nd->bnkid", yg, emb).reshape(b_, n_, -1)
    fused = np.einsum("bnj,jo->bno", yge, pool_mat)
    np.testing.assert_allclose(fused, naive, atol=1e-5, rtol=1e-5)


def test_stgncde_bf16_compute_close_to_f32():
    """compute_dtype='bfloat16' casts only the big field matmuls (f32
    accumulation via preferred_element_type); the forward must stay close to
    exact f32."""
    model32 = _stgncde()
    model16 = _stgncde(compute_dtype="bfloat16")
    x = _x()
    params = model32.init(jax.random.PRNGKey(0), x)
    out32 = np.asarray(model32.apply(params, x))
    out16 = np.asarray(model16.apply(params, x))
    assert out16.dtype == np.float32  # bf16 never leaks out of the fields
    np.testing.assert_allclose(out16, out32, atol=0.05, rtol=0.05)


def test_stgncde_cubic_control_runs_and_differs():
    model_lin = _stgncde(control="linear", substeps=2)
    model_cub = _stgncde(control="cubic", substeps=2)
    x = _x()
    params = model_lin.init(jax.random.PRNGKey(0), x)
    out_lin = model_lin.apply(params, x)
    out_cub = model_cub.apply(params, x)  # same params: fields identical
    assert out_cub.shape == out_lin.shape
    assert np.isfinite(np.asarray(out_cub)).all()
    # curved data: spline derivative differs from chord slopes
    assert np.abs(np.asarray(out_cub) - np.asarray(out_lin)).max() > 1e-5
    g = jax.grad(lambda p: jnp.mean(jnp.square(model_cub.apply(p, x))))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
