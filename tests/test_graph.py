"""Graph math: Laplacians, geometry, multi-view adjacency."""

import numpy as np
import pandas as pd
import pytest

from multistgraph_tpu.graph import geometry, laplacian, views


def test_normalized_laplacian_symmetric_graph():
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=float)
    lap = laplacian.normalized_laplacian(adj)
    # For symmetric A this is I - D^-1/2 A D^-1/2; eigenvalues in [0, 2].
    eig = np.linalg.eigvalsh(lap)
    assert eig.min() >= -1e-9 and eig.max() <= 2 + 1e-9
    np.testing.assert_allclose(lap, lap.T, atol=1e-12)


def test_normalized_laplacian_zero_degree_row():
    adj = np.zeros((3, 3))
    adj[0, 1] = 1.0
    lap = laplacian.normalized_laplacian(adj)
    assert np.isfinite(lap).all()


def test_scaled_laplacian_default_lambda_two():
    adj = np.abs(np.random.default_rng(0).normal(size=(5, 5)))
    lap = laplacian.normalized_laplacian(adj)
    want = lap - np.eye(5)  # 2L/2 - I
    np.testing.assert_allclose(laplacian.scaled_laplacian(adj), want, atol=1e-6)


def test_cheb_polynomials_recursion():
    rng = np.random.default_rng(1)
    s = rng.normal(size=(4, 4)).astype(np.float32)
    polys = laplacian.cheb_polynomials(s, 4)
    np.testing.assert_allclose(polys[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(polys[1], s, atol=1e-6)
    np.testing.assert_allclose(polys[2], 2 * s @ s - np.eye(4), atol=1e-4)
    np.testing.assert_allclose(polys[3], 2 * s @ polys[2] - s, atol=1e-3)


def test_haversine_known_distance():
    # DC to Baltimore is roughly 56 km.
    d = geometry.haversine(38.9072, -77.0369, 39.2904, -76.6122)
    assert 50 < float(d) < 65


def test_gaussian_kernel_adjacency_threshold():
    dist = np.array([[0.0, 1.0], [1.0, 0.0]])
    adj = geometry.gaussian_kernel_adjacency(dist, epsilon=0.5)
    assert adj[0, 0] == 1.0
    # exp(-(1/std)^2) with std=0.5 -> exp(-4) ~ 0.018 < 0.5 -> zeroed
    assert adj[0, 1] == 0.0


def _geo_df(n=4, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "geo_id": np.arange(n),
            "type": "Point",
            "coordinates": [
                "[{:.5f}, {:.5f}]".format(-77 + rng.uniform(-0.1, 0.1), 38.9 + rng.uniform(-0.1, 0.1))
                for _ in range(n)
            ],
        }
    )


def test_od_view_column_normalized_and_clipped():
    adj = np.array([[2.0, 4.0], [1.0, 8.0]], dtype=np.float32)
    out = views.od_view(adj)
    # column j divided by diag[j], clipped at 1
    np.testing.assert_allclose(out, [[1.0, 0.5], [0.5, 1.0]])


def test_semantic_view_identity_without_static():
    np.testing.assert_allclose(views.semantic_view(None, 3), np.eye(3))


def test_semantic_view_inverse_euclidean():
    static = np.array([[0.0, 0.0], [3.0, 4.0]])
    out = views.semantic_view(static, 2)
    np.testing.assert_allclose(out, [[1.0, 0.2], [0.2, 1.0]], rtol=1e-6)


@pytest.mark.parametrize("adjtype,num_views", [("multi", 3), ("od", 1), ("dist", 1), ("cosine", 1), ("identity", 1)])
def test_build_views_support_counts(adjtype, num_views):
    n = 4
    rng = np.random.default_rng(2)
    adj = np.abs(rng.normal(size=(n, n))).astype(np.float32) + np.eye(n, dtype=np.float32)
    static = rng.normal(size=(n, 3))
    base, supports = views.build_views(adj, static, _geo_df(n), n, adjtype)
    assert len(supports) == num_views
    for pair in supports:
        assert len(pair) == 2
        np.testing.assert_allclose(pair[0], np.eye(n))
    stacked = views.stack_static_supports(supports, cheb_k=2)
    assert stacked.shape == (1 + num_views, n, n)
    stacked3 = views.stack_static_supports(supports, cheb_k=3)
    assert stacked3.shape == (1 + 2 * num_views, n, n)
    # cheb expansion: third term of each view is 2 L L - I
    lap = supports[0][1]
    np.testing.assert_allclose(stacked3[2], 2 * lap @ lap - np.eye(n), atol=1e-4)
