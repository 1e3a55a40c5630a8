"""Losses must reproduce the reference masked-metric semantics.

Expected values are computed step-by-step with numpy, following the documented
reference algorithm (ref: libcity/model/loss.py:17-91): threshold labels by
min_s, build a null-val mask, renormalize by its mean, NaN-scrub, average over
all elements.
"""

import numpy as np
import pytest

from multistgraph_tpu.ops import losses


def _expected_masked(preds, labels, null_val, min_s, elementwise):
    labels = labels.copy()
    labels[np.abs(labels) < min_s] = 0
    if np.isnan(null_val):
        mask = ~np.isnan(labels)
    else:
        mask = labels != null_val
    mask = mask.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mask = mask / mask.mean()
    mask = np.nan_to_num(mask, nan=0.0, posinf=np.inf)
    with np.errstate(invalid="ignore", divide="ignore"):
        loss = elementwise(preds, labels) * mask
    loss = np.where(np.isnan(loss), 0.0, loss)
    return loss.mean()


@pytest.mark.parametrize("null_val", [0.0, float("nan")])
def test_masked_mae_matches_reference_semantics(rng, null_val):
    preds = rng.normal(size=(4, 3, 5, 1)).astype(np.float32)
    labels = rng.normal(size=(4, 3, 5, 1)).astype(np.float32)
    labels[labels < 0.3] = 0.0  # plenty of nulls
    got = float(losses.masked_mae(preds, labels, null_val=null_val))
    want = _expected_masked(preds, labels, null_val, 1e-4, lambda p, l: np.abs(p - l))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_mse_and_rmse(rng):
    preds = rng.normal(size=(16, 8)).astype(np.float32)
    labels = rng.normal(size=(16, 8)).astype(np.float32)
    labels[labels < 0] = 0
    mse = float(losses.masked_mse(preds, labels, null_val=0.0))
    want = _expected_masked(preds, labels, 0.0, 1e-4, lambda p, l: (p - l) ** 2)
    np.testing.assert_allclose(mse, want, rtol=1e-5)
    np.testing.assert_allclose(float(losses.masked_rmse(preds, labels, null_val=0.0)), np.sqrt(mse), rtol=1e-5)


def test_masked_mape(rng):
    preds = rng.normal(size=(16, 8)).astype(np.float32) + 5
    labels = rng.normal(size=(16, 8)).astype(np.float32) + 5
    labels[:4] = 0
    got = float(losses.masked_mape(preds, labels, null_val=0.0))
    want = _expected_masked(preds, labels, 0.0, 1e-4, lambda p, l: np.abs((p - l) / l))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_min_s_thresholding_zeroes_small_labels():
    preds = np.array([1.0, 1.0])
    labels = np.array([5e-5, 2.0])  # first is below min_s -> masked out under null_val=0
    got = float(losses.masked_mae(preds, labels, null_val=0.0, min_s=1e-4))
    # only the second element contributes; mask renorm: mask=[0,2] -> mean over both
    np.testing.assert_allclose(got, np.mean([0.0, 1.0 * 2.0]), rtol=1e-6)


def test_all_masked_returns_zero_not_nan():
    preds = np.ones((4,))
    labels = np.zeros((4,))
    got = float(losses.masked_mae(preds, labels, null_val=0.0))
    assert got == 0.0


def test_r2_and_evar_match_sklearn(rng):
    from sklearn.metrics import explained_variance_score, r2_score

    preds = rng.normal(size=200)
    labels = preds + rng.normal(scale=0.3, size=200)
    np.testing.assert_allclose(float(losses.r2_score(preds, labels)), r2_score(labels, preds), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.explained_variance_score(preds, labels)),
        explained_variance_score(labels, preds),
        rtol=1e-5,
    )


def test_huber_quantile_logcosh(rng):
    preds = rng.normal(size=50)
    labels = rng.normal(size=50)
    r = np.abs(preds - labels)
    want_huber = np.mean(np.where(r <= 1.0, 0.5 * r**2, r - 0.5))
    np.testing.assert_allclose(float(losses.huber_loss(preds, labels)), want_huber, rtol=1e-5)
    d = 0.25
    want_q = np.mean(np.where(labels >= preds, d * (labels - preds), (1 - d) * (preds - labels)))
    np.testing.assert_allclose(float(losses.quantile_loss(preds, labels)), want_q, rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.log_cosh_loss(preds, labels)), np.mean(np.log(np.cosh(preds - labels))), rtol=1e-5
    )
