"""Masked losses, functional JAX re-implementations of the reference kernels.

Reference semantics (ref: libcity/model/loss.py:17-91):
  * labels with |label| < min_s are zeroed before masking;
  * mask = labels != null_val (or ~isnan(labels) when null_val is NaN);
  * mask is renormalized by its mean (so the masked mean keeps the same scale
    as an unmasked mean over valid entries); NaNs from 0/0 are scrubbed to 0;
  * the elementwise loss is multiplied by the mask, NaN-scrubbed, and averaged
    over ALL elements.

Deviation from the reference, on purpose: the reference mutates `labels` in
place when thresholding (loss.py:18,55,73), leaking the thresholded labels to
later metric calls on the same tensor. JAX is functional, so thresholding here
is applied consistently inside every masked function — numerically identical
because every reference call site re-applies the same threshold.

All functions accept jnp or np arrays and return a scalar jnp array; they are
jit-safe (null_val / min_s / delta are static Python floats).
"""

import math

import jax.numpy as jnp


def _threshold_labels(labels, min_s):
    labels = jnp.asarray(labels, dtype=jnp.float32)
    if min_s:
        labels = jnp.where(jnp.abs(labels) < min_s, jnp.zeros_like(labels), labels)
    return labels


def _normalized_mask(labels, null_val):
    if null_val is None or (isinstance(null_val, float) and math.isnan(null_val)):
        mask = ~jnp.isnan(labels)
    else:
        mask = labels != null_val
    mask = mask.astype(jnp.float32)
    mask = mask / jnp.mean(mask)
    mask = jnp.where(jnp.isnan(mask), jnp.zeros_like(mask), mask)
    return mask


def _masked_mean(elementwise, mask):
    loss = elementwise * mask
    loss = jnp.where(jnp.isnan(loss), jnp.zeros_like(loss), loss)
    return jnp.mean(loss)


def masked_mae(preds, labels, null_val=float("nan"), min_s=1e-4):
    preds = jnp.asarray(preds, dtype=jnp.float32)
    labels = _threshold_labels(labels, min_s)
    mask = _normalized_mask(labels, null_val)
    return _masked_mean(jnp.abs(preds - labels), mask)


def masked_mse(preds, labels, null_val=float("nan"), min_s=1e-4):
    preds = jnp.asarray(preds, dtype=jnp.float32)
    labels = _threshold_labels(labels, min_s)
    mask = _normalized_mask(labels, null_val)
    return _masked_mean(jnp.square(preds - labels), mask)


def masked_rmse(preds, labels, null_val=float("nan"), min_s=1e-4):
    # NB: reference thresholds labels, then calls masked_mse WITHOUT forwarding
    # min_s (loss.py:88-90) — the inner call re-applies the default 1e-4.
    labels = _threshold_labels(labels, min_s)
    return jnp.sqrt(masked_mse(preds, labels, null_val=null_val))


def masked_mape(preds, labels, null_val=float("nan"), eps=0, min_s=1e-4):
    preds = jnp.asarray(preds, dtype=jnp.float32)
    labels = _threshold_labels(labels, min_s)
    is_nan_null = null_val is None or (isinstance(null_val, float) and math.isnan(null_val))
    if is_nan_null and eps != 0:
        return jnp.mean(jnp.abs((preds - labels) / (labels + eps)))
    mask = _normalized_mask(labels, null_val)
    return _masked_mean(jnp.abs((preds - labels) / labels), mask)


def log_cosh_loss(preds, labels):
    preds = jnp.asarray(preds, dtype=jnp.float32)
    labels = jnp.asarray(labels, dtype=jnp.float32)
    return jnp.mean(jnp.log(jnp.cosh(preds - labels)))


def huber_loss(preds, labels, delta=1.0):
    preds = jnp.asarray(preds, dtype=jnp.float32)
    labels = jnp.asarray(labels, dtype=jnp.float32)
    residual = jnp.abs(preds - labels)
    small = 0.5 * jnp.square(residual)
    large = delta * residual - 0.5 * delta * delta
    return jnp.mean(jnp.where(residual <= delta, small, large))


def quantile_loss(preds, labels, delta=0.25):
    preds = jnp.asarray(preds, dtype=jnp.float32)
    labels = jnp.asarray(labels, dtype=jnp.float32)
    large = delta * (labels - preds)
    small = (1 - delta) * (preds - labels)
    return jnp.mean(jnp.where(labels >= preds, large, small))


def r2_score(preds, labels):
    """Coefficient of determination, matching sklearn.r2_score(labels, preds)."""
    preds = jnp.asarray(preds, dtype=jnp.float32).ravel()
    labels = jnp.asarray(labels, dtype=jnp.float32).ravel()
    ss_res = jnp.sum(jnp.square(labels - preds))
    ss_tot = jnp.sum(jnp.square(labels - jnp.mean(labels)))
    return 1.0 - ss_res / ss_tot


def explained_variance_score(preds, labels):
    """Matches sklearn.explained_variance_score(labels, preds)."""
    preds = jnp.asarray(preds, dtype=jnp.float32).ravel()
    labels = jnp.asarray(labels, dtype=jnp.float32).ravel()
    return 1.0 - jnp.var(labels - preds) / jnp.var(labels)
