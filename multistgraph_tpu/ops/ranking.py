"""Ranking / classification metrics (ref: libcity/evaluator/eval_funcs.py:1-167).

Top-k grid metrics used by other LibCity task families (accident prediction,
next-location): per-sample top-k thresholding of predictions against a binary
"event" ground truth, plus hit/MRR/DCG counting for location ranking.
Vectorized numpy instead of the reference's per-sample torch loops.
"""

from typing import Tuple

import numpy as np


def _topk_threshold(pred_flat: np.ndarray, topk: int) -> np.ndarray:
    """Per-row k-th largest value, (B,) for pred_flat (B, G)."""
    part = np.partition(pred_flat, -topk, axis=1)
    return part[:, -topk]


def precision_at_k(preds: np.ndarray, labels: np.ndarray, topk: int) -> float:
    """Mean over samples of |top-k pred cells ∩ positive cells| / k."""
    b = preds.shape[0]
    p = preds.reshape(b, -1)
    l = labels.reshape(b, -1) > 0
    thr = _topk_threshold(p, topk)[:, None]
    matched = (p >= thr) & l
    return float(matched.sum(axis=1).mean() / topk)


def recall_at_k(preds: np.ndarray, labels: np.ndarray, topk: int) -> float:
    """Mean over samples (with >=1 positive) of matched / #positives."""
    b = preds.shape[0]
    p = preds.reshape(b, -1)
    l = labels.reshape(b, -1) > 0
    thr = _topk_threshold(p, topk)[:, None]
    matched = ((p >= thr) & l).sum(axis=1)
    positives = l.sum(axis=1)
    keep = positives > 0
    if not keep.any():
        return 0.0
    return float((matched[keep] / positives[keep]).mean())


def f1_at_k(preds: np.ndarray, labels: np.ndarray, topk: int) -> float:
    precision = precision_at_k(preds, labels, topk)
    recall = recall_at_k(preds, labels, topk)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def map_at_k(preds: np.ndarray, labels: np.ndarray, topk: int) -> float:
    """Mean average precision over the per-sample top-k ranking (ref :120-143)."""
    b = preds.shape[0]
    p = preds.reshape(b, -1)
    l = labels.reshape(b, -1) != 0
    order = np.argsort(-p, axis=1, kind="stable")[:, :topk]
    matched = np.take_along_axis(l, order, axis=1)  # (B, k)
    cum_hits = np.cumsum(matched, axis=1)
    ranks = np.arange(1, topk + 1)[None, :]
    precision_sum = np.where(matched, cum_hits / ranks, 0.0).sum(axis=1)
    return float((precision_sum / topk).mean())


def pcc_at_k(preds: np.ndarray, labels: np.ndarray, topk: int) -> float:
    """Pearson correlation between top-k predicted values and the labels at
    those cells, averaged over samples with nonzero variance (ref :146-167)."""
    b = preds.shape[0]
    p = preds.reshape(b, -1)
    l = labels.reshape(b, -1)
    order = np.argsort(-p, axis=1, kind="stable")[:, :topk]
    top_pred = np.take_along_axis(p, order, axis=1)
    top_label = np.take_along_axis(l, order, axis=1)
    pm = top_pred - top_pred.mean(axis=1, keepdims=True)
    lm = top_label - top_label.mean(axis=1, keepdims=True)
    denom = np.sqrt((pm**2).sum(axis=1)) * np.sqrt((lm**2).sum(axis=1))
    keep = denom != 0
    if not keep.any():
        return 0.0
    return float(((pm * lm).sum(axis=1)[keep] / denom[keep]).mean())


def top_k_hits(loc_pred: np.ndarray, loc_true: np.ndarray, topk: int) -> Tuple[int, float, float]:
    """(hits, sum reciprocal rank, sum DCG) of true locations inside the
    top-k predictions (ref :54-88)."""
    if topk <= 0:
        raise ValueError("top-k requires k >= 1")
    order = np.argsort(-loc_pred, axis=1, kind="stable")[:, :topk]
    loc_true = np.asarray(loc_true).reshape(-1)
    match = order == loc_true[:, None]
    hit_rows, hit_pos = np.nonzero(match)
    hits = len(hit_rows)
    rank = float((1.0 / (hit_pos + 1)).sum())
    dcg = float((1.0 / np.log2(hit_pos + 2)).sum())
    return hits, rank, dcg
