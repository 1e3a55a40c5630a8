"""Standalone windowing-and-split helper (ref: libcity/utils/utils.py:209-240).

The reference exposes `preprocess_data(data, config)` as a framework-level
utility (outside the dataset classes) that turns one (T, ...) series into
windowed train/test arrays: X/y sliding windows of input_window/output_window
steps, then a chronological split where the first train_rate+eval_rate
fraction is "train" and the remainder "test". Kept for API parity; the main
pipeline uses the vectorized builders in data/windows.py instead.
"""

from typing import Any, Mapping, Tuple

import numpy as np


def preprocess_data(
    data: np.ndarray, config: Mapping[str, Any]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Window a (T, ...) series and split chronologically.

    Same semantics as the reference (utils.py:209-240), including its quirks:
    the last possible window anchor is excluded (`range(T - in - out)`), and
    eval_rate (default 0.1) is folded into the train side of the split.
    Vectorized: one stride-tricks gather instead of the per-index Python loop.
    """
    train_rate = config.get("train_rate", 0.7)
    eval_rate = config.get("eval_rate", 0.1)
    input_window = config.get("input_window", 12)
    output_window = config.get("output_window", 3)

    data = np.asarray(data)
    num_samples = data.shape[0] - input_window - output_window
    if num_samples <= 0:
        empty_x = np.empty((0, input_window) + data.shape[1:], dtype=data.dtype)
        empty_y = np.empty((0, output_window) + data.shape[1:], dtype=data.dtype)
        return empty_x, empty_y, empty_x, empty_y

    starts = np.arange(num_samples)
    x = data[starts[:, None] + np.arange(input_window)]
    y = data[starts[:, None] + input_window + np.arange(output_window)]

    train_size = int(x.shape[0] * (train_rate + eval_rate))
    return x[:train_size], y[:train_size], x[train_size:], y[train_size:]
