"""Windowing: plain sliding windows and multi-temporal-head (MTH) sampling.

The reference materializes windows with per-index Python loops
(traffic_state_datatset.py:740-769, mth_dataset.py:110-160). Here both are
expressed as offset arrays + one vectorized gather, which also enables the
device-resident variant: keep only the (T, N, F) series plus the offset table
on device and gather batches inside jit.

MTH semantics (ref: mth_dataset.py:31-108): for a label start index t, X is
the concatenation over blocks of `input_window` steps sampled at three
strides — closeness (1 x input_window), period (interval_period days), trend
(interval_trend days) — each block list ordered oldest-to-newest, groups
concatenated closeness|period|trend; y = series[t : t + output_window].
Indices lacking full history are skipped.
"""

from dataclasses import dataclass
from typing import Tuple

import numpy as np


def sliding_window_offsets(input_window: int, output_window: int) -> Tuple[np.ndarray, np.ndarray]:
    """Plain windows: X covers [t-Tin+1, t], y covers [t+1, t+Tout] (ref :753-757)."""
    x_offsets = np.arange(-input_window + 1, 1)
    y_offsets = np.arange(1, output_window + 1)
    return x_offsets, y_offsets


def sliding_window_starts(len_time: int, input_window: int, output_window: int) -> np.ndarray:
    """Valid anchor indices t for plain windows (ref :760-762)."""
    return np.arange(input_window - 1, len_time - output_window)


def mth_offsets(
    input_window: int,
    output_window: int,
    len_closeness: int,
    len_period: int,
    len_trend: int,
    interval_period: int,
    interval_trend: int,
    points_per_hour: int = 1,
    hour_each_day: int = 24,
) -> Tuple[np.ndarray, np.ndarray]:
    """Offset tables (x_offsets, y_offsets) relative to the label start t.

    x_offsets has length (len_closeness+len_period+len_trend) * input_window.
    Block order matches the reference: within each group the farthest block
    comes first (mth_dataset.py:60 reverses the search order), groups ordered
    closeness, period, trend (mth_dataset.py:145-158).
    """
    blocks = []
    closeness_stride = input_window  # units = input_window/pph hours -> pph*units = input_window steps
    period_stride = points_per_hour * interval_period * hour_each_day
    trend_stride = points_per_hour * interval_trend * hour_each_day
    for count, stride in (
        (len_closeness, closeness_stride),
        (len_period, period_stride),
        (len_trend, trend_stride),
    ):
        for i in range(count, 0, -1):
            start = -stride * i
            blocks.append(np.arange(start, start + input_window))
    x_offsets = np.concatenate(blocks) if blocks else np.zeros(0, dtype=np.int64)
    y_offsets = np.arange(0, output_window)
    return x_offsets, y_offsets


def mth_starts(
    len_time: int,
    input_window: int,
    x_offsets: np.ndarray,
) -> np.ndarray:
    """Valid label start indices t for MTH windows.

    Conditions replicate the reference: every history block fully in range
    (t + min_offset >= 0) and t + input_window <= len_time — note the
    reference checks input_window, not output_window, on the right edge
    (mth_dataset.py:47,79).
    """
    earliest = -int(x_offsets.min()) if x_offsets.size else 0
    return np.arange(earliest, len_time - input_window + 1)


def validate_mth_windows(input_window: int, output_window: int) -> None:
    """The reference's right-edge check uses input_window (mth_dataset.py:47,79),
    so output_window > input_window would gather past the series end there too
    — fail fast with a clear message instead."""
    if output_window > input_window:
        raise ValueError(
            "MTH windowing requires output_window ({}) <= input_window ({})".format(
                output_window, input_window
            )
        )


def gather_windows(
    series: np.ndarray, starts: np.ndarray, x_offsets: np.ndarray, y_offsets: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Materialize (X, y) via fancy indexing: X[s] = series[s + x_offsets]."""
    x = series[starts[:, None] + x_offsets[None, :]]
    y = series[starts[:, None] + y_offsets[None, :]]
    return x, y


@dataclass(frozen=True)
class SplitSizes:
    num_train: int
    num_val: int
    num_test: int


def split_sizes(num_samples: int, train_rate: float, eval_rate: float) -> SplitSizes:
    """Chronological split sizing (ref: traffic_state_datatset.py:823-827)."""
    test_rate = 1 - train_rate - eval_rate
    num_test = round(num_samples * test_rate)
    num_train = round(num_samples * train_rate)
    num_val = num_samples - num_test - num_train
    return SplitSizes(num_train=num_train, num_val=num_val, num_test=num_test)


def chronological_split(x: np.ndarray, y: np.ndarray, train_rate: float, eval_rate: float):
    """Split (x, y) chronologically into train/val/test (ref :829-834)."""
    sizes = split_sizes(x.shape[0], train_rate, eval_rate)
    x_train, y_train = x[: sizes.num_train], y[: sizes.num_train]
    x_val = x[sizes.num_train : sizes.num_train + sizes.num_val]
    y_val = y[sizes.num_train : sizes.num_train + sizes.num_val]
    x_test, y_test = x[-sizes.num_test :], y[-sizes.num_test :]
    return x_train, y_train, x_val, y_val, x_test, y_test


def pad_to_batch_multiple(x: np.ndarray, y: np.ndarray, batch_size: int):
    """Pad by repeating the last sample to a full batch (ref: data/utils.py:53-62)."""
    num_padding = (batch_size - (x.shape[0] % batch_size)) % batch_size
    if num_padding:
        x = np.concatenate([x, np.repeat(x[-1:], num_padding, axis=0)], axis=0)
        y = np.concatenate([y, np.repeat(y[-1:], num_padding, axis=0)], axis=0)
    return x, y
