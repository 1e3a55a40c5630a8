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


def timestamp2array(timestamps: np.ndarray, t: int) -> np.ndarray:
    """(T, t+9) calendar feature rows (ref: libcity/utils/dataset.py:91-131):
    weekday one-hot (7) | weekday-vs-weekend bit (1, weekday=1) | time-slot
    one-hot over `t` slots/day (slot = minutes-into-day / (1440/t)) | day bit
    (1, 06:00-17:59=1). Vectorized; the reference loops per timestamp."""
    ts = np.asarray(timestamps).astype("datetime64[ns]")
    n = len(ts)
    dow = day_of_week(ts)
    minutes = ((ts - ts.astype("datetime64[D]")) / np.timedelta64(1, "m")).astype(np.int64)
    slot = (minutes // (24 * 60 // t)).astype(np.int64)
    hour = hour_of_day(ts)

    out = np.zeros((n, t + 9), dtype=np.int64)
    rows = np.arange(n)
    out[rows, dow] = 1
    out[:, 7] = (dow < 5).astype(np.int64)  # weekday bit (Sat/Sun -> 0)
    out[rows, 8 + slot] = 1
    out[:, t + 8] = ((hour >= 6) & (hour < 18)).astype(np.int64)  # day bit
    return out


def timestamp2vec_origin(timestamps: np.ndarray) -> np.ndarray:
    """(T, 8) weekday one-hot + weekday-bit rows (ref: dataset.py:133-154)."""
    ts = np.asarray(timestamps).astype("datetime64[ns]")
    dow = day_of_week(ts)
    out = np.zeros((len(ts), 8), dtype=np.int64)
    out[np.arange(len(ts)), dow] = 1
    out[:, 7] = (dow < 5).astype(np.int64)
    return out


def cal_basetime(start_times: np.ndarray, base_zero: bool) -> np.ndarray:
    """Session base time for trajectory cutting (ref: dataset.py:18-41):
    base_zero -> midnight of start_time's day; else the nearest earlier
    12-hour boundary (00:00 or 12:00), so equal wall-clock half-days always
    encode identically."""
    ts = np.asarray(start_times).astype("datetime64[ns]")
    midnight = ts.astype("datetime64[D]").astype("datetime64[ns]")
    if base_zero:
        return midnight
    half_day = np.timedelta64(12, "h")
    return midnight + ((ts - midnight) // half_day) * half_day


def cal_timeoff(now_times: np.ndarray, base_times: np.ndarray) -> np.ndarray:
    """Elapsed time in (fractional) hours between two datetime64 arrays
    (ref: dataset.py:44-50)."""
    now = np.asarray(now_times).astype("datetime64[ns]")
    base = np.asarray(base_times).astype("datetime64[ns]")
    return ((now - base) / np.timedelta64(1, "h")).astype(np.float64)


def time_slot_similarity(data: dict) -> np.ndarray:
    """Jaccard similarity between time slots' check-in location sets
    (ref: dataset.py:53-75, `caculate_time_sim`). `data` holds 'tim_size' and
    'data': {uid: [session, ...]} where each check-in is (loc_id, time_id).
    Vectorized: one (tim_size, num_locs) membership matrix, then
    |A∩B| / |A∪B| from its gram matrix instead of the O(T²) set loop."""
    tim_size = data["tim_size"]
    pairs = [
        (checkin[1], checkin[0])
        for sessions in data["data"].values()
        for session in sessions
        for checkin in session
    ]
    if not pairs:
        return np.zeros((tim_size, tim_size))
    tims = np.array([p[0] for p in pairs])
    locs = np.array([p[1] for p in pairs])
    _, loc_idx = np.unique(locs, return_inverse=True)
    member = np.zeros((tim_size, loc_idx.max() + 1), dtype=np.float64)
    member[tims, loc_idx] = 1.0
    inter = member @ member.T
    sizes = member.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        sim = np.where(union > 0, inter / union, 0.0)
    return sim
