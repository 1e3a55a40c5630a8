"""Correct device timing on the axon-relay TPU: the slope method.

Why naive timing lies here (each mode was observed; tools/bench_hbm_peak.py):

- ~28 ms fixed dispatch+sync round-trip. `(time one synced call)/REPEAT`
  reads `28/REPEAT + work` — for sub-ms kernels the latency term dominates
  and the result tracks REPEAT, not the hardware.
- XLA hoists loop-invariant scan/loop bodies and constant-folds ones-like
  operands, so "repeat the op in a scan" programs can execute the op once
  (or zero times, via DCE when only one output element is consumed).

`slope_time` runs the SAME jitted loop at several trip counts and fits the
least-squares slope of total wall time vs trips: the fixed cost cancels
exactly, and disagreement between trip counts is visible in the totals.
Callers must make the loop body trip-dependent (consume the carry in the
operand: a scalar SMEM operand for Pallas kernels, a dynamic-slice start or
element poke for XLA ops) and consume every output.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Force remote completion via a value transfer (block_until_ready can
    return early through the relay)."""
    return float(jnp.asarray(x, jnp.float32).sum())


def slope_time(make_fn, trips=(8, 16, 32, 64), reps=2):
    """Per-iteration seconds of `make_fn(k)() -> array`, latency-cancelled.

    make_fn(k) must return a zero-arg callable running k trip-dependent
    iterations of the op under test (compile cost is paid per trip count).
    Returns (per_iter_seconds, totals list).
    """
    times = []
    for k in trips:
        fn = make_fn(k)
        device_sync(fn())  # compile
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            device_sync(fn())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times.append(best)
    n = len(trips)
    mk = sum(trips) / n
    mt = sum(times) / n
    per_iter = (sum((k - mk) * (t - mt) for k, t in zip(trips, times))
                / sum((k - mk) ** 2 for k in trips))
    return per_iter, times
