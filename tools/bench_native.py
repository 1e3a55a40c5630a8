"""Benchmark the native (C++) graph-builder runtime vs the numpy fallbacks.

Host-side work only (no TPU): COO->BSR tiling, label-propagation community
ordering, banded all-pairs DTW. Run:

    python tools/bench_native.py [--nodes 1000000] [--avg-degree 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, repeats=1, **kw):
    best = float("inf")
    out = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--avg-degree", type=int, default=8)
    ap.add_argument("--dtw-nodes", type=int, default=403)
    ap.add_argument("--lpa-rounds", type=int, default=5)
    args = ap.parse_args()

    from multistgraph_tpu import native
    from multistgraph_tpu.models.stgode import dtw_profile_distances
    from multistgraph_tpu.ops.bsr import bsr_from_coo, community_order

    if not native.available():
        print("native unavailable: {}".format(native.load_error()))
        return 1

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.nodes * args.avg_degree
    src = rng.integers(0, n, e)
    dst = np.clip(src + rng.integers(-256, 257, e), 0, n - 1)
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)

    results = {}

    t_np, g = timed(bsr_from_coo, src, dst, w, n, native=False)
    del g
    t_cc, g = timed(bsr_from_coo, src, dst, w, n, native=True)
    results["bsr_from_coo"] = {
        "numpy_s": round(t_np, 2), "native_s": round(t_cc, 2),
        "speedup": round(t_np / t_cc, 1), "nnz_blocks": g.nnz_blocks,
    }
    del g

    t_plan, plan = timed(native.BsrPlan, src, dst, n, 128)
    t_fill, v = timed(plan.fill, w)
    del v
    t_refill, v = timed(plan.fill, w)
    del v
    plan.close()
    results["bsr_plan_reuse"] = {
        "plan_s": round(t_plan, 2), "fill_s": round(t_fill, 2),
        "refill_s": round(t_refill, 2),
        "note": "multi-view graphs pay plan once, refill per view",
    }

    t_np, p1 = timed(community_order, src, dst, n,
                     rounds=args.lpa_rounds, native=False)
    t_cc, p2 = timed(community_order, src, dst, n,
                     rounds=args.lpa_rounds, native=True)
    results["community_order"] = {
        "numpy_s": round(t_np, 2), "native_s": round(t_cc, 2),
        "speedup": round(t_np / t_cc, 1),
        "equal": bool(np.array_equal(p1, p2)),
        "rounds": args.lpa_rounds,
    }

    profiles = rng.standard_normal((args.dtw_nodes, 24)).astype(np.float32)
    t_np, d1 = timed(dtw_profile_distances, profiles, native=False)
    t_cc, d2 = timed(dtw_profile_distances, profiles, native=True)
    results["dtw_profile_distances"] = {
        "numpy_s": round(t_np, 2), "native_s": round(t_cc, 3),
        "speedup": round(t_np / t_cc, 1),
        "equal": bool(np.array_equal(d1, d2)),
        "nodes": args.dtw_nodes,
    }

    print(json.dumps({"nodes": n, "edges": e, "results": results}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
