"""Serving benchmark: single-batch predict latency + sustained throughput.

Measures the flagship model's inference path on the DC-237 workload:
  * cold + warm single-batch latency (batch 1 and 16);
  * sustained throughput with the whole-test-set predict scan.

Usage: python tools/bench_inference.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import get_dataset
from multistgraph_tpu.data.synthetic import make_synthetic_dataset
from multistgraph_tpu.executor import get_executor
from multistgraph_tpu.models import get_model

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    bench_root = os.path.join(ROOT, "outputs", "bench")
    raw_dir = os.path.join(bench_root, "raw_data")
    if not os.path.exists(os.path.join(raw_dir, "SYN_DC237", "config.json")):
        make_synthetic_dataset(raw_dir, "SYN_DC237", num_nodes=237, len_time=24 * 151,
                               node_mean=30.169, node_std=84.023, seed=42)
    args = {
        "data_dir": raw_dir, "cache_dir": os.path.join(bench_root, "dataset_cache"),
        "output_dir": os.path.join(bench_root, "outputs"), "exp_id": "infer",
        "input_window": 24, "output_window": 24,
        "len_closeness": 2, "len_period": 1, "len_trend": 1,
        "interval_period": 7, "interval_trend": 28,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "add_static": True,
        "adjtype": "multi", "adpadj": "bidirection",
        "batch_size": 16, "train_rate": 0.7, "eval_rate": 0.15,
        "max_epoch": 0, "saved_model": False, "seed": 0,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", "SYN_DC237", other_args=args)
    dataset = get_dataset(config)
    _, _, test_loader = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    executor = get_executor(config, model, feature)

    import functools

    import jax as _jax

    from tools.timing import slope_time

    results = {}
    for b in (1, 16):
        x = test_loader.x[:b]
        t0 = time.time()
        out = executor._predict_step(executor.params, x)
        float(jnp.sum(out))
        results["cold_ms_b{}".format(b)] = round((time.time() - t0) * 1e3, 1)
        # host-loop rate: includes the relay's per-dispatch overhead, i.e.
        # an upper bound on per-request service time through THIS relay
        iters = 50
        t0 = time.time()
        for _ in range(iters):
            out = executor._predict_step(executor.params, x)
        float(jnp.sum(out))
        warm = (time.time() - t0) / iters
        results["dispatch_ms_b{}".format(b)] = round(warm * 1e3, 2)
        results["samples_per_s_b{}".format(b)] = round(b / warm, 1)

        # true on-device latency via the latency-cancelling slope method
        # (docs/DESIGN.md §9): chained predicts, carry poked into the input
        def make_fn(k, xx=x):
            @functools.partial(_jax.jit, static_argnums=1)
            def fn(xa, kk):
                def body(i, c):
                    out = executor.model.apply(executor.params, xa.at[0, 0, 0, 0].add(c * 1e-12), train=False)
                    return c + jnp.sum(out, dtype=jnp.float32) * 1e-12
                return _jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return lambda: fn(xx, k)

        per_iter, _totals = slope_time(make_fn, trips=(4, 8, 16))
        results["device_ms_b{}".format(b)] = round(per_iter * 1e3, 2)

    # weight-only quantized predict (the serving path's quantize option,
    # ops/quantize.py): device latency + stored parameter bytes vs f32
    from multistgraph_tpu.ops.quantize import (
        dequantize_params, quantize_params, quantized_nbytes)

    results["param_bytes_f32"] = quantized_nbytes(executor.params["params"])
    for mode in ("bfloat16", "int8"):
        qparams = {**executor.params,
                   "params": quantize_params(executor.params["params"], mode)}
        results["param_bytes_{}".format(mode)] = quantized_nbytes(
            qparams["params"])
        x16 = test_loader.x[:16]

        def make_qfn(k, xx=x16, qp=qparams):
            @functools.partial(_jax.jit, static_argnums=1)
            def fn(xa, kk):
                def body(i, c):
                    full = {**qp, "params": dequantize_params(qp["params"])}
                    out = executor.model.apply(
                        full, xa.at[0, 0, 0, 0].add(c * 1e-12), train=False)
                    return c + jnp.sum(out, dtype=jnp.float32) * 1e-12
                return _jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return lambda: fn(xx, k)

        per_iter, _ = slope_time(make_qfn, trips=(4, 8, 16))
        results["device_ms_b16_{}".format(mode)] = round(per_iter * 1e3, 2)

    # sustained: whole test set in one scan program
    perm = jnp.asarray(test_loader.ordered_permutation())
    t0 = time.time()
    pred = executor._predict_scan(executor.params, test_loader.x, perm)
    float(jnp.sum(pred[0]))
    results["scan_cold_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    pred = executor._predict_scan(executor.params, test_loader.x, perm)
    float(jnp.sum(pred[0]))
    sustained = time.time() - t0
    n_samples = int(perm.size)
    results["sustained_samples_per_s"] = round(n_samples / sustained, 1)

    print(json.dumps({
        "metric": "inference_samples_per_second_dc237",
        "value": results["sustained_samples_per_s"],
        "unit": "samples/s",
        "extras": dict(results, device=jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()
