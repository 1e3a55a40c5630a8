"""bf16 compute mode vs exact f32: training-quality check on SYN_DC237.

Trains the flagship DC-237 configuration for a fixed number of epochs in
both modes (same seed, same data) and reports the per-epoch train/val losses
and final masked-MAE side by side. Run on the TPU:

    python tools/bench_bf16_quality.py [--epochs 20]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NUM_NODES = 237
LEN_TIME = 24 * 151


def run(compute_dtype, epochs):
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.data.synthetic import make_synthetic_dataset
    from multistgraph_tpu.executor import get_executor
    from multistgraph_tpu.models import get_model

    bench_root = os.path.join(ROOT, "outputs", "bench")
    raw_dir = os.path.join(bench_root, "raw_data")
    ds_name = "SYN_DC237"
    if not os.path.exists(os.path.join(raw_dir, ds_name, "config.json")):
        make_synthetic_dataset(
            raw_dir, ds_name, num_nodes=NUM_NODES, len_time=LEN_TIME,
            node_mean=30.169, node_std=84.023, seed=42,
        )
    args = {
        "data_dir": raw_dir,
        "cache_dir": os.path.join(bench_root, "dataset_cache"),
        "output_dir": os.path.join(bench_root, "outputs"),
        "exp_id": "bf16q_{}".format(compute_dtype or "f32"),
        "input_window": 24, "output_window": 24,
        "len_closeness": 2, "len_period": 1, "len_trend": 1,
        "interval_period": 7, "interval_trend": 28,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "add_static": True,
        "adjtype": "multi", "adpadj": "bidirection",
        "batch_size": 16, "train_rate": 0.7, "eval_rate": 0.15,
        "max_epoch": epochs, "saved_model": False, "use_early_stop": False,
        "seed": 0, "compute_dtype": compute_dtype,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", ds_name, other_args=args)
    dataset = get_dataset(config)
    loaders = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    executor = get_executor(config, model, feature)
    executor.train(loaders[0], loaders[1])
    metrics = executor.evaluate(loaders[2])
    return executor, metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()
    out = {}
    for mode in (None, "bfloat16"):
        _, metrics = run(mode, args.epochs)
        key = mode or "float32"
        out[key] = str(metrics)
        print("MODE", key, "->\n", metrics, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
