"""Full-protocol quality run on the DC-237-shaped synthetic dataset.

Trains MultiATGCN with the reference's exact protocol (Adam 3e-3, x0.75 decay
at epochs {5,10,20,30}, grad-clip 5, batch 16, early stop patience 6, 30
epochs, standard scaler, 24h->24h with 2/1/1 closeness/period/trend heads)
and reports per-horizon masked MAE/RMSE/MAPE against two naive baselines
computed on the same test windows:

  * persistence — predict the last observed closeness step for every horizon;
  * seasonal    — predict the value 24h before the target step (same hour
    yesterday, i.e. the matching step of the last closeness block).

Writes docs/RESULTS.md. The reference's raw data is unavailable (missing
blobs), so absolute numbers are synthetic-data-specific; the baselines ground
them.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import get_dataset
from multistgraph_tpu.data.synthetic import make_synthetic_dataset
from multistgraph_tpu.executor import get_executor
from multistgraph_tpu.models import get_model
from multistgraph_tpu.ops import losses

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def masked_metrics(pred, true):
    return (
        float(losses.masked_mae(pred, true, 0.0)),
        float(losses.masked_rmse(pred, true, 0.0)),
        float(losses.masked_mape(pred, true, 0.0)),
    )


SHAPES = {
    # README.md:44-53 dataset statistics for DC and Baltimore
    "dc": dict(name="SYN_DC237", num_nodes=237, node_mean=30.169, node_std=84.023,
               output_window=24),
    "bm": dict(name="SYN_BM403", num_nodes=403, node_mean=14.41, node_std=29.3,
               output_window=12),
}


def main():
    shape = SHAPES[sys.argv[1] if len(sys.argv) > 1 else "dc"]
    max_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    bench_root = os.path.join(ROOT, "outputs", "bench")
    raw_dir = os.path.join(bench_root, "raw_data")
    ds_name = shape["name"]
    if not os.path.exists(os.path.join(raw_dir, ds_name, "config.json")):
        make_synthetic_dataset(
            raw_dir, ds_name, num_nodes=shape["num_nodes"], len_time=24 * 151,
            node_mean=shape["node_mean"], node_std=shape["node_std"], seed=42,
        )
    args = {
        "data_dir": raw_dir,
        "cache_dir": os.path.join(bench_root, "dataset_cache"),
        "output_dir": os.path.join(bench_root, "outputs"),
        "exp_id": "quality_" + ds_name,
        "input_window": 24, "output_window": shape["output_window"],
        "len_closeness": 2, "len_period": 1, "len_trend": 1,
        "interval_period": 7, "interval_trend": 28,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "add_static": True,
        "adjtype": "multi", "adpadj": "bidirection",
        "batch_size": 16, "train_rate": 0.7, "eval_rate": 0.15,
        "max_epoch": max_epoch, "use_early_stop": True, "patience": 6,
        "seed": 0,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", ds_name, other_args=args)
    dataset = get_dataset(config)
    train_loader, val_loader, test_loader = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    executor = get_executor(config, model, feature)

    t0 = time.time()
    best_val = executor.train(train_loader, val_loader)
    train_s = time.time() - t0
    print("trained: best val {:.4f} in {:.1f}s".format(best_val, train_s), file=sys.stderr)
    executor.evaluate(test_loader)

    # Model predictions on the test set (scaled space -> inverse transformed).
    import jax.numpy as jnp

    perm = jnp.asarray(test_loader.ordered_permutation())
    pred = np.asarray(executor._predict_scan(executor.params, test_loader.x, perm))
    x_test = np.asarray(jnp.take(test_loader.x, perm.reshape(-1), axis=0))
    y_test = np.asarray(jnp.take(test_loader.y, perm.reshape(-1), axis=0))
    scaler = feature["scaler"]
    tout = shape["output_window"]
    truth = scaler.inverse_transform(y_test[:, :tout, :, 0:1])
    model_pred = scaler.inverse_transform(pred)

    len_c = feature["len_closeness"]
    last_step = scaler.inverse_transform(x_test[:, len_c - 1 : len_c, :, 0:1])
    persistence = np.broadcast_to(last_step, truth.shape)
    seasonal = scaler.inverse_transform(x_test[:, len_c - 24 : len_c - 24 + tout, :, 0:1])

    horizons = [h for h in (3, 6, 12, 24) if h <= tout]
    rows = []
    for h in horizons:
        row = {"horizon": h}
        for name, p in (("MultiATGCN", model_pred), ("persistence", persistence), ("seasonal", seasonal)):
            mae, rmse, mape = masked_metrics(p[:, :h], truth[:, :h])
            row[name] = (mae, rmse, mape)
        rows.append(row)

    lines = [
        "# RESULTS — full-protocol quality run ({})".format(ds_name),
        "",
        "Protocol: reference training recipe (Adam 3e-3, multistep x0.75 @ {5,10,20,30},",
        "clip 5, batch 16, <=30 epochs, early stop patience 6), full multi-view graph +",
        "bidirectional adaptive adjacency + static features, 96-step MTH input, 24h horizon.",
        "Data: statistically-matched synthetic DC (237 nodes, 151 days; the reference's",
        "raw archives are missing blobs). Metrics: masked (null=0) on destandardized values,",
        "cumulative over the first h steps. Baselines computed on identical test windows.",
        "",
        "best val loss: {:.4f} | train wall: {:.0f}s on 1 TPU chip".format(best_val, train_s),
        "",
        "| horizon | MultiATGCN MAE | RMSE | MAPE | persistence MAE | RMSE | MAPE | seasonal MAE | RMSE | MAPE |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for row in rows:
        m, p, s = row["MultiATGCN"], row["persistence"], row["seasonal"]
        lines.append(
            "| {}h | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:.3f} |".format(
                row["horizon"], *m, *p, *s
            )
        )
    os.makedirs(os.path.join(ROOT, "docs"), exist_ok=True)
    out = os.path.join(ROOT, "docs", "RESULTS_{}.md".format(ds_name))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
