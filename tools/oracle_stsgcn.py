"""One-seed oracle head-to-head: the REFERENCE's own torch STSGCN vs our jax
STSGCN on the same synthetic data (VERDICT r4 item 5).

Round-3 diagnosed the STSGCN/TGCN quality anomaly as architectural
(docs/RESULTS_DIAG_TGCN.md), but that rested on our own JAX implementations.
The reference ships a frozen torch STSGCN (/root/reference/libcity/temp/
STSGCN.py, dev-history — imported here LIVE as an oracle, nothing copied);
training it on the same data under the same recipe converts the claim from
plausible to measured: if the torch model lands in the same collapsed range,
the anomaly is the architecture/data, not our port.

Both stacks: same dataset, same seed, same epoch budget, same recipe
(Adam lr 1e-3 = the STSGCN recipe in tools/quality_run.py, clip 5,
batch 16), same group-retransformed cumulative MAE@3h metric.

Usage:
    python tools/oracle_stsgcn.py --probe          # measure torch s/batch
    python tools/oracle_stsgcn.py --max-epoch 6    # the head-to-head
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
REFERENCE = "/root/reference"


def _dataset(config_args, model_name="STSGCN"):
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset

    config = load_config("traffic_state_pred", model_name, config_args["dataset"],
                         other_args=config_args)
    dataset = get_dataset(config)
    return config, dataset


def _batches(loader, seed):
    """Materialize the loader's epoch order as numpy batches (shared verbatim
    by both stacks)."""
    import jax.numpy as jnp

    perm = np.asarray(loader.ordered_permutation())
    out = []
    for idx in perm:
        out.append({
            "X": np.asarray(jnp.take(loader.x, jnp.asarray(idx), axis=0)),
            "y": np.asarray(jnp.take(loader.y, jnp.asarray(idx), axis=0)),
        })
    return out


def _cum_mae3(pred, truth, mstd):
    """Group-retransformed cumulative MAE over the first 3 horizon steps —
    the published tables' MAE@3h (tools/quality_run._trans_frame)."""
    all_m = mstd["All_m"].to_numpy()[None, None, :, None]
    all_s = mstd["All_std"].to_numpy()[None, None, :, None]
    truth_t = truth[:, :3] * all_s + all_m
    pred_t = np.maximum(pred[:, :3] * all_s + all_m, 0.0)
    keep = truth_t > 10.0
    return float(np.abs(pred_t[keep] - truth_t[keep]).mean())


def run_torch(config, dataset, seed, max_epoch, probe=False, model_name="STSGCN"):
    import torch

    torch.set_num_threads(os.cpu_count() or 4)
    torch.manual_seed(seed)
    np.random.seed(seed)

    sys.path.insert(0, REFERENCE)
    try:
        if model_name == "STTN":
            from libcity.temp.STTN import STTN as TorchModel
        else:
            from libcity.temp.STSGCN import STSGCN as TorchModel
    finally:
        sys.path.pop(0)

    train_loader, val_loader, test_loader = dataset.get_data()
    feature = dataset.get_data_feature()  # scaler exists only after get_data
    tcfg = {
        "device": torch.device("cpu"),
        "module_type": "individual", "act_type": "GLU",
        "temporal_emb": True, "spatial_emb": True, "use_mask": False,
        "input_window": int(config.get("input_window", 24)),
        "output_window": int(config.get("output_window", 24)),
        "rho": 1,
        # STTN: hourly data = 24 time intervals/day (its default 288 is
        # 5-minute data); reference model defaults otherwise
        "TG_in_one_day": 24,
    }

    class _Cfg(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    tm = TorchModel(_Cfg(tcfg), dict(feature))
    n_params = sum(p.numel() for p in tm.parameters())
    print("torch {} params: {}".format(model_name, n_params), file=sys.stderr, flush=True)
    lr = float(os.environ.get("ORACLE_TORCH_LR",
                               3e-3 if model_name == "STTN" else 1e-3))
    opt = torch.optim.Adam(tm.parameters(), lr=lr, eps=1e-8)

    def to_t(b):
        return {"X": torch.tensor(b["X"]), "y": torch.tensor(b["y"])}

    if probe:
        b = to_t(_batches(train_loader, seed)[0])
        for tag in ("fwd+bwd", "fwd+bwd"):
            t0 = time.time()
            opt.zero_grad()
            loss = tm.calculate_loss({k: v.clone() for k, v in b.items()})
            loss.backward()
            opt.step()
            print("torch {}: {:.1f}s (loss {:.4f})".format(
                tag, time.time() - t0, loss.item()), file=sys.stderr, flush=True)
        return None

    for epoch in range(max_epoch):
        t0 = time.time()
        losses = []
        for b in _batches(train_loader, seed + epoch):
            opt.zero_grad()
            tb = to_t(b)
            loss = tm.calculate_loss(tb)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 5)
            opt.step()
            losses.append(loss.item())
        print("torch epoch {} train_loss {:.4f} ({:.0f}s)".format(
            epoch, float(np.mean(losses)), time.time() - t0),
            file=sys.stderr, flush=True)

    # test-set predictions in the loader's deterministic order
    preds, trues = [], []
    with torch.no_grad():
        for b in _batches(test_loader, 0):
            preds.append(tm.predict(to_t(b)).numpy())
            trues.append(b["y"][..., :1])
    scaler = feature["scaler"]
    pred = scaler.inverse_transform(np.concatenate(preds))
    truth = scaler.inverse_transform(np.concatenate(trues))
    return pred, truth


def run_jax(config_args, seed, max_epoch, model_name="STSGCN"):
    """Our production path: executor-trained jax STSGCN, same budget."""
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor import get_executor
    from multistgraph_tpu.models import get_model
    from multistgraph_tpu.utils import set_random_seed

    args = dict(config_args)
    args.update({"max_epoch": max_epoch,
                 "learning_rate": 3e-3 if model_name == "STTN" else 1e-3,
                 "exp_id": "oracle_{}_jax_s{}".format(model_name, seed),
                 "seed": seed, "use_early_stop": False})
    config = load_config("traffic_state_pred", model_name, args["dataset"],
                         other_args=args)
    set_random_seed(seed)
    dataset = get_dataset(config)
    train_loader, val_loader, test_loader = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    executor = get_executor(config, model, feature)
    executor.train(train_loader, val_loader)
    import jax.numpy as jnp
    import jax

    perm = np.asarray(test_loader.ordered_permutation())
    predict = jax.jit(lambda p, x: executor.model.apply(p, x, train=False))
    preds, trues = [], []
    for idx in perm:
        x = jnp.take(test_loader.x, jnp.asarray(idx), axis=0)
        y = np.asarray(jnp.take(test_loader.y, jnp.asarray(idx), axis=0))
        preds.append(np.asarray(predict(executor.params, x)))
        trues.append(y[..., :1])
    scaler = feature["scaler"]
    pred = scaler.inverse_transform(np.concatenate(preds))
    truth = scaler.inverse_transform(np.concatenate(trues))
    return pred, truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-epoch", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--len-days", type=int, default=151,
                    help="synthetic series length in days (151 = the "
                    "published protocol's)")
    ap.add_argument("--probe", action="store_true",
                    help="measure torch seconds/batch and exit")
    ap.add_argument("--side", choices=("both", "torch", "jax"), default="both")
    ap.add_argument("--model", choices=("STSGCN", "STTN"), default="STSGCN")
    cli = ap.parse_args()

    bench_root = os.path.join(ROOT, "outputs", "bench_quality")
    raw_dir = os.path.join(bench_root, "raw_data")
    ds_name = "SYN_DC237"
    if cli.len_days != 151:
        ds_name += "_S237x{}".format(24 * cli.len_days)
    from multistgraph_tpu.data.synthetic import make_synthetic_dataset

    if not os.path.exists(os.path.join(raw_dir, ds_name, "config.json")):
        make_synthetic_dataset(
            raw_dir, ds_name, num_nodes=237, len_time=24 * cli.len_days,
            node_mean=30.169, node_std=84.023, seed=42,
            node_stats=os.path.join(ROOT, "multistgraph_tpu", "data", "stats",
                                    "DC237_visit_mstd.csv"))

    config_args = {
        "dataset": ds_name,
        "data_dir": raw_dir,
        "cache_dir": os.path.join(bench_root, "dataset_cache"),
        "output_dir": os.path.join(bench_root, "outputs"),
        "input_window": 24, "output_window": 24, "use_3tu": False,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "add_static": True, "batch_size": 16,
        "train_rate": 0.7, "eval_rate": 0.15, "tensorboard": False,
    }
    config, dataset = _dataset(config_args, cli.model)
    from multistgraph_tpu.data import atomic

    mstd = atomic.load_gbst(os.path.join(raw_dir, ds_name, ds_name + ".gbst"))

    results = {}
    if cli.side in ("both", "torch"):
        out = run_torch(config, dataset, cli.seed, cli.max_epoch,
                        probe=cli.probe, model_name=cli.model)
        if cli.probe:
            return
        results["torch_reference"] = _cum_mae3(out[0], out[1], mstd)
        print("torch reference {} MAE@3h = {:.3f}".format(
            cli.model, results["torch_reference"]), flush=True)
    if cli.side in ("both", "jax"):
        pred, truth = run_jax(config_args, cli.seed, cli.max_epoch,
                              model_name=cli.model)
        results["jax_ours"] = _cum_mae3(pred, truth, mstd)
        print("our jax {} MAE@3h = {:.3f}".format(cli.model, results["jax_ours"]),
              flush=True)
    print(json.dumps({
        "oracle": cli.model, "dataset": ds_name, "seed": cli.seed,
        "max_epoch": cli.max_epoch, "recipe": "adam lr 1e-3 clip 5 batch 16",
        "metric": "group-retransformed cumulative MAE@3h (truth>10)",
        **results,
    }))


if __name__ == "__main__":
    main()
