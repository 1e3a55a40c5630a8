"""Result figures (ref: result_plot.py:30-270) — all five paper families:

  * timeseries — prediction-vs-truth series for the best/worst-MAE nodes,
    from a *_predictions.npz (group-destandardized with a .gbst table)
    (ref :100-189 topbott figures);
  * horizons  — per-horizon metric curves across models, from
    aggregate_results output (ref :203-225);
  * s-small   — metric sensitivity to the small-truth filter threshold
    s_small in {1e-4, 1..10} per horizon, from a *_predictions_trans.pkl
    (ref :194-225 metrics_by_steps_small_unit);
  * params    — parameter-study curves (metric vs swept value, mean ± std
    over seeds) from a CSV with columns value,<metric>[,seed] (ref :228-246
    para_test);
  * ablation  — %-change bars of ablation variants vs a reference label,
    from a CSV with columns label,<metric> (ref :249-269 aba_test).

Usage:
    python tools/plot_results.py timeseries <predictions.npz> [--gbst file.gbst] [--out fig.png]
    python tools/plot_results.py horizons <summary.csv> [--metric MAE_mean] [--out fig.png]
    python tools/plot_results.py s-small <predictions_trans.pkl> [--out fig.png]
    python tools/plot_results.py params <sweep.csv> [--metric MAE] [--xlabel lr] [--out fig.png]
    python tools/plot_results.py ablation <ablations.csv> [--metric MAE] [--reference full] [--out fig.png]
"""

import argparse
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd


def plot_timeseries(npz_path: str, gbst: str = None, out: str = "timeseries.png", k: int = 3):
    blob = np.load(npz_path)
    pred, truth = blob["prediction"], blob["truth"]  # (S, Tout, N, D)
    if gbst:
        table = pd.read_csv(gbst).sort_values("geo_id").reset_index(drop=True)
        s = table["All_std"].to_numpy()[None, None, :, None]
        m = table["All_m"].to_numpy()[None, None, :, None]
        pred, truth = pred * s + m, truth * s + m
    # one-step-ahead series per node over test samples
    p1, t1 = pred[:, 0, :, 0], truth[:, 0, :, 0]
    mae = np.abs(p1 - t1).mean(axis=0)
    order = np.argsort(mae)
    picks = list(order[:k]) + list(order[-k:])
    fig, axes = plt.subplots(len(picks), 1, figsize=(10, 2 * len(picks)), sharex=True)
    for ax, node in zip(np.atleast_1d(axes), picks):
        ax.plot(t1[:, node], label="truth", lw=0.8)
        ax.plot(p1[:, node], label="prediction", lw=0.8)
        ax.set_ylabel("node {}\nMAE {:.2f}".format(node, mae[node]), fontsize=8)
    np.atleast_1d(axes)[0].legend(loc="upper right", fontsize=8)
    np.atleast_1d(axes)[-1].set_xlabel("test sample (1-step ahead)")
    fig.suptitle("best/worst {} nodes by 1-step MAE".format(k))
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out, file=sys.stderr)


def plot_horizons(summary_csv: str, metric: str = "MAE_mean", out: str = "horizons.png"):
    df = pd.read_csv(summary_csv)
    fig, ax = plt.subplots(figsize=(6, 4))
    for model, grp in df.groupby("Model_name"):
        grp = grp.sort_values("horizon")
        ax.plot(grp["horizon"], grp[metric], marker="o", label=model)
        std_col = metric.replace("_mean", "_std")
        if std_col in grp and grp[std_col].notna().all():
            ax.fill_between(
                grp["horizon"],
                grp[metric] - grp[std_col],
                grp[metric] + grp[std_col],
                alpha=0.2,
            )
    ax.set_xlabel("horizon (h)")
    ax.set_ylabel(metric)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out, file=sys.stderr)


def plot_s_small(trans_pkl: str, out: str = "s_small.png"):
    """Metric sensitivity to the truth>s_small filter (ref :194-225): the
    paper's headline protocol filters tiny truths at s_small=10; this shows
    MAE/RMSE/MAPE per horizon as the threshold sweeps 1e-4..10."""
    table = pd.read_pickle(trans_pkl)
    thresholds = [1e-4] + list(range(1, 11))
    metrics = ("MAE", "RMSE", "MAPE")
    rows = []
    for s_small in thresholds:
        for rr in sorted(table["ahead_step"].unique()):
            sel = (table["ahead_step"] == rr) & (table["truth_t"] > s_small)
            pr = np.maximum(table.loc[sel, "prediction_t"].to_numpy(), 0.0)
            tr = table.loc[sel, "truth_t"].to_numpy()
            if not len(tr):
                continue
            diff = pr - tr
            rows.append({
                "s_small": s_small, "index": rr,
                "MAE": float(np.abs(diff).mean()),
                "RMSE": float(np.sqrt((diff ** 2).mean())),
                "MAPE": float(np.abs(diff / tr).mean()),
            })
    df = pd.DataFrame(rows)
    fig, axes = plt.subplots(len(metrics), 1, figsize=(7, 7), sharex=True)
    for ax, metric in zip(axes, metrics):
        for s_small, grp in df.groupby("s_small"):
            grp = grp.sort_values("index")
            ax.plot(grp["index"] + 1, grp[metric], lw=0.9,
                    label="s_small={:g}".format(s_small))
        ax.set_ylabel(metric)
    axes[0].legend(fontsize=6, ncol=3)
    axes[-1].set_xlabel("ahead step")
    fig.suptitle("metric sensitivity to the small-truth filter")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out, file=sys.stderr)
    return df


def plot_params(sweep_csv: str, metric: str = "MAE", xlabel: str = "value",
                out: str = "params.png"):
    """Parameter-study curve: metric vs swept value, mean ± std over seeds
    (ref :228-246). CSV columns: value,<metric>[,seed]."""
    df = pd.read_csv(sweep_csv)
    agg = df.groupby("value")[metric].agg(["mean", "std"]).reset_index()
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.errorbar(agg["value"], agg["mean"], yerr=agg["std"].fillna(0.0),
                marker="o", capsize=3)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(metric)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out, file=sys.stderr)
    return agg


def plot_ablation(abl_csv: str, metric: str = "MAE", reference: str = "full",
                  out: str = "ablation.png"):
    """Ablation bars: % change of each variant vs the reference label
    (ref :249-269). CSV columns: label,<metric>."""
    df = pd.read_csv(abl_csv)
    base = float(df.loc[df["label"] == reference, metric].mean())
    rest = df[df["label"] != reference].groupby("label")[metric].mean()
    change = 100.0 * (rest - base) / base
    fig, ax = plt.subplots(figsize=(6, 3.5))
    colors = ["#c44" if v > 0 else "#4a4" for v in change]
    ax.bar(change.index, change.to_numpy(), color=colors)
    ax.axhline(0, color="k", lw=0.8)
    ax.set_ylabel("Change (%) in {} vs {}".format(metric, reference))
    ax.tick_params(axis="x", rotation=30)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out, file=sys.stderr)
    return change


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    ts = sub.add_parser("timeseries")
    ts.add_argument("npz")
    ts.add_argument("--gbst", default=None)
    ts.add_argument("--out", default="timeseries.png")
    ts.add_argument("--k", type=int, default=3)
    hz = sub.add_parser("horizons")
    hz.add_argument("summary")
    hz.add_argument("--metric", default="MAE_mean")
    hz.add_argument("--out", default="horizons.png")
    ss = sub.add_parser("s-small")
    ss.add_argument("trans_pkl")
    ss.add_argument("--out", default="s_small.png")
    pr = sub.add_parser("params")
    pr.add_argument("sweep")
    pr.add_argument("--metric", default="MAE")
    pr.add_argument("--xlabel", default="value")
    pr.add_argument("--out", default="params.png")
    ab = sub.add_parser("ablation")
    ab.add_argument("ablations")
    ab.add_argument("--metric", default="MAE")
    ab.add_argument("--reference", default="full")
    ab.add_argument("--out", default="ablation.png")
    args = parser.parse_args()
    if args.cmd == "timeseries":
        plot_timeseries(args.npz, args.gbst, args.out, args.k)
    elif args.cmd == "horizons":
        plot_horizons(args.summary, args.metric, args.out)
    elif args.cmd == "s-small":
        plot_s_small(args.trans_pkl, args.out)
    elif args.cmd == "params":
        plot_params(args.sweep, args.metric, args.xlabel, args.out)
    else:
        plot_ablation(args.ablations, args.metric, args.reference, args.out)
