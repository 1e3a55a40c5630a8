"""Result figures (ref: result_plot.py:30-270).

Two figure families from run artifacts:
  * prediction-vs-truth time series for the best/worst-MAE nodes, from a
    *_predictions.npz (group-destandardized when a .gbst table is given);
  * per-horizon metric curves across models, from aggregate_results output.

Usage:
    python tools/plot_results.py timeseries <predictions.npz> [--gbst file.gbst] [--out fig.png]
    python tools/plot_results.py horizons <summary.csv> [--metric MAE_mean] [--out fig.png]
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
    args = parser.parse_args()
    if args.cmd == "timeseries":
        plot_timeseries(args.npz, args.gbst, args.out, args.k)
    else:
        plot_horizons(args.summary, args.metric, args.out)
