"""Exploratory raw-data plots over a dataset's atomic files.

Counterpart of the reference's `data_prepare/1.4-data_prepare_plot.py:1-342`
(its six exploration figure families), reworked for the framework's atomic
format and without the geopandas/shapefile dependency — node geometry comes
from the `.geo` coordinates, so "choropleths" are spatial scatters and the
graph map draws `.rel` edges as segments between node positions:

  1. spatial      — node map colored by mean activity + log-log CCDF of
                    node means (ref: CBG choropleth + loglogplot)
  2. daily        — every node's series (faint) + network mean, with the
                    chronological train/val/test split boundaries
  3. weekly       — per-node mean weekly profile (dow x hour), highlighting
                    the busiest/median/quietest nodes
  4. graph        — .rel edges drawn on the node map, alpha by weight
                    (ref: Adjacent_* maps)
  5. static       — one spatial scatter per .static column (ref:
                    External_Socio panel)
  6. external     — .ext columns + the median node series, shared time axis
                    (ref: external_dynamic)

Usage:
    python tools/plot_raw_data.py <data_dir> <dataset>
        [--out_dir figures] [--families spatial,daily,...]
        [--train_rate 0.7 --eval_rate 0.15]
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from multistgraph_tpu.data import atomic

FAMILIES = ("spatial", "daily", "weekly", "graph", "static", "external")


def _node_xy(geo):
    """(N, 2) lon/lat from the .geo coordinates column (points; polygons use
    their vertex centroid)."""
    xy = []
    for _, row in geo.df.iterrows():
        c = np.asarray(ast.literal_eval(row["coordinates"]), dtype=np.float64)
        xy.append(c.reshape(-1, 2).mean(axis=0))
    return np.asarray(xy)


def _scatter(ax, xy, c, title, cmap="viridis"):
    s = ax.scatter(xy[:, 0], xy[:, 1], c=c, s=14, cmap=cmap, linewidths=0)
    ax.set_title(title, fontsize=9)
    ax.set_xticks([])
    ax.set_yticks([])
    return s


def plot_spatial(xy, series, out):
    mean = series.mean(axis=0)
    fig, ax = plt.subplots(1, 2, figsize=(8, 3.2),
                           gridspec_kw={"width_ratios": [2, 1.4]})
    s = _scatter(ax[0], xy, mean, "mean activity per node")
    fig.colorbar(s, ax=ax[0], shrink=0.85)
    # log-log survival plot of node means: heavy-tailed activity shows as a
    # straight-ish tail, like the reference's loglogplot
    v = np.sort(mean[mean > 0])[::-1]
    ax[1].loglog(v, (np.arange(len(v)) + 1) / len(v), ".", ms=3)
    ax[1].set_xlabel("node mean")
    ax[1].set_ylabel("P(X > x)")
    ax[1].set_title("activity CCDF", fontsize=9)
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    plt.close(fig)


def plot_daily(series, train_rate, eval_rate, out):
    t, n = series.shape
    fig, ax = plt.subplots(figsize=(8, 3.2))
    step = max(1, n // 100)  # at most ~100 faint node lines
    ax.plot(series[:, ::step], color="C0", alpha=0.08, lw=0.6)
    ax.plot(series.mean(axis=1), color="k", lw=1.4, label="network mean")
    for frac, color, label in ((train_rate, "green", "train|val"),
                               ((train_rate + eval_rate), "blue", "val|test")):
        ax.axvline(frac * t, ls="-.", color=color, alpha=0.6, label=label)
    ax.set_xlabel("time step")
    ax.set_ylabel("value")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    plt.close(fig)


def plot_weekly(series, timestamps, out):
    t, n = series.shape
    if timestamps is not None:
        ts = np.asarray(timestamps).astype("datetime64[h]")
        hour = (ts.astype("datetime64[h]") - ts.astype("datetime64[D]")).astype(int)
        # epoch day 0 (1970-01-01) is a THURSDAY: +3 maps Monday -> slot 0,
        # matching the 'Mon 0h .. Sun 23h' axis and the fallback branch
        dow = ((ts.astype("datetime64[D]").view("int64") + 3) % 7).astype(int)
    else:  # hourly series starting Monday 00:00
        hour = np.arange(t) % 24
        dow = (np.arange(t) // 24) % 7
    slot = dow * 24 + hour
    prof = np.zeros((168, n))
    for s in range(168):
        m = slot == s
        if m.any():
            prof[s] = series[m].mean(axis=0)
    fig, ax = plt.subplots(figsize=(8, 3.2))
    step = max(1, n // 100)
    ax.plot(prof[:, ::step], color="C0", alpha=0.08, lw=0.6)
    order = np.argsort(series.mean(axis=0))
    for idx, color, label in ((order[-1], "C3", "busiest node"),
                              (order[len(order) // 2], "C1", "median node"),
                              (order[0], "C2", "quietest node")):
        ax.plot(prof[:, idx], color=color, lw=1.6, label=label)
    for d in range(1, 7):
        ax.axvline(d * 24, color="gray", lw=0.4, alpha=0.5)
    ax.set_xlabel("hour of week (Mon 0h .. Sun 23h)")
    ax.set_ylabel("mean value")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    plt.close(fig)


def plot_graph(xy, adj, out, max_edges=4000):
    src, dst = np.nonzero(adj)
    w = adj[src, dst]
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    if len(src) > max_edges:  # draw the heaviest edges only
        top = np.argsort(-w)[:max_edges]
        src, dst, w = src[top], dst[top], w[top]
    fig, ax = plt.subplots(figsize=(5.5, 4.5))
    wn = w / (w.max() + 1e-12)
    for s, d, a in zip(src, dst, wn):
        ax.plot([xy[s, 0], xy[d, 0]], [xy[s, 1], xy[d, 1]],
                color="C0", alpha=float(0.05 + 0.45 * a), lw=0.5)
    ax.scatter(xy[:, 0], xy[:, 1], s=8, color="k", zorder=3)
    ax.set_title("graph edges ({} drawn)".format(len(src)), fontsize=9)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    plt.close(fig)


def plot_static(xy, static, out, max_cols=6):
    k = min(static.shape[1], max_cols)
    rows = (k + 1) // 2
    fig, axs = plt.subplots(rows, 2, figsize=(7, 2.6 * rows), squeeze=False)
    for i in range(k):
        ax = axs[i // 2][i % 2]
        s = _scatter(ax, xy, static[:, i], "static[{}]".format(i), cmap="coolwarm")
        fig.colorbar(s, ax=ax, shrink=0.8)
    for j in range(k, rows * 2):
        axs[j // 2][j % 2].axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    plt.close(fig)


def plot_external(ext, series, out, max_cols=3):
    k = min(ext.shape[1], max_cols)
    fig, axs = plt.subplots(k + 1, 1, figsize=(7, 1.6 * (k + 1)), sharex=True)
    axs = np.atleast_1d(axs)
    for i in range(k):
        axs[i].plot(ext[:, i], color="k", alpha=0.7, lw=0.8)
        axs[i].set_ylabel("ext[{}]".format(i), fontsize=8)
    t = min(len(series), len(ext))
    axs[k].plot(np.median(series[:t], axis=1), color="blue", alpha=0.7, lw=0.8)
    axs[k].set_ylabel("median node", fontsize=8)
    axs[k].set_xlabel("time step")
    fig.tight_layout()
    fig.savefig(out, dpi=200)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("data_dir")
    ap.add_argument("dataset")
    ap.add_argument("--out_dir", default="figures")
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--train_rate", type=float, default=0.7)
    ap.add_argument("--eval_rate", type=float, default=0.15)
    args = ap.parse_args()

    base = os.path.join(args.data_dir, args.dataset, args.dataset)
    geo = atomic.load_geo(base + ".geo")
    dyna = atomic.load_dyna(base + ".dyna", geo)
    series = dyna.values[..., 0]  # (T, N) first channel
    xy = _node_xy(geo)
    os.makedirs(args.out_dir, exist_ok=True)
    fams = args.families.split(",")

    def path(name):
        return os.path.join(args.out_dir, "{}_{}.png".format(args.dataset, name))

    if "spatial" in fams:
        plot_spatial(xy, series, path("spatial"))
    if "daily" in fams:
        plot_daily(series, args.train_rate, args.eval_rate, path("daily"))
    if "weekly" in fams:
        plot_weekly(series, dyna.timestamps, path("weekly"))
    if "graph" in fams and os.path.exists(base + ".rel"):
        adj = atomic.load_rel(base + ".rel", geo)
        plot_graph(xy, np.asarray(adj), path("graph"))
    if "static" in fams and os.path.exists(base + ".static"):
        plot_static(xy, atomic.load_static(base + ".static"), path("static"))
    if "external" in fams and os.path.exists(base + ".ext"):
        ext = atomic.load_ext(base + ".ext")
        plot_external(ext.values, series, path("external"))
    print("wrote {} figure(s) to {}".format(
        sum(f in fams for f in FAMILIES), args.out_dir))


if __name__ == "__main__":
    main()
