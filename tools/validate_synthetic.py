"""Synthetic-data external validity artifact (VERDICT r4 item 8).

The reference's raw archives are missing blobs; the benchmark tables run on
synthetic data statistically matched to what IS recorded: README.md:44-53
aggregate statistics and other_data/*_visit_mstd.pkl per-node mean/std
tables (mirrored at multistgraph_tpu/data/stats/*.csv). This tool makes
that match MEASURED instead of asserted: it generates the protocol datasets
and compares

  * per-node mean/std marginals (quantiles + KS distance) against the real
    per-node tables — with `node_stats` anchoring these are exact by
    construction (the generator consumes the real values);
  * temporal structure (daily lag-24 / weekly lag-168 autocorrelation of
    the node-mean series, weekend level shift) against what hourly
    crowd-flow data exhibits (qualitative targets: strong daily and weekly
    periodicity, positive long-lag memory);

and writes docs/SYNTHETIC_VALIDITY.md.

Usage: python tools/validate_synthetic.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import pandas as pd

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
STATS = os.path.join(ROOT, "multistgraph_tpu", "data", "stats")


def _acf(x, lag):
    x = x - x.mean()
    denom = float((x * x).sum())
    return float((x[:-lag] * x[lag:]).sum() / denom) if denom else 0.0


def _ks(a, b):
    """Two-sample Kolmogorov-Smirnov distance (no scipy dependency)."""
    a, b = np.sort(a), np.sort(b)
    grid = np.union1d(a, b)
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.abs(ca - cb).max())


def _analyze(name, num_nodes, stats_csv, node_mean, node_std, tmpdir):
    from multistgraph_tpu.data.synthetic import make_synthetic_dataset

    real = pd.read_csv(os.path.join(STATS, stats_csv))
    path = make_synthetic_dataset(
        tmpdir, name, num_nodes=num_nodes, len_time=24 * 151,
        node_mean=node_mean, node_std=node_std, seed=42,
        groupstd_normalize=False,
        node_stats=os.path.join(STATS, stats_csv))
    dyna = pd.read_csv(os.path.join(path, name + ".dyna"))
    series = dyna.pivot_table(index="entity_id", columns="time",
                              values="Visits", sort=False)
    vals = series.to_numpy()  # (N, T)
    syn_m, syn_s = vals.mean(axis=1), vals.std(axis=1)

    mean_series = vals.mean(axis=0)
    t = np.arange(len(mean_series))
    weekday = ((t // 24) + 1) % 7  # 2019-01-01 = Tuesday
    weekend = np.isin(weekday, (5, 6))
    rows = {
        "nodes": num_nodes,
        # marginal match vs the real per-node tables
        "real_mean_q50/q90/max": "{:.1f} / {:.1f} / {:.1f}".format(
            *np.percentile(real["All_m"], [50, 90, 100])),
        "syn_mean_q50/q90/max": "{:.1f} / {:.1f} / {:.1f}".format(
            *np.percentile(syn_m, [50, 90, 100])),
        "KS(node means)": "{:.3f}".format(_ks(real["All_m"].to_numpy(), syn_m)),
        "real_std_q50/q90/max": "{:.1f} / {:.1f} / {:.1f}".format(
            *np.percentile(real["All_std"], [50, 90, 100])),
        "syn_std_q50/q90/max": "{:.1f} / {:.1f} / {:.1f}".format(
            *np.percentile(syn_s, [50, 90, 100])),
        "KS(node stds)": "{:.3f}".format(_ks(real["All_std"].to_numpy(), syn_s)),
        "corr(mean, std) real/syn": "{:.2f} / {:.2f}".format(
            np.corrcoef(real["All_m"], real["All_std"])[0, 1],
            np.corrcoef(syn_m, syn_s)[0, 1]),
        # temporal structure of the citywide series
        "acf@24h / @168h": "{:.2f} / {:.2f}".format(
            _acf(mean_series, 24), _acf(mean_series, 168)),
        "weekend level shift": "{:+.1%}".format(
            mean_series[weekend].mean() / mean_series[~weekend].mean() - 1),
    }
    return rows


def main():
    import tempfile

    tmp = tempfile.mkdtemp(prefix="synval_")
    dc = _analyze("SYN_DC237", 237, "DC237_visit_mstd.csv", 30.169, 84.023, tmp)
    bm = _analyze("SYN_BM403", 403, "BM403_visit_mstd.csv", 14.41, 29.3, tmp)

    lines = [
        "# Synthetic data external validity",
        "",
        "The reference's raw `.7z` archives are missing blobs "
        "(`.MISSING_LARGE_BLOBS:4-5`), so the benchmark tables run on "
        "synthetic data. This artifact measures how closely that data "
        "matches what the reference DOES record about the real datasets: "
        "`README.md:44-53` aggregate statistics and the per-node mean/std "
        "tables `other_data/*_visit_mstd.pkl` (mirrored at "
        "`multistgraph_tpu/data/stats/*.csv`).",
        "",
        "Since round 5 the generator draws each node's mean/std DIRECTLY "
        "from the real tables (`make_synthetic_dataset(node_stats=...)`), "
        "so the per-node marginal distributions are matched by "
        "construction — the KS rows below quantify the residual gap from "
        "the generator's dynamics (non-negativity clipping, finite-sample "
        "noise). Real crowd-flow node means are heavy-tailed (DC max 458 "
        "vs median 13), which the earlier normal draw missed entirely.",
        "",
        "| quantity | SYN_DC237 | SYN_BM403 |",
        "|---|---|---|",
    ]
    for key in dc:
        lines.append("| {} | {} | {} |".format(key, dc[key], bm[key]))
    lines += [
        "",
        "Temporal rows are qualitative anchors (the real hourly series are "
        "not in the repo): hourly visit data shows strong daily (lag-24) "
        "and weekly (lag-168) autocorrelation and a weekend level shift; "
        "the generator's two-harmonic daily profile + weekly drifted "
        "hour-of-week profile + OD-mixed AR(1) reproduces those "
        "structures, which is what makes the per-horizon difficulty and "
        "the 3TU period/trend heads measurable "
        "(multistgraph_tpu/data/synthetic.py docstring).",
        "",
        "Regenerate with `python tools/validate_synthetic.py`.",
    ]
    out = os.path.join(ROOT, "docs", "SYNTHETIC_VALIDITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("\nwrote", out)


if __name__ == "__main__":
    main()
