"""Offline results aggregation (ref: result_convert.py:19-160).

Collects per-run group-retransformed metric tables (*_trans.csv) from the
outputs tree and produces:
  * a per-model x horizon summary (mean over runs);
  * mean +/- std over seeds when multiple runs of the same model exist;
  * a %-improvement comparison against a chosen reference model.

Usage:
    python tools/aggregate_results.py ./outputs --horizons 3 6 12 24 \
        --reference MultiATGCN --out summary.csv
"""

import argparse
import glob
import os
import sys

import pandas as pd


def collect_trans_tables(output_root: str) -> pd.DataFrame:
    rows = []
    for path in glob.glob(os.path.join(output_root, "*", "evaluate_cache", "*_trans.csv")):
        df = pd.read_csv(path, index_col=0)
        df["run"] = os.path.basename(os.path.dirname(os.path.dirname(path)))
        df["source"] = path
        rows.append(df)
    if not rows:
        raise SystemExit("no *_trans.csv found under {}".format(output_root))
    return pd.concat(rows, ignore_index=True)


def summarize(table: pd.DataFrame, horizons) -> pd.DataFrame:
    metrics = ["MAE", "MSE", "RMSE", "R2", "EVAR", "MAPE"]
    # 'index' column is the 0-based ahead step; horizon h means steps < h
    frames = []
    for h in horizons:
        sub = table[table["index"] < h]
        g = sub.groupby(["Model_name", "run"])[metrics].mean().reset_index()
        agg = g.groupby("Model_name")[metrics].agg(["mean", "std"])
        agg.columns = ["{}_{}".format(m, s) for m, s in agg.columns]
        agg["horizon"] = h
        frames.append(agg.reset_index())
    return pd.concat(frames, ignore_index=True)


def add_improvement(summary: pd.DataFrame, reference: str) -> pd.DataFrame:
    out = []
    for h, grp in summary.groupby("horizon"):
        ref_row = grp[grp["Model_name"] == reference]
        if len(ref_row):
            for metric in ("MAE_mean", "RMSE_mean", "MAPE_mean"):
                ref_val = float(ref_row[metric].iloc[0])
                grp = grp.copy()
                grp[metric.replace("_mean", "_vs_ref_pct")] = (
                    100.0 * (grp[metric] - ref_val) / ref_val
                )
        out.append(grp)
    return pd.concat(out, ignore_index=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("output_root")
    parser.add_argument("--horizons", type=int, nargs="+", default=[3, 6, 12, 24])
    parser.add_argument("--reference", type=str, default=None)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    table = collect_trans_tables(args.output_root)
    summary = summarize(table, args.horizons)
    if args.reference:
        summary = add_improvement(summary, args.reference)
    if args.out:
        summary.to_csv(args.out, index=False)
        print("wrote {}".format(args.out), file=sys.stderr)
    pd.set_option("display.width", 200)
    print(summary.to_string(index=False))


if __name__ == "__main__":
    main()
