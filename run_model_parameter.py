"""Grid ablation sweep: parameter list x seeds x datasets (ref: run_model_parameter.py:17-59).

Re-invokes the pipeline once per combination, like the reference's nested-loop
ablation driver. Example:

    python run_model_parameter.py --dataset SYN --parameter adjtype \
        --values multi od cosine --seeds 0 10 100 1000
"""

import argparse
import json

from multistgraph_tpu.pipeline import run_model
from multistgraph_tpu.utils.arguments import add_general_args, collect_other_args, str2bool


def parse_value(raw: str):
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return raw


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="traffic_state_pred")
    parser.add_argument("--model", type=str, default="MultiATGCN")
    parser.add_argument("--dataset", type=str, nargs="+", required=True)
    parser.add_argument("--config_file", type=str, default=None)
    parser.add_argument("--saved_model", type=str2bool, default=True)
    parser.add_argument("--parameter", type=str, required=True,
                        help="config key to sweep (e.g. adjtype, rnn_units)")
    parser.add_argument("--values", type=str, nargs="+", required=True,
                        help="values to sweep (JSON-parsed: 64, 0.001, true, multi)")
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 10, 100, 1000])
    add_general_args(parser)
    args = parser.parse_args()

    base_args = collect_other_args(args, exclude=("parameter", "values", "seeds"))
    rows = []
    for dataset in args.dataset:
        for value in args.values:
            for seed in args.seeds:
                other_args = dict(base_args)
                other_args[args.parameter] = parse_value(value)
                other_args["seed"] = seed
                other_args["exp_id"] = "{}_{}_{}_{}".format(
                    args.model, args.parameter, value, seed
                )
                print(
                    "=== sweep {}={} seed={} dataset={} ===".format(
                        args.parameter, value, seed, dataset
                    )
                )
                result = run_model(
                    task=args.task,
                    model_name=args.model,
                    dataset_name=dataset,
                    config_file=args.config_file,
                    saved_model=args.saved_model,
                    train=True,
                    other_args=other_args,
                )
                if result is not None and "masked_MAE" in result:
                    rows.append({
                        "dataset": dataset, "value": parse_value(value), "seed": seed,
                        "MAE": float(result["masked_MAE"].mean()),
                    })
    if rows:
        # parameter-curve CSV consumed by `tools/plot_results.py params`
        import csv

        out_dir = base_args.get("output_dir", "./outputs")
        out = "{}/sweep_{}_{}.csv".format(out_dir, args.model, args.parameter)
        with open(out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["dataset", "value", "seed", "MAE"])
            writer.writeheader()
            writer.writerows(rows)
        print("sweep summary written to", out)
