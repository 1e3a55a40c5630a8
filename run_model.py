"""CLI entry: train/evaluate a model on a dataset (ref: run_model.py:9-29).

Example:
    python run_model.py --task traffic_state_pred --model MultiATGCN \
        --dataset 201901010601_DC_SG_CTractFIPS_Hourly_Single_GP \
        --config_file config_user --seed 0
"""

import argparse

from multistgraph_tpu.pipeline import run_model
from multistgraph_tpu.utils.arguments import add_general_args, collect_other_args, str2bool

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="traffic_state_pred")
    # one or more model names — the reference's entry loops over a model
    # list in one invocation (ref: run_model.py:6-7,28)
    parser.add_argument("--model", type=str, nargs="+", default=["MultiATGCN"])
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_file", type=str, default=None)
    parser.add_argument("--saved_model", type=str2bool, default=True)
    parser.add_argument("--train", type=str2bool, default=True,
                        help="re-train even if a cached model exists")
    parser.add_argument("--exp_id", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--start_dim", type=int, default=0)
    parser.add_argument("--end_dim", type=int, default=1)
    add_general_args(parser)
    args = parser.parse_args()

    other_args = collect_other_args(args)
    for model_name in args.model:
        run_model(
            task=args.task,
            model_name=model_name,
            dataset_name=args.dataset,
            config_file=args.config_file,
            saved_model=args.saved_model,
            train=args.train,
            other_args=dict(other_args),
        )
