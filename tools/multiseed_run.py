"""Train all protocol seeds in ONE vmapped program, then evaluate each.

The reference protocol (and run_model_parameter.py) launches one run per
seed; at DC-237-class sizes the chip is mostly idle at batch 16, so
parallel/multiseed.py trains S seeds simultaneously for roughly the cost
of one — and pays the epoch-program compile ONCE instead of S times.

Usage:
    python tools/multiseed_run.py --dataset SYN_DC237 \
        --seeds 0 10 100 1000 [--model MultiATGCN] [--config_file cfg] \
        [--exp_id base] [--skip_eval true]

Per-seed best checkpoints land at the standard cache path for exp_id
"{base}_{seed}", then each seed is evaluated through the normal pipeline
(`run_model --train false`), producing the usual per-seed artifacts that
tools/aggregate_results.py consumes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multistgraph_tpu.utils.arguments import add_general_args, collect_other_args, str2bool  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", default="traffic_state_pred")
    ap.add_argument("--model", default="MultiATGCN")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--config_file", default=None)
    ap.add_argument("--exp_id", default=None)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 10, 100, 1000])
    ap.add_argument("--skip_eval", type=str2bool, default=False)
    add_general_args(ap)
    args = ap.parse_args()

    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor import get_executor
    from multistgraph_tpu.models import get_model
    from multistgraph_tpu.parallel.multiseed import train_multiseed
    from multistgraph_tpu.pipeline import run_model

    other = collect_other_args(args, exclude=("seeds", "skip_eval", "exp_id"))
    if args.exp_id is not None:
        other["exp_id"] = args.exp_id
    other.setdefault("exp_id", "{}_{}_multiseed".format(args.model, args.dataset))
    other["seed"] = args.seeds[0]
    config = load_config(args.task, args.model, args.dataset, args.config_file,
                         saved_model=True, train=True, other_args=other)
    if not config.get("gpu", True):
        import jax

        jax.config.update("jax_platforms", "cpu")

    dataset = get_dataset(config)
    train_data, valid_data, _ = dataset.get_data()
    feature = dataset.get_data_feature()
    executor = get_executor(config, get_model(config, feature), feature)

    results = train_multiseed(executor, train_data, valid_data, args.seeds, save=True)
    print("seed  best_epoch  min_val_loss  stopped  checkpoint")
    for r in results:
        print("{:>4}  {:>10}  {:>12.4f}  {!s:>7}  {}".format(
            r.seed, r.best_epoch, r.min_val_loss, r.stopped_epoch, r.checkpoint))

    if args.skip_eval:
        return
    for r in results:
        eval_args = dict(other)
        eval_args["exp_id"] = "{}_{}".format(config["exp_id"], r.seed)
        eval_args["seed"] = r.seed
        print("=== evaluating seed {} (exp_id {}) ===".format(r.seed, eval_args["exp_id"]))
        run_model(task=args.task, model_name=args.model, dataset_name=args.dataset,
                  config_file=args.config_file, saved_model=True, train=False,
                  other_args=eval_args)


if __name__ == "__main__":
    main()
