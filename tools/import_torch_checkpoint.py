"""Convert a reference-PyTorch MultiATGCN checkpoint into this framework.

Usage:
    python tools/import_torch_checkpoint.py \
        --checkpoint /path/to/MultiATGCN_DC_epoch42.tar \
        --dataset DC --exp_id 7 [--config_file my.json] [--out custom.m]

Writes the framework's model-cache checkpoint at
``{output_dir}/{exp_id}/model_cache/{model}_{dataset}.m`` (or ``--out``), so

    python run_model.py --dataset DC --exp_id 7 --train false

evaluates the imported model without retraining, and
``serving.PredictService.from_experiment`` serves it. See
multistgraph_tpu/utils/torch_import.py for format details (ref:
libcity/executor/traffic_state_executor.py:95,118-122).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="reference .m / .tar / state_dict file")
    ap.add_argument("--task", default="traffic_state_pred")
    ap.add_argument("--model", default="MultiATGCN")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--config_file", default=None)
    ap.add_argument("--exp_id", type=int, default=None)
    ap.add_argument("--out", default=None, help="override the output checkpoint path")
    args, extra = ap.parse_known_args()

    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor.executor import get_executor
    from multistgraph_tpu.models import get_model
    from multistgraph_tpu.utils import ensure_dir
    from multistgraph_tpu.utils.arguments import GENERAL_ARGUMENTS
    from multistgraph_tpu.utils.torch_import import import_state_dict, load_torch_checkpoint

    other = {}
    if args.exp_id is not None:
        other["exp_id"] = args.exp_id
    key = None
    for item in extra:  # pass-through --key value pairs, registry-typed
        if item.startswith("--"):
            key = item[2:]
        elif key is not None:
            other[key] = GENERAL_ARGUMENTS.get(key, str)(item)
    config = load_config(args.task, args.model, args.dataset, args.config_file,
                         saved_model=True, train=False, other_args=other)
    if not config.get("gpu", True):
        # same semantics as the pipeline: gpu=false pins the CPU backend
        import jax

        jax.config.update("jax_platforms", "cpu")

    dataset = get_dataset(config)
    dataset.get_data()
    model = get_model(config, dataset.get_data_feature())
    executor = get_executor(config, model, dataset.get_data_feature())

    sd = load_torch_checkpoint(args.checkpoint)
    executor.params = import_state_dict(sd, executor.params, model)

    out = args.out or os.path.join(
        config.get("output_dir", "./outputs"), str(config["exp_id"]), "model_cache",
        "{}_{}.m".format(args.model, args.dataset))
    ensure_dir(os.path.dirname(out))
    executor.save_model(out)
    print("imported {} -> {}".format(args.checkpoint, out))


if __name__ == "__main__":
    main()
