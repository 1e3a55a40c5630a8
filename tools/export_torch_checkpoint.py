"""Export a trained model from this framework to the reference's torch format.

The inverse of tools/import_torch_checkpoint.py: reads this framework's
model-cache checkpoint (``{output_dir}/{exp_id}/model_cache/{model}_{dataset}.m``
or ``--checkpoint``) and writes a ``torch.save``-compatible
``{'model_state_dict': ...}`` .tar the reference implementation's
``load_model_with_epoch`` consumes (ref:
libcity/executor/traffic_state_executor.py:126-137). Lets a user A/B this
framework's training against the reference's evaluation stack, or hand a
model back to a torch-only consumer.

Usage:
    python tools/export_torch_checkpoint.py --dataset DC --exp_id 7 \
        [--out MultiATGCN_DC_epoch0.tar]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", default="traffic_state_pred")
    ap.add_argument("--model", default="MultiATGCN")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--config_file", default=None)
    ap.add_argument("--exp_id", required=True)
    ap.add_argument("--checkpoint", default=None, help="override the input .m path")
    ap.add_argument("--out", default=None, help="output .tar path")
    ap.add_argument("--gpu", default="true")
    args = ap.parse_args()

    import numpy as np
    import torch

    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor.executor import get_executor
    from multistgraph_tpu.models import get_model
    from multistgraph_tpu.utils.arguments import str2bool
    from multistgraph_tpu.utils.torch_import import export_state_dict

    config = load_config(args.task, args.model, args.dataset, args.config_file,
                         saved_model=True, train=False,
                         other_args={"exp_id": args.exp_id, "gpu": str2bool(args.gpu)})
    if not config.get("gpu", True):
        import jax

        jax.config.update("jax_platforms", "cpu")

    dataset = get_dataset(config)
    dataset.get_data()
    model = get_model(config, dataset.get_data_feature())
    executor = get_executor(config, model, dataset.get_data_feature())

    ckpt = args.checkpoint or os.path.join(
        config.get("output_dir", "./outputs"), str(config["exp_id"]), "model_cache",
        "{}_{}.m".format(args.model, args.dataset))
    executor.load_model(ckpt)

    sd = {k: torch.tensor(np.asarray(v))
          for k, v in export_state_dict(executor.params, model).items()}
    out = args.out or "{}_{}_epoch0.tar".format(args.model, args.dataset)
    torch.save({"model_state_dict": sd, "optimizer_state_dict": {}, "epoch": 0}, out)
    print("exported {} -> {}".format(ckpt, out))


if __name__ == "__main__":
    main()
