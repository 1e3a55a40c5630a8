"""CLI entry: serve a trained model over HTTP (multistgraph_tpu/serving.py).

Loads the cached weights that `run_model.py` wrote for the same
task/model/dataset/exp_id and exposes:

    POST /predict  {"x": [[...]]}   -> {"prediction": ..., "shape": [...]}
    GET  /health                    -> service stats

Example:
    python run_model.py   --dataset SYN_DC --exp_id 1 --max_epoch 30
    python serve_model.py --dataset SYN_DC --exp_id 1 --port 8800
"""

import argparse

from multistgraph_tpu.serving import PredictService, serve
from multistgraph_tpu.utils.arguments import add_general_args, collect_other_args

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="traffic_state_pred")
    parser.add_argument("--model", type=str, default="MultiATGCN")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_file", type=str, default=None)
    parser.add_argument("--exp_id", type=str, required=True,
                        help="experiment whose cached model to serve")
    parser.add_argument("--port", type=int, default=8800)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--max_serve_batch", type=int, default=64)
    parser.add_argument("--quantize", choices=("int8", "bfloat16"),
                        default=None,
                        help="weight-only quantization: store parameters "
                        "int8 (4x smaller HBM stream) or bfloat16 (2x); "
                        "dequantized inside the predict program")
    add_general_args(parser)
    args = parser.parse_args()

    other_args = collect_other_args(
        args, exclude=("port", "host", "max_serve_batch", "quantize"))

    service = PredictService.from_experiment(
        args.task, args.model, args.dataset, args.config_file,
        other_args=other_args, max_batch=args.max_serve_batch,
        quantize=args.quantize,
    )
    serve(service, port=args.port, host=args.host)
