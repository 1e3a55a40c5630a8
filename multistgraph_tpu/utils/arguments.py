"""Declarative CLI flag registry (ref: libcity/utils/argument_list.py:6-145)."""

import argparse


def str2bool(s):
    if isinstance(s, bool):
        return s
    if str(s).lower() in ("yes", "true", "t", "1"):
        return True
    if str(s).lower() in ("no", "false", "f", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def str2float(s):
    if isinstance(s, float):
        return s
    try:
        return float(s)
    except ValueError:
        raise argparse.ArgumentTypeError("Float value expected.")


GENERAL_ARGUMENTS = {
    "gpu": str2bool,
    "gpu_id": int,
    "train_rate": str2float,
    "eval_rate": str2float,
    "batch_size": int,
    "learning_rate": str2float,
    "max_epoch": int,
    "dataset_class": str,
    "executor": str,
    "evaluator": str,
    "output_window": int,
    "input_window": int,
    "adjtype": str,
    "adpadj": str,
    "rnn_units": int,
    "num_layers": int,
    "cheb_order": int,
    "use_3tu": str2bool,
    "gcn_off": str2bool,
    "fnn_off": str2bool,
    "node_specific_off": str2bool,
    "add_static": str2bool,
    "load_dynamic": str2bool,
    "data_dir": str,
    "output_dir": str,
    # TPU-native additions (no reference counterpart): parallelism switches
    "data_parallel": str2bool,   # shard the batch axis over all devices
    "node_parallel": str2bool,   # edge-partitioned sparse multi-chip training
    "distributed": str2bool,     # multi-host pod launch (jax.distributed)
    # large-graph (SparseATGCN) configs — BASELINE configs 4-5
    "num_nodes": int,            # synthetic graph size
    "avg_degree": int,
    "embed_dim_adj": int,
    "embed_dim_node": int,
    "len_time": int,
    "graph_split": str,          # none | hub | tail | band (docs/DESIGN.md §4)
    "graph_band_packed": str2bool,  # band form stored pre-packed (slab serving path)
    "compute_dtype": str,        # e.g. bfloat16 — mixed-precision training
    "remat": str2bool,           # rematerialize the time scan
    "adaptive_max_blocks": int,  # cap the adaptive pattern (HBM knob)
    "use_early_stop": str2bool,
    "pallas_interpret": str2bool,  # interpreter-mode kernels (CPU debugging)
}


def add_general_args(parser: argparse.ArgumentParser) -> None:
    for name, typ in GENERAL_ARGUMENTS.items():
        parser.add_argument("--{}".format(name), type=typ, default=None)


def collect_other_args(args: argparse.Namespace, exclude=()) -> dict:
    """Non-None general args as a dict, skipping pipeline-reserved names."""
    reserved = set(exclude) | {"task", "model", "dataset", "config_file", "saved_model", "train"}
    return {
        k: v for k, v in vars(args).items() if k not in reserved and v is not None
    }
