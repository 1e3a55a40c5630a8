"""Import reference PyTorch MultiATGCN checkpoints into this framework.

Users of the reference implementation hold trained checkpoints in two
formats (ref: libcity/executor/traffic_state_executor.py:95,118-122):

  * ``torch.save((model.state_dict(), optimizer.state_dict()), '*.m')``
    — the pipeline's model cache, and
  * ``torch.save({'model_state_dict': ..., 'optimizer_state_dict': ...,
    **config}, '*_epoch%d.tar')`` — the per-epoch training checkpoints.

This module converts either into this framework's flax parameter tree so a
reference-trained model evaluates/serves here without retraining
(``tools/import_torch_checkpoint.py`` is the CLI). The name/shape mapping
is the exact inverse of the transplant used by the golden parity tests
(tests/test_model.py), which prove the two parameterizations produce
allclose forwards.

Only the MODEL weights are imported. The reference's Adam moments are
keyed by parameter ORDER (``optimizer.state_dict()['state'][i]``), which
is not stable across implementations; evaluation and serving never need
them, and resumed fine-tuning re-warms Adam within a few steps. The
optimizer state is therefore re-initialized on load (documented here, not
silently).
"""

from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "export_state_dict",
    "import_state_dict",
    "load_torch_checkpoint",
]


def _conv_head_shapes(model) -> Tuple[int, int]:
    t_conv = 1 if model.fnn_off else model.input_window
    return t_conv, model.hidden_dim


def _torch_entries(our_name: str, value: np.ndarray, model):
    """Yield (torch_name, torch_value) for one of our parameters.

    Inverse direction is handled by `_from_torch` below; both follow the
    reference module's naming (ref: libcity/model/traffic_flow_prediction/
    MultiATGCN.py __init__ parameter registration).
    """
    if our_name in ("node_emb", "node_vec1", "node_vec2", "weight_tsg"):
        return our_name, value
    if our_name.startswith("weight_ts_"):
        return "weight_ts." + our_name.split("_")[-1], value
    if our_name == "weights_gru":
        return "encoder.weights_gru", value
    if our_name == "static_gru_kernel":
        return "static_initial_gru.embd.weight", value.T
    if our_name == "static_gru_bias":
        return "static_initial_gru.embd.bias", value
    if our_name == "end_conv_kernel":
        t_conv, h = _conv_head_shapes(model)
        w = value.reshape(t_conv, h, -1).transpose(2, 0, 1)[:, :, None, :]
        return "end_conv.weight", w
    if our_name == "end_conv_bias":
        return "end_conv.bias", value
    # encoder cells: l{L}_{cell}_{kind} / l{L}_res_{cell}_{kernel|bias}
    layer = our_name[1]
    rest = our_name[3:]
    if rest.startswith("res_"):
        cell, kind = rest[4:].split("_", 1)
        base = "encoder.res_cells.{}.{}".format(layer, cell)
        if kind == "kernel":
            return base + ".weight", value.T
        return base + ".bias", value
    cell, kind = rest.split("_", 1)
    torch_kind = {"weights_g": "weights_g", "pool": "weights_pool",
                  "bias_pool": "bias_pool"}[kind]
    return "encoder.agru_cells.{}.{}.{}".format(layer, cell, torch_kind), value


def _from_torch(torch_name: str, torch_value: np.ndarray, our_name: str, model):
    """Convert one reference tensor back to our parameter's layout."""
    if our_name == "static_gru_kernel":
        return torch_value.T
    if our_name == "end_conv_kernel":
        t_conv, h = _conv_head_shapes(model)
        # torch: (out_dim, t_conv, 1, h) -> ours: (t_conv * h, out_dim)
        return torch_value[:, :, 0, :].transpose(1, 2, 0).reshape(t_conv * h, -1)
    if our_name.startswith("l") and "_res_" in our_name and our_name.endswith("kernel"):
        return torch_value.T
    return torch_value


def export_state_dict(params: Dict[str, Any], model) -> Dict[str, np.ndarray]:
    """Our param tree -> a reference-named state dict (numpy values)."""
    tree = params.get("params", params)
    out = {}
    for our_name, leaf in tree.items():
        torch_name, val = _torch_entries(our_name, np.asarray(leaf), model)
        out[torch_name] = val
    return out


def import_state_dict(state_dict: Dict[str, Any], params_template: Dict[str, Any],
                      model) -> Dict[str, Any]:
    """Reference state dict -> our param tree (same treedef as the template).

    Every template leaf must find its tensor (strict, like
    ``load_state_dict(strict=True)``); unused reference tensors are an
    error too, so silent architecture mismatches cannot slip through.
    """
    tree = dict(params_template.get("params", params_template))
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    new_tree = {}
    for our_name, leaf in tree.items():
        torch_name, _ = _torch_entries(our_name, np.asarray(leaf), model)
        if torch_name not in sd:
            raise KeyError(
                "checkpoint has no tensor '{}' for parameter '{}' — "
                "model config does not match the checkpoint".format(torch_name, our_name))
        val = _from_torch(torch_name, sd[torch_name], our_name, model)
        want = tuple(np.shape(leaf))
        if tuple(val.shape) != want:
            raise ValueError(
                "shape mismatch for '{}' (<- '{}'): checkpoint {} vs model {}".format(
                    our_name, torch_name, tuple(val.shape), want))
        new_tree[our_name] = val.astype(np.asarray(leaf).dtype)
        used.add(torch_name)
    extra = sorted(set(sd) - used)
    if extra:
        raise KeyError(
            "checkpoint tensors not consumed by the model: {} — "
            "model config does not match the checkpoint".format(extra))
    if "params" in params_template:
        return {**params_template, "params": new_tree}
    return new_tree


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint file and return the MODEL state dict.

    Accepts all three on-disk layouts the reference produces: the `.m`
    cache tuple, the `_epoch%d.tar` dict, and a bare state_dict.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, tuple):
        blob = blob[0]
    elif isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
            for k, v in blob.items()}
