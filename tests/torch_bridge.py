"""Shared jax<->torch bridging for live-oracle parity tests.

The reference PyTorch MultiATGCN (/root/reference/libcity/model/
traffic_flow_prediction/MultiATGCN.py) is imported at run time as an oracle —
nothing is copied. This module owns the parameter-name/shape mapping between
our flax param tree and the torch ``state_dict`` in BOTH directions:

  * ``to_torch_state_dict``   — transplant our params into the torch model
    (used by the forward-parity tests since round 1);
  * ``torch_grads_to_jax``    — after ``loss.backward()`` on the torch side,
    pull ``p.grad`` for every parameter and map it back to our flat names
    (used by the gradient-parity tests, VERDICT r2 item 1a).

Both directions are driven by one mapping table so they cannot drift.
"""

import os
import sys

import jax
import numpy as np

REFERENCE_PATH = "/root/reference"


def torch_reference_available():
    if not os.path.exists(os.path.join(REFERENCE_PATH, "libcity")):
        return False
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def import_reference(module, name):
    """Import `name` from a libcity module path under /root/reference."""
    sys.path.insert(0, REFERENCE_PATH)
    try:
        mod = __import__(module, fromlist=[name])
    finally:
        sys.path.pop(0)
    return getattr(mod, name)


def flat_params(our_params):
    """Flatten {'params': tree} to {flat_name: np.ndarray}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(our_params["params"]):
        name = jax.tree_util.keystr(path).strip("'[]").replace("']['", "/")
        flat[name] = np.asarray(leaf)
    return flat


def _identity(v):
    return v


def _transpose(v):
    return np.ascontiguousarray(v.T)


def mapping_entry(name, model):
    """(torch_name, to_torch, from_torch) for one flat jax param name.

    to_torch maps our array to the torch state_dict shape; from_torch is its
    inverse (used for both weights and gradients — all transforms are
    orthonormal reindexings, so the same inverse applies to grads).
    """
    h = model.hidden_dim
    if name in ("node_emb", "node_vec1", "node_vec2", "weight_tsg"):
        return name, _identity, _identity
    if name.startswith("weight_ts_"):
        return "weight_ts." + name.split("_")[-1], _identity, _identity
    if name == "weights_gru":
        return "encoder.weights_gru", _identity, _identity
    if name == "static_gru_kernel":
        return "static_initial_gru.embd.weight", _transpose, _transpose
    if name == "static_gru_bias":
        return "static_initial_gru.embd.bias", _identity, _identity
    if name == "end_conv_kernel":
        t_conv = 1 if model.fnn_off else model.input_window

        def fwd(v):
            return v.reshape(t_conv, h, -1).transpose(2, 0, 1)[:, :, None, :]

        def inv(w):
            return np.ascontiguousarray(
                w[:, :, 0, :].transpose(1, 2, 0).reshape(t_conv * h, -1)
            )

        return "end_conv.weight", fwd, inv
    if name == "end_conv_bias":
        return "end_conv.bias", _identity, _identity
    # per-layer encoder params: "l{layer}/<rest>"
    layer = name[1]
    rest = name[3:]
    if rest.startswith("res_"):
        cell, kind = rest[4:].split("_", 1)
        base = "encoder.res_cells.{}.{}".format(layer, cell)
        if kind == "kernel":
            return base + ".weight", _transpose, _transpose
        return base + ".bias", _identity, _identity
    cell, kind = rest.split("_", 1)
    torch_kind = {"weights_g": "weights_g", "pool": "weights_pool", "bias_pool": "bias_pool"}[kind]
    return (
        "encoder.agru_cells.{}.{}.{}".format(layer, cell, torch_kind),
        _identity,
        _identity,
    )


def to_torch_state_dict(our_params, model, torch_model):
    """Build a torch state_dict holding our parameter values."""
    import torch

    sd = torch_model.state_dict()
    for name, value in flat_params(our_params).items():
        torch_name, fwd, _ = mapping_entry(name, model)
        assert torch_name in sd, torch_name
        mapped = fwd(value)
        assert tuple(sd[torch_name].shape) == mapped.shape, (
            torch_name,
            tuple(sd[torch_name].shape),
            mapped.shape,
        )
        sd[torch_name] = torch.tensor(mapped)
    return sd


def torch_grads_to_jax(torch_model, model, our_params):
    """After backward(), map every torch .grad back to our flat param names."""
    torch_grads = {n: p.grad for n, p in torch_model.named_parameters()}
    out = {}
    for name in flat_params(our_params):
        torch_name, _, inv = mapping_entry(name, model)
        g = torch_grads.get(torch_name)
        out[name] = None if g is None else inv(g.detach().cpu().numpy())
    return out


def jax_grads_flat(grads):
    """Flatten a jax grad tree ({'params': ...}) to {flat_name: np.ndarray}."""
    return flat_params(grads)
