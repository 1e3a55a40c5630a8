"""Weight-only quantization for the serving path.

The DC-237-class models are HBM-bandwidth-bound (docs/DESIGN.md §9), and at
serving batch sizes the parameter stream is the dominant read, so weight-only
quantization is nearly-free latency/footprint headroom:

  * ``int8``: per-tensor symmetric absmax scaling. Weights are STORED as
    int8 (+ one f32 scale each) and dequantized on-chip inside the jitted
    predict program — the HBM read is 1/4 of f32, the convert+multiply
    fuses into the consumer. Small leaves (biases, vectors below
    `min_size`) stay f32: they are noise in the footprint and quantizing
    them costs accuracy for nothing.
  * ``bfloat16``: straight cast (half the stream, ~zero accuracy cost).

Activations are NOT quantized: the model's gates/tanh run f32 regardless
(see models/multi_atgcn.py compute_dtype), and weight-only preserves the
served predictions to well under a percent relative error
(tests/test_serving_quantized.py asserts the bound). Wired into
serving.PredictService(quantize='int8'|'bfloat16') and the serve_model.py
--quantize flag. No reference counterpart (torch CPU serving path does not
exist; SURVEY §2).
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["quantize_params", "dequantize_params", "quantized_nbytes"]

_QKEY = "__q8__"  # marker key for a quantized leaf


def _is_quantized_leaf(x) -> bool:
    return isinstance(x, dict) and _QKEY in x


def quantize_params(params, mode: str = "int8", min_size: int = 256):
    """Quantize the float leaves of a parameter pytree.

    mode='int8': float leaves with >= min_size elements become
    ``{'__q8__': int8 array, 'scale': f32 scalar}`` (per-tensor symmetric);
    smaller leaves pass through. mode='bfloat16': every float leaf is cast.
    Returns a pytree consumable by dequantize_params.
    """
    if mode in ("bf16", "bfloat16"):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params)
    if mode != "int8":
        raise ValueError("unknown quantization mode %r" % (mode,))

    def q(a):
        a = jnp.asarray(a)
        if not jnp.issubdtype(a.dtype, jnp.floating) or a.size < min_size:
            return a
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12) / 127.0
        return {
            _QKEY: jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8),
            "scale": scale.astype(jnp.float32),
        }

    return jax.tree_util.tree_map(q, params)


def dequantize_params(qparams, dtype=jnp.float32):
    """Inverse of quantize_params; traceable (runs inside the predict jit,
    so the HBM read stays int8 and the dequant fuses into the consumers)."""
    def dq(x):
        if _is_quantized_leaf(x):
            return (x[_QKEY].astype(dtype) * x["scale"]).astype(dtype)
        a = jnp.asarray(x)
        if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != dtype:
            return a.astype(dtype)
        return a

    return jax.tree_util.tree_map(dq, qparams, is_leaf=_is_quantized_leaf)


def quantized_nbytes(tree) -> int:
    """Total stored bytes of a (possibly quantized) parameter tree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += np.asarray(leaf).nbytes
    return total
