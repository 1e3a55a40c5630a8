"""Cotangent rounding: bound the dtype of reverse-mode accumulators.

Reference counterpart: none — this is a TPU HBM lever for the 1M-node
training point (BASELINE config 5, docs/DESIGN.md §4).

Under mixed precision the forward activations are bf16, but JAX's
transpose rules emit cotangents in whatever dtype the backward math
produces — an f32 ``preferred_element_type`` dot hands every upstream op
an f32 cotangent, and `lax.scan`'s transpose then allocates its
per-step input-cotangent accumulator in THAT dtype. At 1M nodes the
hoisted (T, K, N, B, C) input stack's f32 accumulator alone is 4.1 GB
(measured: the largest allocation in the band-form OOM report,
docs/bench/train1m_band_t8_noadp_r4.log); the (T, N, B, H) layer-output
cotangent pad is another 2 GB.

``round_cotangent(x, dtype)`` is the identity on the primal and casts
the cotangent on the way back — placed at a scan boundary it forces the
accumulator to the compute dtype, halving those buffers. This is the
same precision decision the SpMM custom-VJP backward already makes
(rounding dy to bf16 before the backward kernels): under bf16 compute
the gradient signal has already passed through bf16 forward products,
so one more bf16 rounding costs <1 ulp of the quantities actually used.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["round_cotangent"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def round_cotangent(x, dtype):
    """Identity on ``x``; the cotangent flowing back through this point is
    cast to ``dtype`` (a hashable dtype spec, e.g. ``'bfloat16'``)."""
    return x


def _fwd(x, dtype):
    return x, None


def _bwd(dtype, _res, g):
    return (g.astype(jnp.dtype(dtype)),)


round_cotangent.defvjp(_fwd, _bwd)
