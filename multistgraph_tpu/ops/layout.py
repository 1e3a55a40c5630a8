"""Layout laundering: force an array into the default TPU layout.

XLA's layout assignment sometimes leaves a scan's per-step input stacks in
the producing dot's preferred layout, where the leading (step) dimension
lands inside the (8,128) tile — every `lax.scan` slice then reads one
sublane per tile, ~1/8 HBM bandwidth (measured ~550us/step for a
(24,16,237,128) stack at DC-237, tools/profile_step.py; an identical-shape
stack in the default layout reads at ~80us/step). There is no public API to
pin an intermediate's layout, but Pallas calls only accept default-layout
operands — so an identity pallas_call forces exactly one full-bandwidth
relayout copy at a spot WE choose, instead of a 1/8-bandwidth read at every
scan step.

The op is the identity, differentiable (cotangent is laundered too — the
backward scan writes its dpre stacks with the same disease), and a no-op in
spirit: numerics are bit-identical.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _launder(x, interpret=False):
    if not interpret and jax.default_backend() != "tpu":
        return x  # layout tiling is a TPU concern; elsewhere this is a no-op
    if x.ndim < 2 or x.size == 0:
        return x
    # Grid over the leading dim: one (1, rest...) block per step keeps the
    # block well under VMEM while the DMA engine streams full tiles.
    lead = x.shape[0]
    block = (1,) + x.shape[1:]
    idx = lambda i: (i,) + (0,) * (x.ndim - 1)  # noqa: E731
    return pl.pallas_call(
        _copy_kernel,
        grid=(lead,),
        in_specs=[pl.BlockSpec(block, idx)],
        out_specs=pl.BlockSpec(block, idx),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def force_default_layout(x, interpret=False):
    """Identity returning ``x`` in the default (row-major tiled) layout."""
    return _launder(x, interpret)


def _fwd(x, interpret):
    return _launder(x, interpret), None


def _bwd(interpret, _, g):
    return (_launder(g, interpret),)


force_default_layout.defvjp(_fwd, _bwd)


def force_default_layouts(*xs):
    """Launder several arrays; returns them in order."""
    return tuple(force_default_layout(x) for x in xs)
