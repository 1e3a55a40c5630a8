"""force_default_layout must be a differentiable identity.

On CPU it is a pass-through (layout tiling is a TPU concern); with
interpret=True the pallas copy path itself is exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops.layout import force_default_layout


def test_identity_and_grad(rng):
    x = jnp.asarray(rng.normal(size=(5, 3, 7, 9)).astype(np.float32))
    for interpret in (False, True):
        y = force_default_layout(x, interpret)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        g = jax.grad(lambda a: jnp.sum(force_default_layout(a, interpret) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-6)


def test_bf16_and_small(rng):
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)).astype(jnp.bfloat16)
    y = force_default_layout(x, True)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(y, np.float32), np.asarray(x, np.float32))
    v = jnp.ones((3,))  # ndim < 2: returned as-is
    assert force_default_layout(v, True) is v
