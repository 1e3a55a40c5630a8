"""ops/precision.round_cotangent: identity forward, dtype-bounded backward.

The 1M-node HBM lever (docs/DESIGN.md §4): scan transpose allocates its
input-cotangent accumulator in the cotangent's dtype, so rounding at the
scan boundary halves the largest backward buffers under bf16 compute.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops.precision import round_cotangent


def test_forward_is_identity():
    x = jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(round_cotangent(x, "bfloat16")),
                                  np.asarray(x))
    assert round_cotangent(x, "bfloat16").dtype == jnp.float32


def test_cotangent_is_rounded():
    """vjp through the op rounds an f32 cotangent to bf16 values (1/3 is
    not bf16-representable). Placement rule this encodes: the op must sit
    where the PRIMAL upstream is already the compute dtype — strict lax
    transposes reject mixed dtypes (sparse_atgcn wraps bf16 stacks only)."""
    x = jnp.ones((4,), jnp.bfloat16)

    def f(a):
        # f32 head: the seed cotangent arrives f32, as in the model
        return round_cotangent(a, "bfloat16").astype(jnp.float32) * (1.0 / 3.0)

    _, vjp = jax.vjp(f, x)
    (g,) = vjp(jnp.ones((4,), jnp.float32))
    assert g.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(g, np.float32),
        np.full((4,), float(jnp.bfloat16(1.0 / 3.0)), np.float32))


def test_scan_accumulator_dtype_follows_rounding():
    """Through a scan over an f32-producing body, the xs-cotangent emerges
    bf16-rounded when the boundary rounds (values match a manual cast)."""
    xs = jnp.linspace(0.1, 1.0, 8, dtype=jnp.float32).reshape(8, 1)

    def loss(xs, rounded):
        def step(c, x):
            if rounded:
                x = round_cotangent(x, "bfloat16")
            # f32 dot: hands x an f32 cotangent absent the rounding
            return c + jnp.sum(x * jnp.float32(1.0 / 3.0)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), xs)
        return c

    g_plain = jax.grad(loss)(xs, False)
    g_round = jax.grad(loss)(xs, True)
    np.testing.assert_array_equal(
        np.asarray(g_round),
        np.asarray(g_plain.astype(jnp.bfloat16).astype(jnp.float32)))
