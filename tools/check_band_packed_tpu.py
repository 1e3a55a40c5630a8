"""On-chip numerics check of the packed-band slab path (ops/band.py).

The slab kernel + its feature-padding branch (feat % 128 != 0) are
TPU-only (Mosaic DMA alignment), so the CPU suite can only cover them in
interpreter mode; this script asserts the REAL kernel against the einsum
form on the attached chip at both an aligned and an unaligned feature
width, forward and both gradient legs. Run: python
tools/check_band_packed_tpu.py (exits nonzero on mismatch).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops.band import (
    pack_band_rows, split_band, spmm_band, spmm_band_packed)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    n, block = 4000, 128
    src = rng.integers(0, n, 40000)
    dst = np.clip(src + rng.integers(-300, 301, 40000), 0, n - 1)
    w = rng.uniform(0.1, 1.0, 40000).astype(np.float32)
    bg = split_band(src, dst, w, n, block)
    offs = tuple(int(o) for o in bg.offsets)
    radius = max(abs(o) for o in offs)
    v = jnp.asarray(bg.band_values)
    v_pack = jnp.asarray(pack_band_rows(bg.band_values, offs, radius))
    for feat in (64, 128, 256):
        x = jnp.asarray(rng.normal(size=(bg.padded_nodes, feat)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(bg.padded_nodes, feat)).astype(np.float32))
        want = spmm_band(v, bg.offsets, x, block=block)
        got = spmm_band_packed(v_pack, radius, x, block=block)
        err = float(jnp.abs(got - want).max())
        print("feat={} fwd max|d|={:.2e}".format(feat, err))
        assert err < 2e-3, err

        def loss_e(xx):
            return jnp.sum(spmm_band(v, bg.offsets, xx, block=block) * t)

        def loss_p(xx):
            return jnp.sum(spmm_band_packed(v_pack, radius, xx, block=block) * t)

        gx_e = jax.grad(loss_e)(x)
        gx_p = jax.grad(loss_p)(x)
        gerr = float(jnp.abs(gx_p - gx_e).max())
        print("feat={} dX  max|d|={:.2e}".format(feat, gerr))
        assert gerr < 2e-3, gerr
    print("ok")


if __name__ == "__main__":
    main()
