"""Parameter initializers reproducing the reference's effective init scheme.

IMPORTANT parity note: the reference builds SVD-based adaptive-graph embeddings
and PCA-based node embeddings in ``MultiATGCN.__init__`` (MultiATGCN.py:285-307)
— but then calls ``self._init_parameters()`` (MultiATGCN.py:348,356-361) which
re-initializes EVERY parameter: xavier_uniform for dim>1, uniform[0,1) for
vectors. The SVD/PCA values are therefore overwritten and the shipped model's
effective initialization is plain xavier/uniform. This module implements:

  * ``torch_style_init`` — the effective scheme (default), replicating torch's
    fan computation for >=2-d tensors and U[0,1) for 1-d;
  * ``svd_lowrank_embeddings`` / ``pca_project`` — the overwritten SVD/PCA
    recipes, available behind the ``svd_init`` config flag for experimentation.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _torch_fans(shape: Tuple[int, ...]) -> Tuple[int, int]:
    """torch.nn.init._calculate_fan_in_and_fan_out semantics.

    For an n-d tensor: fan_in = shape[1] * prod(shape[2:]),
    fan_out = shape[0] * prod(shape[2:]).
    """
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def torch_style_init(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """xavier_uniform (torch fan rules, gain 1) for dim>1; U[0,1) for dim<=1."""
    if len(shape) > 1:
        fan_in, fan_out = _torch_fans(shape)
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return jax.random.uniform(key, shape, dtype, minval=0.0, maxval=1.0)


def dense_kernel_init(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Init for flax Dense kernels (in, out): matches torch Linear (out, in) xavier."""
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def uniform01_init(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, shape, dtype, minval=0.0, maxval=1.0)


def svd_lowrank_embeddings(adj: np.ndarray, rank: int) -> Tuple[np.ndarray, np.ndarray]:
    """E1 = U sqrt(S), E2 = sqrt(S) V^T of the base adjacency (MultiATGCN.py:298-304)."""
    u, s, vt = np.linalg.svd(np.asarray(adj, dtype=np.float64), full_matrices=False)
    root = np.sqrt(s[:rank])
    e1 = u[:, :rank] * root[None, :]
    e2 = root[:, None] * vt[:rank, :]
    return e1.astype(np.float32), e2.astype(np.float32)


def pca_project(static: np.ndarray, q: int) -> np.ndarray:
    """Project static features onto their top-q principal directions.

    Equivalent to ``static @ v`` with v from torch.pca_lowrank(static, q)
    (center=True semantics; MultiATGCN.py:291-292,407-408). Sign conventions
    of the principal directions are implementation-defined; downstream use
    feeds a trainable Dense layer, so signs don't affect expressiveness.
    """
    static = np.asarray(static, dtype=np.float64)
    centered = static - static.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    v = vt[:q].T  # (F, q)
    return (static @ v).astype(np.float32)
