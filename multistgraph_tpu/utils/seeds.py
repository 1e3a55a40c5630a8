"""Determinism controls (ref: libcity/utils/utils.py:243-254).

The reference seeds python/numpy/torch and forces deterministic cuDNN. In JAX
randomness is explicit: model init and any stochastic op take a
`jax.random.PRNGKey`. We still seed python/numpy for host-side shuffling and
synthetic-data generation, and return the root PRNG key for device-side use.
"""

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
