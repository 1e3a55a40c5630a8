"""Test harness: force CPU with 8 virtual devices so sharding tests run anywhere.

Must set the env vars before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin and pin
# JAX_PLATFORMS before this file runs; override both so tests always use the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A small synthetic atomic dataset shared across tests."""
    from multistgraph_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("raw_data")
    make_synthetic_dataset(str(root), "SYN_SMALL", num_nodes=8, len_time=24 * 40, seed=7)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
