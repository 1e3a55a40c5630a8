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

# `pytest -m smoke` — a <2 min cross-section (config/data/graph/losses/
# metrics-IO + the flagship forward compile) for quick sanity between edits;
# the full 39-file suite remains the merge gate.
_SMOKE_FILES = {
    "test_config.py",
    "test_data.py",
    "test_graph.py",
    "test_losses.py",
    "test_ranking_and_grid.py",
    "test_tbwriter.py",
}
_SMOKE_TESTS = {"test_entry_compiles_and_runs"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _SMOKE_FILES or item.name in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


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
