"""Native (C++) graph-builder runtime: bit-parity with the numpy fallbacks.

The contract of multistgraph_tpu/native is exact behavioral equality with
the pure-Python implementations (ops/bsr.py, models/stgode.py) — same float
accumulation order, tie-breaking, and sort stability — so switching backends
can never change a model. Reference counterpart: none (the reference builds
dense supports in Python at N<=403); this is the host half of the TPU-native
sparse scale path (BASELINE configs 4-5).
"""

import subprocess
import sys

import numpy as np
import pytest

from multistgraph_tpu import native
from multistgraph_tpu.models.stgode import dtw_profile_distances
from multistgraph_tpu.ops.bsr import bsr_from_coo, community_order

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native library unavailable: {}".format(native.load_error()),
)


def random_edges(n, e, seed=0, dup_frac=0.1):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    k = int(e * dup_frac)
    if k:  # exact duplicate edges exercise accumulation-order parity
        src[:k], dst[:k] = src[k : 2 * k], dst[k : 2 * k]
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    return src, dst, w


@pytest.mark.parametrize("n,e", [(300, 4000), (1000, 20000)])
def test_bsr_bit_parity(n, e):
    src, dst, w = random_edges(n, e)
    ref = bsr_from_coo(src, dst, w, n, native=False)
    got = bsr_from_coo(src, dst, w, n, native=True)
    assert np.array_equal(ref.row_of, got.row_of)
    assert np.array_equal(ref.col_of, got.col_of)
    assert np.array_equal(ref.values, got.values)  # bitwise, incl. dup sums
    assert got.num_nodes == n and got.block == ref.block


def test_bsr_parity_with_reorder():
    src, dst, w = random_edges(700, 9000, seed=3)
    ref = bsr_from_coo(src, dst, w, 700, reorder="community", native=False)
    got = bsr_from_coo(src, dst, w, 700, reorder="community", native=True)
    assert np.array_equal(ref.perm, got.perm)
    assert np.array_equal(ref.values, got.values)


def test_bsr_plan_refill_reuse():
    """Multi-view graphs share one edge structure: refills must equal
    independent builds for each weight vector."""
    src, dst, w1 = random_edges(500, 6000, seed=5)
    w2 = (w1 * 3.7 + 0.1).astype(np.float32)
    plan = native.BsrPlan(src, dst, 500, 128)
    ref1 = bsr_from_coo(src, dst, w1, 500, native=False)
    ref2 = bsr_from_coo(src, dst, w2, 500, native=False)
    assert np.array_equal(plan.fill(w1), ref1.values)
    assert np.array_equal(plan.fill(w2), ref2.values)
    assert np.array_equal(plan.row_of, ref1.row_of.astype(np.int32))
    plan.close()


def test_community_order_parity():
    src, dst, _ = random_edges(2000, 16000, seed=7, dup_frac=0.0)
    ref = community_order(src, dst, 2000, rounds=6, native=False)
    got = community_order(src, dst, 2000, rounds=6, native=True)
    assert np.array_equal(ref, got)


def test_community_order_parity_ties_and_isolated():
    # Tiny graph engineered for label-count ties + isolated nodes (5, 6).
    src = np.array([0, 1, 2, 3, 0, 4], dtype=np.int64)
    dst = np.array([1, 2, 3, 0, 2, 4], dtype=np.int64)
    ref = community_order(src, dst, 7, rounds=10, native=False)
    got = community_order(src, dst, 7, rounds=10, native=True)
    assert np.array_equal(ref, got)


def test_dtw_parity():
    rng = np.random.default_rng(11)
    profiles = rng.standard_normal((37, 24)).astype(np.float32)
    for band in (2, 4, 23):
        ref = dtw_profile_distances(profiles, band=band, native=False)
        got = dtw_profile_distances(profiles, band=band, native=True)
        assert np.array_equal(ref, got), "band={}".format(band)


def test_large_block_falls_back_to_numpy():
    src, dst, w = random_edges(600, 2000, seed=9)
    g = bsr_from_coo(src, dst, w, 600, block=512)  # native only covers <=256
    ref = bsr_from_coo(src, dst, w, 600, block=512, native=False)
    assert np.array_equal(g.values, ref.values)


def test_env_gate_disables_native():
    code = (
        "import os; os.environ['MSG_NATIVE'] = '0';"
        "from multistgraph_tpu import native;"
        "assert not native.available(); print('gated')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert out.returncode == 0 and "gated" in out.stdout, out.stderr
