"""node_factored_apply kernels vs the einsum they replace.

The Pallas pair in ops/node_apply.py computes the node-conditioned weight
application out[b,n,o] = sum_{d,k,i} e[n,d] hh[b,k,n,i] pool[d,k,i,o] (the
reference's per-node W[n] = node_emb[n] . weights_pool apply,
MultiATGCN.py:104-108) without materializing the expanded (N,K,I,O) weights.
These tests check both kernels against the dense einsum in interpret mode
(runs on CPU), including non-128-multiple node counts (padding path) and the
gate folding of pool_to_kernel_layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.ops.node_apply import (
    node_factored_apply,
    node_factored_apply_t,
    pool_to_kernel_layout,
)

B, K, N, I, D, O = 2, 3, 140, 8, 4, 16  # N not a multiple of 128 -> padding


@pytest.fixture()
def tensors(rng):
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.3
    return dict(
        hh=f(B, K, N, I), e=f(N, D), pool=f(D, K, I, O), dpre=f(B, N, O),
        gate=jax.nn.softmax(f(K)),
    )


def test_forward_matches_einsum(tensors):
    mat, _ = pool_to_kernel_layout(tensors["pool"])
    got = node_factored_apply(tensors["hh"], tensors["e"], mat, interpret=True)
    w = jnp.einsum("nd,dkio->nkio", tensors["e"], tensors["pool"])
    want = jnp.einsum("bkni,nkio->bno", tensors["hh"], w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_transposed_matches_einsum(tensors):
    _, mat_t = pool_to_kernel_layout(tensors["pool"])
    got = node_factored_apply_t(tensors["dpre"], tensors["e"], mat_t, interpret=True)
    w = jnp.einsum("nd,dkio->nkio", tensors["e"], tensors["pool"])
    want = jnp.einsum("bno,nkio->bkni", tensors["dpre"], w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_gate_folding(tensors):
    mat, mat_t = pool_to_kernel_layout(tensors["pool"], gate=tensors["gate"])
    got = node_factored_apply(tensors["hh"], tensors["e"], mat, interpret=True)
    w = jnp.einsum("nd,dkio->nkio", tensors["e"], tensors["pool"])
    w = w * tensors["gate"][None, :, None, None]
    want = jnp.einsum("bkni,nkio->bno", tensors["hh"], w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    gotT = node_factored_apply_t(tensors["dpre"], tensors["e"], mat_t, interpret=True)
    wantT = jnp.einsum("bno,nkio->bkni", tensors["dpre"], w)
    np.testing.assert_allclose(np.asarray(gotT), np.asarray(wantT), atol=1e-4)


def test_bf16_inputs(tensors):
    mat, _ = pool_to_kernel_layout(tensors["pool"].astype(jnp.bfloat16))
    got = node_factored_apply(
        tensors["hh"].astype(jnp.bfloat16), tensors["e"], mat, interpret=True
    )
    assert got.dtype == jnp.float32  # f32 accumulation
    w = jnp.einsum("nd,dkio->nkio", tensors["e"], tensors["pool"])
    want = jnp.einsum("bkni,nkio->bno", tensors["hh"], w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05)


def test_node_apply_q8_matches_dequant_einsum():
    """int8 streaming kernel == exact math on the dequantized weights (the
    per-(n,o) scale commutes with the (k,i) contraction)."""
    rng = np.random.default_rng(0)
    n, b, ki, o = 37, 4, 24, 16
    hh = rng.normal(size=(n, b, ki)).astype(np.float32)
    w = rng.normal(size=(n, ki, o)).astype(np.float32)
    from multistgraph_tpu.ops.node_apply import (
        node_apply_q8, node_apply_q8_t, quantize_node_weights,
    )

    wq, s = quantize_node_weights(jnp.asarray(w))
    wdq = np.asarray(wq, np.float32) * np.asarray(s)
    got = node_apply_q8(jnp.asarray(hh), wq, s, interpret=True)
    want = np.einsum("nbk,nko->nbo", hh, wdq)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2, rtol=2e-2)
    # quantization error itself is bounded (per-channel absmax, 1/127)
    exact = np.einsum("nbk,nko->nbo", hh, w)
    rel = np.abs(np.asarray(got) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, rel

    dpre = rng.normal(size=(n, b, o)).astype(np.float32)
    gotT = node_apply_q8_t(jnp.asarray(dpre), wq, s, interpret=True)
    wantT = np.einsum("nbo,nko->nbk", dpre, wdq)
    np.testing.assert_allclose(np.asarray(gotT), wantT, atol=2e-2, rtol=2e-2)
