"""Microbenchmark: ATGRU-step weight-application variants on the real chip.

The dense model's hot loop applies node-conditioned weights to graph-
aggregated hidden states every scan step (models/multi_atgcn.py:290-306,
mirroring the reference's 96 AGCN calls per step, MultiATGCN.py:94-108).
At DC-237 scale (B=16, H=64, K=5) the expanded per-node weights W[n] are
~116 MB per step-layer pair — the step is HBM-bound on weight streaming,
not MXU-bound. Variants measured:

  v0_f32_expanded   — current model: f32 W (N,K,I,O), einsum bkni,nkio->bno
  v1_bf16_expanded  — same contraction, W and activations cast to bf16
                      (halves the dominant HBM stream; f32 accumulate)
  v2_factored_pool  — never materialize W: contract the (D,K,I,O) pool with
                      activations first (big MXU matmul, D x FLOPs), then
                      the node embedding (N,D); tiny weight stream
  v3_factored_bf16  — v2 with bf16 operands

Each variant runs the full gate+update+state-mix recurrence under one
lax.scan inside one jit program with an in-program fori-style repeat, so
remote-dispatch latency (this relay: ~tens of ms per call) is amortized out.
Timing syncs via a value transfer (block_until_ready alone can return before
remote completion on this relay).

Run on the TPU: python tools/bench_dense_variants.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, H, K, T = 16, 237, 64, 5, 24
D = 20  # node-embedding (expert) dim
REPEATS = 20


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def _time(fn, *args) -> float:
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPEATS


def _scan_expanded(supports, wg, wu, h0, dtype):
    supports = supports.astype(dtype)
    wg, wu = wg.astype(dtype), wu.astype(dtype)

    def one_pass(h, _):
        def step(h, _):
            hh = jnp.einsum("knm,bmc->bknc", supports, h.astype(dtype),
                            preferred_element_type=jnp.float32)
            zr = jax.nn.sigmoid(jnp.einsum("bkni,nkio->bno", hh.astype(dtype), wg,
                                           preferred_element_type=jnp.float32))
            z, r = jnp.split(zr, 2, -1)
            hzh = jnp.einsum("knm,bmc->bknc", supports, (z * h).astype(dtype),
                             preferred_element_type=jnp.float32)
            hc = jnp.tanh(jnp.einsum("bkni,nkio->bno", hzh.astype(dtype), wu,
                                     preferred_element_type=jnp.float32))
            return r * h + (1 - r) * hc, None

        h, _ = jax.lax.scan(step, h, None, length=T)
        return h, None

    h, _ = jax.lax.scan(one_pass, h0, None, length=REPEATS)
    return h


def _scan_factored(supports, pool_g, pool_u, emb, h0, dtype):
    supports = supports.astype(dtype)
    pool_g, pool_u = pool_g.astype(dtype), pool_u.astype(dtype)
    # pools reshaped to one (K*I, D*O) matmul operand
    pg = pool_g.transpose(1, 2, 0, 3).reshape(K * H, D * 2 * H)
    pu = pool_u.transpose(1, 2, 0, 3).reshape(K * H, D * H)
    emb_f = emb.astype(jnp.float32)

    def apply(hh, p, o_dim):
        # (B,K,N,I) -> (B,N,K*I) @ (K*I, D*O) -> (B,N,D,O) --emb--> (B,N,O)
        flat = hh.transpose(0, 2, 1, 3).reshape(B, N, K * H).astype(dtype)
        u = jnp.einsum("bnf,fe->bne", flat, p, preferred_element_type=jnp.float32)
        u = u.reshape(B, N, D, o_dim)
        return jnp.einsum("bndo,nd->bno", u, emb_f)

    def one_pass(h, _):
        def step(h, _):
            hh = jnp.einsum("knm,bmc->bknc", supports, h.astype(dtype),
                            preferred_element_type=jnp.float32)
            zr = jax.nn.sigmoid(apply(hh, pg, 2 * H))
            z, r = jnp.split(zr, 2, -1)
            hzh = jnp.einsum("knm,bmc->bknc", supports, (z * h).astype(dtype),
                             preferred_element_type=jnp.float32)
            hc = jnp.tanh(apply(hzh, pu, H))
            return r * h + (1 - r) * hc, None

        h, _ = jax.lax.scan(step, h, None, length=T)
        return h, None

    h, _ = jax.lax.scan(one_pass, h0, None, length=REPEATS)
    return h


def main():
    rng = np.random.default_rng(0)
    supports = jnp.asarray(rng.normal(size=(K, N, N)).astype(np.float32)) / np.sqrt(N)
    pool_g = jnp.asarray(rng.normal(size=(D, K, H, 2 * H)).astype(np.float32)) * 0.05
    pool_u = jnp.asarray(rng.normal(size=(D, K, H, H)).astype(np.float32)) * 0.05
    emb = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    wg = jnp.einsum("nd,dkio->nkio", emb, pool_g)
    wu = jnp.einsum("nd,dkio->nkio", emb, pool_u)
    h0 = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32)) * 0.1

    weight_bytes = (wg.size + wu.size) * 4
    print("expanded weight stream/step: {:.1f} MB (f32)".format(weight_bytes / 1e6))
    dev = jax.devices()[0]
    print("device:", dev.platform, getattr(dev, "device_kind", "?"))

    results = {}
    f_v0 = jax.jit(lambda s, g, u, h: _scan_expanded(s, g, u, h, jnp.float32))
    results["v0_f32_expanded"] = _time(f_v0, supports, wg, wu, h0)
    f_v1 = jax.jit(lambda s, g, u, h: _scan_expanded(s, g, u, h, jnp.bfloat16))
    results["v1_bf16_expanded"] = _time(f_v1, supports, wg, wu, h0)
    f_v2 = jax.jit(lambda s, g, u, e, h: _scan_factored(s, g, u, e, h, jnp.float32))
    results["v2_factored_pool"] = _time(f_v2, supports, pool_g, pool_u, emb, h0)
    f_v3 = jax.jit(lambda s, g, u, e, h: _scan_factored(s, g, u, e, h, jnp.bfloat16))
    results["v3_factored_bf16"] = _time(f_v3, supports, pool_g, pool_u, emb, h0)

    for name, t in results.items():
        per_step = t / T * 1e6
        print("{:>18}: {:7.3f} ms / T={} encoder pass  ({:6.1f} us/step)".format(
            name, t * 1e3, T, per_step))

    # rooflines for the dominant term (one layer's gate+update h-contraction)
    hbm_gbs = 819.0  # v5e
    stream = weight_bytes * T
    print("HBM roofline, expanded f32 weights: {:.3f} ms/pass".format(stream / hbm_gbs / 1e6))
    print("HBM roofline, expanded bf16 weights: {:.3f} ms/pass".format(stream / 2 / hbm_gbs / 1e6))
    flops_fact = 2 * B * N * (K * H) * (D * 2 * H + D * H) * T
    print("MXU roofline, factored bf16 (197 TF/s): {:.3f} ms/pass".format(flops_fact / 197e12 * 1e3))


if __name__ == "__main__":
    main()
