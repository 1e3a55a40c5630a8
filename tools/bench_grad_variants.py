"""Verify WHERE the dense train step's backward time goes.

Hypothesis (from the 1.1 ms forward vs 36.5 ms train step measured by
bench_step_breakdown): reverse-mode AD of the scan accumulates the gradient
of the EXPANDED node-conditioned weights W (N,K,I,O) — a ~233 MB
read-modify-write per scan step, ~22 GB per train step — because W appears
(as e . pool, loop-invariant) inside every step of the recurrence.

Times fwd+bwd of a 24-step gated-GRU-like scan for:
  g0_expanded_param — W (N,K,I,O) differentiated directly (what autodiff
                      does after hoisting the e.pool expansion)
  g1_factored_param — pool (D,K,I,O) + emb differentiated, W formed inside
                      (autodiff may accumulate dW then contract, or not)
  g2_shared_param   — shared (K,I,O) weights, no node conditioning
                      (control: tiny gradient accumulator)

If g0 >> g2 with similar forward cost, the fix is a custom VJP/BPTT that
avoids per-step dW accumulation. Run: python tools/bench_grad_variants.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, H, K, T, D = 16, 237, 64, 5, 24, 20
REPEAT = 8


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def _time(fn, *args) -> float:
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPEAT


def _recurrence(supports, h0, apply_g, apply_u):
    def step(h, _):
        hh = jnp.einsum("knm,bmc->bknc", supports, h)
        zr = jax.nn.sigmoid(apply_g(hh))
        z, r = jnp.split(zr, 2, -1)
        hzh = jnp.einsum("knm,bmc->bknc", supports, z * h)
        hc = jnp.tanh(apply_u(hzh))
        return r * h + (1 - r) * hc, None

    h, _ = jax.lax.scan(step, h0, None, length=T)
    return h


def main():
    rng = np.random.default_rng(0)
    supports = jnp.asarray(rng.normal(size=(K, N, N)).astype(np.float32)) / np.sqrt(N)
    pool_g = jnp.asarray(rng.normal(size=(D, K, H, 2 * H)).astype(np.float32)) * 0.05
    pool_u = jnp.asarray(rng.normal(size=(D, K, H, H)).astype(np.float32)) * 0.05
    emb = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    wg = jnp.einsum("nd,dkio->nkio", emb, pool_g)
    wu = jnp.einsum("nd,dkio->nkio", emb, pool_u)
    sg = jnp.asarray(rng.normal(size=(K, H, 2 * H)).astype(np.float32)) * 0.05
    su = jnp.asarray(rng.normal(size=(K, H, H)).astype(np.float32)) * 0.05
    h0 = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32)) * 0.1

    def loss_expanded(params):
        wg_, wu_ = params
        h = _recurrence(
            supports, h0,
            lambda hh: jnp.einsum("bkni,nkio->bno", hh, wg_),
            lambda hh: jnp.einsum("bkni,nkio->bno", hh, wu_),
        )
        return h.mean()

    def loss_factored(params):
        pg, pu, e = params
        wg_ = jnp.einsum("nd,dkio->nkio", e, pg)
        wu_ = jnp.einsum("nd,dkio->nkio", e, pu)
        h = _recurrence(
            supports, h0,
            lambda hh: jnp.einsum("bkni,nkio->bno", hh, wg_),
            lambda hh: jnp.einsum("bkni,nkio->bno", hh, wu_),
        )
        return h.mean()

    def loss_shared(params):
        sg_, su_ = params
        h = _recurrence(
            supports, h0,
            lambda hh: jnp.einsum("bkni,kio->bno", hh, sg_),
            lambda hh: jnp.einsum("bkni,kio->bno", hh, su_),
        )
        return h.mean()

    def loss_factored_apply(params):
        # apply the pool INSIDE the step ("bkni,dkio->bndo" then "bndo,nd")
        # — D x more matmul FLOPs but the gradient accumulators are the tiny
        # pool/emb, not a (N,K,I,O) expansion
        pg, pu, e = params
        h = _recurrence(
            supports, h0,
            lambda hh: jnp.einsum(
                "bndo,nd->bno", jnp.einsum("bkni,dkio->bndo", hh, pg), e
            ),
            lambda hh: jnp.einsum(
                "bndo,nd->bno", jnp.einsum("bkni,dkio->bndo", hh, pu), e
            ),
        )
        return h.mean()

    def repeat_grad(loss, params):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(params)
            return c + l + sum(x.sum() for x in jax.tree_util.tree_leaves(g)), None

        return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)[0])

    t0 = _time(repeat_grad(loss_expanded, (wg, wu)))
    t1 = _time(repeat_grad(loss_factored, (pool_g, pool_u, emb)))
    t2 = _time(repeat_grad(loss_shared, (sg, su)))
    t3 = _time(repeat_grad(loss_factored_apply, (pool_g, pool_u, emb)))
    print("fwd+bwd of the 24-step recurrence (one layer, gate+update):")
    print("  g0 expanded W param : %7.2f ms" % (t0 * 1e3))
    print("  g1 factored pool    : %7.2f ms" % (t1 * 1e3))
    print("  g2 shared weights   : %7.2f ms" % (t2 * 1e3))
    print("  g3 factored apply   : %7.2f ms" % (t3 * 1e3))


if __name__ == "__main__":
    main()
