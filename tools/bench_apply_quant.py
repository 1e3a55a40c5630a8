"""On-chip A/B: int8 expanded-weight streaming vs the bf16 einsum apply.

VERDICT r4 item 3: the dense DC-237 training step is pinned at the HBM
ceiling by the per-timestep read of the expanded (N,K,I,O) node-conditioned
weights (~29 MB/layer bf16, re-read every scan step, forward and reverse).
int8 storage with per-(n,o) scales halves those bytes IF the convert
happens in VMEM (ops/node_apply.node_apply_q8); XLA-level int8 cannot do
this (the convert materializes — or hoists — a bf16 copy).

This probe scans T steps of the REAL per-step composition (support
aggregation from the carry + node-conditioned apply + cheap carry update)
in three variants and slope-times them (tools/timing.py):

  C  bf16 einsum apply (what fused_atgru_layer runs today)
  Q  int8 Pallas apply (agg emitted N-major, (K,C) merged outside kernel)
  QT int8 transposed apply (the reverse-scan dapply direction)

Run on the chip: python tools/bench_apply_quant.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tools.timing import slope_time

B, N, H, K, T = 16, 237, 64, 5, 24
I = H            # hh is the aggregated hidden state
O = 3 * H        # gate 2H + update H fused
KI = K * I


def main():
    rng = np.random.default_rng(0)
    supports = jnp.asarray(rng.normal(size=(K, N, N)).astype(np.float32) / np.sqrt(N),
                           jnp.bfloat16)
    w = rng.normal(size=(N, K, I, O)).astype(np.float32) / np.sqrt(KI)
    w_bf = jnp.asarray(w, jnp.bfloat16)                    # (N,K,I,O)
    from multistgraph_tpu.ops.node_apply import (
        node_apply_q8, node_apply_q8_t, quantize_node_weights,
    )

    wq, s = quantize_node_weights(jnp.asarray(w.reshape(N, KI, O)))
    h0 = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32), jnp.bfloat16)
    h0_n = jnp.transpose(h0, (1, 0, 2))                    # (N,B,H)

    mm = lambda spec, a, b: jnp.einsum(  # noqa: E731
        spec, a, b, preferred_element_type=jnp.float32)

    def c_fn(k):
        def step(h, _):
            hh = mm("knm,bmc->bknc", supports, h)          # (B,K,N,I)
            out = mm("bkni,nkio->bno", hh.astype(jnp.bfloat16), w_bf)
            h = jnp.tanh(out[..., :H]).astype(jnp.bfloat16)
            return h, ()

        def run():
            hT, _ = jax.lax.scan(step, h0, None, length=k)
            return hT

        return jax.jit(run)

    def q_fn(k):
        def step(h, _):
            # h: (N,B,H); agg N-major, (K,C) merged outside the kernel
            hh = mm("knm,mbc->nbkc", supports, h)          # (N,B,K,I) f32
            hh = hh.reshape(N, B, KI).astype(jnp.bfloat16)
            out = node_apply_q8(hh, wq, s)                 # (N,B,O) f32
            h = jnp.tanh(out[..., :H]).astype(jnp.bfloat16)
            return h, ()

        def run():
            hT, _ = jax.lax.scan(step, h0_n, None, length=k)
            return hT

        return jax.jit(run)

    def qt_fn(k):
        dpre0 = jnp.asarray(rng.normal(size=(N, B, O)).astype(np.float32),
                            jnp.bfloat16)

        def step(d, _):
            dhh = node_apply_q8_t(d, wq, s)                # (N,B,KI) bf16
            d = jnp.tanh(dhh[..., :O]).astype(jnp.bfloat16)
            return d, ()

        def run():
            dT, _ = jax.lax.scan(step, dpre0, None, length=k)
            return dT

        return jax.jit(run)

    stream_bf16 = N * KI * O * 2 / 2**20
    stream_q8 = (N * KI * O + N * O * 4) / 2**20
    print("weight stream/step: bf16 {:.1f} MB, int8 {:.1f} MB".format(
        stream_bf16, stream_q8))
    for name, fn in (("C  bf16 einsum", c_fn), ("Q  int8 kernel", q_fn),
                     ("QT int8 kernel^T", qt_fn)):
        per, totals = slope_time(fn, trips=(64, 512, 1024), reps=3)
        print("{}: {:.1f} us/step  (totals {})".format(
            name, per * 1e6, ["{:.1f}ms".format(t * 1e3) for t in totals]))


if __name__ == "__main__":
    main()
