"""A/B the recurrence's einsum index orders on the real chip.

The profiled bf16 train step (tools/profile_step.py) spends ~0.9 ms/step on
in-scan relayout copies between the graph aggregation and the weight apply
({2,3,1,0} -> {3,0,1,2} on (B,K,N,C)), and ~1.4 ms/step relayouting the bulk
hh/hzh recompute stacks into the dW contraction's preferred layout
({3,4,2,1,0} -> {4,0,1,2,3} on (T,B,K,N,C)). The only lever XLA exposes is
the einsum output index ORDER (layout assignment then has different options);
this harness times the real `fused_atgru_layer` fwd+bwd (one DC-237 layer,
bf16) for each combination of candidate orders and prints a ranking.

Run on the TPU: python tools/bench_layer_layouts.py
"""

import itertools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.models import multi_atgcn as M

T, B, N, H, K = 24, 16, 237, 64, 5
REPEAT = 8

VARIANTS = {
    "scan-base": dict(_AGG_SPEC="knm,bmc->bknc", _APPLY_SPEC="bkni,nkio->bno"),
    "scan-nmajor": dict(_AGG_SPEC="knm,bmc->nkbc", _APPLY_SPEC="nkbi,nkio->bno"),
    "bulk-base": dict(_BULK_AGG_SPEC="knm,tbmc->tbknc", _DW_SPEC="tbkni,tbno->nkio"),
    "bulk-nmajor": dict(_BULK_AGG_SPEC="knm,tbmc->nkbtc", _DW_SPEC="nkbti,tbno->nkio"),
    "bulk-ntmajor": dict(_BULK_AGG_SPEC="knm,tbmc->nktbc", _DW_SPEC="nktbi,tbno->nkio"),
    "rev-base": dict(_DAPPLY_SPEC="bno,nkio->bkni", _DSUP_SPEC="bknc,bmc->knm",
                     _DAGGT_SPEC="knm,bknc->bmc"),
    "rev-nmajor": dict(_DAPPLY_SPEC="bno,nkio->nkbi", _DSUP_SPEC="nkbc,bmc->knm",
                       _DAGGT_SPEC="knm,nkbc->bmc"),
}

COMBOS = [
    ("scan-base", "bulk-base", "rev-base"),
    ("scan-nmajor", "bulk-base", "rev-base"),
    ("scan-base", "bulk-nmajor", "rev-base"),
    ("scan-base", "bulk-ntmajor", "rev-base"),
    ("scan-base", "bulk-base", "rev-nmajor"),
    ("scan-nmajor", "bulk-nmajor", "rev-nmajor"),
]


def _sync(x) -> float:
    return float(jnp.asarray(x, jnp.float32).sum())


def _inputs():
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.1
    b16 = lambda *s: f(*s).astype(jnp.bfloat16)
    return dict(
        gate_x=b16(T, B, N, 2 * H), upd_x=b16(T, B, N, H),
        rg_x=b16(T, B, N, 2 * H), ru_x=b16(T, B, N, H),
        w_seq=jax.nn.sigmoid(f(T)), supports=f(K, N, N) / np.sqrt(N),
        wg_h=b16(N, K, H, 2 * H), wu_h=b16(N, K, H, H),
        bg=f(N, 2 * H), bu=f(N, H),
        rg_h=f(H, 2 * H), ru_h=f(H, H), rg_b=f(2 * H), ru_b=f(H),
        state0=f(B, N, H),
    )


ARGS = ("gate_x", "upd_x", "rg_x", "ru_x", "w_seq", "supports", "wg_h",
        "wu_h", "bg", "bu", "rg_h", "ru_h", "rg_b", "ru_b", "state0")


def build(kw):
    wts = jnp.asarray(np.random.default_rng(1).normal(size=(T, B, N, H)), jnp.float32)

    def loss(args, scale):
        out = M.fused_atgru_layer(jnp.bfloat16, *args)
        return jnp.sum(out * wts) * scale

    grad = jax.value_and_grad(loss)
    args = tuple(kw[k] for k in ARGS)

    def body(c, _):
        v, g = grad(args, c)
        return v * 1e-9, None

    return jax.jit(lambda: jax.lax.scan(body, jnp.float32(1.0), None,
                                        length=REPEAT)[0])


def main():
    kw = _inputs()
    ref_val = None
    results = []
    for combo in COMBOS:
        spec = {}
        for name in combo:
            spec.update(VARIANTS[name])
        for k, v in spec.items():
            setattr(M, k, v)
        fn = build(kw)
        t0 = time.time()
        val = _sync(fn())
        compile_s = time.time() - t0
        if ref_val is None:
            ref_val = val
        else:
            # einsum order changes bf16 reassociation slightly; loose check
            assert abs(val - ref_val) < 1e-2 * (abs(ref_val) + 1), (val, ref_val)
        t0 = time.perf_counter()
        _sync(fn())
        dt = (time.perf_counter() - t0) / REPEAT
        label = "+".join(c for c in combo if not c.endswith("-base")) or "base"
        results.append((dt, label))
        print("  {:32s} {:7.3f} ms/layer-step (compile {:.0f}s)".format(
            label, dt * 1e3, compile_s), flush=True)
    results.sort()
    print("best: {} at {:.3f} ms".format(results[0][1], results[0][0] * 1e3))


if __name__ == "__main__":
    main()
