"""Op-level xplane profile of the DC-237 train step on the real chip.

Captures a ``jax.profiler.trace`` of the jitted train step (run in-program
REPEAT times via lax.scan, carry-chained so XLA cannot hoist it) and
aggregates device-plane op durations by HLO category — matmuls (dot/conv),
copies/transposes (relayouts), dynamic-(update-)slices (scan stack traffic),
elementwise fusions — printing the top ops and a per-step category table.

Usage: python tools/profile_step.py [--fused 1] [--dtype bfloat16]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from multistgraph_tpu.data.scalers import StandardScaler
from multistgraph_tpu.executor.optimizers import build_optimizer
from multistgraph_tpu.models import make_loss_fn
from __graft_entry__ import _tiny_setup

REPEAT = 32


def build_step(fused: bool, dtype, quant=False):
    model, config, params, x, y = _tiny_setup(num_nodes=237, batch=16, hidden=64)
    model = model.clone(fused_bptt=fused, compute_dtype=dtype,
                        weight_stream_quant="int8" if quant else None)
    scaler = StandardScaler(mean=1.0, std=2.0)
    loss_fn = make_loss_fn(model, scaler)
    optimizer = build_optimizer(type("Cfg", (), {"get": lambda s, k, d=None: config.get(k, d)})())
    opt_state = optimizer.init(params["params"])
    rng = jax.random.PRNGKey(0)
    batch = {"X": x, "y": y}

    def train_body(carry, b):
        p, os_ = carry
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn({"params": pp}, b, rng=rng, train=True)
        )(p["params"])
        updates, os_ = optimizer.update(grads, os_, p["params"])
        p = {"params": jax.tree_util.tree_map(lambda a, u: a + u, p["params"], updates)}
        return (p, os_), None

    fn = jax.jit(
        lambda b: jax.lax.scan(lambda c, _: (train_body(c, b)[0], None),
                               (params, opt_state), None, length=REPEAT)[0]
    )
    return fn, batch


def categorize(name: str) -> str:
    n = name.lower()
    if "dynamic-update-slice" in n or "dynamic_update_slice" in n:
        return "dyn-update-slice"
    if "dynamic-slice" in n or "dynamic_slice" in n:
        return "dyn-slice"
    if n.startswith("copy") or ".copy" in n or "transpose" in n:
        return "copy/transpose"
    if "convert" in n:
        return "convert"
    if "dot" in n or "conv" in n:
        return "dot/conv"
    if "fusion" in n:
        return "fusion"
    if "all-reduce" in n or "all-to-all" in n or "all-gather" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    fn, batch = build_step(bool(args.fused), "bfloat16" if dtype else None,
                           quant=args.quant)
    out = fn(batch)  # compile + warm
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).sum())

    tmpdir = tempfile.mkdtemp(prefix="xplane_")
    with jax.profiler.trace(tmpdir):
        out = fn(batch)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32).sum())

    files = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print("no xplane captured under", tmpdir)
        return
    pd = jax.profiler.ProfileData.from_file(files[0])
    per_op = collections.Counter()
    per_cat = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # keep only the XLA op lines; skip the async/annotation lines that
            # double-count spans
            if "async" in lname or "step" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                per_op[ev.name] += dur
                per_cat[categorize(ev.name)] += dur
    total = sum(per_cat.values())
    print("device op time per train step (REPEAT=%d):" % REPEAT)
    for cat, ns in per_cat.most_common():
        print("  %-18s %8.3f ms  (%4.1f%%)" % (cat, ns / 1e6 / REPEAT, 100.0 * ns / total))
    print("  %-18s %8.3f ms" % ("TOTAL", total / 1e6 / REPEAT))
    print("\ntop ops:")
    for name, ns in per_op.most_common(args.top):
        print("  %8.0f us/step  %s" % (ns / 1e3 / REPEAT, name[:140]))


if __name__ == "__main__":
    main()
