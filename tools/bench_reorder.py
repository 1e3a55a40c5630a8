"""SpMM throughput at large-graph scale, with and without node reordering.

BASELINE.json config 5 scale point (1M nodes): the x-gather's column
locality is the measured limiter (docs/DESIGN.md §9 — 501 GB/s effective vs
the 733 GB/s HBM ceiling at 1M nodes, while 50k reaches 701). RCM/community
reordering concentrates edges near the diagonal, cutting both the number of
128x128 BSR tiles touched and the column working set each row block gathers.
This bench builds ONE graph and BSR-tiles it under each ordering, then
slope-times the same SpMM kernel on each layout.

Reported per ordering: nnz_blocks, ms/iter, edges/s (real work — invariant
to padding), block-granular GFLOP/s, and effective GB/s of the tile bytes
actually streamed.

Two graph families (--family):
  * spatial — random_spatial_graph's distribution (ids already near-optimal:
    |dst-src| < 256 locality). Reordering cannot beat the natural order
    here; the bench quantifies that honestly.
  * planted — community structure with ids SCRAMBLED across the range
    (tests/test_reorder_community.py:planted_partition at scale): raw
    tiling is pathological, clustering is the enabler.

Usage: python tools/bench_reorder.py [num_nodes] [avg_degree] [feat]
                                     [orderings, default none,rcm,community]
                                     [--family spatial|planted]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# honour an explicit JAX_PLATFORMS (e.g. cpu smoke tests) — the TPU relay
# plugin otherwise pins the platform regardless of the env var
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.ops import bsr
from multistgraph_tpu.ops.spmm import spmm, spmm_jax


def _edges(num_nodes, avg_degree, seed=0):
    """The same edge distribution random_spatial_graph tiles (bsr.py:242),
    exposed as raw COO so each ordering tiles the identical edge set."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    hub_fraction, num_hubs, locality = 0.05, 8, 256
    n_local = int(num_edges * (1 - hub_fraction))
    src_local = rng.integers(0, num_nodes, n_local)
    offset = rng.integers(-locality, locality + 1, n_local)
    dst_local = np.clip(src_local + offset, 0, num_nodes - 1)
    n_hub = num_edges - n_local
    src_hub = rng.integers(0, num_nodes, n_hub)
    hubs = rng.integers(0, num_nodes, num_hubs)
    dst_hub = hubs[rng.integers(0, num_hubs, n_hub)]
    src = np.concatenate([src_local, src_hub])
    dst = np.concatenate([dst_local, dst_hub])
    w = rng.uniform(0.1, 1.0, num_edges).astype(np.float32)
    return src, dst, w


def _planted_edges(num_nodes, avg_degree, num_comms=None, seed=0):
    """Planted-partition edges with node ids scrambled across the range
    (tests/test_reorder_community.py:planted_partition, scaled): ~90% of
    edges stay inside one of `num_comms` communities whose members are
    spread uniformly over the id space."""
    rng = np.random.default_rng(seed)
    num_comms = num_comms or max(8, num_nodes // 8192)
    comm_of = rng.permutation(np.arange(num_nodes) % num_comms)
    members = [np.flatnonzero(comm_of == c) for c in range(num_comms)]
    deg_in = int(avg_degree * 0.9)
    src_parts, dst_parts = [], []
    for m in members:
        src_parts.append(m[rng.integers(0, len(m), len(m) * deg_in)])
        dst_parts.append(m[rng.integers(0, len(m), len(m) * deg_in)])
    n_out = num_nodes * avg_degree - sum(len(s) for s in src_parts)
    src_parts.append(rng.integers(0, num_nodes, n_out))
    dst_parts.append(rng.integers(0, num_nodes, n_out))
    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    w = rng.uniform(0.1, 1.0, len(src)).astype(np.float32)
    return src, dst, w


def _bench_band(label, src, dst, w, num_nodes, feat, results,
                dtype="f32"):
    """Time the structured decomposition: band diagonals (batched matmuls)
    + hub columns (skinny dense) + COO tail for whatever remains."""
    import functools

    import jax.numpy as jnp

    from multistgraph_tpu.ops.band import (
        pack_band_rows, split_band, spmm_band, spmm_band_packed)
    from multistgraph_tpu.ops.hybrid import split_hub_columns, spmm_tail
    from tools.timing import slope_time

    t0 = time.time()
    bg = split_band(src, dst, w, num_nodes)
    hy = split_hub_columns(bg.rest_src, bg.rest_dst, bg.rest_w, num_nodes)
    # leftovers after band+hub stay exact through the COO tail
    non_hub = ~np.isin(bg.rest_dst, hy.hub_cols)
    n_tail = int(non_hub.sum())
    build_s = time.time() - t0
    n_blocks = bg.num_row_blocks
    print(
        "[{}] build {:.1f}s offsets={} hub_cols={} tail_edges={}".format(
            label, build_s, bg.offsets.tolist(), hy.num_hubs, n_tail),
        file=sys.stderr, flush=True)

    rng = np.random.default_rng(1)
    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    x = jnp.asarray(rng.normal(size=(bg.padded_nodes, feat)).astype(np.float32)).astype(cdt)
    bvals = jnp.asarray(bg.band_values).astype(cdt)
    hv = jnp.asarray(hy.hub_values)
    hc = jnp.asarray(hy.hub_cols)
    rest_parts = None
    if n_tail:
        order = np.argsort(bg.rest_src[non_hub], kind="stable")  # segsum-sorted
        rs = jnp.asarray(bg.rest_src[non_hub][order].astype(np.int32))
        rd = jnp.asarray(bg.rest_dst[non_hub][order].astype(np.int32))
        rw = jnp.asarray(bg.rest_w[non_hub][order])
        rest_parts = (rw, rs, rd)

    # packed slab path (serving fast path): pack ONCE host-side — XLA's
    # LICM refuses to hoist the ~GB in-program pack (P4 probes,
    # docs/bench/probe_band_integration_r4c.log)
    packed = os.environ.get("MSG_BAND_BENCH", "") == "packed"
    if packed:
        radius = int(max(abs(int(o)) for o in bg.offsets)) if len(bg.offsets) else 0
        bvals = jnp.asarray(pack_band_rows(
            np.asarray(bg.band_values), tuple(int(o) for o in bg.offsets),
            radius)).astype(cdt)

    def kernel(bv, xx):
        if packed:
            y = spmm_band_packed(bv, radius, xx, block=bg.block)
        else:
            y = spmm_band(bv, bg.offsets, xx, block=bg.block)
        if hy.num_hubs > 0:
            y = y + hv @ jnp.take(xx, hc, axis=0)
        if rest_parts is not None:
            y = y + spmm_tail(rest_parts[0], rest_parts[1], rest_parts[2],
                              xx, xx.shape[0])
        return y

    def make_fn(k, bvals=bvals, x=x):
        @functools.partial(jax.jit, static_argnums=2)
        def fn(bv, xx, kk):
            def body(i, c):
                xi = xx.at[0, 0].add((c * 1e-12).astype(xx.dtype))
                return c + jnp.sum(kernel(bv, xi)[0], dtype=jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return lambda: fn(bvals, x, k)

    per_iter, _ = slope_time(make_fn, trips=(2, 4, 8))
    n_band = int((bg.band_values != 0).sum())
    n_edges = n_band + int((hy.hub_values != 0).sum()) + n_tail
    # streamed bytes: every band plane's tiles + one x pass per offset +
    # hub values + tail gathers
    itemsize = 2 if dtype == "bf16" else 4
    tile_bytes = (bg.band_values.size
                  + len(bg.offsets) * bg.padded_nodes * feat) * itemsize \
        + hy.hub_values.size * 4
    tile_bytes += n_tail * 2 * feat * 4
    results[label] = {
        "nnz_blocks": int(len(bg.offsets) * n_blocks),
        "spmm_ms": round(per_iter * 1e3, 3),
        "edges_per_s": round(n_edges / per_iter),
        "gbps_effective": round(tile_bytes / per_iter / 1e9, 1),
        "build_s": round(build_s, 1),
        "band_offsets": bg.offsets.tolist(),
        "num_hubs": int(hy.num_hubs),
        "num_tail_edges": n_tail,
        "dtype": dtype,
        "band_impl": "packed_slab" if packed else "einsum",
    }
    print("[{}] {}".format(label, results[label]), file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("num_nodes", type=int, nargs="?", default=1 << 20)
    ap.add_argument("avg_degree", type=int, nargs="?", default=16)
    ap.add_argument("feat", type=int, nargs="?", default=128)
    ap.add_argument("orderings", nargs="?", default="none,rcm,community")
    ap.add_argument("--family", choices=("spatial", "planted"), default="spatial")
    ap.add_argument("--kernel", choices=("block", "stream"), default="block",
                    help="BSR kernel: block = one grid step per nnz block "
                         "(ops/spmm.py); stream = row-streaming double-"
                         "buffered DMA kernel (ops/spmm_stream.py)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="stream kernel: values-DMA chunk size (0 = per-tile)")
    ap.add_argument("--num_comms", type=int, default=None,
                    help="planted family: community count (default "
                         "num_nodes // 8192); smaller communities fill "
                         "tiles denser")
    ap.add_argument("--min_fill", type=int, default=None,
                    help="tail splits: tile edge count below which edges "
                         "go to the COO tail (default block // 2 = 64)")
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="f32",
                    help="band path: compute dtype for the diagonal matmuls "
                         "(bf16 halves the dominant value+x streams; "
                         "accumulation stays f32)")
    args = ap.parse_args()
    num_nodes, avg_degree, feat = args.num_nodes, args.avg_degree, args.feat
    orderings = args.orderings.split(",")
    family = args.family

    from tools.timing import slope_time

    if family == "planted":
        src, dst, w = _planted_edges(num_nodes, avg_degree,
                                     num_comms=args.num_comms)
    else:
        src, dst, w = _edges(num_nodes, avg_degree)
    rng = np.random.default_rng(1)
    x_host = rng.normal(size=(0, feat))  # placeholder, sized per graph below

    results = {}
    for ordering in orderings:
        # an ordering token is '+'-separated: an optional node reorder
        # (rcm | community) and an optional hybrid split (hub | tail),
        # e.g. "community+tail". "none" = raw BSR tiling.
        parts = ordering.split("+")
        reorder_name = next((p for p in parts if p in bsr._ORDERINGS), None)
        use_hub, use_tail = "hub" in parts, "tail" in parts
        if use_hub and use_tail:
            raise SystemExit("hub+tail composition not supported")

        if "band" in parts:
            # full structured decomposition: dense offset-diagonals for the
            # local band (ops/band.py — batched matmuls, NO gather), skinny
            # hub columns for the high-fan-in rest, COO tail for leftovers
            _bench_band(ordering, src, dst, w, num_nodes, feat, results,
                        dtype=args.dtype)
            continue

        t0 = time.time()
        hub_values = hub_cols = None
        tail_w = tail_src = tail_dst = None
        s2, d2 = src, dst
        if reorder_name is not None:
            perm = bsr._ORDERINGS[reorder_name](src, dst, num_nodes)
            inv = np.empty(num_nodes, np.int64)
            inv[perm] = np.arange(num_nodes)
            # s2/d2 carry the permutation; don't reorder again at tiling
            # (x is random here, so the perm needn't be recorded)
            s2, d2 = inv[src], inv[dst]
        if use_hub:
            # hybrid split: BSR remainder + dense skinny hub columns
            # (ops/hybrid.py) — attacks the near-empty hub tiles directly
            from multistgraph_tpu.ops.hybrid import split_hub_columns

            hy = split_hub_columns(s2, d2, w, num_nodes)
            graph, hub_values, hub_cols = hy.bsr, hy.hub_values, hy.hub_cols
        elif use_tail:
            # hybrid split: BSR of dense-enough tiles + COO segment-sum
            # tail — absorbs scattered singleton-tile edges (memory-safe by
            # construction: only kept tiles materialize)
            from multistgraph_tpu.ops.hybrid import split_scattered_tail

            tg = split_scattered_tail(s2, d2, w, num_nodes,
                                      min_fill=args.min_fill)
            graph = tg.bsr
            tail_w, tail_src, tail_dst = tg.tail_w, tg.tail_src, tg.tail_dst
        else:
            # count tiles BEFORE materializing them: a pathological ordering
            # (e.g. RCM on a hub graph — the hubs shatter the BFS layering)
            # can explode the tile count past host memory; record the count
            # as the finding instead of dying on a 100+ GiB allocation.
            block = 128
            n_blocks = -(-num_nodes // block)
            planned = len(np.unique((s2 // block).astype(np.int64) * n_blocks
                                    + d2 // block))
            if planned * block * block * 4 > 12e9:
                results[ordering] = {
                    "nnz_blocks": int(planned),
                    "skipped": "tiling needs {:.0f} GiB of value tiles".format(
                        planned * block * block * 4 / 2 ** 30),
                    "build_s": round(time.time() - t0, 1),
                }
                print("[{}] {}".format(ordering, results[ordering]),
                      file=sys.stderr, flush=True)
                continue
            graph = bsr.bsr_from_coo(s2, d2, w, num_nodes)
        build_s = time.time() - t0
        print(
            "[{}] build {:.1f}s nnz_blocks={} ({:.3f}% dense) nnz_edges={}".format(
                ordering, build_s, graph.nnz_blocks,
                100.0 * graph.nnz_blocks / graph.num_row_blocks ** 2,
                graph.nnz_edges),
            file=sys.stderr, flush=True)
        if x_host.shape[0] != graph.padded_nodes:
            x_host = rng.normal(size=(graph.padded_nodes, feat)).astype(np.float32)
        values = jnp.asarray(graph.values)
        row_of = jnp.asarray(graph.row_of)
        col_of = jnp.asarray(graph.col_of)
        x = jnp.asarray(x_host)

        # the Pallas kernel on TPU; the numerically-identical pure-jax BSR
        # SpMM off-TPU (interpret-mode Pallas is orders of magnitude slower)
        on_tpu = jax.devices()[0].platform == "tpu"
        if args.kernel == "stream" and on_tpu:
            from multistgraph_tpu.ops.spmm_stream import (row_ptr_from_rows,
                                                          spmm_stream)

            row_ptr = jnp.asarray(
                row_ptr_from_rows(graph.row_of, graph.num_row_blocks))

            def base_kernel(vv, rr, cc, xx, row_ptr=row_ptr):
                return spmm_stream(vv, row_ptr, cc, xx, chunk=args.chunk)
        else:
            base_kernel = spmm if on_tpu else spmm_jax
        n_edges = graph.nnz_edges
        if hub_values is not None:
            from multistgraph_tpu.ops.hybrid import spmm_hybrid

            hv = jnp.asarray(hub_values)
            hc = jnp.asarray(hub_cols)
            n_edges += int((hub_values != 0).sum())

            def kernel(vv, rr, cc, xx):
                return spmm_hybrid(vv, rr, cc, hv, hc, xx,
                                   kernel=lambda *a: base_kernel(*a))
        elif tail_w is not None:
            from multistgraph_tpu.ops.hybrid import spmm_tail_hybrid

            tw = jnp.asarray(tail_w)
            ts = jnp.asarray(tail_src)
            td = jnp.asarray(tail_dst)
            n_edges += int(tail_w.shape[0])

            def kernel(vv, rr, cc, xx):
                return spmm_tail_hybrid(vv, rr, cc, tw, ts, td, xx,
                                        kernel=lambda *a: base_kernel(*a))
        else:
            kernel = base_kernel

        def make_fn(k, values=values, row_of=row_of, col_of=col_of, x=x,
                    kernel=kernel):
            @functools.partial(jax.jit, static_argnums=2)
            def fn(vv, xx, kk):
                def body(i, c):
                    xi = xx.at[0, 0].add((c * 1e-12).astype(xx.dtype))
                    return c + jnp.sum(kernel(vv, row_of, col_of, xi)[0],
                                       dtype=jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return lambda: fn(values, x, k)

        per_iter, totals = slope_time(make_fn, trips=(2, 4, 8))
        tile_bytes = graph.nnz_blocks * (graph.block ** 2 + graph.block * feat) * 4
        if hub_values is not None:
            tile_bytes += hub_values.size * 4
        if tail_w is not None:
            # per tail edge: one x-row gather + one y-row accumulate
            tile_bytes += tail_w.shape[0] * 2 * feat * 4
        flops = 2 * graph.nnz_blocks * graph.block ** 2 * feat
        results[ordering] = {
            "nnz_blocks": int(graph.nnz_blocks),
            "spmm_ms": round(per_iter * 1e3, 3),
            "edges_per_s": round(n_edges / per_iter),
            "gflops_block_granular": round(flops / per_iter / 1e9, 1),
            "gbps_effective": round(tile_bytes / per_iter / 1e9, 1),
            "build_s": round(build_s, 1),
            **({"num_hubs": int(len(hub_cols))} if hub_values is not None else {}),
            **({"num_tail_edges": int(tail_w.shape[0])} if tail_w is not None else {}),
        }
        print("[{}] {}".format(ordering, results[ordering]),
              file=sys.stderr, flush=True)

    base = results.get("none")
    timed = [r for r in results.values() if "spmm_ms" in r]
    if not timed:
        print(json.dumps({"metric": "spmm_reorder_all_skipped",
                          "extras": results}))
        return
    best = min(timed, key=lambda r: r["spmm_ms"])
    print(json.dumps({
        "metric": "spmm_edges_per_second_{}m_{}_reordered".format(
            round(num_nodes / 1e6, 1), family),
        "value": best["edges_per_s"],
        "unit": "edges/s",
        "extras": {
            "num_nodes": num_nodes,
            "avg_degree": avg_degree,
            "feat": feat,
            "speedup_vs_unordered": (
                round(base["spmm_ms"] / best["spmm_ms"], 2)
                if base and "spmm_ms" in base else None),
            "orderings": results,
            "device": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
