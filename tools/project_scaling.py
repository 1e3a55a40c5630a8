"""Projected multi-chip scaling efficiency from STATIC exchange plans.

The north-star distributed clause (BASELINE.json: ">=80% edges/s scaling
efficiency 1 chip -> multi-host") cannot be validated on this attached
single chip — but the boundary-exchange plans (ops/spmm_boundary.py) are
STATIC, so the bytes every shard moves per training step are exactly
countable at any shard count, and the single-chip step time is measured.
This tool combines the two into a defensible projected-efficiency curve:

    t_compute(S) = t_step_1chip / S          (compute is embarrassingly
                                              row-parallel: every shard runs
                                              the same program on 1/S rows)
    t_comm(S)    = wire_bytes_per_step(S) / (per-chip interconnect B/W)
    efficiency   = t_compute / (t_compute + t_comm)       [no overlap]
                   t_compute / max(t_compute, t_comm)     [full overlap]

The no-overlap column is the conservative bound; XLA overlaps the local-edge
SpMM with the all_to_all (the aggregation is written for that — see
boundary_aggregate), so reality sits between the columns.

Wire bytes per step are counted from the PADDED buffers actually sent
(all_to_all ships (S, max_send, b, F) per shard including padding slots),
not the useful-block lower bound — both are reported.

Exchanges per training step: each `_aggregate` call performs ONE feature
exchange shared by every support view; SparseATGCN calls it L*(1+2T) times
per forward (hoisted-x once per layer + gate/update per step), and each
all_to_all transposes to an all_to_all in the backward: 2*L*(1+2T) total.
Hub columns add one (H, F) psum per aggregation (ring all-reduce:
2*(S-1)/S * H*F bytes per chip); band forms a 2*radius*block*F halo.

Interconnect constants (override via CLI): TPU v5e ICI — 4 links/chip in a
2D torus at 45 GB/s/direction each (jax-ml.github.io/scaling-book); the
all_to_all rides all links, so per-chip injection B/W defaults to 90 GB/s
(2 links' worth sustained — conservative vs the 180 GB/s peak). DCN —
"multi-host" worst case at 6.25 GB/s/chip (50 Gbps NIC shared x8... we use
per-chip 6.25 as the pessimistic published figure).

Hardware validation pending (single attached chip); these are projections
from exact byte counts + measured compute, not measurements.

Usage: python tools/project_scaling.py [--nodes 1048576] [--degree 16]
         [--t-steps 4] [--layers 2] [--hidden 64]
         [--step-seconds <measured 1-chip step>] [--shards 2,4,8,16]
         [--split hub|tail] [--ici-gbs 90] [--dcn-gbs 6.25] [--dtype bf16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1048576,
                    help="2^20 by default: divisible into 2..64 shards")
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--t-steps", type=int, default=4)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--step-seconds", type=float, default=None,
                    help="measured single-chip step time for THIS workload; "
                    "required for the efficiency columns")
    ap.add_argument("--shards", default="2,4,8,16")
    ap.add_argument("--split", choices=("hub", "tail"), default="hub")
    ap.add_argument("--ici-gbs", type=float, default=90.0)
    ap.add_argument("--dcn-gbs", type=float, default=6.25)
    ap.add_argument("--dtype", choices=("f32", "bf16"), default="bf16")
    cli = ap.parse_args()

    from multistgraph_tpu.ops import bsr
    from multistgraph_tpu.ops.spmm_boundary import partition_bsr_boundary

    print("building graph N={} deg={} split={} ...".format(
        cli.nodes, cli.degree, cli.split), file=sys.stderr)
    graph, _ = bsr.random_spatial_graph(cli.nodes, cli.degree, seed=0,
                                        split=cli.split)
    core = graph.bsr
    block = core.block
    feat = cli.batch * cli.hidden  # aggregation feature width (B*H flattened)
    dbytes = 2 if cli.dtype == "bf16" else 4
    # exchanges per training step (module docstring)
    n_exch = 2 * cli.layers * (1 + 2 * cli.t_steps)

    shard_counts = [int(s) for s in cli.shards.split(",")]
    rows = []
    for S in shard_counts:
        if core.num_row_blocks % S:
            print("skip S={}: {} row blocks not divisible".format(
                S, core.num_row_blocks), file=sys.stderr)
            continue
        plan = partition_bsr_boundary(graph, S)
        # useful vs on-wire (padded) boundary blocks per exchange
        useful_blocks = int(round(
            plan.boundary_fraction * core.num_row_blocks * S))
        wire_blocks = S * S * plan.max_send
        bsr_wire = wire_blocks * block * feat * dbytes
        hub_bytes = 0
        if plan.hub_values is not None:
            H = plan.hub_lidx.shape[1]
            hub_bytes = int(2 * (S - 1) / S * H * feat * dbytes) * S
        tail_bytes = 0
        if plan.tail_send_idx is not None:
            tail_bytes = S * S * plan.tail_send_idx.shape[-1] * feat * dbytes
        band_bytes = 0
        if plan.band_radius:
            band_bytes = S * 2 * plan.band_radius * block * feat * dbytes
        wire_per_exchange = bsr_wire + hub_bytes + tail_bytes + band_bytes
        wire_per_step = wire_per_exchange * n_exch
        # per-CHIP injected bytes per step (all_to_all is balanced by
        # construction: each chip sends its row of the (S, S, max_send) plan)
        chip_bytes = wire_per_step / S
        row = {
            "shards": S,
            "boundary_fraction": round(plan.boundary_fraction, 4),
            "useful_blocks_per_exchange": useful_blocks,
            "wire_blocks_per_exchange": wire_blocks,
            "padding_overhead": round(wire_blocks / max(useful_blocks, 1), 2),
            "wire_MB_per_step_per_chip": round(chip_bytes / 1e6, 2),
            "hub_MB_per_step_per_chip": round(hub_bytes * n_exch / S / 1e6, 3),
            "tail_MB_per_step_per_chip": round(tail_bytes * n_exch / S / 1e6, 3),
        }
        if cli.step_seconds:
            t_cmp = cli.step_seconds / S
            for name, gbs in (("ici", cli.ici_gbs), ("dcn", cli.dcn_gbs)):
                t_comm = chip_bytes / (gbs * 1e9)
                row["eff_{}_no_overlap".format(name)] = round(
                    t_cmp / (t_cmp + t_comm), 4)
                row["eff_{}_overlap".format(name)] = round(
                    t_cmp / max(t_cmp, t_comm), 4)
                row["t_comm_{}_ms".format(name)] = round(t_comm * 1e3, 3)
            row["t_compute_ms"] = round(t_cmp * 1e3, 2)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    out = {
        "metric": "projected_scaling_efficiency_{}".format(cli.split),
        "value": (rows[-1].get("eff_ici_no_overlap")
                  if rows and cli.step_seconds else None),
        "unit": "fraction at S={}".format(rows[-1]["shards"]) if rows else "",
        "extras": {
            "nodes": cli.nodes, "degree": cli.degree, "split": cli.split,
            "t_steps": cli.t_steps, "layers": cli.layers,
            "feat_width": feat, "dtype": cli.dtype,
            "exchanges_per_step": n_exch,
            "step_seconds_1chip": cli.step_seconds,
            "ici_gbs": cli.ici_gbs, "dcn_gbs": cli.dcn_gbs,
            "rows": rows,
            "caveat": "projection from exact static byte counts + measured "
                      "single-chip compute; multi-chip hardware validation "
                      "pending",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
