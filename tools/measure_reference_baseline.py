"""Measure the reference PyTorch implementation's training throughput.

Imports the reference from /root/reference at run time (read-only oracle; no
code is copied) and times optimizer steps on the DC-237-shaped workload the
bench uses: full multi-view graph + bidirectional adaptive adjacency + static
features, batch 16, 96-step multi-head input, 24-step horizon. Writes
BASELINE_MEASURED.json consumed by bench.py's vs_baseline field.

The reference repo has no committed benchmark numbers (BASELINE.md) and its
original hardware (Colab-class GPU) is unavailable here, so the measured
baseline is the reference running on this host's CPU via its native torch
path — the only hardware both stacks share.
"""

import json
import os
import platform
import sys
import time

import numpy as np

REFERENCE_PATH = "/root/reference"
N, B, TIN, TOUT = 237, 16, 24, 24
NUM_TRAIN_BATCHES = 128  # DC-sized: ~151 days hourly -> ~2050 train samples / 16


def build_reference_model(torch):
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from libcity.model.traffic_flow_prediction.MultiATGCN import MultiATGCN as TorchModel
    finally:
        sys.path.pop(0)
    import pandas as pd

    rng = np.random.default_rng(0)
    adj = np.abs(rng.normal(size=(N, N))).astype(np.float32)
    np.fill_diagonal(adj, rng.uniform(2, 4, N))
    geo = pd.DataFrame(
        {
            "geo_id": np.arange(N),
            "type": "Point",
            "coordinates": [
                "[{:.5f}, {:.5f}]".format(-77 + 0.001 * i, 38.9 + 0.0008 * i) for i in range(N)
            ],
        }
    )

    class _Scaler:
        def inverse_transform(self, x):
            return x * 2.0 + 1.0

    config = {
        "input_window": TIN, "output_window": TOUT, "start_dim": 0, "end_dim": 1,
        "rnn_units": 64, "num_layers": 2, "cheb_order": 2,
        "embed_dim_node": 20, "embed_dim_adj": 20,
        "adjtype": "multi", "adpadj": "bidirection",
        "add_time_in_day": True, "add_day_in_week": False, "load_dynamic": False,
        "gcn_off": False, "fnn_off": False, "node_specific_off": False,
        "batch_size": B, "device": torch.device("cpu"),
    }
    data_feature = {
        # >= embed_dim_node feature columns: torch.pca_lowrank requires
        # q <= n_features (the real .static has ~24 socioeconomic+POI columns)
        "num_nodes": N, "adj_mx": adj, "static": rng.normal(size=(N, 24)),
        "coordinate": geo, "ext_dim": 1, "output_dim": 1,
        "len_closeness": 2 * TIN, "len_period": TIN, "len_trend": TIN,
        "scaler": _Scaler(),
    }
    return TorchModel(config, data_feature)


def main():
    import torch

    torch.manual_seed(0)
    model = build_reference_model(torch)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=3e-3)
    rng = np.random.default_rng(1)
    x = torch.tensor(rng.normal(size=(B, 4 * TIN, N, 2)).astype(np.float32))
    y = torch.tensor(np.abs(rng.normal(size=(B, TOUT, N, 2))).astype(np.float32))
    batch = {"X": x, "y": y}

    # warmup
    for _ in range(2):
        optimizer.zero_grad()
        loss = model.calculate_loss(batch)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5)
        optimizer.step()

    steps = 5
    t0 = time.time()
    for _ in range(steps):
        optimizer.zero_grad()
        loss = model.calculate_loss(batch)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5)
        optimizer.step()
    per_step = (time.time() - t0) / steps

    blob = {
        "reference_step_seconds": per_step,
        "reference_epoch_seconds": per_step * NUM_TRAIN_BATCHES,
        "reference_epochs_per_hour": 3600.0 / (per_step * NUM_TRAIN_BATCHES),
        "num_train_batches": NUM_TRAIN_BATCHES,
        "workload": "DC-237 multi-view, B=16, 96-step MTH input, 24h horizon",
        "hardware": "host CPU ({}), torch {}".format(platform.processor() or "unknown", torch.__version__),
        "note": "reference repo commits no benchmark numbers; this is the reference "
                "implementation measured on the shared host CPU",
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob, indent=2))


if __name__ == "__main__":
    main()
