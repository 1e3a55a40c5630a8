"""Weight-only quantized serving (ops/quantize.py wired into serving.py).

Reference counterpart: none (the reference has no serving path, SURVEY §2);
this asserts the accuracy bound the quantize module promises: weight-only
int8/bf16 preserves predictions to well under a percent relative error.
"""

import numpy as np
import pytest

from multistgraph_tpu.pipeline import run_model
from multistgraph_tpu.serving import PredictService


def _args(synthetic_dataset, tmp_path):
    return {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "serveq",
        "max_epoch": 1,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 8, "embed_dim_node": 3, "embed_dim_adj": 3,
        "use_early_stop": False, "load_best_epoch": False, "seed": 0,
        "tensorboard": False,
    }


@pytest.fixture(scope="module")
def experiment(synthetic_dataset, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serving_q")
    args = _args(synthetic_dataset, tmp_path)
    run_model("traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args)
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset

    dataset = get_dataset(load_config(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args))
    _, _, test_loader = dataset.get_data()
    return args, np.asarray(test_loader.x)


def _service(args, quantize):
    return PredictService.from_experiment(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
        other_args=args, max_batch=8, quantize=quantize)


def test_int8_predictions_within_a_percent(experiment):
    args, x = experiment
    y_full = _service(args, None).predict(x[:8])
    svc = _service(args, "int8")
    y_q = svc.predict(x[:8])
    assert y_q.shape == y_full.shape
    # accuracy bound promised by ops/quantize.py: relative L1 error of the
    # served predictions stays well under 1%
    rel = np.abs(y_q - y_full).mean() / max(np.abs(y_full).mean(), 1e-9)
    assert rel < 0.01, "int8 weight-only rel-L1 {:.4%} >= 1%".format(rel)
    assert svc.stats()["quantize"] == "int8"


def test_bf16_predictions_close(experiment):
    args, x = experiment
    y_full = _service(args, None).predict(x[:8])
    y_q = _service(args, "bfloat16").predict(x[:8])
    rel = np.abs(y_q - y_full).mean() / max(np.abs(y_full).mean(), 1e-9)
    assert rel < 0.01, "bf16 weight-only rel-L1 {:.4%} >= 1%".format(rel)


def test_quantized_param_bytes_shrink(experiment):
    args, _x = experiment
    full = _service(args, None).stats()["param_bytes"]
    q8 = _service(args, "int8").stats()["param_bytes"]
    qb = _service(args, "bfloat16").stats()["param_bytes"]
    # int8 stores large leaves at 1/4 (+ scales, + small f32 leaves)
    assert q8 < 0.5 * full
    assert qb <= 0.51 * full


def test_quantized_http_roundtrip(experiment):
    import json
    import threading
    import urllib.request

    from multistgraph_tpu.serving import make_server

    args, x = experiment
    server = make_server(_service(args, "int8"), port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:{}/predict".format(port),
            data=json.dumps({"x": x[:2].tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        assert out["shape"][0] == 2
        with urllib.request.urlopen(
                "http://127.0.0.1:{}/health".format(port), timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["quantize"] == "int8"
    finally:
        server.shutdown()
