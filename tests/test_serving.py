"""Serving subsystem: bucketed predict service + HTTP endpoint.

Reference counterpart: none (the reference's train=False path only re-runs
offline evaluation, libcity/pipeline/pipeline.py:55-60); this is the
TPU-native deployment surface (multistgraph_tpu/serving.py).
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from multistgraph_tpu.pipeline import run_model
from multistgraph_tpu.serving import PredictService, make_server


def _args(synthetic_dataset, tmp_path):
    return {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "serve",
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
def trained(synthetic_dataset, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serving")
    args = _args(synthetic_dataset, tmp_path)
    run_model("traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args)
    service = PredictService.from_experiment(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
        other_args=args, max_batch=8)
    # an input window straight from the dataset's own windowing
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset

    dataset = get_dataset(load_config(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args))
    _, _, test_loader = dataset.get_data()
    return service, np.asarray(test_loader.x)


def test_predict_shapes_and_padding(trained):
    service, x = trained
    # batch of 3 pads to bucket 4; pad rows must not leak into the output
    y3 = service.predict(x[:3])
    assert y3.shape[0] == 3 and y3.shape[1] == 3
    y1 = service.predict(x[:1])
    np.testing.assert_allclose(y1[0], y3[0], rtol=1e-5, atol=1e-5)
    assert service._compiled  # bucket programs were compiled and cached
    assert sorted(service._compiled) == [1, 4]


def test_predict_chunks_large_batches(trained):
    service, x = trained
    n = min(len(x), 11)  # > max_batch=8 forces chunking
    y = service.predict(x[:n])
    assert y.shape[0] == n
    y_again = service.predict(x[:n])
    np.testing.assert_allclose(y, y_again, rtol=0, atol=0)


def test_predict_is_group_destandardized_and_nonnegative(trained):
    service, x = trained
    y = service.predict(x[:4])
    assert (y >= 0).all()
    # group destandardization must be active for this groupstd experiment
    assert service.stats()["group_destandardize"] is True


def test_rejects_bad_rank(trained):
    service, x = trained
    with pytest.raises(ValueError, match="expected"):
        service.predict(x[0])


def test_http_roundtrip(trained):
    service, x = trained
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address
        with urllib.request.urlopen(
                "http://{}:{}/health".format(host, port), timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        body = json.dumps({"x": x[:2].tolist()}).encode()
        req = urllib.request.Request(
            "http://{}:{}/predict".format(host, port), data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            reply = json.loads(r.read())
        got = np.asarray(reply["prediction"], np.float32)
        want = service.predict(x[:2])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        # malformed request -> 400 with an error message, server survives
        bad = urllib.request.Request(
            "http://{}:{}/predict".format(host, port), data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad, timeout=30)
        assert err.value.code == 400
    finally:
        server.shutdown()


def test_serves_sparse_graph_model(rng):
    """PredictService is model-agnostic: a SparseATGCN (whose variables
    carry a non-trainable 'graph' collection, models/sparse_atgcn.py:137)
    serves through the same bucketed predict path — the whole variable
    dict rides self.params into model.apply. This is the 50k-1M-node
    serving surface (BASELINE configs 4-5)."""
    import jax

    from multistgraph_tpu.data.scalers import NoneScaler
    from multistgraph_tpu.models.sparse_atgcn import (
        build_sparse_atgcn, init_with_graph)
    from multistgraph_tpu.ops import bsr

    n_pad = 256
    dense = (rng.uniform(size=(n_pad, n_pad)) < 0.05).astype(np.float32)
    graph = bsr.bsr_from_dense(dense, block=128)
    cfg = {"output_window": 3, "output_dim": 1, "rnn_units": 8,
           "num_layers": 1, "embed_dim_adj": 4, "adpadj": "none"}
    model = build_sparse_atgcn(graph, cfg, interpret=True)
    x0 = np.zeros((1, 4, n_pad, 1), np.float32)
    variables = init_with_graph(model, jax.random.PRNGKey(0), x0)

    service = PredictService(model, variables, NoneScaler(), max_batch=4)
    x = rng.normal(size=(3, 4, n_pad, 1)).astype(np.float32)
    out = service.predict(x)
    assert out.shape == (3, 3, n_pad, 1)
    assert np.isfinite(out).all()
