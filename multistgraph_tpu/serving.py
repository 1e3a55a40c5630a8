"""Production serving for trained models: micro-batched JIT predict + HTTP.

The reference stack has no serving path (its `train=False` mode only re-runs
offline evaluation, libcity/pipeline/pipeline.py:55-60); on TPU a trained
model is deployable directly: one compiled predict program per batch bucket,
device-resident parameters, inverse-transformed outputs.

Design points (TPU-first):
  * **Bucketed batching** — XLA programs have static shapes, so arbitrary
    request sizes would recompile. Requests are right-padded to the next
    power-of-two batch (compiled lazily, cached per bucket) and the pad rows
    are sliced off the reply.
  * **Model-space in, measurement-space out** — inputs are windowed feature
    tensors exactly as the data layer produces them (B, T, N, F); outputs are
    scaler-inverse-transformed predictions (B, Tout, N, D), i.e. the same
    quantity `executor.evaluate` feeds the evaluator, plus optional
    group de-z-scoring (the reference's headline metric space,
    traffic_state_executor.py:292-322).
  * **Stateless HTTP front** — a stdlib ThreadingHTTPServer JSON endpoint
    (`POST /predict`, `GET /health`); concurrent requests serialize through
    the device queue, which is the correct behavior for a single chip.

Usage:
    service = PredictService.from_experiment(
        "traffic_state_pred", "MultiATGCN", "SYN_DC", other_args={...})
    y = service.predict(x)                      # numpy in/out
    serve(service, port=8800)                   # blocking HTTP server
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp


class PredictService:
    """Wraps a trained model + scaler into a padded, bucketed predict call."""

    def __init__(self, model, params, scaler, max_batch: int = 64,
                 ct_visit_mstd=None, clip_negative: bool = True,
                 quantize: str = None):
        """quantize: None | 'int8' | 'bfloat16' — weight-only quantization of
        the trainable parameters (ops/quantize.py). Weights are STORED
        quantized and dequantized inside the jitted predict program, so the
        HBM parameter stream shrinks 4x/2x; graph arrays and activations are
        untouched. tests/test_serving_quantized.py asserts the accuracy
        bound; measured latency delta in docs/DESIGN.md §9."""
        self.model = model
        self.quantize = quantize
        if quantize:
            from multistgraph_tpu.ops.quantize import quantize_params

            params = dict(params)
            params["params"] = quantize_params(params["params"], mode=quantize)
        self.params = params
        self.scaler = scaler
        self.max_batch = max_batch
        self.clip_negative = clip_negative
        # per-node (mean, std) frame for group de-z-scoring, or None
        self._group_mstd = None
        if ct_visit_mstd is not None:
            self._group_mstd = (
                np.asarray(ct_visit_mstd["All_m"], np.float32),
                np.asarray(ct_visit_mstd["All_std"], np.float32),
            )
        self._compiled = {}
        self._lock = threading.Lock()
        self.requests_served = 0

    # -------------------------------------------------------------- factory
    @classmethod
    def from_experiment(cls, task, model_name, dataset_name, config_file=None,
                        other_args=None, max_batch: int = 64,
                        quantize: str = None):
        """Rebuild the experiment's model and load its trained weights from
        the standard cache location (outputs/<exp_id>/model_cache/...m)."""
        from multistgraph_tpu.config import load_config
        from multistgraph_tpu.data import get_dataset
        from multistgraph_tpu.executor.executor import get_executor
        from multistgraph_tpu.models import get_model

        config = load_config(task, model_name, dataset_name, config_file,
                             saved_model=True, train=False,
                             other_args=other_args)
        dataset = get_dataset(config)
        dataset.get_data()  # dataset npz cache makes this cheap on re-load
        feature = dataset.get_data_feature()
        model = get_model(config, feature)
        executor = get_executor(config, model, feature)
        import os

        cache = os.path.join(
            config.get("output_dir", "./outputs"), str(config.get("exp_id")),
            "model_cache", "{}_{}.m".format(model_name, dataset_name))
        executor.load_model(cache)
        return cls(model, executor.params, feature.get("scaler"),
                   max_batch=max_batch,
                   ct_visit_mstd=feature.get("ct_visit_mstd")
                   if config.get("groupstd", False) else None,
                   quantize=quantize)

    # -------------------------------------------------------------- predict
    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _fn_for(self, bucket: int):
        with self._lock:
            fn = self._compiled.get(bucket)
            if fn is None:
                if self.quantize:
                    from multistgraph_tpu.ops.quantize import dequantize_params

                    def apply(params, x):
                        # dequant INSIDE the jit: the HBM read stays int8/
                        # bf16 and the convert fuses into the consumers
                        full = {**params,
                                "params": dequantize_params(params["params"])}
                        return self.model.apply(full, x, train=False)
                else:
                    def apply(params, x):
                        return self.model.apply(params, x, train=False)
                fn = jax.jit(apply)
                self._compiled[bucket] = fn
        return fn

    def predict(self, x: np.ndarray) -> np.ndarray:
        """x: (B, T, N, F) model-space windows; returns (B, Tout, N, D)
        inverse-transformed predictions. B may be anything; requests larger
        than max_batch are chunked."""
        x = np.asarray(x, np.float32)
        if x.ndim != 4:
            raise ValueError("expected (batch, time, nodes, features), got %r"
                             % (x.shape,))
        outs = []
        for lo in range(0, len(x), self.max_batch):
            outs.append(self._predict_chunk(x[lo:lo + self.max_batch]))
        self.requests_served += 1
        return np.concatenate(outs, axis=0)

    def _predict_chunk(self, x: np.ndarray) -> np.ndarray:
        n = len(x)
        bucket = self._bucket(n)
        if n < bucket:
            x = np.concatenate(
                [x, np.repeat(x[-1:], bucket - n, axis=0)], axis=0)
        pred = self._fn_for(bucket)(self.params, jnp.asarray(x))
        pred = self.scaler.inverse_transform(pred)
        out = np.asarray(pred[:n])
        if self._group_mstd is not None:
            m, s = self._group_mstd
            out = out * s[None, None, :, None] + m[None, None, :, None]
        if self.clip_negative:
            out = np.maximum(out, 0.0)
        return out

    def stats(self) -> dict:
        from multistgraph_tpu.ops.quantize import quantized_nbytes

        return {
            "requests_served": self.requests_served,
            "compiled_buckets": sorted(self._compiled),
            "max_batch": self.max_batch,
            "device": jax.devices()[0].platform,
            "group_destandardize": self._group_mstd is not None,
            "quantize": self.quantize,
            "param_bytes": quantized_nbytes(self.params.get("params", {})),
        }


class _Handler(BaseHTTPRequestHandler):
    service = None  # injected by serve()

    def _reply(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            self._reply(200, dict(self.service.stats(), status="ok"))
        else:
            self._reply(404, {"error": "unknown path %s" % self.path})

    def do_POST(self):
        if self.path != "/predict":
            self._reply(404, {"error": "unknown path %s" % self.path})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            x = np.asarray(req["x"], np.float32)
            y = self.service.predict(x)
            self._reply(200, {"prediction": y.tolist(),
                              "shape": list(y.shape)})
        except Exception as exc:  # noqa: BLE001 — report, don't kill the server
            self._reply(400, {"error": str(exc)})

    def log_message(self, fmt, *args):  # quiet by default
        pass


def make_server(service: PredictService, port: int = 0,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Build (without blocking) an HTTP server bound to the service; port=0
    picks a free port (server.server_address[1])."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve(service: PredictService, port: int = 8800, host: str = "0.0.0.0"):
    """Blocking HTTP server: POST /predict {"x": [...]}, GET /health."""
    server = make_server(service, port, host)
    print("serving on {}:{}".format(*server.server_address), flush=True)
    server.serve_forever()
