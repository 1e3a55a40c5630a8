"""Per-horizon metric accumulation + result artifacts.

Reference: libcity/evaluator/traffic_state_evaluator.py:11-174. Metric math
comes from ops/losses (jnp, device-side); accumulation and CSV/JSON artifacts
are host-side like the reference.
"""

import datetime
import json
import os
from typing import Dict

import jax.numpy as jnp
import pandas as pd

from multistgraph_tpu.ops import losses
from multistgraph_tpu.utils import ensure_dir, get_logger

ALLOWED_METRICS = [
    "MAE", "MSE", "RMSE", "MAPE",
    "masked_MAE", "masked_MSE", "masked_RMSE", "masked_MAPE",
    "R2", "EVAR",
]

NAN = float("nan")


def _metric_value(metric: str, y_pred, y_true, min_s: float) -> float:
    if metric == "masked_MAE":
        return float(losses.masked_mae(y_pred, y_true, 0.0, min_s=min_s))
    if metric == "masked_MSE":
        return float(losses.masked_mse(y_pred, y_true, 0.0, min_s=min_s))
    if metric == "masked_RMSE":
        return float(losses.masked_rmse(y_pred, y_true, 0.0, min_s=min_s))
    if metric == "masked_MAPE":
        return float(losses.masked_mape(y_pred, y_true, 0.0, min_s=min_s))
    if metric == "MAE":
        return float(losses.masked_mae(y_pred, y_true, NAN))
    if metric == "MSE":
        return float(losses.masked_mse(y_pred, y_true, NAN))
    if metric == "RMSE":
        return float(losses.masked_rmse(y_pred, y_true, NAN))
    if metric == "MAPE":
        return float(losses.masked_mape(y_pred, y_true, NAN))
    if metric == "R2":
        return float(losses.r2_score(y_pred, y_true))
    if metric == "EVAR":
        return float(losses.explained_variance_score(y_pred, y_true))
    raise ValueError(metric)


class TrafficStateEvaluator:
    def __init__(self, config):
        self.metrics = config.get("metrics", ["MAE"])
        self.save_modes = config.get("save_mode", ["csv", "json"])
        self.mode = config.get("evaluator_mode", "single")
        self.config = config
        self.min_s = config.get("min_s", 1e-4)
        self.len_timeslots = 0
        self.result: Dict[str, float] = {}
        self.intermediate_result: Dict[str, list] = {}
        self._check_config()
        self._logger = get_logger(name="multistgraph_tpu.evaluator")

    def _check_config(self):
        if not isinstance(self.metrics, list):
            raise TypeError("Evaluator type is not list")
        for metric in self.metrics:
            if metric not in ALLOWED_METRICS:
                raise ValueError(
                    "the metric {} is not allowed in TrafficStateEvaluator".format(metric)
                )

    def collect(self, batch: Dict):
        if not isinstance(batch, dict):
            raise TypeError("evaluator.collect input is not a dict of user")
        y_true = jnp.asarray(batch["y_true"])
        y_pred = jnp.asarray(batch["y_pred"])
        if y_true.shape != y_pred.shape:
            raise ValueError("batch['y_true'].shape is not equal to batch['y_pred'].shape")
        self.len_timeslots = int(y_true.shape[1])
        for i in range(1, self.len_timeslots + 1):
            for metric in self.metrics:
                self.intermediate_result.setdefault("{}@{}".format(metric, i), [])
        mode = self.mode.lower()
        if mode not in ("single", "average"):
            raise ValueError(
                "Error parameter evaluator_mode={}, please set `single` or `average`.".format(self.mode)
            )
        for i in range(1, self.len_timeslots + 1):
            pred_i = y_pred[:, :i] if mode == "average" else y_pred[:, i - 1]
            true_i = y_true[:, :i] if mode == "average" else y_true[:, i - 1]
            for metric in self.metrics:
                self.intermediate_result["{}@{}".format(metric, i)].append(
                    _metric_value(metric, pred_i, true_i, self.min_s)
                )

    def evaluate(self) -> Dict[str, float]:
        for i in range(1, self.len_timeslots + 1):
            for metric in self.metrics:
                key = "{}@{}".format(metric, i)
                self.result[key] = sum(self.intermediate_result[key]) / len(
                    self.intermediate_result[key]
                )
        return self.result

    def save_result(self, save_path: str, filename: str = None) -> pd.DataFrame:
        self._logger.info("Note that you select the %s mode to evaluate!", self.mode)
        self.evaluate()
        ensure_dir(save_path)
        if filename is None:
            filename = "{}_{}_{}".format(
                datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S"),
                self.config.get("model", ""),
                self.config.get("dataset", ""),
            )
        if "json" in self.save_modes:
            self._logger.info("Evaluate result is %s", json.dumps(self.result))
            with open(os.path.join(save_path, filename + ".json"), "w") as f:
                json.dump(self.result, f)
        dataframe = {}
        if "csv" in self.save_modes:
            for metric in self.metrics:
                dataframe[metric] = [
                    self.result["{}@{}".format(metric, i)]
                    for i in range(1, self.len_timeslots + 1)
                ]
            dataframe = pd.DataFrame(dataframe, index=range(1, self.len_timeslots + 1))
            dataframe.to_csv(os.path.join(save_path, filename + ".csv"), index=False)
            summary_cols = [c for c in ["MAE", "masked_MAE", "masked_MAPE", "masked_RMSE"] if c in dataframe]
            if summary_cols:
                self._logger.info("\n%s", dataframe[summary_cols])
                self._logger.info("\n%s", dataframe[summary_cols].mean())
        return dataframe

    def clear(self):
        self.result = {}
        self.intermediate_result = {}


def evaluate_model(y_pred, y_true, metrics, mode="single", path="metrics.csv"):
    """Standalone per-horizon evaluation over prediction/truth arrays.

    Reference: libcity/evaluator/utils.py:81-157 (`evaluate_model`) — the
    offline counterpart to TrafficStateEvaluator: one row per horizon step,
    one column per metric, written to `path` and returned as a DataFrame.
    Masked metrics use null_val=0; all metrics apply the reference's default
    min_s=1e-4 label thresholding (loss.py:17-90 signature defaults).
    """
    y_pred = jnp.asarray(y_pred)
    y_true = jnp.asarray(y_true)
    if y_true.shape != y_pred.shape:
        raise ValueError("y_true.shape is not equal to y_pred.shape")
    mode = mode.lower()
    if mode not in ("single", "average"):
        raise ValueError(
            "Error parameter mode={}, please set `single` or `average`.".format(mode)
        )
    for metric in metrics:
        if metric not in ALLOWED_METRICS:
            raise ValueError("Error parameter metric={}!".format(metric))
    rows = []
    for i in range(1, int(y_true.shape[1]) + 1):
        pred_i = y_pred[:, :i] if mode == "average" else y_pred[:, i - 1]
        true_i = y_true[:, :i] if mode == "average" else y_true[:, i - 1]
        rows.append(
            {m: _metric_value(m, pred_i, true_i, 1e-4) for m in metrics}
        )
    df = pd.DataFrame(rows, columns=metrics)
    if path:
        df.to_csv(path)
    return df


EVALUATOR_REGISTRY = {"TrafficStateEvaluator": TrafficStateEvaluator}


def get_evaluator(config):
    name = config.get("evaluator", "TrafficStateEvaluator")
    if name not in EVALUATOR_REGISTRY:
        raise AttributeError("evaluator {} is not registered".format(name))
    return EVALUATOR_REGISTRY[name](config)
