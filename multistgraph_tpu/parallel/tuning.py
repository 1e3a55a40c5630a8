"""Hyperparameter search: sampling + model-based search + trial schedulers.

Capability-parity replacement for the reference's Ray Tune / hyperopt layer
(ref: libcity/pipeline/pipeline.py:65-230, libcity/executor/hyper_tuning.py:109-233)
without rebuilding Ray (SURVEY.md §7.4.8): trials are independent processes or
in-process runs (the default — in-process sequential trials let the remote
compile service dedupe identical programs across trials); schedulers:

  * 'fifo'   — every trial runs max_epoch epochs;
  * 'asha'   — synchronous successive halving: rungs of increasing epoch
    budgets, top 1/eta of trials promoted per rung, each promoted trial
    RESUMING from its own rung-best checkpoint via the executor's
    config['epoch'] resume path (ray ASHAScheduler + per-epoch tune
    checkpoints, ref traffic_state_executor.py:368-374, pipeline.py:221-230);
  * 'median' — MedianStoppingRule (ref pipeline.py:210-211): a trial is
    stopped once its running-best validation loss falls behind the median of
    prior trials' running-best at the same epoch (sequential trials only).

Search modes: 'grid' / 'random' / 'exhaustive' point sampling, 'tpe'
(hyperopt-TPE-class density-ratio search), 'atpe' (hyperopt's adaptive TPE:
the sampler's own hyperparameters track the trial history), 'bayes'
(BayesOptSearch-class GP expected-improvement, ref pipeline.py:196-201).

Search-space DSLs:
  * JSON dict (ref pipeline.py:65-116):
      {param: {"type": "uniform"|"randn"|"randint"|"quniform"|"loguniform"|
               "choice"|"grid_search", ...}}
  * line file (ref hyper_tuning.py:159-185): `name type values` rows, e.g.
      learning_rate uniform 0.0005,0.005
      rnn_units choice [32,64,128]
    parsed by parse_space_file.
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
        elif kind == "quniform":
            if any(k not in spec for k in ("lower", "upper", "q")):
                raise SearchSpaceError("quniform %s needs lower/upper/q" % name)
        elif kind == "loguniform":
            # hyperopt semantics: value = exp(uniform(lower, upper)),
            # i.e. lower/upper are in LOG space (ref hyper_tuning.py:177-179)
            if "lower" not in spec or "upper" not in spec:
                raise SearchSpaceError("loguniform %s needs lower/upper" % name)
        elif kind in ("choice", "grid_search"):
            if "list" not in spec:
                raise SearchSpaceError("%s %s needs list" % (kind, name))
        else:
            raise SearchSpaceError("Unsupported type %s for %s" % (kind, name))
    return space


def parse_space_file(path: str) -> Dict[str, Dict]:
    """The reference's line-based space DSL (ref hyper_tuning.py:159-185):
    `name type values` rows; choice takes a python-literal list, uniform and
    loguniform take `low,high`, quniform takes `low,high,q`. Unknown types
    raise, blank/short lines are skipped (same tolerance as the reference)."""
    import ast

    space: Dict[str, Dict] = {}
    with open(path) as fp:
        for line in fp:
            parts = line.strip().split(" ")
            if len(parts) < 3:
                continue
            name, kind, value = parts[0], parts[1], "".join(parts[2:])
            if kind == "choice":
                space[name] = {"type": "choice", "list": list(ast.literal_eval(value))}
            elif kind == "uniform":
                low, high = value.split(",")
                space[name] = {"type": "uniform", "lower": float(low), "upper": float(high)}
            elif kind == "quniform":
                low, high, q = value.split(",")
                space[name] = {"type": "quniform", "lower": float(low),
                               "upper": float(high), "q": float(q)}
            elif kind == "loguniform":
                low, high = value.split(",")
                space[name] = {"type": "loguniform", "lower": float(low), "upper": float(high)}
            else:
                raise SearchSpaceError("Illegal parameter type [{}]".format(kind))
    return space


def _draw_spec(spec: Dict, rng) -> Any:
    """One prior draw from a validated spec."""
    kind = spec["type"]
    if kind == "uniform":
        return float(rng.uniform(spec["lower"], spec["upper"]))
    if kind == "randn":
        return float(rng.normal(spec["mean"], spec["sd"]))
    if kind == "randint":
        return int(rng.integers(spec["lower"], spec["upper"]))
    if kind == "quniform":
        v = rng.uniform(spec["lower"], spec["upper"])
        return float(np.round(v / spec["q"]) * spec["q"])
    if kind == "loguniform":
        return float(np.exp(rng.uniform(spec["lower"], spec["upper"])))
    return spec["list"][int(rng.integers(len(spec["list"])))]


def sample_configurations(
    space: Dict[str, Dict], mode: str, num_samples: int, seed: int = 0
) -> List[Dict[str, Any]]:
    """'grid': cartesian product over grid/choice + point samples for others;
    'random': num_samples independent draws."""
    rng = np.random.default_rng(seed)

    draw = lambda spec: _draw_spec(spec, rng)  # noqa: E731

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
    if mode == "exhaustive":
        return _exhaustive_configurations(space, num_samples, rng)
    raise SearchSpaceError("mode must be 'grid', 'random', or 'exhaustive'")


def _exhaustive_configurations(
    space: Dict[str, Dict],
    num_samples: int,
    rng: np.random.Generator,
    max_successive_failures: int = 1000,
) -> List[Dict[str, Any]]:
    """The reference's hyperopt 'exhaustive_search' algorithm (ref
    libcity/executor/hyper_tuning.py:68-106): draw random points, reject any
    whose hashed parameter assignment was already produced, and stop early —
    returning fewer than num_samples — after max_successive_failures
    consecutive duplicates (the space is then considered exhausted). On a
    purely discrete space this enumerates it in random order without repeats;
    continuous dimensions effectively never collide."""
    seen = set()
    configs: List[Dict[str, Any]] = []
    failures = 0
    while len(configs) < num_samples:
        cfg = {k: _draw_spec(s, rng) for k, s in space.items()}
        key = hash(frozenset((k, repr(v)) for k, v in cfg.items()))
        if key in seen:
            failures += 1
            if failures > max_successive_failures:
                break
            continue
        failures = 0
        seen.add(key)
        configs.append(cfg)
    return configs


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
        return _draw_spec(spec, self.rng)

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
                bad = np.array([self.history[i][name] for i in bad_idx], dtype=float)
                cand = np.clip(
                    np.round(self.rng.normal(good.mean(), good.std() + 1.0, self.n_candidates)),
                    spec["lower"], spec["upper"] - 1,
                ).astype(int)
                # score candidates by the good/bad density ratio, same as the
                # continuous branch (a smoothed count ratio over the drawn set)
                def ratio(v):
                    h = good.std() + 1.0
                    lg = np.exp(-0.5 * ((v - good) / h) ** 2).sum() + 1e-12
                    lb = np.exp(-0.5 * ((v - bad) / h) ** 2).sum() + 1e-12
                    return lg / lb
                out[name] = int(cand[int(np.argmax([ratio(v) for v in cand]))])
            else:
                log_space = kind == "loguniform"
                to_internal = (lambda v: np.log(v)) if log_space else (lambda v: v)
                good = to_internal(
                    np.array([self.history[i][name] for i in good_idx], dtype=float)
                )
                bad = to_internal(
                    np.array([self.history[i][name] for i in bad_idx], dtype=float)
                )
                if kind in ("uniform", "quniform", "loguniform"):
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
                    to_internal(
                        np.array([self._draw(spec) for _ in range(n_prior)], dtype=float)
                    ),
                ])
                if kind in ("uniform", "quniform", "loguniform"):
                    cands = np.clip(cands, spec["lower"], spec["upper"])

                def kde(pts, x):
                    h = pts.std() + 1e-6
                    return np.exp(-0.5 * ((x[:, None] - pts[None, :]) / h) ** 2).sum(axis=1) / (
                        len(pts) * h
                    )

                score = kde(good, cands) / (kde(bad, cands) + 1e-12)
                best = float(cands[int(np.argmax(score))])
                if log_space:
                    best = float(np.exp(best))
                elif kind == "quniform":
                    best = float(np.round(best / spec["q"]) * spec["q"])
                out[name] = best
        return out


class ATPESampler(TPESampler):
    """Adaptive TPE (hyperopt's 'atpe' capability, ref
    libcity/executor/hyper_tuning.py:109-233 mode dispatch).

    Like hyperopt's ATPE, the sampler's own hyperparameters adapt to the
    trial history instead of staying fixed: the good-group size follows
    hyperopt's ceil(gamma * sqrt(n)) rule (capped at 25) so the elite set
    grows sublinearly, and the candidate pool grows with log2(n) so later
    proposals search the density ratio more finely once the surrogate has
    signal. With few observations it behaves exactly like TPE's prior draws.
    """

    def __init__(self, space: Dict[str, Dict], seed: int = 0, gamma: float = 0.25,
                 n_candidates: int = 24):
        super().__init__(space, seed=seed, gamma=gamma, n_candidates=n_candidates)
        self._base_gamma = gamma
        self._base_candidates = n_candidates

    def suggest(self) -> Dict[str, Any]:
        n = len(self.losses)
        if n >= 4:
            n_good = min(int(np.ceil(self._base_gamma * np.sqrt(n))), 25)
            # TPESampler.suggest derives the split as ceil(gamma*n): express
            # the adaptive elite count through an equivalent effective gamma.
            self.gamma = max(n_good - 0.5, 0.5) / n
            self.n_candidates = int(self._base_candidates * (1 + np.log2(n)))
        return super().suggest()


class GPEISampler:
    """Gaussian-process expected-improvement search (Ray BayesOptSearch
    capability class, ref pipeline.py:196-201).

    Continuous dims are normalized to [0,1] (log-warped for loguniform); an
    RBF-kernel GP is fit on observed (params, loss) pairs and the next point
    maximizes EI over a random candidate set. Categorical dims fall back to
    prior draws (BayesOpt proper is continuous-only, as in Ray).
    """

    def __init__(self, space: Dict[str, Dict], seed: int = 0, n_candidates: int = 256,
                 xi: float = 0.01, length_scale: float = 0.2):
        self.space = space
        self.rng = np.random.default_rng(seed)
        self.n_candidates = n_candidates
        self.xi = xi
        self.ls = length_scale
        self.cont = [k for k, s in space.items()
                     if s["type"] in ("uniform", "quniform", "loguniform", "randn", "randint")]
        self.history: List[Dict[str, Any]] = []
        self.losses: List[float] = []

    def observe(self, params: Dict[str, Any], loss: float) -> None:
        self.history.append(params)
        self.losses.append(float(loss))

    def _bounds(self, spec):
        # loguniform lower/upper are ALREADY log-space (hyperopt semantics,
        # see parse_search_space) — the GP works in that space directly and
        # _normalize/_denormalize log/exp the VALUES, not the bounds.
        kind = spec["type"]
        if kind in ("uniform", "quniform", "loguniform"):
            return spec["lower"], spec["upper"]
        if kind == "randint":
            return spec["lower"], spec["upper"] - 1
        return spec["mean"] - 3 * spec["sd"], spec["mean"] + 3 * spec["sd"]

    def _normalize(self, name, value):
        spec = self.space[name]
        lo, hi = self._bounds(spec)
        v = np.log(value) if spec["type"] == "loguniform" else value
        return (v - lo) / max(hi - lo, 1e-12)

    def _denormalize(self, name, unit):
        spec = self.space[name]
        lo, hi = self._bounds(spec)
        v = lo + unit * (hi - lo)
        kind = spec["type"]
        if kind == "loguniform":
            return float(np.exp(v))
        if kind == "randint":
            return int(np.clip(np.round(v), spec["lower"], spec["upper"] - 1))
        if kind == "quniform":
            return float(np.round(v / spec["q"]) * spec["q"])
        return float(v)

    def suggest(self) -> Dict[str, Any]:
        out = {k: _draw_spec(s, self.rng) for k, s in self.space.items()}
        if len(self.losses) < 3 or not self.cont:
            return out
        xs = np.array(
            [[self._normalize(k, h[k]) for k in self.cont] for h in self.history]
        )  # (n, d)
        ys = np.array(self.losses)
        y_mu, y_sd = ys.mean(), ys.std() + 1e-9
        ys_n = (ys - y_mu) / y_sd

        def kernel(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return np.exp(-0.5 * d2 / self.ls**2)

        k_xx = kernel(xs, xs) + 1e-4 * np.eye(len(xs))
        alpha = np.linalg.solve(k_xx, ys_n)
        cands = self.rng.uniform(0, 1, size=(self.n_candidates, len(self.cont)))
        k_sx = kernel(cands, xs)
        mu = k_sx @ alpha
        var = np.maximum(1.0 - np.einsum("ij,jk,ik->i", k_sx, np.linalg.inv(k_xx), k_sx), 1e-9)
        sd = np.sqrt(var)
        best = ys_n.min()
        z = (best - mu - self.xi) / sd
        # EI under a standard normal
        from math import erf, sqrt

        phi = np.exp(-0.5 * z**2) / np.sqrt(2 * np.pi)
        cdf = 0.5 * (1.0 + np.array([erf(v / sqrt(2.0)) for v in z]))
        ei = sd * (z * cdf + phi)
        pick = cands[int(np.argmax(ei))]
        for i, k in enumerate(self.cont):
            out[k] = self._denormalize(k, float(pick[i]))
        return out


@dataclass
class TrialResult:
    trial_id: int
    params: Dict[str, Any]
    val_loss: float
    epochs_run: int
    history: List[float] = field(default_factory=list)
    # (start_epoch, end_epoch_exclusive) per scheduler rung — start_epoch > 0
    # proves checkpoint resume rather than retraining from scratch
    rungs: List[tuple] = field(default_factory=list)
    best_epoch: int = 0


def _run_trial(payload, hook=None):
    """Worker: one training run; returns (trial_id, val_loss, history,
    best_epoch). `hook(trial_id, epoch, val) -> bool` may request an early
    stop (scheduler kill); only usable for in-process trials."""
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
        # resume from this trial's own per-epoch checkpoint — the exp_id is
        # stable across rungs, so the executor finds the file it saved
        # (executor.py:139-141, ref traffic_state_executor.py:368-374)
        config["epoch"] = resume_epoch
    set_random_seed(config.get("seed", 0))
    dataset = get_dataset(config)
    train_data, valid_data, _ = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    executor = get_executor(config, model, feature)
    history: List[float] = []

    def report(epoch, val, _ex):
        history.append(val)
        return hook(trial_id, epoch, val) if hook is not None else False

    executor.report_hook = report
    best = executor.train(train_data, valid_data)
    best_epoch = resume_epoch + int(np.argmin(history)) if history else resume_epoch
    return trial_id, float(best), history, best_epoch


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
    """Run the search; returns trial results sorted best-first.

    `space` may be a dict, a JSON path/string (parse_search_space), or a
    line-DSL file path (parse_space_file picks up `.txt`/non-JSON files).
    """
    if isinstance(space, str) and os.path.exists(space) and not space.endswith(".json"):
        try:
            parsed = parse_search_space(space)
        except (json.JSONDecodeError, SearchSpaceError):
            parsed = parse_search_space(parse_space_file(space))
    else:
        parsed = parse_search_space(space)

    if mode in ("tpe", "atpe", "bayes"):
        # Sequential model-based search: each next trial is proposed from the
        # surrogate fit on past trials (TPE: good/bad density ratio; atpe:
        # TPE with history-adaptive hyperparameters; bayes: GP expected
        # improvement). In-process so compiled programs are deduped across
        # trials by the compile service.
        sampler = {"tpe": TPESampler, "atpe": ATPESampler, "bayes": GPEISampler}[mode](
            parsed, seed=seed
        )
        results = {}
        for i in range(num_samples):
            params = sampler.suggest()
            _tid, best, history, best_epoch = _run_trial(
                (i, task, model_name, dataset_name, config_file, base_args,
                 params, max_epoch, 0)
            )
            sampler.observe(params, best)
            results[i] = TrialResult(
                trial_id=i, params=params, val_loss=float(best),
                epochs_run=max_epoch, history=history,
                rungs=[(0, max_epoch)], best_epoch=best_epoch,
            )
        return sorted(results.values(), key=lambda r: r.val_loss)

    configs = sample_configurations(parsed, mode, num_samples, seed)
    results = {
        i: TrialResult(trial_id=i, params=cfg, val_loss=float("inf"), epochs_run=0)
        for i, cfg in enumerate(configs)
    }

    def launch(trials, epochs, resume_epochs, hook=None):
        payloads = [
            (i, task, model_name, dataset_name, config_file, base_args,
             results[i].params, epochs, resume_epochs.get(i, 0))
            for i in trials
        ]
        if workers > 1 and hook is None:
            with ProcessPoolExecutor(max_workers=workers) as pool:
                outs = list(pool.map(_run_trial, payloads))
        else:
            outs = [_run_trial(p, hook=hook) for p in payloads]
        for trial_id, best, history, best_epoch in outs:
            start = resume_epochs.get(trial_id, 0)
            results[trial_id].val_loss = best
            results[trial_id].epochs_run = epochs
            results[trial_id].history.extend(history)
            results[trial_id].rungs.append((start, epochs))
            results[trial_id].best_epoch = best_epoch

    if scheduler == "fifo":
        launch(list(results), max_epoch, {})
    elif scheduler == "asha":
        # successive halving with CHECKPOINT RESUME: each promoted trial
        # continues from its own rung-best checkpoint instead of retraining
        # (ray ASHAScheduler + tune.checkpoint_dir capability,
        # ref traffic_state_executor.py:368-374, pipeline.py:221-230)
        alive = list(results)
        budget = min_epochs
        resume: Dict[int, int] = {}
        # resume requires per-epoch checkpoints on disk; without saved_model
        # fall back to rung-restart SHA (still correct, just re-trains)
        can_resume = (base_args or {}).get("saved_model", True)
        while alive:
            launch(alive, budget, resume)
            if budget >= max_epoch or len(alive) == 1:
                break
            ranked = sorted(alive, key=lambda i: results[i].val_loss)
            alive = ranked[: max(1, len(ranked) // eta)]
            if can_resume:
                resume = {i: results[i].best_epoch for i in alive}
            budget = min(budget * eta, max_epoch)
    elif scheduler == "median":
        # MedianStoppingRule (ref pipeline.py:210-211): kill a trial whose
        # running-best val loss is worse than the median of earlier trials'
        # running-best at the same epoch. Sequential by construction.
        finished_running_best: List[List[float]] = []

        def median_hook(trial_id, epoch, val):
            del trial_id
            results_running_best.append(
                min(results_running_best[-1], val) if results_running_best else val
            )
            if epoch < min_epochs or not finished_running_best:
                return False
            at_epoch = [rb[min(epoch, len(rb) - 1)] for rb in finished_running_best]
            return results_running_best[-1] > float(np.median(at_epoch))

        for i in list(results):
            results_running_best: List[float] = []
            launch([i], max_epoch, {}, hook=median_hook)
            hist = results[i].history
            rb, acc = [], float("inf")
            for v in hist:
                acc = min(acc, v)
                rb.append(acc)
            if rb:
                finished_running_best.append(rb)
    else:
        raise ValueError("scheduler must be 'fifo', 'asha' or 'median'")

    return sorted(results.values(), key=lambda r: r.val_loss)


def save_tuning_result(results: List[TrialResult], filename: str) -> None:
    """Human-readable search summary (ref hyper_tuning.py:187-198
    HyperTuning.save_result): best params + score, then every trial."""
    best = results[0]
    with open(filename, "w") as fp:
        fp.write("best params: {}\n".format(best.params))
        fp.write("best_valid_score: \n{}\n".format(best.val_loss))
        fp.write("-" * 76 + "\n")
        fp.write("All parameters tune and result: \n")
        for r in results:
            fp.write("{}\n".format(
                ", ".join("{}:{}".format(k, v) for k, v in r.params.items())
            ))
            fp.write("Valid result:\n{} (epochs {}, rungs {})\n".format(
                r.val_loss, r.epochs_run, r.rungs
            ))


def objective_function(
    task, model_name, dataset_name, config_file=None, base_args=None, hyper_config_dict=None,
    max_epoch=10,
):
    """Single-objective evaluation (ref pipeline.py:233-249): returns best val loss."""
    _, best, _, _ = _run_trial(
        (0, task, model_name, dataset_name, config_file, base_args,
         hyper_config_dict or {}, max_epoch, 0)
    )
    return best
