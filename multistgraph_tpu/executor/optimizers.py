"""Optimizer + LR-scheduler factories with torch-matching semantics.

Reference: libcity/executor/traffic_state_executor.py:140-198.

Design: the optimizer is an optax chain wrapped in ``inject_hyperparams`` so
the learning rate lives in the optimizer state; the scheduler is a host-side
object that computes the epoch's lr (torch schedulers step per epoch in the
reference, :356-360) which the executor injects before each epoch's jitted
steps. This reproduces every torch scheduler exactly — including
ReduceLROnPlateau, which needs validation feedback no pure schedule can see.

Torch-semantics notes:
  * Adam weight_decay is L2-added-to-gradient (not decoupled AdamW);
  * clip_grad_norm_ is global-norm clipping applied before the optimizer.
"""

import math
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class _AdagradTorchState(NamedTuple):
    sum_of_squares: optax.Updates


def _scale_by_adagrad_torch(eps: float) -> optax.GradientTransformation:
    """torch.optim.Adagrad denominator: g / (sqrt(sum g^2) + eps).

    optax.scale_by_rss puts eps INSIDE the rsqrt and zeroes the update while
    the accumulator is 0 — both differ from torch; verified step-for-step by
    tests/test_torch_training_parity.py::test_optimizer_step_parity_vs_torch.
    """

    def init_fn(params):
        return _AdagradTorchState(jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        sums = jax.tree_util.tree_map(lambda g, s: s + g * g, updates, state.sum_of_squares)
        updates = jax.tree_util.tree_map(lambda g, s: g / (jnp.sqrt(s) + eps), updates, sums)
        return updates, _AdagradTorchState(sums)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config) -> optax.GradientTransformation:
    learner = str(config.get("learner", "adam")).lower()
    lr = config.get("learning_rate", 0.01)
    weight_decay = config.get("weight_decay", 0)
    eps = config.get("lr_epsilon", 1e-8)
    b1 = config.get("lr_beta1", 0.9)
    b2 = config.get("lr_beta2", 0.999)
    alpha = config.get("lr_alpha", 0.99)
    momentum = config.get("lr_momentum", 0)

    def make(learning_rate):
        if learner == "adam" or learner == "sparse_adam":
            core = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
            core.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        elif learner == "sgd":
            core = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
            if momentum:
                core.append(optax.trace(decay=momentum, nesterov=False))
        elif learner == "adagrad":
            core = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
            core.append(_scale_by_adagrad_torch(eps=eps))
        elif learner == "rmsprop":
            core = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
            # torch RMSprop adds eps OUTSIDE the sqrt
            core.append(optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False))
            if momentum:
                core.append(optax.trace(decay=momentum, nesterov=False))
        else:
            # unrecognized -> default Adam (ref :161-164)
            core = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
        return optax.chain(*core, optax.scale(-learning_rate))

    tx = optax.inject_hyperparams(make)(learning_rate=lr)
    if config.get("clip_grad_norm", False):
        tx = optax.chain(optax.clip_by_global_norm(config.get("max_grad_norm", 1.0)), tx)
    return tx


def set_learning_rate(opt_state, lr):
    """Write lr into an inject_hyperparams state (possibly nested in a chain)."""
    if hasattr(opt_state, "hyperparams"):
        opt_state.hyperparams["learning_rate"] = lr
        return
    for inner in opt_state:
        if hasattr(inner, "hyperparams"):
            inner.hyperparams["learning_rate"] = lr
            return
    raise ValueError("no inject_hyperparams state found")


def get_learning_rate(opt_state) -> float:
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    for inner in opt_state:
        if hasattr(inner, "hyperparams"):
            return float(inner.hyperparams["learning_rate"])
    raise ValueError("no inject_hyperparams state found")


class LRScheduler:
    """Host-side per-epoch lr computation matching torch scheduler semantics.

    ``lr_for_epoch(epoch)`` returns the lr to use during 0-based `epoch`;
    plateau mode instead updates state via ``step_plateau(val_loss)`` after
    each epoch.
    """

    def __init__(
        self,
        kind: Optional[str],
        base_lr: float,
        milestones: Optional[List[int]] = None,
        decay_ratio: float = 0.1,
        step_size: int = 10,
        t_max: int = 30,
        eta_min: float = 0.0,
        patience: int = 10,
        threshold: float = 1e-4,
        lr_lambda: Optional[Callable[[int], float]] = None,
    ):
        self.kind = (kind or "none").lower()
        self.base_lr = base_lr
        self.milestones = sorted(milestones or [])
        self.decay_ratio = decay_ratio
        self.step_size = step_size
        self.t_max = t_max
        self.eta_min = eta_min
        self.patience = patience
        self.threshold = threshold
        self.lr_lambda = lr_lambda or (lambda epoch: epoch)
        # plateau state
        self._plateau_lr = base_lr
        self._best = float("inf")
        self._bad_epochs = 0

    def lr_for_epoch(self, epoch: int) -> float:
        if self.kind == "multisteplr":
            hits = sum(1 for m in self.milestones if m <= epoch)
            return self.base_lr * (self.decay_ratio ** hits)
        if self.kind == "steplr":
            return self.base_lr * (self.decay_ratio ** (epoch // self.step_size))
        if self.kind == "exponentiallr":
            return self.base_lr * (self.decay_ratio ** epoch)
        if self.kind == "cosineannealinglr":
            return self.eta_min + (self.base_lr - self.eta_min) * (
                1 + math.cos(math.pi * epoch / self.t_max)
            ) / 2
        if self.kind == "lambdalr":
            return self.base_lr * self.lr_lambda(epoch)
        if self.kind == "reducelronplateau":
            return self._plateau_lr
        return self.base_lr

    def step_plateau(self, val_loss: float) -> None:
        """torch ReduceLROnPlateau (mode=min, rel threshold) epoch update."""
        if self.kind != "reducelronplateau":
            return
        if val_loss < self._best * (1 - self.threshold):
            self._best = val_loss
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience:
                self._plateau_lr *= self.decay_ratio
                self._bad_epochs = 0


def build_lr_scheduler(config) -> Optional[LRScheduler]:
    """Scheduler from config; None when lr_decay is off (ref :167-198)."""
    if not config.get("lr_decay", False):
        return None
    kind = str(config.get("lr_scheduler", "multisteplr")).lower()
    known = {
        "multisteplr", "steplr", "exponentiallr", "cosineannealinglr",
        "lambdalr", "reducelronplateau",
    }
    if kind not in known:
        return None
    return LRScheduler(
        kind,
        base_lr=config.get("learning_rate", 0.01),
        milestones=config.get("steps", []),
        decay_ratio=config.get("lr_decay_ratio", 0.1),
        step_size=config.get("step_size", 10),
        t_max=config.get("lr_T_max", 30),
        eta_min=config.get("lr_eta_min", 0),
        patience=config.get("lr_patience", 10),
        threshold=config.get("lr_threshold", 1e-4),
        lr_lambda=config.get("lr_lambda", None),
    )
