"""Vmapped multi-seed training: S seeds in ONE compiled epoch program.

The reference's protocol (and run_model_parameter.py) trains each seed as a
separate process/run; on a TPU the DC-237-class workloads leave most of the
MXU idle at batch 16, so S independent seeds can ride one chip nearly for
free. This module stacks per-seed parameter/optimizer trees on a leading
seed axis and `jax.vmap`s the executor's own single-dispatch epoch program
(`executor.TrafficStateExecutor._train_epoch_impl`) over it:

  * ONE compile for all seeds (vs S compiles, each ~minutes through a
    remote-compile relay);
  * per-seed data shuffles, dropout streams, plateau LR schedules, early
    stopping, and best-epoch snapshots — semantics match the single-seed
    executor (asserted step-for-step in tests/test_multiseed.py);
  * seeds that early-stop keep computing until ALL stop (their updates are
    masked out of the best-snapshot tracking) — wasted FLOPs on a chip
    that was idle anyway, in exchange for zero recompiles and no ragged
    shapes.

Per-seed best checkpoints are written in the executor's cache format, so
``run_model --train false --exp_id {base}_{seed}`` and the serving stack
consume them unchanged (tools/multiseed_run.py drives that end-to-end).

No reference counterpart (the reference is single-accelerator, one run per
seed — SURVEY §2.6); this is a TPU-native throughput feature.
"""

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.executor.optimizers import build_lr_scheduler

__all__ = ["MultiSeedResult", "train_multiseed", "seed_cache_path"]


@dataclass
class MultiSeedResult:
    seed: int
    best_epoch: int
    min_val_loss: float
    stopped_epoch: Optional[int]  # early-stop epoch, None if ran to max
    history: List[Dict[str, float]] = field(default_factory=list)
    checkpoint: Optional[str] = None


def seed_cache_path(config, seed) -> str:
    """Cache path run_model(--train false, exp_id={base}_{seed}) looks for."""
    return os.path.join(
        config.get("output_dir", "./outputs"),
        "{}_{}".format(config.get("exp_id"), seed), "model_cache",
        "{}_{}.m".format(config.get("model"), config.get("dataset")))


def _select(mask, new, best):
    """Per-seed where() across a stacked pytree (mask: (S,) bool)."""
    def pick(n, b):
        m = mask.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, b)

    return jax.tree_util.tree_map(pick, new, best)


def train_multiseed(executor, train_loader, eval_loader, seeds,
                    save: bool = True) -> List[MultiSeedResult]:
    """Train `seeds` jointly through one vmapped epoch program.

    `executor` is a constructed TrafficStateExecutor (its model, optimizer,
    loss, and epoch programs are reused; its own params are untouched).
    Returns one MultiSeedResult per seed; with save=True each seed's best
    (params, opt_state) snapshot is written to seed_cache_path().
    """
    model, config = executor.model, executor.config
    if hasattr(model, "attach_graph"):
        raise NotImplementedError(
            "multi-seed vmap does not support sparse graph-collection models "
            "yet — their non-differentiable 'graph' arrays are seed-invariant "
            "and should be broadcast, not stacked; train those per-seed.")
    logger = executor._logger
    S = len(seeds)

    # ---- stacked per-seed init (one jitted program, like the executor's)
    feature_dim = executor.data_feature.get("feature_dim", 1)
    num_nodes = executor.data_feature.get("num_nodes", 1)
    total_len = (
        executor.data_feature.get("len_closeness", 0)
        + executor.data_feature.get("len_period", 0)
        + executor.data_feature.get("len_trend", 0)
    ) or config.get("input_window", 1)
    dummy = jnp.zeros((config.get("batch_size", 16), total_len, num_nodes, feature_dim))
    init_keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    params = jax.jit(jax.vmap(lambda k: model.init(k, dummy, train=False)))(init_keys)
    opt_state = jax.jit(jax.vmap(executor.optimizer.init))(params["params"])

    # ---- vmapped epoch programs over (params, opt_state, perm, key, lr)
    train_epoch = jax.jit(
        jax.vmap(executor._train_epoch_impl,
                 in_axes=(0, 0, None, None, 0, 0, 0, None)),
        donate_argnums=(0, 1))
    eval_epoch = jax.jit(
        jax.vmap(executor._eval_epoch_impl, in_axes=(0, None, None, None)))
    select = jax.jit(_select)

    # ---- per-seed host state, mirroring executor.train()
    num_batches = len(train_loader)
    perm_rngs = [np.random.default_rng(int(s)) for s in seeds]
    seed_rng = [jax.random.PRNGKey(int(s)) for s in seeds]
    schedulers = [build_lr_scheduler(config) for _ in seeds]
    base_lr = config.get("learning_rate", 0.01)
    patience = executor.patience
    use_early_stop = executor.use_early_stop
    min_val = np.full(S, np.inf)
    wait = np.zeros(S, dtype=int)
    best_epoch = np.zeros(S, dtype=int)
    stopped = np.full(S, -1, dtype=int)
    results = [MultiSeedResult(seed=int(s), best_epoch=0, min_val_loss=float("inf"),
                               stopped_epoch=None) for s in seeds]
    # deep copies: the train program DONATES params/opt_state buffers, so the
    # snapshot trees must own their storage from the start
    best_params = jax.tree_util.tree_map(jnp.copy, params)
    best_opt = jax.tree_util.tree_map(jnp.copy, opt_state)
    eval_perm = jnp.asarray(eval_loader.ordered_permutation())

    logger.info("multi-seed training: %d seeds %s in one vmapped program", S, list(seeds))
    for epoch_idx in range(executor.epochs):
        t0 = time.time()
        perms, keys, lrs = [], [], []
        for i in range(S):
            order = np.arange(train_loader.num_samples)
            if train_loader.shuffle:
                perm_rngs[i].shuffle(order)
            perms.append(order[: num_batches * train_loader.batch_size]
                         .reshape(num_batches, train_loader.batch_size))
            seed_rng[i], k = jax.random.split(seed_rng[i])
            keys.append(k)
            lrs.append(schedulers[i].lr_for_epoch(epoch_idx)
                       if schedulers[i] is not None else base_lr)
        params, opt_state, train_losses = train_epoch(
            params, opt_state,
            train_loader.x, train_loader.y,
            jnp.asarray(np.stack(perms)), jnp.stack(keys),
            jnp.asarray(lrs, jnp.float32), epoch_idx * num_batches)
        val_losses = np.asarray(eval_epoch(params, eval_loader.x, eval_loader.y,
                                           eval_perm))
        train_losses = np.asarray(train_losses)

        active = stopped < 0
        improved = (val_losses < min_val) & active
        if improved.any():
            best_params = select(jnp.asarray(improved), params, best_params)
            best_opt = select(jnp.asarray(improved), opt_state, best_opt)
            best_epoch[improved] = epoch_idx
            min_val[improved] = val_losses[improved]
        wait[improved] = 0
        newly_waiting = active & ~improved
        wait[newly_waiting] += 1
        for i in range(S):
            if schedulers[i] is not None and active[i]:
                schedulers[i].step_plateau(float(val_losses[i]))
            if active[i]:
                results[i].history.append({
                    "epoch": epoch_idx,
                    "train_loss": float(train_losses[i]),
                    "val_loss": float(val_losses[i]),
                    "lr": float(lrs[i]),
                })
            if use_early_stop and active[i] and wait[i] >= patience:
                stopped[i] = epoch_idx
                logger.warning("seed %d early-stopped at epoch %d", seeds[i], epoch_idx)
        logger.info(
            "Epoch [%d/%d] val_loss per seed: %s (%.2fs)",
            epoch_idx, executor.epochs,
            np.array2string(val_losses, precision=4), time.time() - t0)
        if use_early_stop and (stopped >= 0).all():
            break

    for i, s in enumerate(seeds):
        results[i].best_epoch = int(best_epoch[i])
        results[i].min_val_loss = float(min_val[i])
        results[i].stopped_epoch = int(stopped[i]) if stopped[i] >= 0 else None
        if save:
            path = seed_cache_path(config, s)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            blob = {
                "params": jax.tree_util.tree_map(lambda a: a[i], best_params),
                "opt_state": jax.tree_util.tree_map(lambda a: a[i], best_opt),
                "epoch": int(best_epoch[i]),
            }
            with open(path, "wb") as f:
                f.write(flax.serialization.to_bytes(blob))
            results[i].checkpoint = path
            logger.info("seed %d: best epoch %d (val %.4f) -> %s",
                        s, best_epoch[i], min_val[i], path)
    return results
