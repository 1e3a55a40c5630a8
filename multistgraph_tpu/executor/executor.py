"""Training executor: jitted train/eval steps, epoch loop, checkpoints, eval.

Reference behavior being reproduced (libcity/executor/traffic_state_executor.py:17-448):
optimizer/scheduler factories, optional config-selected train loss, epoch loop
with train/valid phases + timing + scalar logging, best-epoch checkpointing,
early stop on patience, best-epoch reload, full-test evaluation with raw
prediction npz + per-horizon metric artifacts + group-based re-transform.

TPU-native design notes:
  * one jit-compiled train step (donated params/opt_state) instead of
    per-batch zero_grad/backward/step;
  * per-batch losses stay on device during the epoch; host sync happens once
    per epoch;
  * the learning rate is injected into optimizer state per epoch, reproducing
    torch scheduler semantics exactly (see executor/optimizers.py);
  * checkpoints are flax msgpack trees, not torch pickles.
"""

import datetime
import os
import time
from functools import partial
from typing import Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multistgraph_tpu.evaluator.evaluator import get_evaluator
from multistgraph_tpu.executor.optimizers import (
    build_lr_scheduler,
    build_optimizer,
    set_learning_rate,
)
from multistgraph_tpu.models.multi_atgcn import make_loss_fn, training_apply_kwargs
from multistgraph_tpu.ops import losses
from multistgraph_tpu.utils import ensure_dir, get_logger


def _enable_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache: makes re-runs skip all compiles.

    Default ON for platform==tpu only (``compilation_cache_dir: "auto"``),
    explicit path opts in anywhere, empty/None opts out. It must stay off on
    CPU: PJRT CPU executable serialization segfaults intermittently after
    hundreds of in-process compiles (observed as suite-wide SIGSEGV/SIGABRT
    inside ``put_executable_and_time``)."""
    try:
        if jax.config.jax_compilation_cache_dir is None:
            ensure_dir(cache_dir)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


class TrafficStateExecutor:
    def __init__(self, config, model, data_feature):
        self.config = config
        self.model = model
        self.data_feature = data_feature
        self.evaluator = get_evaluator(config)
        self._scaler = data_feature.get("scaler")
        self.exp_id = config.get("exp_id", None)
        self.output_window = config.get("output_window", 1)
        self.start_dim = config.get("start_dim", 0)
        self.end_dim = config.get("end_dim", 1)
        self.groupstd = config.get("groupstd", False)
        self.ct_visit_mstd = data_feature.get("ct_visit_mstd")
        self.output_dim = config.get("output_dim", 1)

        output_root = config.get("output_dir", "./outputs")
        cache_cfg = config.get("compilation_cache_dir", "auto")
        if cache_cfg == "auto":
            # ON by default on TPU (cuts the 30-300 s warmup compile of every
            # re-run to seconds); stays OFF on CPU, where PJRT executable
            # serialization segfaults after hundreds of in-process compiles
            # (see _enable_compilation_cache). Opt out with
            # compilation_cache_dir: null / "".
            try:
                platform = jax.default_backend()
            except Exception:  # pragma: no cover - backend init failure
                platform = "cpu"
            if platform == "tpu":
                _enable_compilation_cache(
                    os.path.join(output_root, "xla_cache"))
        elif cache_cfg:
            _enable_compilation_cache(cache_cfg)
        self.cache_dir = os.path.join(output_root, str(self.exp_id), "model_cache")
        self.evaluate_res_dir = os.path.join(output_root, str(self.exp_id), "evaluate_cache")
        self.summary_dir = os.path.join(output_root, str(self.exp_id))
        for d in (self.cache_dir, self.evaluate_res_dir, self.summary_dir):
            ensure_dir(d)
        self._logger = get_logger(name="multistgraph_tpu.executor")
        self._metrics_log = os.path.join(self.summary_dir, "train_metrics.csv")
        # TensorBoard scalars next to the CSV (ref traffic_state_executor.py:38)
        self._writer = None
        if config.get("tensorboard", True):
            from multistgraph_tpu.utils.tbwriter import SummaryWriter

            self._writer = SummaryWriter(self.summary_dir)

        self.epochs = config.get("max_epoch", 100)
        self.train_loss_name = str(config.get("train_loss", "none")).lower()
        self.use_early_stop = config.get("use_early_stop", False)
        self.patience = config.get("patience", 50)
        self.log_every = config.get("log_every", 1)
        self.saved = config.get("saved_model", True)
        self.load_best_epoch = config.get("load_best_epoch", True)
        self.hyper_tune = config.get("hyper_tune", False)
        self.report_hook = None  # set by the hyperparameter tuner

        # Optional data parallelism: shard the batch dim of every in-epoch
        # batch over a mesh of all visible devices; XLA inserts the gradient
        # all-reduce. The reference has no distributed training (SURVEY §2.6).
        self._mesh = None
        self._batch_sharding = None
        if config.get("data_parallel", False) and len(jax.devices()) > 1:
            from multistgraph_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(axes=("data",))
            self._batch_sharding = jax.sharding.NamedSharding(
                self._mesh, jax.sharding.PartitionSpec("data")
            )
            self._logger.info("data parallelism over %d devices", len(jax.devices()))

        # Parameter init from a dummy batch of the dataset's shapes.
        seed = config.get("seed", 0)
        self._rng = jax.random.PRNGKey(seed)
        feature_dim = data_feature.get("feature_dim", 1)
        num_nodes = data_feature.get("num_nodes", 1)
        total_len = (
            data_feature.get("len_closeness", 0)
            + data_feature.get("len_period", 0)
            + data_feature.get("len_trend", 0)
        ) or config.get("input_window", 1)
        dummy = jnp.zeros((config.get("batch_size", 16), total_len, num_nodes, feature_dim))
        self._rng, init_key = jax.random.split(self._rng)
        # One jitted program for the whole init: flax otherwise dispatches one
        # tiny compiled program per parameter, which is pathological when
        # compiles go through a remote-compile relay (~0.4 s each).
        self.params = jax.jit(lambda k, x: model.init(k, x, train=False))(init_key, dummy)
        if hasattr(model, "attach_graph"):
            # sparse models: populate the zero-initialized 'graph' collection
            self.params = model.attach_graph(self.params)
        num_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(self.params):
            self._logger.info("%s\t%s", jax.tree_util.keystr(path), leaf.shape)
        self._logger.info("Total parameter numbers: %d", num_params)

        self.optimizer = build_optimizer(config)
        self.opt_state = self.optimizer.init(self.params["params"])
        self.lr_scheduler = build_lr_scheduler(config)
        self.loss_fn = self._build_train_loss()

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._train_epoch_scan = jax.jit(self._train_epoch_impl, donate_argnums=(0, 1))
        self._eval_epoch_scan = jax.jit(self._eval_epoch_impl)
        self._loss_eval = jax.jit(partial(self.loss_fn, train=False))
        self._predict_step = jax.jit(lambda params, x: self.model.apply(params, x, train=False))
        self._predict_scan = jax.jit(self._predict_scan_impl)

        self._epoch_num = config.get("epoch", 0)
        if self._epoch_num > 0:
            self.load_model_with_epoch(self._epoch_num)

    # ------------------------------------------------------------------ loss
    def _build_train_loss(self):
        """Config-selected train loss, else the model's own (ref :200-250)."""
        model_loss = make_loss_fn(self.model, self._scaler)
        if self.train_loss_name == "none":
            self._logger.warning(
                "Received none train loss func and will use the loss func defined in the model."
            )
            return model_loss
        named = {
            "mae": losses.masked_mae,
            "mse": losses.masked_mse,
            "rmse": losses.masked_rmse,
            "mape": losses.masked_mape,
            "logcosh": losses.log_cosh_loss,
            "huber": losses.huber_loss,
            "quantile": losses.quantile_loss,
            "masked_mae": partial(losses.masked_mae, null_val=0.0),
            "masked_mse": partial(losses.masked_mse, null_val=0.0),
            "masked_rmse": partial(losses.masked_rmse, null_val=0.0),
            "masked_mape": partial(losses.masked_mape, null_val=0.0),
            "r2": losses.r2_score,
            "evar": losses.explained_variance_score,
        }
        if self.train_loss_name not in named:
            self._logger.warning("Received unrecognized train loss function, set default mae loss func.")
            lf = losses.masked_mae
        else:
            lf = named[self.train_loss_name]
        out_dim = self.output_dim

        def loss_fn(params, batch, rng=None, train=True, tf_ratio=None):
            kwargs = training_apply_kwargs(self.model, batch, rng, train, tf_ratio)
            pred = self.model.apply(params, batch["X"], train=train, **kwargs)
            y_true = self._scaler.inverse_transform(batch["y"][..., :out_dim])
            y_pred = self._scaler.inverse_transform(pred[..., :out_dim])
            return lf(y_pred, y_true)

        return loss_fn

    # ------------------------------------------------------------- train step
    def _grad_step(self, params, batch, rng, tf_ratio=None):
        """Loss + grads w.r.t. the trainable 'params' collection only (other
        collections, e.g. a sparse model's int32 'graph' arrays, pass through
        undifferentiated)."""
        others = {k: v for k, v in params.items() if k != "params"}

        def wrt(trainable):
            return self.loss_fn({"params": trainable, **others}, batch,
                                rng=rng, train=True, tf_ratio=tf_ratio)

        return jax.value_and_grad(wrt)(params["params"])

    def _tf_ratio(self, global_step):
        """Scheduled-sampling teacher-forcing ratio at a (traced) global
        step: cl/(cl + exp(i/cl)) (DCRNN paper eq. 9), or None when the
        model doesn't opt in via cl_decay_steps."""
        cl = float(getattr(self.model, "cl_decay_steps", 0) or 0)
        if cl <= 0:
            return None
        return cl / (cl + jnp.exp(jnp.asarray(global_step, jnp.float32) / cl))

    def _train_step_impl(self, params, opt_state, batch, rng, lr, global_step=0):
        set_learning_rate(opt_state, lr)
        loss, grads = self._grad_step(params, batch, rng,
                                      tf_ratio=self._tf_ratio(global_step))
        updates, opt_state = self.optimizer.update(grads, opt_state, params["params"])
        params = dict(params)
        params["params"] = jax.tree_util.tree_map(lambda p, u: p + u, params["params"], updates)
        return params, opt_state, loss

    def _train_epoch_impl(self, params, opt_state, x, y, perm, epoch_key, lr,
                          global_step0=0):
        """One FULL epoch as a single compiled program: lax.scan over batches.

        x/y are the device-resident split arrays; perm is (num_batches, B)
        shuffled sample indices. One dispatch per epoch removes the per-batch
        host round-trips that dominate a remotely-attached chip and lets XLA
        pipeline the whole epoch.
        """
        set_learning_rate(opt_state, lr)

        def body(carry, inputs):
            params, opt_state = carry
            idx, step = inputs
            batch = {"X": jnp.take(x, idx, axis=0), "y": jnp.take(y, idx, axis=0)}
            if self._batch_sharding is not None:
                batch = {
                    k: jax.lax.with_sharding_constraint(v, self._batch_sharding)
                    for k, v in batch.items()
                }
            rng = jax.random.fold_in(epoch_key, step)
            loss, grads = self._grad_step(
                params, batch, rng, tf_ratio=self._tf_ratio(global_step0 + step))
            updates, opt_state = self.optimizer.update(grads, opt_state, params["params"])
            params = dict(params)
            params["params"] = jax.tree_util.tree_map(lambda p, u: p + u, params["params"], updates)
            return (params, opt_state), loss

        steps = jnp.arange(perm.shape[0])
        (params, opt_state), batch_losses = jax.lax.scan(body, (params, opt_state), (perm, steps))
        return params, opt_state, jnp.mean(batch_losses)

    def _eval_epoch_impl(self, params, x, y, perm):
        def body(_, idx):
            batch = {"X": jnp.take(x, idx, axis=0), "y": jnp.take(y, idx, axis=0)}
            return None, self.loss_fn(params, batch, train=False)

        _, batch_losses = jax.lax.scan(body, None, perm)
        return jnp.mean(batch_losses)

    def _predict_scan_impl(self, params, x, perm):
        def body(_, idx):
            return None, self.model.apply(params, jnp.take(x, idx, axis=0), train=False)

        _, preds = jax.lax.scan(body, None, perm)
        # (num_batches, B, Tout, N, D) -> (num_samples, Tout, N, D)
        return preds.reshape((-1,) + preds.shape[2:])

    # --------------------------------------------------------------- training
    def train(self, train_dataloader, eval_dataloader) -> float:
        self._logger.info("Start training ...")
        min_val_loss = float("inf")
        wait = 0
        best_epoch = 0
        train_time, eval_time = [], []
        num_batches = len(train_dataloader)
        self._logger.info("num_batches:%d", num_batches)

        if not os.path.exists(self._metrics_log) or os.path.getsize(self._metrics_log) == 0:
            with open(self._metrics_log, "a") as f:
                f.write("epoch,train_loss,val_loss,lr,seconds\n")

        # Optional jax.profiler capture of one full epoch (SURVEY §5.1: the
        # reference only wall-clocks phases; trace capture is first-class here).
        profile_dir = self.config.get("profile_dir", None)
        profile_epoch = self.config.get("profile_epoch", 1)

        for epoch_idx in range(self._epoch_num, self.epochs):
            if profile_dir is not None and epoch_idx == profile_epoch:
                jax.profiler.start_trace(profile_dir)
            start_time = time.time()
            lr = (
                self.lr_scheduler.lr_for_epoch(epoch_idx)
                if self.lr_scheduler is not None
                else self.config.get("learning_rate", 0.01)
            )
            self._rng, epoch_key = jax.random.split(self._rng)
            if hasattr(train_dataloader, "epoch_permutation"):
                # Single-dispatch epoch: scan over device-resident batches.
                perm = jnp.asarray(train_dataloader.epoch_permutation())
                self.params, self.opt_state, mean_loss = self._train_epoch_scan(
                    self.params, self.opt_state,
                    train_dataloader.x, train_dataloader.y, perm, epoch_key, lr,
                    epoch_idx * num_batches,
                )
                train_loss = float(mean_loss)
            else:
                epoch_losses = []
                keys = jax.random.split(epoch_key, num_batches)
                for bi, batch in enumerate(train_dataloader):
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, batch, keys[bi], lr,
                        epoch_idx * num_batches + bi,
                    )
                    epoch_losses.append(loss)
                train_loss = float(jnp.mean(jnp.stack(epoch_losses)))
            t1 = time.time()
            train_time.append(t1 - start_time)

            t2 = time.time()
            val_loss = self._valid_epoch(eval_dataloader)
            end_time = time.time()
            eval_time.append(end_time - t2)

            if profile_dir is not None and epoch_idx == profile_epoch:
                jax.profiler.stop_trace()
                self._logger.info("profiler trace for epoch %d written to %s", epoch_idx, profile_dir)

            if self.lr_scheduler is not None:
                self.lr_scheduler.step_plateau(val_loss)

            if (epoch_idx % self.log_every) == 0:
                self._logger.info(
                    "Epoch [%d/%d] train_loss: %.4f, val_loss: %.4f, lr: %.6f, %.2fs",
                    epoch_idx, self.epochs, train_loss, val_loss, lr, end_time - start_time,
                )
            with open(self._metrics_log, "a") as f:
                f.write("{},{:.6f},{:.6f},{:.6g},{:.2f}\n".format(
                    epoch_idx, train_loss, val_loss, lr, end_time - start_time))
            if self._writer is not None:
                # same tags as the reference (ref :347,447) + the lr schedule
                self._writer.add_scalar("training loss", train_loss, epoch_idx)
                self._writer.add_scalar("eval loss", val_loss, epoch_idx)
                self._writer.add_scalar("learning rate", lr, epoch_idx)

            if self.hyper_tune and self.report_hook is not None:
                # ray-tune-style per-epoch report; a truthy return requests
                # trial termination (MedianStoppingRule-class schedulers)
                if self.report_hook(epoch_idx, val_loss, self):
                    self._logger.warning("Trial stopped by scheduler at epoch: %d", epoch_idx)
                    break

            if val_loss < min_val_loss:
                wait = 0
                if self.saved:
                    model_file_name = self.save_model_with_epoch(epoch_idx)
                    self._logger.info(
                        "Val loss decrease from %.4f to %.4f, saving to %s",
                        min_val_loss, val_loss, model_file_name,
                    )
                min_val_loss = val_loss
                best_epoch = epoch_idx
            else:
                wait += 1
                if wait == self.patience and self.use_early_stop:
                    self._logger.warning("Early stopping at epoch: %d", epoch_idx)
                    break

        if train_time:
            self._logger.info(
                "Trained totally %d epochs, average train time is %.3fs, average eval time is %.3fs",
                len(train_time), sum(train_time) / len(train_time), sum(eval_time) / len(eval_time),
            )
        if self.load_best_epoch and self.saved:
            self.load_model_with_epoch(best_epoch)
        return min_val_loss

    def _valid_epoch(self, eval_dataloader) -> float:
        if hasattr(eval_dataloader, "ordered_permutation"):
            perm = jnp.asarray(eval_dataloader.ordered_permutation())
            return float(
                self._eval_epoch_scan(self.params, eval_dataloader.x, eval_dataloader.y, perm)
            )
        vals = [self._loss_eval(self.params, batch) for batch in eval_dataloader]
        return float(jnp.mean(jnp.stack(vals)))

    # ------------------------------------------------------------- evaluation
    def evaluate(self, test_dataloader):
        """Full-test evaluation + artifacts (ref :252-323).

        Target channels come from the MODEL's own start_dim/end_dim (every
        registered model exposes them), not from a model-name string switch —
        so SparseATGCN and future graph models evaluate identically to
        MultiATGCN (the reference special-cases by name, ref :268-276)."""
        self._logger.info("Start evaluating ...")
        s_dim = getattr(self.model, "start_dim", self.start_dim)
        e_dim = getattr(self.model, "end_dim", self.end_dim)
        n_out = e_dim - s_dim
        if hasattr(test_dataloader, "ordered_permutation"):
            perm = jnp.asarray(test_dataloader.ordered_permutation())
            output = self._predict_scan(self.params, test_dataloader.x, perm)
            y_all = jnp.take(test_dataloader.y, jnp.asarray(perm.reshape(-1)), axis=0)
            y_true = y_all[:, : self.output_window, :, s_dim:e_dim]
            y_pred = output[..., :n_out]
            y_truths = np.asarray(self._scaler.inverse_transform(y_true))
            y_preds = np.asarray(self._scaler.inverse_transform(y_pred))
        else:
            y_truths, y_preds = [], []
            for batch in test_dataloader:
                output = self._predict_step(self.params, batch["X"])
                y_true = self._scaler.inverse_transform(
                    batch["y"][:, : self.output_window, :, s_dim:e_dim]
                )
                y_pred = self._scaler.inverse_transform(output[..., :n_out])
                y_truths.append(np.asarray(y_true))
                y_preds.append(np.asarray(y_pred))
            y_preds = np.concatenate(y_preds, axis=0)
            y_truths = np.concatenate(y_truths, axis=0)

        stamp = time.strftime("%Y_%m_%d_%H_%M_%S", time.localtime(time.time()))
        tag = "{}_{}_{}".format(stamp, self.config.get("model"), self.config.get("dataset"))
        np.savez_compressed(
            os.path.join(self.evaluate_res_dir, tag + "_predictions.npz"),
            prediction=y_preds, truth=y_truths,
        )
        self.evaluator.clear()
        self.evaluator.collect({"y_true": y_truths, "y_pred": y_preds})
        test_result = self.evaluator.save_result(self.evaluate_res_dir)

        if self.groupstd and self.ct_visit_mstd is not None:
            self._group_retransform_eval(y_preds, y_truths, tag)
        return test_result

    def _group_retransform_eval(self, y_preds, y_truths, tag):
        """Group-based de-z-score metrics — the paper's headline protocol (ref :292-322).

        Vectorized numpy instead of the reference's flattened DataFrame; the
        _predictions_trans.pkl artifact keeps the reference's tabular layout.
        """
        sh = y_preds.shape  # (S, Tout, N, D)
        mstd = self.ct_visit_mstd
        all_m = mstd["All_m"].to_numpy()[None, None, :, None]
        all_s = mstd["All_std"].to_numpy()[None, None, :, None]
        pred_t = y_preds * all_s + all_m
        truth_t = y_truths * all_s + all_m

        geo_ids = np.broadcast_to(mstd["geo_id"].to_numpy()[None, None, :, None], sh)
        ahead = np.broadcast_to(np.arange(sh[1])[None, :, None, None], sh)
        table = pd.DataFrame(
            {
                "prediction": y_preds.ravel(),
                "truth": y_truths.ravel(),
                "All_m": np.broadcast_to(all_m, sh).ravel(),
                "All_std": np.broadcast_to(all_s, sh).ravel(),
                "geo_id": geo_ids.ravel(),
                "ahead_step": ahead.ravel(),
                "prediction_t": pred_t.ravel(),
                "truth_t": truth_t.ravel(),
            }
        )
        table.to_pickle(os.path.join(self.evaluate_res_dir, tag + "_predictions_trans.pkl"))

        pred_t = np.maximum(pred_t, 0.0)
        s_small = 10.0
        rows = []
        for rr in range(sh[1]):
            keep = truth_t[:, rr] > s_small
            pr = pred_t[:, rr][keep]
            tr = truth_t[:, rr][keep]
            diff = pr - tr
            mae = float(np.abs(diff).mean())
            mse = float((diff ** 2).mean())
            rmse = float(np.sqrt(mse))
            # NB: the reference passes (pred, truth) to sklearn's
            # r2_score/explained_variance_score whose signature is
            # (y_true, y_pred) — i.e. arguments swapped. Reproduced verbatim.
            r2 = float(1.0 - (diff ** 2).sum() / ((pr - pr.mean()) ** 2).sum())
            evar = float(1.0 - np.var(tr - pr) / np.var(pr))
            mape = float(np.abs(diff / tr).mean())
            rows.append(
                [self.config.get("model"), rr, datetime.datetime.now(), mae, mse, rmse, r2, evar, mape]
            )
        frame = pd.DataFrame(
            rows,
            columns=["Model_name", "index", "Model_time", "MAE", "MSE", "RMSE", "R2", "EVAR", "MAPE"],
        )
        frame.to_csv(os.path.join(self.evaluate_res_dir, tag + "_trans.csv"))
        return frame

    # ------------------------------------------------------------ checkpoints
    # Two backends: 'msgpack' (flax bytes, single file, the default) and
    # 'orbax' (production checkpointing: per-array storage, async-capable,
    # restores correctly onto sharded trees in multi-host settings).
    def _checkpoint_blob(self, epoch: Optional[int] = None) -> Dict:
        return {"params": self.params, "opt_state": self.opt_state, "epoch": epoch or 0}

    @property
    def _ckpt_backend(self) -> str:
        return str(self.config.get("checkpoint_backend", "msgpack")).lower()

    def save_model(self, cache_name: str):
        ensure_dir(os.path.dirname(cache_name))
        self._logger.info("Saved model at %s", cache_name)
        if self._ckpt_backend == "orbax":
            import orbax.checkpoint as ocp

            path = os.path.abspath(cache_name) + ".orbax"
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, self._checkpoint_blob(), force=True)
            return
        with open(cache_name, "wb") as f:
            f.write(flax.serialization.to_bytes(self._checkpoint_blob()))

    def load_model(self, cache_name: str):
        self._logger.info("Loaded model at %s", cache_name)
        if self._ckpt_backend == "orbax":
            import orbax.checkpoint as ocp

            path = os.path.abspath(cache_name) + ".orbax"
            template = self._checkpoint_blob()
            with ocp.StandardCheckpointer() as ckptr:
                try:
                    blob = ckptr.restore(path, template)
                except Exception:
                    # Same band storage-form migration as the msgpack path:
                    # restore WITHOUT a template (raw pytree), verify the only
                    # graph-key difference is the band_values <-> band_packed
                    # substitution, keep the attached (re-derived) graph
                    # arrays, and take everything else from the checkpoint.
                    raw = ckptr.restore(path)
                    tmpl_graph = template["params"].get("graph")
                    raw_graph = (raw or {}).get("params", {}).get("graph")
                    if tmpl_graph is None or raw_graph is None:
                        raise

                    def _norm(keys):
                        return {k.replace("band_packed", "band_values")
                                for k in keys
                                if not k.endswith("band_radius_static")}

                    if _norm(raw_graph) != _norm(tmpl_graph):
                        raise
                    self._logger.info(
                        "Orbax checkpoint graph collection %s differs from "
                        "the attached form %s; keeping the attached graph "
                        "arrays", sorted(raw_graph), sorted(tmpl_graph))
                    raw["params"]["graph"] = flax.serialization.to_state_dict(
                        tmpl_graph)
                    blob = flax.serialization.from_state_dict(template, raw)
            self.params, self.opt_state = blob["params"], blob["opt_state"]
            return
        with open(cache_name, "rb") as f:
            data = f.read()
        template = self._checkpoint_blob()
        try:
            blob = flax.serialization.from_bytes(template, data)
        except (ValueError, KeyError):
            # The non-trainable 'graph' collection's STORAGE FORM can differ
            # between save and load (e.g. a band graph trained on per-offset
            # planes, served with graph_band_packed=True slabs). The graph
            # arrays are re-derived by attach_graph at executor init and are
            # numerically the same operator, so keep the attached form and
            # restore everything else (trainable params, opt_state, epoch).
            raw = flax.serialization.msgpack_restore(data)
            tmpl_graph = template["params"].get("graph")
            raw_graph = raw.get("params", {}).get("graph")
            if tmpl_graph is None or raw_graph is None or \
                    set(raw_graph) == set(tmpl_graph):
                raise  # not a graph-form mismatch — surface the real error
            # Only the KNOWN band storage-form substitution is re-derivable
            # (per-offset planes <-> pre-packed slabs of the SAME supports);
            # any other key-set difference (different graph_split, different
            # dataset) must stay a hard error, not a silent partial load.
            def _norm(keys):
                # the packed form adds `*band_radius_static` alongside
                # renaming `band_values` -> `band_packed`
                return {k.replace("band_packed", "band_values") for k in keys
                        if not k.endswith("band_radius_static")}

            if _norm(raw_graph) != _norm(tmpl_graph):
                raise
            self._logger.info(
                "Checkpoint graph collection %s differs from the attached "
                "form %s; keeping the attached graph arrays",
                sorted(raw_graph), sorted(tmpl_graph))
            raw["params"]["graph"] = flax.serialization.to_state_dict(tmpl_graph)
            blob = flax.serialization.from_state_dict(template, raw)
        self.params, self.opt_state = blob["params"], blob["opt_state"]

    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(
            self.cache_dir,
            "{}_{}_epoch{}.msgpack".format(self.config.get("model"), self.config.get("dataset"), epoch),
        )

    def save_model_with_epoch(self, epoch: int) -> str:
        path = self._epoch_path(epoch)
        ensure_dir(self.cache_dir)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(self._checkpoint_blob(epoch)))
        self._logger.info("Saved model at %d", epoch)
        return path

    def load_model_with_epoch(self, epoch: int):
        path = self._epoch_path(epoch)
        assert os.path.exists(path), "Weights at epoch %d not found" % epoch
        with open(path, "rb") as f:
            blob = flax.serialization.from_bytes(self._checkpoint_blob(epoch), f.read())
        self.params, self.opt_state = blob["params"], blob["opt_state"]
        self._logger.info("Loaded model at %d", epoch)


EXECUTOR_REGISTRY = {"TrafficStateExecutor": TrafficStateExecutor}


def get_executor(config, model, data_feature):
    name = config.get("executor", "TrafficStateExecutor")
    if name not in EXECUTOR_REGISTRY:
        raise AttributeError("executor {} is not registered".format(name))
    return EXECUTOR_REGISTRY[name](config, model, data_feature)
