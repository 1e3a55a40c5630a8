"""Vmapped multi-seed training (parallel/multiseed.py).

Asserts the vmapped S-seed epoch program is numerically equivalent to
driving the executor's own single-seed epoch program per seed with the same
shuffles/keys/lrs, plus early-stop bookkeeping and checkpoint reload.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import get_dataset
from multistgraph_tpu.executor import get_executor
from multistgraph_tpu.models import get_model
from multistgraph_tpu.parallel.multiseed import seed_cache_path, train_multiseed

SEEDS = [3, 7]


def _args(synthetic_dataset, tmp_path, **over):
    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "multiseed",
        "max_epoch": 2,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
        "use_early_stop": False, "saved_model": False, "load_best_epoch": False,
        "lr_decay": False, "seed": SEEDS[0],
    }
    args.update(over)
    return args


def _build(synthetic_dataset, tmp_path, **over):
    config = load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL",
                         other_args=_args(synthetic_dataset, tmp_path, **over))
    dataset = get_dataset(config)
    train, val, test = dataset.get_data()
    feature = dataset.get_data_feature()
    ex = get_executor(config, get_model(config, feature), feature)
    return config, ex, train, val, test


def _sequential_reference(ex, train, val, seed, epochs, lr):
    """Drive the executor's own single-seed programs with the exact
    shuffle/key streams multiseed uses; return per-epoch (params, val)."""
    model = ex.model
    feature_dim = ex.data_feature.get("feature_dim", 1)
    num_nodes = ex.data_feature["num_nodes"]
    total_len = (ex.data_feature.get("len_closeness", 0)
                 + ex.data_feature.get("len_period", 0)
                 + ex.data_feature.get("len_trend", 0))
    dummy = jnp.zeros((ex.config.get("batch_size"), total_len, num_nodes, feature_dim))
    params = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    opt_state = ex.optimizer.init(params["params"])
    perm_rng = np.random.default_rng(seed)
    rng = jax.random.PRNGKey(seed)
    num_batches = len(train)
    eval_perm = jnp.asarray(val.ordered_permutation())
    snaps = []
    for epoch_idx in range(epochs):
        order = np.arange(train.num_samples)
        perm_rng.shuffle(order)
        perm = jnp.asarray(order[: num_batches * train.batch_size]
                           .reshape(num_batches, train.batch_size))
        rng, key = jax.random.split(rng)
        params, opt_state, _ = jax.jit(ex._train_epoch_impl)(
            params, opt_state, train.x, train.y, perm, key,
            jnp.float32(lr), epoch_idx * num_batches)
        v = float(jax.jit(ex._eval_epoch_impl)(params, val.x, val.y, eval_perm))
        snaps.append((jax.tree_util.tree_map(np.asarray, params), v))
    return snaps


def test_multiseed_matches_sequential(synthetic_dataset, tmp_path):
    config, ex, train, val, _ = _build(synthetic_dataset, tmp_path)
    results = train_multiseed(ex, train, val, SEEDS, save=True)
    lr = config.get("learning_rate", 0.01)
    for res, seed in zip(results, SEEDS):
        snaps = _sequential_reference(ex, train, val, seed, config["max_epoch"], lr)
        # identical per-epoch validation losses
        assert len(res.history) == len(snaps)
        for h, (_, v) in zip(res.history, snaps):
            assert h["val_loss"] == pytest.approx(v, rel=1e-4), (seed, h["epoch"])
        # best-epoch bookkeeping and the saved snapshot match
        vals = [v for _, v in snaps]
        assert res.best_epoch == int(np.argmin(vals))
        assert res.min_val_loss == pytest.approx(min(vals), rel=1e-4)
        import flax.serialization

        with open(res.checkpoint, "rb") as f:
            blob = flax.serialization.msgpack_restore(f.read())
        best_params, _ = snaps[res.best_epoch]
        got = blob["params"]["params"]
        want = best_params["params"]
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)


def test_multiseed_checkpoints_load_into_executor(synthetic_dataset, tmp_path):
    config, ex, train, val, _ = _build(synthetic_dataset, tmp_path)
    results = train_multiseed(ex, train, val, SEEDS, save=True)
    for res, seed in zip(results, SEEDS):
        assert res.checkpoint == seed_cache_path(config, seed)
        assert os.path.exists(res.checkpoint)
        ex.load_model(res.checkpoint)  # template-structured restore works


def test_multiseed_early_stop_bookkeeping(synthetic_dataset, tmp_path):
    config, ex, train, val, _ = _build(
        synthetic_dataset, tmp_path, max_epoch=6, use_early_stop=True, patience=1,
        learning_rate=10.0,  # diverges -> no improvement after epoch 0
    )
    results = train_multiseed(ex, train, val, SEEDS, save=False)
    for res in results:
        assert res.stopped_epoch is not None and res.stopped_epoch < 6
        assert len(res.history) == res.stopped_epoch + 1
        assert res.checkpoint is None


def test_multiseed_rejects_graph_collection_models(synthetic_dataset, tmp_path):
    config, ex, train, val, _ = _build(synthetic_dataset, tmp_path)

    class _FakeSparse:
        def attach_graph(self, p):
            return p

    ex.model = _FakeSparse()
    with pytest.raises(NotImplementedError):
        train_multiseed(ex, train, val, SEEDS, save=False)
