"""Executor data parallelism: sharded epochs match single-device numerics."""

import numpy as np

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import get_dataset
from multistgraph_tpu.executor import get_executor
from multistgraph_tpu.models import get_model


def _run(synthetic_dataset, tmp_path, tag, model_name="MultiATGCN", **overrides):
    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / ("out_" + tag)),
        "exp_id": tag,
        "max_epoch": 2,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 8, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 8, "embed_dim_node": 3, "embed_dim_adj": 3,
        "use_early_stop": False, "saved_model": False, "load_best_epoch": False,
        "seed": 0,
    }
    args.update(overrides)
    config = load_config("traffic_state_pred", model_name, "SYN_SMALL", other_args=args)
    dataset = get_dataset(config)
    train, val, _ = dataset.get_data()
    feature = dataset.get_data_feature()
    model = get_model(config, feature)
    ex = get_executor(config, model, feature)
    best = ex.train(train, val)
    return best, ex


def test_dp_matches_single_device(synthetic_dataset, tmp_path):
    best_single, _ = _run(synthetic_dataset, tmp_path, "single", data_parallel=False)
    best_dp, ex = _run(synthetic_dataset, tmp_path, "dp", data_parallel=True)
    assert ex._mesh is not None  # the 8-device CPU mesh was actually used
    np.testing.assert_allclose(best_single, best_dp, rtol=1e-4)


def test_dp_matches_single_device_zoo_model(synthetic_dataset, tmp_path):
    """The DP scan path is model-agnostic: a zoo model (GWNET) trains
    batch-sharded with numerics equal to single-device."""
    kw = dict(model_name="GWNET", use_3tu=False, input_window=12)
    best_single, _ = _run(synthetic_dataset, tmp_path, "zsingle",
                          data_parallel=False, **kw)
    best_dp, ex = _run(synthetic_dataset, tmp_path, "zdp",
                       data_parallel=True, **kw)
    assert ex._mesh is not None
    np.testing.assert_allclose(best_single, best_dp, rtol=1e-4)


def test_dp_splits_are_sample_sharded(synthetic_dataset, tmp_path):
    """DP storage scales with the mesh: split arrays land sharded over the
    sample axis, not replicated on device 0 — with unchanged training loss
    (covered by test_dp_matches_single_device)."""
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset

    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache_sh"),
        "output_dir": str(tmp_path / "out_sh"),
        "exp_id": "dp_shard", "data_parallel": True,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "add_time_in_day": True,
        "batch_size": 8, "train_rate": 0.7, "eval_rate": 0.15, "seed": 0,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args)
    train, val, test = get_dataset(config).get_data()
    for loader in (train, val, test):
        spec = loader.x.sharding.spec
        assert spec and spec[0] == "data", "split not sharded over samples: {}".format(spec)
