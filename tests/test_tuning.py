"""Hyperparameter search: DSL parsing, sampling, FIFO and ASHA schedulers."""

import numpy as np
import pytest

from multistgraph_tpu.parallel.tuning import (
    SearchSpaceError,
    hyper_parameter,
    parse_search_space,
    sample_configurations,
)


def test_parse_search_space_types():
    space = parse_search_space(
        {
            "learning_rate": {"type": "uniform", "lower": 1e-4, "upper": 1e-2},
            "rnn_units": {"type": "grid_search", "list": [8, 16]},
            "num_layers": {"type": "choice", "list": [1, 2]},
            "noise": {"type": "randn", "mean": 0, "sd": 1},
            "seedish": {"type": "randint", "lower": 0, "upper": 10},
        }
    )
    assert len(space) == 5
    with pytest.raises(SearchSpaceError):
        parse_search_space({"x": {"type": "beta"}})
    with pytest.raises(SearchSpaceError):
        parse_search_space({"x": {"type": "uniform", "lower": 0}})


def test_grid_sampling_cartesian():
    space = parse_search_space(
        {
            "a": {"type": "grid_search", "list": [1, 2, 3]},
            "b": {"type": "choice", "list": ["x", "y"]},
            "c": {"type": "uniform", "lower": 0.0, "upper": 1.0},
        }
    )
    configs = sample_configurations(space, "grid", 0, seed=1)
    assert len(configs) == 6
    assert {(c["a"], c["b"]) for c in configs} == {(a, b) for a in [1, 2, 3] for b in ["x", "y"]}
    assert all(0 <= c["c"] <= 1 for c in configs)


def test_random_sampling_count():
    space = parse_search_space({"lr": {"type": "uniform", "lower": 0, "upper": 1}})
    configs = sample_configurations(space, "random", 5, seed=2)
    assert len(configs) == 5
    assert len({c["lr"] for c in configs}) == 5


def test_tpe_sampler_prefers_good_region():
    from multistgraph_tpu.parallel.tuning import TPESampler

    space = parse_search_space(
        {
            "lr": {"type": "uniform", "lower": 0.0, "upper": 1.0},
            "opt": {"type": "choice", "list": ["a", "b"]},
        }
    )
    s = TPESampler(space, seed=0)
    # objective: minimized near lr=0.2 with opt='a'
    rng = np.random.default_rng(1)
    for _ in range(30):
        params = s.suggest()
        loss = (params["lr"] - 0.2) ** 2 + (0.0 if params["opt"] == "a" else 0.5)
        loss += 0.01 * rng.normal()
        s.observe(params, loss)
    final = [s.suggest() for _ in range(10)]
    lrs = np.array([f["lr"] for f in final])
    assert abs(np.median(lrs) - 0.2) < 0.15
    assert sum(f["opt"] == "a" for f in final) >= 8


@pytest.fixture(scope="module")
def tune_env(tmp_path_factory):
    from multistgraph_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("tune")
    make_synthetic_dataset(str(root / "raw"), "SYN_TUNE", num_nodes=5, len_time=24 * 20, seed=2)
    return {
        "data_dir": str(root / "raw"),
        "cache_dir": str(root / "cache"),
        "output_dir": str(root / "out"),
        "exp_id": "tune",
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 3,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 4, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
        "use_early_stop": False, "saved_model": False, "load_best_epoch": False,
        "seed": 0,
    }


def test_fifo_search(tune_env):
    results = hyper_parameter(
        "traffic_state_pred", "MultiATGCN", "SYN_TUNE",
        space={"learning_rate": {"type": "grid_search", "list": [0.003, 0.0001]}},
        mode="grid", scheduler="fifo", max_epoch=2, base_args=tune_env,
    )
    assert len(results) == 2
    assert results[0].val_loss <= results[1].val_loss
    assert all(r.epochs_run == 2 for r in results)
    assert all(len(r.history) == 2 for r in results)  # report_hook fired per epoch


def test_tpe_mode_end_to_end(tune_env):
    results = hyper_parameter(
        "traffic_state_pred", "MultiATGCN", "SYN_TUNE",
        space={"learning_rate": {"type": "uniform", "lower": 1e-4, "upper": 1e-2}},
        mode="tpe", num_samples=5, max_epoch=1, base_args=tune_env,
    )
    assert len(results) == 5
    assert all(np.isfinite(r.val_loss) for r in results)
    assert results[0].val_loss <= results[-1].val_loss


def test_asha_promotes_best(tune_env):
    results = hyper_parameter(
        "traffic_state_pred", "MultiATGCN", "SYN_TUNE",
        space={"learning_rate": {"type": "grid_search", "list": [0.003, 0.001, 1e-5, 3e-5]}},
        mode="grid", scheduler="asha", max_epoch=4, min_epochs=1, eta=2, base_args=tune_env,
    )
    assert len(results) == 4
    epochs = sorted(r.epochs_run for r in results)
    # successive halving: some trials stopped at the first rung, the best ran more
    assert epochs[0] < epochs[-1]
    best = results[0]
    assert best.epochs_run >= 2
