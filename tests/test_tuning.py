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


def test_exhaustive_sampling_dedups_and_exhausts():
    # Reference exhaustive_search semantics (hyper_tuning.py:68-106): random
    # draws, duplicates rejected by hash, early stop when the space runs dry.
    space = parse_search_space(
        {
            "a": {"type": "choice", "list": [1, 2, 3]},
            "b": {"type": "choice", "list": ["x", "y"]},
        }
    )
    configs = sample_configurations(space, "exhaustive", 50, seed=3)
    keys = [(c["a"], c["b"]) for c in configs]
    assert len(keys) == len(set(keys)) == 6  # full space, no repeats
    # Asking for fewer returns exactly that many, still unique.
    some = sample_configurations(space, "exhaustive", 4, seed=4)
    assert len(some) == 4
    assert len({(c["a"], c["b"]) for c in some}) == 4


def test_preprocess_data_helper():
    # Ref utils.py:209-240: windows + chronological split, eval folded into
    # train, last anchor excluded (num_samples = T - in - out).
    import numpy as np

    from multistgraph_tpu.utils import preprocess_data

    data = np.arange(20.0)[:, None]  # (T=20, 1)
    cfg = {"train_rate": 0.7, "eval_rate": 0.1, "input_window": 4, "output_window": 2}
    trainx, trainy, testx, testy = preprocess_data(data, cfg)
    assert trainx.shape == (11, 4, 1) and trainy.shape == (11, 2, 1)
    assert testx.shape == (3, 4, 1) and testy.shape == (3, 2, 1)
    # Window contents: X[i] = data[i:i+4], y[i] = data[i+4:i+6].
    assert (trainx[0, :, 0] == [0, 1, 2, 3]).all()
    assert (trainy[0, :, 0] == [4, 5]).all()
    assert (testx[-1, :, 0] == [13, 14, 15, 16]).all()
    assert (testy[-1, :, 0] == [17, 18]).all()


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


def test_atpe_sampler_adapts_and_converges():
    """ATPE = TPE whose own hyperparameters track the history (hyperopt
    'atpe', ref libcity/executor/hyper_tuning.py:109-233): the elite-group
    size follows ceil(gamma*sqrt(n)) and the candidate pool grows with n —
    and it still finds the good region."""
    from multistgraph_tpu.parallel.tuning import ATPESampler

    space = parse_search_space(
        {
            "lr": {"type": "uniform", "lower": 0.0, "upper": 1.0},
            "opt": {"type": "choice", "list": ["a", "b"]},
        }
    )
    s = ATPESampler(space, seed=0)
    rng = np.random.default_rng(1)
    for _ in range(30):
        params = s.suggest()
        loss = (params["lr"] - 0.2) ** 2 + (0.0 if params["opt"] == "a" else 0.5)
        loss += 0.01 * rng.normal()
        s.observe(params, loss)
    # adaptive schedule engaged: n=30 -> elite count ceil(0.25*sqrt(30)) = 2,
    # candidate pool 24*(1+log2(30))
    s.suggest()
    assert int(np.ceil(s.gamma * 30)) == int(np.ceil(0.25 * np.sqrt(30)))
    assert s.n_candidates == int(24 * (1 + np.log2(30)))
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


def test_quniform_loguniform_draws():
    space = parse_search_space(
        {
            "units": {"type": "quniform", "lower": 8, "upper": 64, "q": 8},
            "lr": {"type": "loguniform", "lower": np.log(1e-4), "upper": np.log(1e-1)},
        }
    )
    configs = sample_configurations(space, "random", 50, seed=3)
    for c in configs:
        assert c["units"] % 8 == 0 and 8 <= c["units"] <= 64
        assert 1e-4 <= c["lr"] <= 1e-1
    # loguniform must actually spread over decades
    lrs = np.array([c["lr"] for c in configs])
    assert lrs.min() < 1e-3 and lrs.max() > 1e-2


def test_parse_space_file(tmp_path):
    """The reference's `name type values` line DSL (hyper_tuning.py:159-185)."""
    from multistgraph_tpu.parallel.tuning import parse_space_file

    f = tmp_path / "space.txt"
    f.write_text(
        "learning_rate uniform 0.0005,0.005\n"
        "rnn_units choice [32,64,128]\n"
        "dropout quniform 0.0,0.5,0.1\n"
        "weight_decay loguniform -9.2,-4.6\n"
        "\n"
        "short line\n"
    )
    space = parse_search_space(parse_space_file(str(f)))
    assert space["learning_rate"] == {"type": "uniform", "lower": 0.0005, "upper": 0.005}
    assert space["rnn_units"]["list"] == [32, 64, 128]
    assert space["dropout"]["q"] == 0.1
    assert space["weight_decay"]["type"] == "loguniform"
    with pytest.raises(SearchSpaceError):
        bad = tmp_path / "bad.txt"
        bad.write_text("x beta 1,2\n")
        parse_space_file(str(bad))


def test_gp_ei_sampler_prefers_good_region():
    from multistgraph_tpu.parallel.tuning import GPEISampler

    space = parse_search_space({"lr": {"type": "uniform", "lower": 0.0, "upper": 1.0}})
    s = GPEISampler(space, seed=0)
    rng = np.random.default_rng(1)
    for _ in range(25):
        params = s.suggest()
        s.observe(params, (params["lr"] - 0.3) ** 2 + 0.005 * rng.normal())
    # the search trajectory must concentrate near the optimum (later EI
    # suggestions explore by design, so assert on the observed sequence)
    late = np.array([h["lr"] for h in s.history[-10:]])
    assert abs(np.median(late) - 0.3) < 0.15
    best = s.history[int(np.argmin(s.losses))]["lr"]
    assert abs(best - 0.3) < 0.1


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


def test_asha_resumes_from_checkpoint(tune_env):
    """Promoted trials must CONTINUE from their rung-best checkpoint (ray
    ASHA + per-epoch tune checkpoints, ref traffic_state_executor.py:368-374),
    not retrain from epoch 0 — asserted via the recorded rung start epochs."""
    env = dict(tune_env)
    env.update(saved_model=True, exp_id="tune_resume")
    results = hyper_parameter(
        "traffic_state_pred", "MultiATGCN", "SYN_TUNE",
        space={"learning_rate": {"type": "grid_search", "list": [0.003, 0.001]}},
        mode="grid", scheduler="asha", max_epoch=4, min_epochs=2, eta=2, base_args=env,
    )
    best = results[0]
    assert len(best.rungs) == 2
    (start1, end1), (start2, end2) = best.rungs
    assert (start1, end1) == (0, 2)
    assert end2 == 4
    assert start2 > 0, "promoted trial restarted from scratch instead of resuming"
    # history: rung-1 epochs + only the REMAINING epochs of rung 2
    assert len(best.history) == 2 + (4 - start2)


def test_median_stopping_kills_bad_trials(tune_env):
    env = dict(tune_env)
    env["exp_id"] = "tune_median"
    results = hyper_parameter(
        "traffic_state_pred", "MultiATGCN", "SYN_TUNE",
        # two healthy learning rates, then two hopeless ones likely to be
        # median-stopped before max_epoch
        space={"learning_rate": {"type": "grid_search", "list": [0.003, 0.002, 1e-7, 1e-8]}},
        mode="grid", scheduler="median", max_epoch=4, min_epochs=1, base_args=env,
    )
    assert len(results) == 4
    by_id = {r.trial_id: r for r in results}
    # the first trial always runs to completion (no median to compare against)
    assert len(by_id[0].history) == 4
    # at least one hopeless trial stopped early
    assert min(len(by_id[2].history), len(by_id[3].history)) < 4


def test_bayes_mode_end_to_end(tune_env):
    results = hyper_parameter(
        "traffic_state_pred", "MultiATGCN", "SYN_TUNE",
        space={"learning_rate": {"type": "loguniform",
                                 "lower": float(np.log(1e-4)), "upper": float(np.log(1e-2))}},
        mode="bayes", num_samples=4, max_epoch=1, base_args=tune_env,
    )
    assert len(results) == 4
    assert all(np.isfinite(r.val_loss) for r in results)
    assert all(1e-4 <= r.params["learning_rate"] <= 1e-2 for r in results)


def test_save_tuning_result(tmp_path):
    from multistgraph_tpu.parallel.tuning import TrialResult, save_tuning_result

    results = [
        TrialResult(0, {"lr": 0.003}, 0.5, 4, [0.9, 0.5], [(0, 2), (1, 4)], 3),
        TrialResult(1, {"lr": 1e-5}, 0.9, 2, [1.0, 0.9], [(0, 2)], 1),
    ]
    out = tmp_path / "hyper.result"
    save_tuning_result(results, str(out))
    text = out.read_text()
    assert "best params: {'lr': 0.003}" in text
    assert "lr:1e-05" in text
