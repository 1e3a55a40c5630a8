"""Config precedence engine must mirror the reference's first-writer-wins merge."""

import json

import pytest

from multistgraph_tpu.config import ConfigError, load_config


def test_defaults_flow_through(synthetic_dataset):
    cfg = load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL", data_dir=synthetic_dataset)
    # model defaults
    assert cfg["rnn_units"] == 64 and cfg["cheb_order"] == 2 and cfg["adjtype"] == "cosine"
    # task bindings
    assert cfg["dataset_class"] == "MTHDataset"
    assert cfg["executor"] == "TrafficStateExecutor"
    assert cfg["evaluator"] == "TrafficStateEvaluator"
    # executor defaults after model defaults: learning_rate from model (0.003)
    assert cfg["learning_rate"] == 0.003
    # dataset config.json info block flattened
    assert cfg["data_col"] == ["Visits"]
    assert cfg["time_intervals"] == 3600
    assert cfg["set_weight_link_or_dist"] == "dist"


def test_cli_args_beat_everything(synthetic_dataset):
    cfg = load_config(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
        other_args={"rnn_units": 16, "data_col": ["Other"]},
        data_dir=synthetic_dataset,
    )
    assert cfg["rnn_units"] == 16
    assert cfg["data_col"] == ["Other"]


def test_config_file_beats_defaults_but_not_cli(synthetic_dataset, tmp_path):
    user = {"rnn_units": 32, "max_epoch": 3}
    with open(tmp_path / "config_user.json", "w") as f:
        json.dump(user, f)
    cfg = load_config(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
        config_file="config_user",
        other_args={"rnn_units": 8},
        data_dir=synthetic_dataset,
        run_dir=str(tmp_path),
    )
    assert cfg["rnn_units"] == 8  # CLI wins
    assert cfg["max_epoch"] == 3  # file beats executor default (100)


def test_hyper_dict_below_cli(synthetic_dataset):
    cfg = load_config(
        "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
        other_args={"learning_rate": 0.5},
        hyper_config_dict={"learning_rate": 0.1, "rnn_units": 99},
        data_dir=synthetic_dataset,
    )
    assert cfg["learning_rate"] == 0.5
    assert cfg["rnn_units"] == 99


def test_unknown_task_and_model_raise(synthetic_dataset):
    with pytest.raises(ConfigError):
        load_config("bogus_task", "MultiATGCN", "SYN_SMALL", data_dir=synthetic_dataset)
    with pytest.raises(ConfigError):
        load_config("traffic_state_pred", "BogusModel", "SYN_SMALL", data_dir=synthetic_dataset)


def test_missing_config_file_raises(synthetic_dataset):
    with pytest.raises(FileNotFoundError):
        load_config(
            "traffic_state_pred", "MultiATGCN", "SYN_SMALL",
            config_file="nope", data_dir=synthetic_dataset,
        )


def test_dict_like_api(synthetic_dataset):
    cfg = load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL", data_dir=synthetic_dataset)
    assert "rnn_units" in cfg
    assert cfg.get("missing", 42) == 42
    with pytest.raises(KeyError):
        cfg["missing"]
    cfg["new_key"] = 1
    assert cfg["new_key"] == 1
    assert "task" in set(iter(cfg))
