"""TensorBoard event writer: wire-format correctness + executor integration."""

import glob
import os

import numpy as np

from multistgraph_tpu.utils.tbwriter import SummaryWriter, crc32c, read_scalars


def test_crc32c_known_vector():
    # RFC 3720 test vector for CRC32C
    assert crc32c(b"123456789") == 0xE3069283


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    for step in range(5):
        w.add_scalar("training loss", 1.0 / (step + 1), step)
        w.add_scalar("eval loss", 2.0 / (step + 1), step)
    w.close()
    events = read_scalars(w.path)
    train = [(s, v) for s, t, v in events if t == "training loss"]
    assert [s for s, _ in train] == list(range(5))
    np.testing.assert_allclose([v for _, v in train], [1.0 / (s + 1) for s in range(5)],
                               rtol=1e-6)
    assert sum(t == "eval loss" for _, t, _ in events) == 5


def test_executor_writes_event_file(synthetic_dataset, tmp_path):
    from multistgraph_tpu.config import load_config
    from multistgraph_tpu.data import get_dataset
    from multistgraph_tpu.executor import get_executor
    from multistgraph_tpu.models import get_model

    args = {
        "data_dir": synthetic_dataset,
        "cache_dir": str(tmp_path / "cache"),
        "output_dir": str(tmp_path / "out"),
        "exp_id": "tb", "max_epoch": 2,
        "len_closeness": 1, "len_period": 1, "len_trend": 1,
        "interval_period": 2, "interval_trend": 4,
        "input_window": 24, "output_window": 3,
        "load_external": True, "load_dynamic": False, "add_time_in_day": True,
        "groupstd": True, "batch_size": 8, "train_rate": 0.7, "eval_rate": 0.15,
        "rnn_units": 4, "embed_dim_node": 2, "embed_dim_adj": 2,
        "use_early_stop": False, "saved_model": False, "load_best_epoch": False,
        "seed": 0,
    }
    config = load_config("traffic_state_pred", "MultiATGCN", "SYN_SMALL", other_args=args)
    dataset = get_dataset(config)
    train, val, _ = dataset.get_data()
    feature = dataset.get_data_feature()
    ex = get_executor(config, get_model(config, feature), feature)
    ex.train(train, val)
    files = glob.glob(os.path.join(str(tmp_path / "out" / "tb"), "events.out.tfevents.*"))
    assert files, "no event file written"
    events = read_scalars(files[0])
    tags = {t for _, t, _ in events}
    assert {"training loss", "eval loss", "learning rate"} <= tags
    assert sum(t == "training loss" for _, t, _ in events) == 2
