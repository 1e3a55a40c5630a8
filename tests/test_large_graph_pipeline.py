"""SparseATGCN end-to-end through the standard pipeline (interpret kernels)."""

import numpy as np

from multistgraph_tpu.pipeline import run_model


def test_sparse_model_pipeline(tmp_path):
    result = run_model(
        task="traffic_state_pred",
        model_name="SparseATGCN",
        dataset_name="SYN_LARGE_TEST",
        other_args={
            "output_dir": str(tmp_path / "out"),
            "exp_id": "sparse_e2e",
            "num_nodes": 200,          # pads to 256 = 2 blocks
            "avg_degree": 8,
            "len_time": 150,
            "input_window": 12,
            "output_window": 3,
            "batch_size": 4,
            "rnn_units": 8,
            "embed_dim_adj": 4,
            "num_layers": 1,
            "remat": False,
            "max_epoch": 2,
            "use_early_stop": False,
            "pallas_interpret": True,
            "seed": 0,
        },
    )
    assert len(result) == 3  # three horizons
    assert np.isfinite(result["masked_MAE"]).all()
    # training should beat the trivial scale: losses finite and not absurd
    assert float(result["masked_MAE"].iloc[0]) < 10


def test_sparse_model_pipeline_node_parallel(tmp_path):
    """North-star path end-to-end: edge-partitioned SparseATGCN training over
    the 8-device virtual mesh through the ordinary run_model pipeline."""
    result = run_model(
        task="traffic_state_pred",
        model_name="SparseATGCN",
        dataset_name="SYN_LARGE_TEST",
        other_args={
            "output_dir": str(tmp_path / "out"),
            "exp_id": "sparse_e2e_np",
            "num_nodes": 1000,         # pads to 1024 = 8 row blocks over 8 shards
            "avg_degree": 8,
            "len_time": 120,
            "input_window": 8,
            "output_window": 2,
            "batch_size": 4,
            "rnn_units": 8,
            "embed_dim_adj": 4,
            "num_layers": 1,
            "adpadj": "unidirection",  # adaptive view through the SDDMM path
            "node_parallel": True,
            "max_epoch": 1,
            "use_early_stop": False,
            "pallas_interpret": True,
            "seed": 0,
        },
    )
    assert len(result) == 2
    assert np.isfinite(result["masked_MAE"]).all()


def test_sparse_pipeline_graph_split_forms(tmp_path):
    """config['graph_split'] selects the hybrid graph representation
    (hub / tail / band — the measured-fastest 1M forms, docs/DESIGN.md §4)
    end-to-end through run_model; each form trains to finite metrics."""
    for split in ("hub", "tail", "band"):
        result = run_model(
            task="traffic_state_pred",
            model_name="SparseATGCN",
            dataset_name="SYN_LARGE_SPLIT",
            other_args={
                "output_dir": str(tmp_path / ("out_" + split)),
                "exp_id": "split_" + split,
                "num_nodes": 300,      # pads to 384 = 3 blocks
                "avg_degree": 8,
                "len_time": 120,
                "graph_split": split,
                "input_window": 8,
                "output_window": 2,
                "batch_size": 4,
                "rnn_units": 8,
                "embed_dim_adj": 4,
                "adpadj": "none",
                "num_layers": 1,
                "remat": False,
                "max_epoch": 1,
                "use_early_stop": False,
                "pallas_interpret": True,
                "seed": 0,
            },
        )
        assert np.isfinite(result["masked_MAE"]).all(), split


def test_band_checkpoint_moves_between_storage_forms(tmp_path):
    """A checkpoint trained on per-offset band PLANES loads into the
    PACKED-slab serving form (graph_band_packed=True) through the real
    executor.load_model path — the graph collection's storage form differs,
    so the restore keeps the attached (re-derived) graph arrays and the
    evaluation metrics are identical to re-evaluating the plane form."""
    common = {
        "output_dir": str(tmp_path / "out"),
        "exp_id": "band_ckpt",
        "num_nodes": 300,
        "avg_degree": 8,
        "len_time": 120,
        "graph_split": "band",
        "input_window": 8,
        "output_window": 2,
        "batch_size": 4,
        "rnn_units": 8,
        "embed_dim_adj": 4,
        "adpadj": "none",
        "num_layers": 1,
        "remat": False,
        "max_epoch": 1,
        "use_early_stop": False,
        "pallas_interpret": True,
        "seed": 0,
    }
    kw = dict(task="traffic_state_pred", model_name="SparseATGCN",
              dataset_name="SYN_LARGE_CKPT")
    trained = run_model(other_args=common, **kw)
    plane = run_model(other_args={**common, "train": False}, **kw)
    packed = run_model(
        other_args={**common, "train": False, "graph_band_packed": True}, **kw)
    np.testing.assert_allclose(np.asarray(plane["masked_MAE"]),
                               np.asarray(trained["masked_MAE"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(packed["masked_MAE"]),
                               np.asarray(plane["masked_MAE"]),
                               rtol=1e-4, atol=1e-5)


def test_band_checkpoint_storage_form_orbax(tmp_path):
    """Same storage-form migration through the ORBAX backend (round-5 fix:
    the fallback previously existed only on the msgpack path)."""
    common = {
        "output_dir": str(tmp_path / "out"),
        "exp_id": "band_ckpt_ox",
        "num_nodes": 300,
        "avg_degree": 8,
        "len_time": 120,
        "graph_split": "band",
        "input_window": 8,
        "output_window": 2,
        "batch_size": 4,
        "rnn_units": 8,
        "embed_dim_adj": 4,
        "adpadj": "none",
        "num_layers": 1,
        "remat": False,
        "max_epoch": 1,
        "use_early_stop": False,
        "pallas_interpret": True,
        "seed": 0,
        "checkpoint_backend": "orbax",
    }
    kw = dict(task="traffic_state_pred", model_name="SparseATGCN",
              dataset_name="SYN_LARGE_CKPT_OX")
    trained = run_model(other_args=common, **kw)
    packed = run_model(
        other_args={**common, "train": False, "graph_band_packed": True}, **kw)
    np.testing.assert_allclose(np.asarray(packed["masked_MAE"]),
                               np.asarray(trained["masked_MAE"]),
                               rtol=1e-4, atol=1e-5)
