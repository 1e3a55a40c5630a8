"""Reference-checkpoint migration (utils/torch_import.py).

Round-trips our parameters through the reference's on-disk checkpoint
formats (ref: libcity/executor/traffic_state_executor.py:95,118-122) and,
when the reference + torch are importable, through the actual reference
module's ``state_dict()``, asserting identical parameters and identical
forwards after import.
"""

import os
import sys

import jax
import numpy as np
import pytest

from multistgraph_tpu.models import build_multi_atgcn
from multistgraph_tpu.utils.torch_import import (
    export_state_dict,
    import_state_dict,
    load_torch_checkpoint,
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_model import _config, _data_feature, _init, _input  # noqa: E402

REFERENCE_PATH = "/root/reference"


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(lb[path]),
                                      err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("with_static,fnn_off", [(False, False), (True, True)])
def test_roundtrip_export_import(with_static, fnn_off):
    model = build_multi_atgcn(_config(fnn_off=fnn_off),
                              _data_feature(with_static=with_static))
    x = _input()
    params = _init(model, x)
    sd = export_state_dict(params, model)
    # fresh template (different init) — import must restore the original
    template = _init(model, x, seed=1)
    restored = import_state_dict(sd, template, model)
    _tree_equal(params, restored)


def test_import_rejects_mismatched_checkpoint():
    model = build_multi_atgcn(_config(), _data_feature())
    x = _input()
    params = _init(model, x)
    sd = export_state_dict(params, model)
    sd_extra = dict(sd, stray_tensor=np.zeros(3, np.float32))
    with pytest.raises(KeyError, match="not consumed"):
        import_state_dict(sd_extra, params, model)
    sd_missing = dict(sd)
    sd_missing.pop("node_emb")
    with pytest.raises(KeyError, match="node_emb"):
        import_state_dict(sd_missing, params, model)
    sd_bad = dict(sd, node_emb=sd["node_emb"][:, :2])
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(sd_bad, params, model)


def _torch_available():
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _torch_available(), reason="torch unavailable")
def test_load_all_three_disk_formats(tmp_path):
    import torch

    model = build_multi_atgcn(_config(), _data_feature())
    x = _input()
    params = _init(model, x)
    sd_t = {k: torch.tensor(v) for k, v in export_state_dict(params, model).items()}

    cache = tmp_path / "MultiATGCN_X.m"
    torch.save((sd_t, {"state": {}}), cache)          # pipeline cache tuple
    tar = tmp_path / "MultiATGCN_X_epoch3.tar"
    torch.save({"model_state_dict": sd_t, "optimizer_state_dict": {"state": {}},
                "epoch": 3}, tar)                     # per-epoch tar dict
    bare = tmp_path / "bare.pt"
    torch.save(sd_t, bare)                            # bare state_dict

    template = _init(model, x, seed=2)
    for path in (cache, tar, bare):
        restored = import_state_dict(load_torch_checkpoint(str(path)), template, model)
        _tree_equal(params, restored)


@pytest.mark.skipif(
    not (_torch_available() and os.path.exists(os.path.join(REFERENCE_PATH, "libcity"))),
    reason="reference/torch unavailable")
def test_import_from_actual_reference_module(tmp_path):
    """End-to-end: a checkpoint written by the REFERENCE model imports and
    reproduces the reference's forward here."""
    import torch

    sys.path.insert(0, REFERENCE_PATH)
    try:
        from libcity.model.traffic_flow_prediction.MultiATGCN import MultiATGCN as TorchModel
    finally:
        sys.path.pop(0)

    feature = _data_feature(seed=3)
    cfg = _config(adjtype="multi", adpadj="bidirection")
    model = build_multi_atgcn(cfg, feature)
    x = _input(seed=5)
    params = _init(model, x)

    torch_cfg = dict(cfg)
    torch_cfg["device"] = torch.device("cpu")
    torch_feature = dict(feature)
    torch_feature["coordinate"] = feature["coordinate"].copy()
    torch_model = TorchModel(torch_cfg, torch_feature)  # its own random init
    ckpt = tmp_path / "MultiATGCN_ref_epoch0.tar"
    torch.save({"model_state_dict": torch_model.state_dict(),
                "optimizer_state_dict": {}}, ckpt)

    restored = import_state_dict(load_torch_checkpoint(str(ckpt)), params, model)
    ours = np.asarray(model.apply(restored, x, train=False))
    torch_model.eval()
    with torch.no_grad():
        theirs = torch_model({"X": torch.tensor(np.asarray(x))}).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
