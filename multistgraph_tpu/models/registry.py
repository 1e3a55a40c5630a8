"""Model registry + factory (ref: libcity/utils/utils.py:29-39).

The reference resolves model classes by reflection over task-named modules;
here it's an explicit registry of builder functions
``builder(config, data_feature) -> flax.linen.Module``.
"""

from typing import Callable, Dict

from multistgraph_tpu.models.astgcn import build_astgcn, build_mstgcn
from multistgraph_tpu.models.baselines import build_fnn, build_rnn, build_seq2seq
from multistgraph_tpu.models.conv_baselines import build_gwnet, build_stgcn
from multistgraph_tpu.models.dcrnn import build_dcrnn
from multistgraph_tpu.models.gman import build_gman
from multistgraph_tpu.models.graph_baselines import build_agcrn, build_tgcn
from multistgraph_tpu.models.mtgnn import build_mtgnn
from multistgraph_tpu.models.multi_atgcn import build_multi_atgcn
from multistgraph_tpu.models.sparse_atgcn import build_sparse_atgcn_from_feature
from multistgraph_tpu.models.stgncde import build_stgncde
from multistgraph_tpu.models.stgode import build_stgode
from multistgraph_tpu.models.stsgcn import build_stsgcn
from multistgraph_tpu.models.sttn import build_sttn

MODEL_REGISTRY: Dict[str, Callable] = {
    "MultiATGCN": build_multi_atgcn,
    "SparseATGCN": build_sparse_atgcn_from_feature,
    "RNN": build_rnn,
    "FNN": build_fnn,
    "Seq2Seq": build_seq2seq,
    "AGCRN": build_agcrn,
    "TGCN": build_tgcn,
    "STGCN": build_stgcn,
    "GWNET": build_gwnet,
    "DCRNN": build_dcrnn,
    "ASTGCN": build_astgcn,
    "MSTGCN": build_mstgcn,
    "MTGNN": build_mtgnn,
    "STSGCN": build_stsgcn,
    "STTN": build_sttn,
    "GMAN": build_gman,
    "STGODE": build_stgode,
    "STGNCDE": build_stgncde,
}


def get_model(config, data_feature):
    name = config["model"]
    if name not in MODEL_REGISTRY:
        raise AttributeError("model {} is not registered".format(name))
    return MODEL_REGISTRY[name](config, data_feature)
