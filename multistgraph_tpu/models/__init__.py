from multistgraph_tpu.models.multi_atgcn import MultiATGCN, build_multi_atgcn, make_loss_fn
from multistgraph_tpu.models.registry import MODEL_REGISTRY, get_model

__all__ = ["MultiATGCN", "build_multi_atgcn", "make_loss_fn", "MODEL_REGISTRY", "get_model"]
