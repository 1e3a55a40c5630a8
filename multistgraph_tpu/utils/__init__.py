from multistgraph_tpu.utils.logging import get_logger, ensure_dir
from multistgraph_tpu.utils.preprocess import preprocess_data
from multistgraph_tpu.utils.seeds import set_random_seed

__all__ = ["get_logger", "ensure_dir", "preprocess_data", "set_random_seed"]
