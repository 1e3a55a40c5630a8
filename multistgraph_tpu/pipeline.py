"""One-shot train+evaluate pipeline (ref: libcity/pipeline/pipeline.py:16-62)."""

import os
import random
from typing import Any, Dict, Optional

from multistgraph_tpu.config import load_config
from multistgraph_tpu.data import get_dataset
from multistgraph_tpu.executor.executor import get_executor
from multistgraph_tpu.models import get_model
from multistgraph_tpu.utils import ensure_dir, get_logger, set_random_seed


def run_model(
    task: str = None,
    model_name: str = None,
    dataset_name: str = None,
    config_file: str = None,
    saved_model: bool = True,
    train: bool = True,
    other_args: Optional[Dict[str, Any]] = None,
):
    """Train (or reuse a cached model) and evaluate; returns the test-result table."""
    config = load_config(
        task, model_name, dataset_name, config_file, saved_model, train, other_args
    )
    if not config.get("gpu", True):
        # Reference parity (`gpu: false` pins torch to CPU,
        # /root/reference/libcity/executor/traffic_state_executor.py device
        # selection): force the CPU backend. Must happen before the first
        # device query — a pre-registered accelerator plugin ignores the
        # JAX_PLATFORMS env var, only this config update works.
        import jax

        jax.config.update("jax_platforms", "cpu")
    if config.get("distributed", False):
        # multi-host pod launch: every host joins the cluster before any jax
        # call; devices then span the pod (parallel/launch.py)
        from multistgraph_tpu.parallel.launch import initialize_distributed

        initialize_distributed()
    exp_id = config.get("exp_id", None)
    if exp_id is None:
        exp_id = int(random.SystemRandom().random() * 100000)
        config["exp_id"] = exp_id

    logger = get_logger(config)
    logger.info(
        "Begin pipeline, task=%s, model_name=%s, dataset_name=%s, exp_id=%s",
        task, model_name, dataset_name, exp_id,
    )
    seed = config.get("seed", 0)
    set_random_seed(seed)

    dataset = get_dataset(config)
    train_data, valid_data, test_data = dataset.get_data()
    data_feature = dataset.get_data_feature()

    model = get_model(config, data_feature)
    executor = get_executor(config, model, data_feature)

    output_root = config.get("output_dir", "./outputs")
    model_cache_file = os.path.join(
        output_root, str(exp_id), "model_cache",
        "{}_{}.m".format(model_name, dataset_name),
    )
    cached = os.path.exists(model_cache_file) or os.path.exists(model_cache_file + ".orbax")
    if train or not cached:
        executor.train(train_data, valid_data)
        if saved_model:
            ensure_dir(os.path.dirname(model_cache_file))
            executor.save_model(model_cache_file)
    else:
        executor.load_model(model_cache_file)
    return executor.evaluate(test_data)
