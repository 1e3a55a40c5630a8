"""Run logging: per-experiment log file + stdout (ref: libcity/utils/utils.py:107-157)."""

import logging
import os
import time
from typing import Optional


def ensure_dir(path: str) -> None:
    if path and not os.path.exists(path):
        os.makedirs(path, exist_ok=True)


def get_logger(config=None, name: Optional[str] = None, log_dir: str = "./outputs/log"):
    """Create a logger writing to `{exp_id}-{model}-{dataset}-{time}.log` + stdout.

    Log level comes from config['log_level'] (default INFO).
    """
    logger = logging.getLogger(name or "multistgraph_tpu")
    logger.handlers.clear()
    level = logging.INFO
    if config is not None:
        level = getattr(logging, str(config.get("log_level", "INFO")).upper(), logging.INFO)
    logger.setLevel(level)
    formatter = logging.Formatter(
        "%(asctime)s - %(levelname)s - %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )

    stream = logging.StreamHandler()
    stream.setFormatter(formatter)
    logger.addHandler(stream)

    if config is not None:
        ensure_dir(log_dir)
        filename = "{}-{}-{}-{}.log".format(
            config.get("exp_id", "exp"),
            config.get("model", "model"),
            config.get("dataset", "dataset"),
            time.strftime("%b-%d-%Y_%H-%M-%S"),
        )
        fh = logging.FileHandler(os.path.join(log_dir, filename))
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
