from multistgraph_tpu.config.parser import Config, ConfigError, load_config

__all__ = ["Config", "ConfigError", "load_config"]
