from multistgraph_tpu.ops import losses

__all__ = ["losses"]
