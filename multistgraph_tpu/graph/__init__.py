from multistgraph_tpu.graph import geometry, laplacian, views

__all__ = ["geometry", "laplacian", "views"]
