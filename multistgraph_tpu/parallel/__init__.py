from multistgraph_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from multistgraph_tpu.parallel.sharding import (
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "shard_batch",
]
