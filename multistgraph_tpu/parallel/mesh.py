"""Device-mesh construction helpers.

The reference is single-device (SURVEY.md §2.6); this layer is the TPU-native
addition: a `jax.sharding.Mesh` over the chip grid with named axes
  * 'data'  — batch-dimension data parallelism
  * 'node'  — graph-node model parallelism (for large synthetic graphs)
XLA inserts the collectives (grad psum over 'data', gather/scatter of node
shards) from sharding annotations — no hand-written NCCL-style calls.
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the first n_devices with the given axis names.

    With one axis, shape defaults to (n,). With two axes and no shape, the
    devices are factored as evenly as possible (e.g. 8 -> (2, 4)). Pass an
    explicit `devices` list to build on a non-default backend (e.g. the
    virtual CPU mesh while an accelerator is the default platform).
    """
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            a = int(np.floor(np.sqrt(n)))
            while n % a:
                a -= 1
            shape = (a, n // a)
        else:
            raise ValueError("provide an explicit shape for >2 mesh axes")
    if int(np.prod(shape)) != n:
        raise ValueError("mesh shape {} != device count {}".format(shape, n))
    return Mesh(np.array(devices).reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
