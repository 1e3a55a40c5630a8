"""Multi-host launch: jax.distributed initialization wrapper.

The reference is single-device (SURVEY §2.6); all multi-device evidence in
this repo runs one process over a real or virtual mesh. On a real TPU pod
each HOST runs the same program and must join the cluster before any jax
call — this wrapper owns that handshake so `run_model --distributed true`
works on pods (and is a no-op on a single host):

    # per host (or let the TPU runtime env vars fill everything in):
    python run_model.py --distributed true ...

After initialization, `jax.devices()` spans the whole pod; the existing
mesh/sharding code (parallel/mesh.py, ops/spmm_boundary.py) is unchanged —
collectives ride ICI within a slice and DCN across hosts, inserted by XLA
from the same shardings.
"""

import os
from typing import Optional

from multistgraph_tpu.utils import get_logger


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join (or skip) the multi-host cluster. Returns True when distributed
    mode is active.

    Resolution order (mirrors jax.distributed.initialize):
      1. explicit arguments;
      2. standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
         JAX_PROCESS_ID, or a TPU/cloud runtime's automatic discovery);
      3. neither present -> single-host no-op, returns False.

    Must run BEFORE the first jax device query on every host; safe to call
    twice (the second call is ignored).
    """
    logger = get_logger(name="multistgraph_tpu.parallel")
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    auto_tpu = bool(os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not auto_tpu:
        if num_processes in (None, 1):
            logger.info("single-host run; jax.distributed not initialized")
            return False

    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as exc:
        if "already" in str(exc):  # second call: idempotent no-op
            pass
        elif "before any JAX calls" in str(exc):
            # the backend is already up single-host (e.g. runtime-looking env
            # vars on a relay-attached chip, discovered after first jax use)
            logger.info("jax already initialized single-host; skipping distributed init")
            return False
        else:
            raise
    except ValueError:
        # runtime-looking env vars present but no usable cluster config
        # (e.g. a relay-attached single chip): stay single-host
        logger.info("no usable cluster configuration; staying single-host")
        return False
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
