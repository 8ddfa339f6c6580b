"""Multi-host launch helpers.

On a TPU pod slice each host runs this same program;
`jax.distributed.initialize` wires the hosts into one runtime so
`jax.devices()` spans the slice and `Mesh`/`shard_map` collectives ride
ICI between chips and DCN between hosts.  The reference has no multi-host
story at all (single ROS process); here the distributed keyframe
adjustment (parallel.keyframe_dist) is the component that scales across
hosts, with scan ingestion done per-host on disjoint bag segments.
"""

import logging
import os
from typing import Optional

log = logging.getLogger("dmsa_launch")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed from args or the standard env variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on Cloud
    TPU pods jax.distributed.initialize() autodetects everything).

    Safe to call on a single host (no-op without coordinator info).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        try:
            # Cloud TPU pod autodetection path
            jax.distributed.initialize()
            log.info(
                "jax.distributed initialized: process %d/%d, %d global devices",
                jax.process_index(),
                jax.process_count(),
                len(jax.devices()),
            )
        except Exception:
            log.info("single-process mode (%d local devices)", len(jax.devices()))
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_keyframe_mesh(axis_name: str = "data"):
    """Mesh over ALL devices in the (possibly multi-host) runtime for the
    distributed keyframe adjustment."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))
