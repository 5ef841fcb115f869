"""Multi-host (multi-process) initialization + per-host data sharding.

The TPU-pod analog of the reference's torch.distributed/SLURM launch
(``/root/reference/nequip/train/simple_ddp.py``, ``docs/guide/accelerations/
ddp_training.md:16-35``): one Python process per host, connected by
``jax.distributed.initialize``; afterwards ``jax.device_count()`` spans the
slice/pod and every Mesh-based code path (DP / spatial / 2-D) works
unchanged over ICI+DCN.

Launch recipe (SLURM or GKE set the env automatically on TPU VMs)::

    from nequip_tpu.parallel import init_distributed
    init_distributed()                      # no-op on a single host
    # ... build meshes / Trainer as usual ...

Per-host data sharding: give every process its slice of the global batch
stream with ``DataLoader(..., process_index=jax.process_index(),
process_count=jax.process_count())`` — the deterministic ``(seed, epoch)``
ordering makes the shards disjoint and reproducible.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("nequip_tpu")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize multi-process JAX; returns True if distributed.

    With no arguments, relies on jax's automatic cluster detection (TPU pod
    metadata, SLURM, Open MPI); explicitly passed values win.  A no-op
    (returns False) when neither arguments nor a recognizable multi-process
    environment are present, so single-host runs need no special casing.
    """
    import jax

    explicit = coordinator_address is not None
    auto = any(
        v in os.environ
        for v in (
            "SLURM_JOB_NUM_NODES",
            "OMPI_COMM_WORLD_SIZE",
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
        )
    )
    if not explicit and not auto:
        log.info("single-host run (no multi-process environment detected)")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    log.info(
        f"jax.distributed initialized: process {jax.process_index()} / "
        f"{jax.process_count()}, {jax.local_device_count()} local of "
        f"{jax.device_count()} global devices"
    )
    return True
