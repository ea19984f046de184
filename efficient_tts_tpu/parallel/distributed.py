"""Multi-host initialization.

TPU-native replacement for the reference's per-GPU process launcher +
NCCL rendezvous (`/root/reference/nntts/distributed/launch.py:69-124`,
`nntts/bin/train.py:53-68`): one process per host calls
`jax.distributed.initialize`, after which `jax.devices()` spans the
whole slice and every mesh/collective rides ICI (intra-slice) or DCN
(inter-host) automatically. There is no explicit process-group or
all-reduce API to manage -- GSPMD inserts the gradient psum that DDP
performed via NCCL hooks.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent `jax.distributed.initialize` wrapper.

    On TPU pods all arguments are discovered from the environment; on
    CPU/GPU fleets pass them explicitly (the analog of the reference's
    MASTER_ADDR/WORLD_SIZE/RANK env protocol, `launch.py:78-99`).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        log.info("jax.distributed already initialized: %s", e)
    log.info(
        "process %d/%d: %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def is_primary() -> bool:
    """True on the host that should log/save (reference rank-0 gating,
    `efficient_tts_trainer.py:173-177`)."""
    return jax.process_index() == 0
