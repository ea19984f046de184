"""Device mesh construction.

TPU-native replacement for the reference's process-based DDP launcher +
NCCL process groups (`/root/reference/nntts/distributed/launch.py`,
`nntts/bin/train.py:53-68`): a single program drives all chips through a
`jax.sharding.Mesh`; collectives are inserted by GSPMD from sharding
annotations and ride ICI within a slice (DCN across hosts via
`jax.distributed.initialize`, see `distributed.py`).

Axes:
  data  -- batch (data parallel; gradient psum == DDP all-reduce)
  model -- channel/tensor parallel (new capability vs the reference,
           used to shard the HiFi-GAN generator when it exceeds one
           chip's HBM -- BASELINE.json north star)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None, model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With `data=None` the data axis absorbs all devices not used by
    `model`.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def fit_data_extent(batch_size: int, n_available: int) -> int:
    """Largest divisor of `batch_size` that is <= n_available -- the
    usable data-parallel extent for a given per-step batch."""
    for d in range(min(batch_size, n_available), 0, -1):
        if batch_size % d == 0:
            return d
    return 1
