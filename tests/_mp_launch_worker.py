"""Subprocess worker for the multi-process launch test.

Run as: python tests/_mp_launch_worker.py <coordinator> <num_procs> <pid> <outdir>

The parent sets JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 so that two worker
processes form an 8-device global CPU "slice" — the TPU-native analog of
the reference's launcher + NCCL rendezvous
(`/root/reference/nntts/distributed/launch.py:69-124`,
`nntts/bin/train.py:53-68`). Each process:
  * joins via `initialize_multihost` (jax.distributed coordinator),
  * builds the 8-device global mesh,
  * assembles its local shard of a deterministic global batch,
  * runs 2 data-parallel EFTS train steps (GSPMD psum over processes),
  * prints the (replicated) loss each step,
  * process 0 saves a checkpoint (reference rank-0 gating,
    `efficient_tts_trainer.py:173-177`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator = sys.argv[1]
num_procs = int(sys.argv[2])
pid = int(sys.argv[3])
outdir = sys.argv[4]

import jax  # noqa: E402

# The machine's boot shim may register a TPU plugin and override
# JAX_PLATFORMS — force CPU back (same dance as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
try:
    # cross-process CPU collectives need gloo (newer jax defaults to it)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402

from efficient_tts_tpu.parallel.distributed import (  # noqa: E402
    initialize_multihost,
    is_primary,
)

initialize_multihost(coordinator, num_procs, pid)
assert jax.process_count() == num_procs, jax.process_count()
assert jax.device_count() == 4 * num_procs, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

from efficient_tts_tpu.models import efficient_tts as efts  # noqa: E402
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig  # noqa: E402
from efficient_tts_tpu.parallel.mesh import make_mesh  # noqa: E402
from efficient_tts_tpu.parallel.sharding import batch_sharding  # noqa: E402
from efficient_tts_tpu.train.efts_train_step import (  # noqa: E402
    make_train_step,
    shard_state,
)
from efficient_tts_tpu.train.optim import adam_warmup  # noqa: E402

cfg = EftsCNNConfig(
    num_symbols=16,
    symbol_embedding_dim=32,
    n_channels=32,
    n_text_encoder_layer=1,
    n_mel_encoder_layer=1,
    n_decoder_layer=1,
    dropout_rate=0.0,
    use_masking=True,
)
mesh = make_mesh(data=jax.device_count(), model=1, devices=jax.devices())
tx = adam_warmup(lr=1e-3, warmup_steps=10)
# deterministic init: both processes compute identical host params, then
# device_put onto the global (replicated) sharding
params = efts.init(jax.random.PRNGKey(0), cfg)
state = shard_state(params, tx, mesh)
step = make_train_step(cfg, tx, mesh=mesh)

B, T1, T2 = 8, 12, 48
rng = np.random.default_rng(7)  # same global batch on every process
full = {
    "text": rng.integers(1, 16, size=(B, T1)).astype(np.int32),
    "text_lengths": np.full((B,), T1, np.int32),
    "mel": rng.standard_normal((B, T2, 80)).astype(np.float32),
    "mel_lengths": np.full((B,), T2, np.int32),
}
lo, hi = pid * (B // num_procs), (pid + 1) * (B // num_procs)
batch = {
    k: jax.make_array_from_process_local_data(
        batch_sharding(mesh, ndim=v.ndim), v[lo:hi], v.shape
    )
    for k, v in full.items()
}

for i in range(2):
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))
    print(f"LOSS {i} {loss:.10f}", flush=True)

# Checkpoint save: in multi-process JAX the orbax save is COLLECTIVE —
# every process participates (each writes only its addressable shards,
# with internal sync barriers), producing exactly one logical checkpoint.
# This is the TPU-native analog of the reference's rank-0-only torch.save
# (`efficient_tts_trainer.py:173-177`); the rank-0 gating survives as
# logging-only.
from efficient_tts_tpu.train.checkpoint import save_checkpoint

path = save_checkpoint(outdir, state)
if is_primary():
    print(f"CKPT {path}", flush=True)

print("DONE", flush=True)
