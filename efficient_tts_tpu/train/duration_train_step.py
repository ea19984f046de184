"""Train step for the standalone DurationModel (external-duration flow).

The reference trains `DurationModel` (`nntts/models/duration_model.py`)
through the generic trainer with `CommonDurationModelCollate` batches
(ppg, durations, spkid). Here the step is one jitted program over
`collate_duration_model` dict batches; the host loop is `EftsTrainer`
(interval semantics are model-agnostic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from efficient_tts_tpu.models import duration_model
from efficient_tts_tpu.models.duration_model import DurationModelConfig


def init_duration_state(key, cfg: DurationModelConfig, tx) -> dict:
    params = duration_model.init(key, cfg)
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "rng": jax.random.fold_in(key, 1),
    }


def make_duration_train_step(cfg: DurationModelConfig, tx):
    """Returns train_step(state, batch) -> (state, metrics) for batches
    from `data/collate.py:collate_duration_model`."""

    def loss_fn(params, batch, rng):
        out = duration_model.forward(
            params,
            cfg,
            batch["ppg"],
            batch["lengths"],
            batch["durations"],
            spkids=batch.get("spkids") if cfg.num_spks else None,
            rng=rng,
            deterministic=False,
        )
        return out["loss"], out

    @jax.jit
    def train_step(state, batch):
        rng, step_rng = jax.random.split(state["rng"])
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, step_rng
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "rng": rng,
        }
        return new_state, {"loss": loss}

    return train_step
