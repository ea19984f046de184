"""Train state: {params, opt_state, step} pytree.

The functional analog of the reference checkpoint dict
{model, optimizer, scheduler, steps, epochs}
(`trainers/efficient_tts_trainer.py:78-99`): optax folds the scheduler
into the optimizer state, `step` is carried explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def create_state(params, tx: optax.GradientTransformation) -> dict:
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def apply_updates(state: dict, grads, tx: optax.GradientTransformation) -> dict:
    updates, new_opt_state = tx.update(grads, state["opt_state"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    return {
        "params": new_params,
        "opt_state": new_opt_state,
        "step": state["step"] + 1,
    }
