"""Preemption-safe checkpointing: SIGTERM behaves like Ctrl-C.

TPU-VM spot preemption and scheduler eviction deliver SIGTERM with a
grace window; the trainers must write a resumable checkpoint before
exiting (the reference only handles KeyboardInterrupt,
`nntts/bin/train.py:250-253`).
"""

import os
import signal

import jax.numpy as jnp
import numpy as np
import pytest

from efficient_tts_tpu.train.hifigan_trainer import HiFiGANTrainer
from efficient_tts_tpu.utils.preemption import convert_sigterm


def test_convert_sigterm_raises_keyboard_interrupt():
    before = signal.getsignal(signal.SIGTERM)
    with pytest.raises(KeyboardInterrupt):
        with convert_sigterm():
            signal.raise_signal(signal.SIGTERM)
    assert signal.getsignal(signal.SIGTERM) is before


def test_convert_sigterm_restores_handler_on_clean_exit():
    before = signal.getsignal(signal.SIGTERM)
    with convert_sigterm():
        assert signal.getsignal(signal.SIGTERM) is not before
    assert signal.getsignal(signal.SIGTERM) is before


def test_trainer_checkpoints_on_sigterm(tmp_path):
    """A SIGTERM mid-training run writes a resumable checkpoint via the
    interrupt-save path and re-raises."""
    state = {
        "gen": {"params": {"w": jnp.ones((3,))}},
        "step": jnp.asarray(0, jnp.int32),
    }

    def train_step(state, batch):
        step = state["step"] + 1
        return {**state, "step": step}, {"g_loss": jnp.zeros(())}

    def batches():
        while True:
            yield None, {"x": np.zeros((1,))}

    trainer = HiFiGANTrainer(
        train_step,
        state,
        batches(),
        outdir=str(tmp_path),
        train_max_steps=100,
        save_interval_steps=1000,
        log_interval_steps=3,  # deliver the signal from the log branch
    )

    class Writer:
        def add_scalar(self, *a):
            signal.raise_signal(signal.SIGTERM)

    trainer.writer = Writer()
    with pytest.raises(KeyboardInterrupt):
        trainer.run()
    saved = [d for d in os.listdir(tmp_path) if d.startswith("checkpoint-")]
    assert saved == ["checkpoint-3steps"]


def test_trainer_divergence_guard_checkpoints_and_aborts(tmp_path):
    """A non-finite loss saves an emergency checkpoint and raises
    FloatingPointError instead of training on NaNs (divergence guard,
    absent upstream)."""
    state = {
        "gen": {"params": {"w": jnp.ones((3,))}},
        "step": jnp.asarray(0, jnp.int32),
    }

    def train_step(state, batch):
        step = state["step"] + 1
        loss = jnp.where(step >= 3, jnp.nan, 0.5)
        return {**state, "step": step}, {"g_loss": loss, "d_loss": jnp.zeros(())}

    def batches():
        while True:
            yield None, {"x": np.zeros((1,))}

    trainer = HiFiGANTrainer(
        train_step,
        state,
        batches(),
        outdir=str(tmp_path),
        train_max_steps=100,
        save_interval_steps=1000,
        log_interval_steps=1000,
    )
    with pytest.raises(FloatingPointError, match="diverged"):
        trainer.run()
    saved = [d for d in os.listdir(tmp_path) if d.startswith("checkpoint-")]
    assert saved == ["checkpoint-3steps"]
