"""Preemption-safe checkpointing: SIGTERM behaves like Ctrl-C.

TPU-VM spot preemption and scheduler eviction deliver SIGTERM with a
grace window; the trainers must write a resumable checkpoint before
exiting (the reference only handles KeyboardInterrupt,
`nntts/bin/train.py:250-253`).
"""

import os
import signal

import jax
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
    # metrics (and so the log branch that delivers the signal) are
    # consumed one step late, after step 4 was dispatched
    assert saved == ["checkpoint-4steps"]


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
    # the dump is named for the DIVERGENT step (3) but — metrics being
    # consumed one step late — holds the step-4 state, likely
    # NaN-propagated: hence the non-resumable name (invisible to
    # latest_checkpoint)
    assert [d for d in os.listdir(tmp_path) if d.startswith("diverged-state-")] == [
        "diverged-state-3"
    ]
    assert not any(d.startswith("checkpoint-") for d in os.listdir(tmp_path))
    from efficient_tts_tpu.train.checkpoint import latest_checkpoint

    assert latest_checkpoint(str(tmp_path)) is None


def test_checkpoint_pruning_keeps_newest(tmp_path):
    from efficient_tts_tpu.train.checkpoint import prune_checkpoints, save_checkpoint

    for step in (5, 10, 15, 20):
        save_checkpoint(str(tmp_path), {"step": jnp.asarray(step, jnp.int32)})
    removed = prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(os.listdir(tmp_path))
    assert left == ["checkpoint-15steps", "checkpoint-20steps"]
    assert len(removed) == 2
    assert prune_checkpoints(str(tmp_path), keep=None) == []  # reference mode


def test_efts_trainer_divergence_guard(tmp_path):
    """The EFTS trainer's _check_finite path: a NaN loss checkpoints and
    aborts (same guard as the GAN trainer)."""
    import optax

    from efficient_tts_tpu.models import efficient_tts as efts_m
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.train.efts_trainer import EftsTrainer

    cfg = EftsCNNConfig(
        num_symbols=12, symbol_embedding_dim=16, n_channels=16,
        n_text_encoder_layer=1, n_mel_encoder_layer=1, n_decoder_layer=1,
        dropout_rate=0.0, use_masking=True,
    )

    def batches():
        while True:
            yield 0, {
                "text": np.ones((2, 4), np.int32),
                "text_lengths": np.full((2,), 4, np.int32),
                "mel": np.zeros((2, 8, 80), np.float32),
                "mel_lengths": np.full((2,), 8, np.int32),
            }

    trainer = EftsTrainer(
        cfg, optax.adam(1e-3), batches(), outdir=str(tmp_path),
        train_max_steps=10, save_interval_steps=1000,
        eval_interval_steps=1000, log_interval_steps=1000,
    )
    trainer.init_state(efts_m.init(jax.random.PRNGKey(0), cfg))

    def bad_step(state, batch, rng):
        return {**state, "step": state["step"] + 1}, {
            "loss": jnp.asarray(float("nan")),
            "mel_loss": jnp.zeros(()),
            "duration_loss": jnp.zeros(()),
        }

    trainer._train_step = bad_step
    with pytest.raises(FloatingPointError, match="diverged"):
        trainer.run()
    assert any(d.startswith("diverged-state-") for d in os.listdir(tmp_path))
    assert not any(d.startswith("checkpoint-") for d in os.listdir(tmp_path))
