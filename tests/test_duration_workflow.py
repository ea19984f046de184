"""External-duration workflow: collates + DurationModel training.

Covers the reference's `TTSCollate`/`CommonDurationModelCollate`
(`collate_fn.py:7-98`) semantics and a short DurationModel fit.
"""

import numpy as np
import jax

from efficient_tts_tpu.data.collate import (
    collate_duration_model,
    collate_text_mel_durations,
)
from efficient_tts_tpu.models.duration_model import DurationModelConfig
from efficient_tts_tpu.models import duration_model
from efficient_tts_tpu.train.duration_train_step import (
    init_duration_state,
    make_duration_train_step,
)
from efficient_tts_tpu.train.optim import adam_warmup


def test_collate_text_mel_durations_sum_invariant():
    rng = np.random.default_rng(0)
    batch = []
    for t1, t2 in [(5, 40), (7, 61), (3, 22)]:
        text = rng.integers(1, 50, t1)
        dur = rng.integers(1, 5, t1)
        # make sum(dur) deliberately smaller than the mel length
        mel = rng.standard_normal((t2, 8)).astype(np.float32)
        batch.append((text, dur, mel, 3))
    out = collate_text_mel_durations(batch, text_bucket=4, mel_bucket=16)
    b, t1p = out["durations"].shape
    assert out["mel"].shape[1] % 16 == 0
    # TTSCollate invariant (`collate_fn.py:54-55`): per row,
    # sum(durations) == recorded mel length when durations fell short
    for i in range(b):
        assert out["durations"][i].sum() == out["mel_lengths"][i]
    assert (out["spkids"] == 3).all()
    # zero padding beyond the true text length
    assert (out["durations"][2, 3:] == 0).all() or out["durations"][2, 2] > 0


def test_collate_duration_model_shapes():
    rng = np.random.default_rng(1)
    batch = [
        (rng.standard_normal((6, 12)).astype(np.float32), rng.integers(1, 4, 6), 1),
        (rng.standard_normal((9, 12)).astype(np.float32), rng.integers(1, 4, 9), 2),
    ]
    out = collate_duration_model(batch, bucket=8)
    assert out["ppg"].shape == (2, 16, 12)
    assert out["durations"].shape == (2, 16)
    assert (out["lengths"] == [6, 9]).all()
    assert (out["durations"][0, 6:] == 0).all()


def test_duration_model_trains():
    """A linear ppg->duration mapping is learnable; loss decreases and
    inference rounds to linear-domain ints (`duration_model.py:100-110`)."""
    # reference quirk preserved: the active DurationPredictor's first conv
    # takes n_chans inputs (`duration_predictor.py:57`), so idim must equal
    # duration_predictor_chans
    cfg = DurationModelConfig(
        idim=32, duration_predictor_chans=32,
        duration_predictor_dropout_rate=0.0,
    )
    tx = adam_warmup(lr=1e-2, warmup_steps=None, weight_decay=0.0)
    state = init_duration_state(jax.random.PRNGKey(0), cfg, tx)
    step = make_duration_train_step(cfg, tx)

    rng = np.random.default_rng(2)
    ppg = rng.standard_normal((4, 16, 32)).astype(np.float32)
    dur = np.clip(np.abs(ppg[:, :, 0] * 3) + 1, 1, 8).astype(np.int32)
    batch = {
        "ppg": ppg,
        "lengths": np.full((4,), 16, np.int32),
        "durations": dur,
        "spkids": np.zeros((4,), np.int32),
    }
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    pred = duration_model.inference(state["params"], cfg, ppg)
    pred = np.asarray(pred)
    assert pred.shape == (4, 16)
    assert np.allclose(pred, np.round(pred))  # rounded linear-domain
    assert (pred >= 0).all()
