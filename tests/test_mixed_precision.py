"""bf16 mixed-precision training path: loss tracks f32 and trains."""

import numpy as np
import jax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.train.efts_train_step import make_train_step
from efficient_tts_tpu.train.optim import adam_warmup
from efficient_tts_tpu.train.state import create_state

BASE = dict(
    num_symbols=40,
    symbol_embedding_dim=64,
    n_channels=64,
    n_text_encoder_layer=2,
    n_mel_encoder_layer=1,
    n_decoder_layer=2,
    dropout_rate=0.0,
    use_masking=True,
)


def _batch(b=4, t1=16, t2=64):
    rng = np.random.default_rng(0)
    return {
        "text": rng.integers(1, 40, size=(b, t1)).astype(np.int32),
        "text_lengths": np.full((b,), t1, np.int32),
        "mel": rng.standard_normal((b, t2, 80)).astype(np.float32),
        "mel_lengths": np.full((b,), t2, np.int32),
    }


def test_bf16_forward_tracks_f32():
    params = efts.init(jax.random.PRNGKey(0), EftsCNNConfig(**BASE))
    batch = _batch()
    out32 = efts.forward(
        params, EftsCNNConfig(**BASE), batch["text"], batch["text_lengths"],
        batch["mel"], batch["mel_lengths"], deterministic=True,
    )
    out16 = efts.forward(
        params, EftsCNNConfig(**BASE, compute_dtype="bfloat16"),
        batch["text"], batch["text_lengths"], batch["mel"], batch["mel_lengths"],
        deterministic=True,
    )
    assert out16["mel_pred"].dtype == np.float32
    rel = abs(float(out16["loss"]) - float(out32["loss"])) / max(
        float(out32["loss"]), 1e-6
    )
    assert rel < 0.05, f"bf16 loss drifts {rel:.3f} from f32"


def test_bf16_training_decreases_loss():
    cfg = EftsCNNConfig(**BASE, compute_dtype="bfloat16")
    tx = adam_warmup(lr=1e-3, warmup_steps=10)
    params = efts.init(jax.random.PRNGKey(0), cfg)
    state = create_state(params, tx)
    step = make_train_step(cfg, tx)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(20):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    # params remain f32 (master weights)
    assert all(
        leaf.dtype == np.float32
        for leaf in jax.tree_util.tree_leaves(state["params"])
    )
