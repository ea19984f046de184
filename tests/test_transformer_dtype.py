"""EFTS-Transformer bf16 compute mode + flash-attention dispatch logic.

The flash kernel itself is TPU-Mosaic-only (asserted on hardware by
`scripts/check_flash_attention.py`); here we test the CPU-visible
contract: eligibility gating, the auto fallback, and that bf16 compute
keeps losses f32/finite and the alignment chain f32.
"""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.models import efficient_tts_transformer as mod
from efficient_tts_tpu.models.efficient_tts_transformer import (
    EftsTransformerConfig,
)
from efficient_tts_tpu.nn.attention import (
    _flash_eligible,
    multi_head_attention,
    multi_head_attention_init,
)

CFG = dict(
    num_symbols=12,
    n_channels=64,
    n_heads=2,
    ff_hidden=128,
    n_text_encoder_layer=1,
    n_mel_encoder_layer=1,
    n_decoder_layer=1,
    dropout_rate=0.0,
    use_masking=True,
)


def _batch(b=2, t1=8, t2=32):
    rng = np.random.RandomState(0)
    return dict(
        text=jnp.asarray(rng.randint(1, 12, (b, t1)), jnp.int32),
        text_lengths=jnp.asarray([t1, t1 - 2], jnp.int32),
        mel=jnp.asarray(rng.randn(b, t2, 80), jnp.float32),
        mel_lengths=jnp.asarray([t2, t2 - 8], jnp.int32),
    )


def test_flash_eligibility_gate():
    mask3 = jnp.ones((2, 1, 256), bool)
    full_mask = jnp.ones((2, 256, 256), bool)
    assert _flash_eligible(256, 256, mask3, 0.0, True)
    assert _flash_eligible(256, 256, None, 0.0, True)
    assert not _flash_eligible(200, 200, mask3, 0.0, True)   # not 128-divisible
    assert not _flash_eligible(256, 128, mask3, 0.0, True)   # cross-attention
    assert not _flash_eligible(256, 256, full_mask, 0.0, True)  # full mask
    assert not _flash_eligible(256, 256, mask3, 0.1, False)  # attn dropout


def test_auto_impl_falls_back_to_xla_off_tpu():
    params = multi_head_attention_init(jax.random.PRNGKey(0), 2, 64)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 128, 64), jnp.float32)
    y_auto = multi_head_attention(params, x, x, x, 2, impl="auto")
    y_xla = multi_head_attention(params, x, x, x, 2, impl="xla")
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_xla))


def test_bf16_forward_matches_f32_coarsely_and_keeps_f32_contract():
    batch = _batch()
    cfg32 = EftsTransformerConfig(**CFG)
    cfg16 = EftsTransformerConfig(**CFG, compute_dtype="bfloat16")
    params = mod.init(jax.random.PRNGKey(0), cfg32)
    out32 = mod.forward(
        params, cfg32, batch["text"], batch["text_lengths"], batch["mel"],
        batch["mel_lengths"], deterministic=True,
    )
    out16 = mod.forward(
        params, cfg16, batch["text"], batch["text_lengths"], batch["mel"],
        batch["mel_lengths"], deterministic=True,
    )
    # contract: losses/mel_pred/alignment artifacts are f32 either way
    for k in ("loss", "mel_loss", "duration_loss"):
        assert out16[k].dtype == jnp.float32
        assert np.isfinite(float(out16[k]))
    assert out16["mel_pred"].dtype == jnp.float32
    assert out16["reconst_alpha"].dtype == jnp.float32
    assert out16["imv"].dtype == jnp.float32
    # bf16 tower noise stays small on an untrained net
    assert abs(float(out16["loss"]) - float(out32["loss"])) < 0.05 * abs(
        float(out32["loss"])
    )


def test_bf16_gradients_flow():
    batch = _batch()
    cfg16 = EftsTransformerConfig(**CFG, compute_dtype="bfloat16")
    params = mod.init(jax.random.PRNGKey(0), cfg16)

    def loss_fn(p):
        return mod.forward(
            p, cfg16, batch["text"], batch["text_lengths"], batch["mel"],
            batch["mel_lengths"], deterministic=True,
        )["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # params stay f32; at least the decoder/attention kernels get signal
    assert all(g.dtype == jnp.float32 for g in leaves)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    )
    assert gnorm > 0


def test_infer_durations_e_is_f32_under_bf16():
    batch = _batch()
    cfg16 = EftsTransformerConfig(**CFG, compute_dtype="bfloat16")
    params = mod.init(jax.random.PRNGKey(0), cfg16)
    e, value, tmask = mod.infer_durations(
        params, cfg16, batch["text"], batch["text_lengths"]
    )
    assert e.dtype == jnp.float32
