"""EFTS-Transformer: EfficientTTS with transformer encoders/decoder.

The EfficientTTS paper (arXiv:2012.03500) defines both CNN and
Transformer variants; the reference repo ships only EFTS-CNN and its
transformer stack is import-broken (`transformer_block.py:14` imports a
nonexistent `Conv1dLinear` -- SURVEY.md §2.2). This module provides a
working variant: the IMV alignment machinery (`ops/alignment.py`) is
shared verbatim with EFTS-CNN; text/mel encoders and the decoder are
transformer blocks with scaled positional encodings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from efficient_tts_tpu.losses.fastspeech import fastspeech_loss
from efficient_tts_tpu.nn.attention import add_positional_encoding
from efficient_tts_tpu.nn.duration_predictor import (
    duration_predictor,
    duration_predictor_infer,
    duration_predictor_init,
)
from efficient_tts_tpu.nn.layers import (
    embedding,
    embedding_init,
    leaky_relu,
    linear,
    linear_init,
)
from efficient_tts_tpu.nn.transformer import transformer_block, transformer_block_init
from efficient_tts_tpu.ops.alignment import (
    aligned_positions,
    alignment_from_positions,
    imv_from_alpha,
    index_vector,
    scaled_dot_attention,
)
from efficient_tts_tpu.utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class EftsTransformerConfig:
    num_symbols: int = 148
    odim: int = 80
    n_channels: int = 384
    n_heads: int = 4
    ff_hidden: int = 1536
    n_text_encoder_layer: int = 4
    n_mel_encoder_layer: int = 2
    n_decoder_layer: int = 4
    n_duration_layer: int = 2
    dropout_rate: float = 0.1
    use_masking: bool = True
    # "frame" (reference weighting) | "utterance" (equal per-utterance
    # weight; see EftsCNNConfig.loss_normalize and VALIDATION §3e)
    loss_normalize: str = "frame"
    duration_offset: float = 1.0
    sigma: float = 0.01
    sigma_e: float = 0.5
    use_conv_ff: bool = True
    kernel_size: int = 3
    # "bfloat16" runs the transformer towers (attention + FF) in bf16
    # with f32 MXU accumulation; params, the IMV alignment chain, and
    # losses stay f32 — the same contract as the CNN variant.
    compute_dtype: str | None = None
    # "flash" routes eligible self-attention through the fused Pallas
    # TPU kernel (blockwise, the [B,H,T,T] scores never reach HBM);
    # "auto" = flash on TPU / XLA elsewhere. Ineligible shapes (T not a
    # multiple of 128) or attention-prob dropout fall back to XLA.
    attn_impl: str = "xla"


def _compute_dtype(cfg: EftsTransformerConfig):
    if cfg.compute_dtype in (None, "float32", "f32"):
        return None
    return jnp.dtype(cfg.compute_dtype)


def init(key, cfg: EftsTransformerConfig) -> dict:
    keys = jax.random.split(key, 9)
    c = cfg.n_channels
    return {
        "text_embedding": embedding_init(keys[0], cfg.num_symbols, c),
        "text_encoder": transformer_block_init(
            keys[1], cfg.n_text_encoder_layer, c, cfg.n_heads, cfg.ff_hidden,
            cfg.use_conv_ff, cfg.kernel_size,
        ),
        "text_key": linear_init(keys[2], c, c),
        "text_value": linear_init(keys[3], c, c),
        "mel_prenet": linear_init(keys[4], cfg.odim, c),
        "mel_encoder": transformer_block_init(
            keys[5], cfg.n_mel_encoder_layer, c, cfg.n_heads, cfg.ff_hidden,
            cfg.use_conv_ff, cfg.kernel_size,
        ),
        "decoder": transformer_block_init(
            keys[6], cfg.n_decoder_layer, c, cfg.n_heads, cfg.ff_hidden,
            cfg.use_conv_ff, cfg.kernel_size,
        ),
        "mel_out": linear_init(keys[7], c, cfg.odim),
        "duration_predictor": duration_predictor_init(
            keys[8], c, cfg.n_duration_layer, c
        ),
        "pe_scale": jnp.ones(()),
    }


def _encode_text(params, cfg, text, text_mask, rng, deterministic):
    h = embedding(params["text_embedding"], text)
    cdt = _compute_dtype(cfg)
    if cdt is not None:
        h = h.astype(cdt)
    h = add_positional_encoding(h, scale=params["pe_scale"].astype(h.dtype))
    h = transformer_block(
        params["text_encoder"], h, cfg.n_heads,
        mask=text_mask[:, None, :], use_conv_ff=cfg.use_conv_ff,
        dropout_rate=cfg.dropout_rate, rng=rng, deterministic=deterministic,
        attn_impl=cfg.attn_impl,
    )
    maskf = text_mask.astype(h.dtype)[:, :, None]
    key = linear(params["text_key"], h) * maskf
    value = linear(params["text_value"], h) * maskf
    return key, value


def forward(
    params: dict,
    cfg: EftsTransformerConfig,
    text: jnp.ndarray,
    text_lengths: jnp.ndarray,
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    rng=None,
    deterministic: bool = True,
) -> dict:
    b, t1 = text.shape
    t2 = speech.shape[1]
    text_mask = sequence_mask(text_lengths, t1)
    mel_mask = sequence_mask(speech_lengths, t2)
    text_mel_mask = text_mask[:, :, None] & mel_mask[:, None, :]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_text, r_mel, r_dec, r_dur = jax.random.split(rng, 4)

    text_key, text_value = _encode_text(
        params, cfg, text, text_mask, r_text, deterministic
    )

    cdt = _compute_dtype(cfg)
    speech_c = speech.astype(cdt) if cdt is not None else speech
    mel_h = leaky_relu(linear(params["mel_prenet"], speech_c), 0.1)
    mel_h = add_positional_encoding(mel_h, scale=params["pe_scale"].astype(mel_h.dtype))
    mel_h = transformer_block(
        params["mel_encoder"], mel_h, cfg.n_heads,
        mask=mel_mask[:, None, :], use_conv_ff=cfg.use_conv_ff,
        dropout_rate=cfg.dropout_rate, rng=r_mel, deterministic=deterministic,
        attn_impl=cfg.attn_impl,
    )

    alpha = scaled_dot_attention(mel_h, text_key, text_mask)
    alpha = alpha * text_mel_mask.astype(alpha.dtype)
    p = index_vector(text_mask)
    imv = imv_from_alpha(alpha, p, mel_mask, text_lengths)
    e = aligned_positions(imv, p, mel_mask, text_mask, sigma_e=cfg.sigma_e)
    reconst_alpha = alignment_from_positions(
        e, t2, sigma=cfg.sigma, mel_mask=mel_mask, text_mask=text_mask
    ) * text_mel_mask.astype(jnp.float32)

    alpha_c = reconst_alpha.astype(cdt) if cdt is not None else reconst_alpha
    expanded = jnp.einsum(
        "bst,bsc->btc", alpha_c, text_value, preferred_element_type=jnp.float32
    )
    if cdt is not None:
        expanded = expanded.astype(cdt)
    expanded = expanded * mel_mask.astype(expanded.dtype)[:, :, None]
    dec = transformer_block(
        params["decoder"], expanded, cfg.n_heads,
        mask=mel_mask[:, None, :], use_conv_ff=cfg.use_conv_ff,
        dropout_rate=cfg.dropout_rate, rng=r_dec, deterministic=deterministic,
        attn_impl=cfg.attn_impl,
    )
    mel_pred = linear(params["mel_out"], dec).astype(jnp.float32)
    mel_pred = mel_pred * mel_mask.astype(mel_pred.dtype)[:, :, None]

    e_sg = jax.lax.stop_gradient(e)
    delta_e = jnp.concatenate([e_sg[:, :1], e_sg[:, 1:] - e_sg[:, :-1]], axis=1)
    log_delta_e = jnp.where(
        text_mask, jnp.log(delta_e + cfg.duration_offset), 0.0
    )
    dur_pred = duration_predictor(
        params["duration_predictor"], text_value,
        pad_mask=~text_mask.astype(bool), dropout_rate=cfg.dropout_rate,
        rng=r_dur, deterministic=deterministic,
    ).astype(jnp.float32)
    mel_loss, dur_loss = fastspeech_loss(
        mel_pred, speech, dur_pred, log_delta_e, text_mask, mel_mask,
        use_masking=cfg.use_masking, loss_normalize=cfg.loss_normalize,
    )
    return {
        "loss": mel_loss + dur_loss,
        "mel_loss": mel_loss,
        "duration_loss": dur_loss,
        "imv": imv,
        "reconst_alpha": reconst_alpha,
        "mel_pred": mel_pred,
        # detached aligned positions (duration target integral), for
        # calibration checks — same contract as the CNN variant
        "aligned_e": e_sg,
    }


def infer_durations(params, cfg, text, text_lengths):
    t1 = text.shape[1]
    text_mask = sequence_mask(text_lengths, t1)
    _, text_value = _encode_text(params, cfg, text, text_mask, None, True)
    delta_e = duration_predictor_infer(
        params["duration_predictor"], text_value,
        pad_mask=~text_mask.astype(bool), offset=cfg.duration_offset,
    )
    # f32 cumsum regardless of compute dtype (same guard as the CNN)
    return jnp.cumsum(delta_e.astype(jnp.float32), axis=1), text_value, text_mask


def infer_decode(params, cfg, text_value, e, text_mask, t2: int, compute_dtype=None):
    """`compute_dtype=jnp.bfloat16` runs the expansion matmul and decoder
    in bf16 (f32 accumulation); alignment reconstruction stays f32 —
    same contract as the CNN variant's `infer_decode`."""
    reconst_alpha = alignment_from_positions(
        e, t2, sigma=cfg.sigma, mel_mask=None, text_mask=text_mask
    )
    value, alpha = text_value, reconst_alpha
    if compute_dtype is not None:
        value = value.astype(compute_dtype)
        alpha = alpha.astype(compute_dtype)
    expanded = jnp.einsum(
        "bst,bsc->btc", alpha, value, preferred_element_type=jnp.float32
    ).astype(value.dtype)
    dec = transformer_block(
        params["decoder"], expanded, cfg.n_heads, use_conv_ff=cfg.use_conv_ff,
        attn_impl=cfg.attn_impl,
    )
    return linear(params["mel_out"], dec).astype(jnp.float32), reconst_alpha
