"""EFTS-CNN: non-autoregressive text-to-mel with IMV monotonic alignment.

TPU-native redesign of the reference `EfficientTTSCNN`
(`/root/reference/nntts/models/efficient_tts.py:23-435`): same behavioral
contract (architecture hyperparameters, IMV math with sigma=0.01 /
sigma_e=0.5, detached log-domain duration targets with offset 1.0, masked
FastSpeech loss), rebuilt as pure functions over pytree params:

  * channels-last activations everywhere, so text/mel/decoder conv stacks
    and the V^T alpha' expansion are MXU matmuls with no layout shuffles;
  * one jit-compiled XLA graph for the training forward, static shapes;
  * inference split into `infer_durations` (tiny graph -> aligned
    positions e) and `infer_decode` (bucketed static T2), replacing the
    reference's data-dependent `round(e[-1]).item()` output shape
    (:358-363) with host-side bucket selection;
  * dropout/PRNG explicit; weight norm carried as {v,g} and foldable for
    inference (`nn/layers.py:fold_weight_norm`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from efficient_tts_tpu.losses.fastspeech import fastspeech_loss
from efficient_tts_tpu.nn.blocks import res_conv_block, res_conv_block_init
from efficient_tts_tpu.nn.duration_predictor import (
    duration_predictor,
    duration_predictor_infer,
    duration_predictor_init,
)
from efficient_tts_tpu.nn.layers import (
    dropout,
    embedding,
    embedding_init,
    leaky_relu,
    linear,
    linear_init,
)
from efficient_tts_tpu.ops.alignment import (
    aligned_positions,
    alignment_from_positions,
    imv_from_alpha,
    index_vector,
    scaled_dot_attention,
)
from efficient_tts_tpu.utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class EftsCNNConfig:
    """Hyperparameters; defaults mirror `efficient_tts.py:26-48`."""

    num_symbols: int = 148
    odim: int = 80
    symbol_embedding_dim: int = 512
    n_channels: int = 512
    n_text_encoder_layer: int = 5
    n_mel_encoder_layer: int = 3
    n_decoder_layer: int = 6
    n_duration_layer: int = 2
    k_size: int = 5
    leaky_slope: float = 0.1
    use_weight_norm: bool = True
    dropout_rate: float = 0.1
    use_masking: bool = False
    duration_offset: float = 1.0
    sigma: float = 0.01
    sigma_e: float = 0.5
    delta_e_method_1: bool = True
    share_text_encoder_key_value: bool = False
    use_mel_query_fc: bool = False
    # "frame" = reference loss weighting (utterance weight ~ frame
    # count, `fastspeech_loss.py:55-63`); "utterance" = per-utterance
    # normalization (equal weight per utterance — treats the
    # short-utterance gradient starvation measured in VALIDATION §3e)
    loss_normalize: str = "frame"
    # "bfloat16" runs the conv stacks + big matmuls in bf16 with f32 MXU
    # accumulation (params stay f32); the IMV alignment chain is always
    # f32. None/"float32" = full precision (parity mode).
    compute_dtype: str | None = None


def init(key, cfg: EftsCNNConfig) -> dict:
    keys = jax.random.split(key, 10)
    params = {
        "text_embedding": embedding_init(
            keys[0], cfg.num_symbols, cfg.symbol_embedding_dim
        ),
        "text_encoder": res_conv_block_init(
            keys[1], cfg.n_text_encoder_layer, cfg.n_channels, cfg.k_size,
            cfg.use_weight_norm,
        ),
        "text_key": linear_init(keys[2], cfg.n_channels, cfg.n_channels),
        "mel_prenet": linear_init(keys[4], cfg.odim, cfg.n_channels),
        "mel_encoder": res_conv_block_init(
            keys[5], cfg.n_mel_encoder_layer, cfg.n_channels, cfg.k_size,
            cfg.use_weight_norm,
        ),
        "decoder": res_conv_block_init(
            keys[6], cfg.n_decoder_layer, cfg.n_channels, cfg.k_size,
            cfg.use_weight_norm,
        ),
        "mel_out": linear_init(keys[7], cfg.n_channels, cfg.odim),
        "duration_predictor": duration_predictor_init(
            keys[8], cfg.n_channels, cfg.n_duration_layer, cfg.n_channels
        ),
    }
    if not cfg.share_text_encoder_key_value:
        params["text_value"] = linear_init(keys[3], cfg.n_channels, cfg.n_channels)
    if cfg.use_mel_query_fc:
        params["mel_query_fc"] = linear_init(keys[9], cfg.n_channels, cfg.n_channels)
    return params


def _compute_dtype(cfg: EftsCNNConfig):
    if cfg.compute_dtype in (None, "float32", "f32"):
        return None
    return jnp.dtype(cfg.compute_dtype)


def _encode_text(params, cfg: EftsCNNConfig, text, text_mask, rng, deterministic):
    """text ids [B, T1] -> (key [B,T1,C], value [B,T1,C]), masked."""
    h = embedding(params["text_embedding"], text)  # [B, T1, C]
    cdt = _compute_dtype(cfg)
    if cdt is not None:
        h = h.astype(cdt)
    h = res_conv_block(
        params["text_encoder"], h, cfg.leaky_slope, cfg.dropout_rate, rng,
        deterministic,
    )
    key = linear(params["text_key"], h)
    if cfg.share_text_encoder_key_value:
        value = key
    else:
        value = linear(params["text_value"], h)
    maskf = text_mask.astype(key.dtype)[:, :, None]
    return key * maskf, value * maskf


def forward(
    params: dict,
    cfg: EftsCNNConfig,
    text: jnp.ndarray,
    text_lengths: jnp.ndarray,
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    rng=None,
    deterministic: bool = True,
) -> dict:
    """Training forward (reference :120-228). speech is [B, T2, odim].

    Returns dict with loss scalars and diagnostics (imv, reconst_alpha,
    mel_pred) matching the reference's 6-tuple return (:228).
    """
    b, t1 = text.shape
    t2 = speech.shape[1]
    text_mask = sequence_mask(text_lengths, t1)
    mel_mask = sequence_mask(speech_lengths, t2)
    text_mel_mask = text_mask[:, :, None] & mel_mask[:, None, :]

    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_text, r_mel, r_dec, r_pre, r_dur = jax.random.split(rng, 5)

    text_key, text_value = _encode_text(
        params, cfg, text, text_mask, r_text, deterministic
    )

    # mel query (training only; reference :161-164)
    cdt = _compute_dtype(cfg)
    speech_c = speech.astype(cdt) if cdt is not None else speech
    mel_h = leaky_relu(linear(params["mel_prenet"], speech_c), cfg.leaky_slope)
    if not deterministic and cfg.dropout_rate > 0:
        mel_h = dropout(r_pre, mel_h, cfg.dropout_rate, deterministic=False)
    mel_h = res_conv_block(
        params["mel_encoder"], mel_h, cfg.leaky_slope, cfg.dropout_rate, r_mel,
        deterministic,
    )
    if cfg.use_mel_query_fc:
        mel_h = linear(params["mel_query_fc"], mel_h)

    # soft alignment + IMV chain (float32 throughout)
    alpha = scaled_dot_attention(mel_h, text_key, text_mask)
    alpha = alpha * text_mel_mask.astype(alpha.dtype)
    p = index_vector(text_mask)
    imv = imv_from_alpha(alpha, p, mel_mask, text_lengths)
    e = aligned_positions(imv, p, mel_mask, text_mask, sigma_e=cfg.sigma_e)
    reconst_alpha = alignment_from_positions(
        e, t2, sigma=cfg.sigma, mel_mask=mel_mask, text_mask=text_mask
    )
    reconst_alpha = reconst_alpha * text_mel_mask.astype(reconst_alpha.dtype)

    # expand text values to mel frames: [B, T2, C] = alpha'^T V (reference :190-194)
    alpha_c = reconst_alpha.astype(cdt) if cdt is not None else reconst_alpha
    expanded = jnp.einsum(
        "bst,bsc->btc", alpha_c, text_value, preferred_element_type=jnp.float32
    )
    if cdt is not None:
        expanded = expanded.astype(cdt)
    expanded = expanded * mel_mask.astype(expanded.dtype)[:, :, None]

    dec = res_conv_block(
        params["decoder"], expanded, cfg.leaky_slope, cfg.dropout_rate, r_dec,
        deterministic,
    )
    mel_pred = linear(params["mel_out"], dec).astype(jnp.float32)
    mel_pred = mel_pred * mel_mask.astype(mel_pred.dtype)[:, :, None]

    # duration target from detached aligned positions (reference :203-216)
    e_sg = jax.lax.stop_gradient(e)
    delta_e = jnp.concatenate([e_sg[:, :1], e_sg[:, 1:] - e_sg[:, :-1]], axis=1)
    log_delta_e = jnp.log(delta_e + cfg.duration_offset)
    log_delta_e = jnp.where(text_mask, log_delta_e, 0.0)

    dur_pred = duration_predictor(
        params["duration_predictor"],
        text_value,
        pad_mask=~text_mask.astype(bool),
        dropout_rate=cfg.dropout_rate,
        rng=r_dur,
        deterministic=deterministic,
    ).astype(jnp.float32)

    mel_loss, dur_loss = fastspeech_loss(
        mel_pred, speech, dur_pred, log_delta_e, text_mask, mel_mask,
        use_masking=cfg.use_masking, loss_normalize=cfg.loss_normalize,
    )
    loss = mel_loss + dur_loss
    return {
        "loss": loss,
        "mel_loss": mel_loss,
        "duration_loss": dur_loss,
        "imv": imv,
        "reconst_alpha": reconst_alpha,
        "mel_pred": mel_pred,
        # aligned positions e [B, T1] — the (detached) duration target's
        # integral; exposed so calibration checks can compare the duration
        # predictor against its actual training target (reference :203-216)
        "aligned_e": e_sg,
    }


def infer_durations(
    params: dict, cfg: EftsCNNConfig, text: jnp.ndarray, text_lengths: jnp.ndarray
):
    """Stage 1 of inference (reference :246-265): text -> (e, text_value).

    e[:, -1] (at the last valid position) determines the mel length; the
    caller rounds it on host and picks a static T2 bucket for stage 2.
    """
    t1 = text.shape[1]
    text_mask = sequence_mask(text_lengths, t1)
    _, text_value = _encode_text(params, cfg, text, text_mask, None, True)
    delta_e = duration_predictor_infer(
        params["duration_predictor"],
        text_value,
        pad_mask=~text_mask.astype(bool),
        offset=cfg.duration_offset,
        to_round=False,
    )
    # f32 cumsum regardless of compute dtype: bf16 would lose whole frames
    # once e reaches a few hundred
    e = jnp.cumsum(delta_e.astype(jnp.float32), axis=1)  # pads add 0 -> plateau
    return e, text_value, text_mask


def infer_decode(
    params: dict,
    cfg: EftsCNNConfig,
    text_value: jnp.ndarray,
    e: jnp.ndarray,
    text_mask: jnp.ndarray,
    t2: int,
    compute_dtype=None,
):
    """Stage 2 of inference (reference :268-285) at static mel length t2.

    `compute_dtype=jnp.bfloat16` runs the expansion matmul and decoder
    stack on the MXU in bf16 (f32 accumulation); the alignment
    reconstruction itself stays float32.
    """
    reconst_alpha = alignment_from_positions(
        e, t2, sigma=cfg.sigma, mel_mask=None, text_mask=text_mask
    )
    value = text_value
    alpha = reconst_alpha
    if compute_dtype is not None:
        value = value.astype(compute_dtype)
        alpha = alpha.astype(compute_dtype)
    expanded = jnp.einsum(
        "bst,bsc->btc", alpha, value, preferred_element_type=jnp.float32
    )
    if compute_dtype is not None:
        expanded = expanded.astype(compute_dtype)
    dec = res_conv_block(params["decoder"], expanded, cfg.leaky_slope)
    mel_pred = linear(params["mel_out"], dec).astype(jnp.float32)
    return mel_pred, reconst_alpha
