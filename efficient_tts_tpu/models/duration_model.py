"""Standalone duration model for external-duration workflows.

Counterpart of `/root/reference/nntts/models/duration_model.py:16-110`:
a bare DurationPredictor trained with log-domain MSE against provided
durations, with optional speaker-id conditioning.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from efficient_tts_tpu.losses.duration import duration_mse_loss
from efficient_tts_tpu.nn.duration_predictor import (
    duration_predictor,
    duration_predictor_infer,
    duration_predictor_init,
)
from efficient_tts_tpu.utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class DurationModelConfig:
    idim: int = 256
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 256
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_rate: float = 0.1
    num_spks: int | None = None
    spk_embed_dim: int | None = None
    spk_embed_integration_type: str = "add"
    use_masking: bool = True
    offset: float = 1.0


def init(key, cfg: DurationModelConfig) -> dict:
    return {
        "duration_predictor": duration_predictor_init(
            key,
            cfg.idim,
            cfg.duration_predictor_layers,
            cfg.duration_predictor_chans,
            cfg.duration_predictor_kernel_size,
            num_spks=cfg.num_spks,
            spk_embed_dim=cfg.spk_embed_dim,
            spk_embed_integration_type=cfg.spk_embed_integration_type,
        )
    }


def forward(
    params: dict,
    cfg: DurationModelConfig,
    xs: jnp.ndarray,
    ilens: jnp.ndarray,
    durations: jnp.ndarray,
    spkids=None,
    rng=None,
    deterministic: bool = True,
) -> dict:
    """xs [B, T, idim], durations [B, T] linear-domain -> {'loss': scalar}."""
    t = xs.shape[1]
    mask = sequence_mask(ilens, t)
    d_outs = duration_predictor(
        params["duration_predictor"],
        xs,
        pad_mask=~mask.astype(bool),
        dropout_rate=cfg.duration_predictor_dropout_rate,
        rng=rng,
        deterministic=deterministic,
        spkids=spkids,
        spk_embed_integration_type=cfg.spk_embed_integration_type,
    )
    loss = duration_mse_loss(
        d_outs, durations, mask if cfg.use_masking else jnp.ones_like(mask),
        offset=cfg.offset,
    )
    return {"loss": loss, "d_outs": d_outs}


def inference(params: dict, cfg: DurationModelConfig, xs: jnp.ndarray, spkids=None):
    """Rounded linear-domain durations (`duration_model.py:100-110`)."""
    return duration_predictor_infer(
        params["duration_predictor"],
        xs,
        offset=cfg.offset,
        to_round=True,
        spkids=spkids,
        spk_embed_integration_type=cfg.spk_embed_integration_type,
    )
