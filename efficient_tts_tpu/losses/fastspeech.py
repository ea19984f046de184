"""FastSpeech-style loss: mel regression + duration L1.

Counterpart of `/root/reference/nntts/losses/fastspeech_loss.py`: mel MSE
(or L1 with use_mse=False) plus duration **L1** in log domain. Masked
means computed as sum(err * mask) / sum(mask), numerically identical to
the reference's masked_select + mean reduction (`fastspeech_loss.py:54-67`).

Note: the reference's `use_weighted_masking` branch only switches the
reduction to 'none' and never applies weights (a latent bug); it is
unreachable from any shipped config and is not reproduced here.
"""

from __future__ import annotations

import jax.numpy as jnp


def fastspeech_loss(
    mel_pred: jnp.ndarray,
    mel_target: jnp.ndarray,
    dur_pred: jnp.ndarray,
    dur_target: jnp.ndarray,
    text_mask: jnp.ndarray,
    mel_mask: jnp.ndarray,
    use_masking: bool = True,
    use_mse: bool = True,
    loss_normalize: str = "frame",
):
    """Returns (mel_loss, duration_loss) scalars.

    Args:
        mel_pred/mel_target: [B, T2, n_mels]
        dur_pred/dur_target: [B, T1] (log domain)
        text_mask: [B, T1] True valid; mel_mask: [B, T2] True valid.
        loss_normalize: "frame" (reference semantics: one global masked
            mean, so an utterance's gradient weight is proportional to
            its frame count — `fastspeech_loss.py:55-63`) or
            "utterance" (per-utterance masked mean, then a uniform mean
            over valid utterances). The frame weighting starves short
            utterances of gradient signal — measured as the
            EFTS-Transformer's bimodal teacher-forced tail
            (VALIDATION §3e: 1.8-2.7 dB on long utterances, 12-20 dB on
            the short ones, which get ~4x less weight); "utterance"
            equalizes the per-utterance contribution. Requires
            use_masking (without masks there is no per-utterance
            extent); falls back to the plain mean otherwise.
    """
    if use_mse:
        mel_err = jnp.square(mel_pred - mel_target)
    else:
        mel_err = jnp.abs(mel_pred - mel_target)
    dur_err = jnp.abs(dur_pred - dur_target)

    if use_masking:
        mel_maskf = mel_mask.astype(mel_err.dtype)[:, :, None]
        text_maskf = text_mask.astype(dur_err.dtype)
        if loss_normalize == "utterance":
            # ghost rows (bucket padding in ragged accumulation) have
            # all-zero masks: they contribute 0 and are excluded from
            # the utterance count
            mel_frames = jnp.sum(mel_maskf, axis=(1, 2)) * mel_err.shape[-1]
            per_mel = jnp.sum(mel_err * mel_maskf, axis=(1, 2)) / jnp.maximum(
                mel_frames, 1.0
            )
            tokens = jnp.sum(text_maskf, axis=1)
            per_dur = jnp.sum(dur_err * text_maskf, axis=1) / jnp.maximum(
                tokens, 1.0
            )
            valid = (tokens > 0).astype(mel_err.dtype)
            n_valid = jnp.maximum(jnp.sum(valid), 1.0)
            mel_loss = jnp.sum(per_mel * valid) / n_valid
            dur_loss = jnp.sum(per_dur * valid) / n_valid
        else:
            mel_loss = jnp.sum(mel_err * mel_maskf) / jnp.maximum(
                jnp.sum(mel_maskf) * mel_err.shape[-1], 1.0
            )
            dur_loss = jnp.sum(dur_err * text_maskf) / jnp.maximum(
                jnp.sum(text_maskf), 1.0
            )
    else:
        mel_loss = jnp.mean(mel_err)
        dur_loss = jnp.mean(dur_err)
    return mel_loss, dur_loss
