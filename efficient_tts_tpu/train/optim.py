"""Optimizers matching the reference training semantics.

The LJ recipe (`egs/lj/conf/efficient_tts_cnn_phnseq_noDropout.v1.yaml:34-44`)
uses torch Adam(lr=1e-3, betas=(0.9,0.99), eps=1e-9, weight_decay=1e-5,
amsgrad=True) with grad-norm clipping 1.0 applied by the trainer before
the step (`trainers/efficient_tts_trainer.py:154-160`), plus WarmupLR.

Torch's `weight_decay` adds wd * param to the *gradient* before the Adam
moments (L2, not decoupled), and the clip happens before that -- the
optax chain below reproduces that order exactly.

`radam` mirrors `/root/reference/nntts/optimizers/radam.py` (rectified
Adam) via optax's implementation.
"""

from __future__ import annotations

import optax

from efficient_tts_tpu.train.schedule import warmup_lr


def adam_warmup(
    lr: float = 1e-3,
    betas=(0.9, 0.99),
    eps: float = 1e-9,
    weight_decay: float = 1e-5,
    amsgrad: bool = True,
    grad_clip_norm: float | None = 1.0,
    warmup_steps: int | None = 4000,
) -> optax.GradientTransformation:
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if amsgrad:
        parts.append(optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps))
    else:
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    schedule = warmup_lr(lr, warmup_steps) if warmup_steps else lr
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def radam(
    lr: float = 1e-3,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def hifigan_adam(
    lr: float = 2e-4,
    betas=(0.8, 0.99),
    lr_decay: float = 0.999,
    steps_per_epoch: int = 1000,
) -> optax.GradientTransformation:
    """AdamW-free Adam with per-epoch exponential decay
    (`HiFiGAN_LJ_V1/config.json`: lr 2e-4, betas (0.8, 0.99), decay 0.999)."""
    from efficient_tts_tpu.train.schedule import exponential_decay_per_epoch

    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale_by_learning_rate(
            exponential_decay_per_epoch(lr, lr_decay, steps_per_epoch)
        ),
    )


OPTIMIZER_REGISTRY = {
    "Adam": adam_warmup,
    "RAdam": radam,
    "HiFiGANAdam": hifigan_adam,
}
