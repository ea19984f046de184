"""YAML config loading and registry resolution.

The reference names classes as YAML strings and resolves them with
getattr over package namespaces (`nntts/bin/train.py:105-223`); here the
same config shape resolves against explicit registries, and the merged
config is re-dumped to `outdir/config.yml` so inference can rebuild the
model without the original file (`train.py:98-99`, `inference.py:43-45`).
"""

from __future__ import annotations

import os

import yaml


def load_config(path: str, overrides: dict | None = None) -> dict:
    with open(path) as f:
        config = yaml.safe_load(f) or {}
    if overrides:
        config.update({k: v for k, v in overrides.items() if v is not None})
    return config


def dump_config(config: dict, outdir: str) -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    return path


def model_config_from_dict(config: dict):
    """Build the model dataclass config from `model_name`/`model_params`."""
    from efficient_tts_tpu.models import (
        DurationModelConfig,
        EftsCNNConfig,
        EftsTransformerConfig,
    )

    name = config.get("model_name", "EfficientTTSCNN")
    params = dict(config.get("model_params", {}))
    if name == "EfficientTTSCNN":
        # translate reference-style kwargs to dataclass fields
        params.pop("use_weighted_masking", None)  # broken/unused in reference
        act_params = params.pop("nonlinear_activation_params", None)
        params.pop("nonlinear_activation", None)
        if act_params and "negative_slope" in act_params:
            params["leaky_slope"] = act_params["negative_slope"]
        return EftsCNNConfig(**params)
    if name == "EfficientTTSTransformer":
        params.pop("use_weighted_masking", None)
        return EftsTransformerConfig(**params)
    if name == "DurationModel":
        return DurationModelConfig(**params)
    raise ValueError(f"unknown model_name: {name}")


def optimizer_from_dict(config: dict):
    """Build the optax chain from optimizer/scheduler/grad_norm blocks.

    Resolves the same config surface as the reference's getattr registries
    (`nntts/bin/train.py:190-203`): any of torch.optim's names
    (`nntts/optimizers/__init__.py:1` re-exports them all) for
    `optimizer_type`, any torch lr_scheduler name plus `WarmupLR`
    (`nntts/schedulers/__init__.py:1-2`) for `scheduler_type`.
    """
    import optax

    from efficient_tts_tpu.train.optim import adam_warmup, radam
    from efficient_tts_tpu.train.schedule import warmup_lr
    from efficient_tts_tpu.train.torch_optim import (
        OPTIMIZER_FACTORIES,
        SCHEDULER_FACTORIES,
    )

    opt_type = config.get("optimizer_type", "Adam")
    opt_params = dict(config.get("optimizer_params", {}))
    sched_type = config.get("scheduler_type", "WarmupLR")
    sched_params = dict(config.get("scheduler_params", {}))
    grad_norm = config.get("grad_norm", 1.0)
    if opt_type == "Adam" and sched_type in ("WarmupLR", None, "", "none"):
        return adam_warmup(
            lr=float(opt_params.get("lr", 1e-3)),
            betas=tuple(opt_params.get("betas", (0.9, 0.99))),
            eps=float(opt_params.get("eps", 1e-9)),
            weight_decay=float(opt_params.get("weight_decay", 0.0)),
            amsgrad=bool(opt_params.get("amsgrad", False)),
            grad_clip_norm=grad_norm,
            warmup_steps=(
                sched_params.get("warmup_steps", 4000)
                if sched_type == "WarmupLR"
                else None
            ),
        )
    if opt_type == "RAdam":
        return radam(
            lr=float(opt_params.get("lr", 1e-3)),
            betas=tuple(opt_params.get("betas", (0.9, 0.999))),
            eps=float(opt_params.get("eps", 1e-8)),
            weight_decay=float(opt_params.get("weight_decay", 0.0)),
        )
    if opt_type not in OPTIMIZER_FACTORIES:
        raise ValueError(f"unknown optimizer_type: {opt_type}")
    if "betas" in opt_params:
        opt_params["betas"] = tuple(opt_params["betas"])
    base_lr = float(opt_params.pop("lr", 1e-3))
    parts = []
    if grad_norm:
        parts.append(optax.clip_by_global_norm(float(grad_norm)))
    if sched_type in (None, "", "none"):
        parts.append(OPTIMIZER_FACTORIES[opt_type](lr=base_lr, **opt_params))
    else:
        if sched_type == "WarmupLR":
            schedule = warmup_lr(base_lr, sched_params.get("warmup_steps", 4000))
        elif sched_type in SCHEDULER_FACTORIES:
            schedule = SCHEDULER_FACTORIES[sched_type](base_lr, **sched_params)
        else:
            raise ValueError(f"unknown scheduler_type: {sched_type}")
        # torch's time-varying group lr multiplies the final step in every
        # torch.optim rule, so lr=1 + scale_by_schedule is exact.
        parts.append(OPTIMIZER_FACTORIES[opt_type](lr=1.0, **opt_params))
        parts.append(optax.scale_by_schedule(schedule))
    return optax.chain(*parts)


def _deep_tuple(v):
    return tuple(_deep_tuple(x) for x in v) if isinstance(v, list) else v


def vocoder_config_from_dict(config: dict):
    """Build `HiFiGANConfig` from a config dict's `vocoder_params`,
    deep-converting YAML lists to tuples (the config is a frozen
    dataclass used as a jit static argument, so every field must be
    hashable — nested lists are not)."""
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig

    return HiFiGANConfig(
        **{k: _deep_tuple(v) for k, v in dict(config.get("vocoder_params", {})).items()}
    )


def vocoder_config_near_checkpoint(path: str | None):
    """HiFiGANConfig for a checkpoint: rebuilt from the `config.yml` the
    vocoder trainer dumps next to its checkpoints (mirroring the
    reference's model-rebuild-from-outdir pattern,
    `nntts/bin/inference.py:42-48`), else library defaults."""
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig

    if path:
        cfg_file = os.path.join(
            os.path.dirname(os.path.abspath(path)), "config.yml"
        )
        if os.path.exists(cfg_file):
            return vocoder_config_from_dict(load_config(cfg_file))
    return HiFiGANConfig()
