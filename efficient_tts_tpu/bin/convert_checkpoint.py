"""Convert reference PyTorch checkpoints to framework checkpoints.

    python -m efficient_tts_tpu.bin.convert_checkpoint \
        --torch_checkpoint checkpoint-320000steps.pkl \
        --model EfficientTTSCNN --num_symbols 76 \
        --outdir exp/lj_imported

Reads the reference trainer's `torch.save` dict
(`trainers/efficient_tts_trainer.py:78-99`) or a HiFi-GAN generator file
(`hifigan_model.py:24-25`), maps the state_dict through
`compat/torch_import.py`, and writes an orbax checkpoint restorable by
the trainer/inference CLIs. Optimizer state is torch-specific and starts
fresh (--pretrain semantics).
"""

from __future__ import annotations

import argparse
import logging
import os


def get_parser():
    p = argparse.ArgumentParser(description="Import reference torch checkpoints")
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--model", default="EfficientTTSCNN",
                   choices=["EfficientTTSCNN", "HiFiGANGenerator"])
    p.add_argument("--outdir", required=True)
    p.add_argument("--num_symbols", type=int, default=76)
    p.add_argument("--config", default=None,
                   help="optional YAML with model_params overriding defaults")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    from efficient_tts_tpu.compat.torch_import import (
        efts_cnn_from_state_dict,
        hifigan_generator_from_state_dict,
        load_reference_checkpoint,
    )
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.optim import adam_warmup

    state = load_reference_checkpoint(args.torch_checkpoint)
    sd, steps = state["model"], state["steps"]
    logging.info("loaded %d tensors at step %d", len(sd), steps)

    if args.model == "EfficientTTSCNN":
        from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
        from efficient_tts_tpu.utils.config import load_config, model_config_from_dict

        if args.config:
            cfg = model_config_from_dict(load_config(args.config))
        else:
            cfg = EftsCNNConfig(
                num_symbols=args.num_symbols, dropout_rate=0.0, use_masking=True
            )
        params = efts_cnn_from_state_dict(sd, cfg)
    else:
        from efficient_tts_tpu.models.hifigan import HiFiGANConfig

        params = hifigan_generator_from_state_dict(sd, HiFiGANConfig())

    import jax.numpy as jnp

    from efficient_tts_tpu.train.state import create_state

    tx = adam_warmup()
    train_state = create_state(
        jax.tree_util.tree_map(jnp.asarray, params), tx
    )
    train_state["step"] = jnp.asarray(steps, jnp.int32)
    path = ckpt.save_checkpoint(args.outdir, train_state, step=steps)
    logging.info("wrote %s", path)


if __name__ == "__main__":
    main()
