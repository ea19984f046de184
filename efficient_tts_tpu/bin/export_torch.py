"""Export framework checkpoints to reference/official PyTorch files
(inverse of `convert_checkpoint.py`).

    # EFTS-CNN -> reference trainer .pkl (loadable by nntts-inference,
    # `/root/reference/nntts/bin/inference.py:62-84`)
    python -m efficient_tts_tpu.bin.export_torch \
        --model EfficientTTSCNN --checkpoint exp/lj/checkpoint-100000steps \
        --out exp/lj/checkpoint-100000steps.pkl

    # vocoder generator -> `generator_v1` file for `load_hifigan_generator`
    # (`hifigan_model.py:18-28`)
    python -m efficient_tts_tpu.bin.export_torch \
        --model HiFiGANGenerator --checkpoint exp_voc/checkpoint-50000steps \
        --out HiFiGAN_LJ_V1/generator_v1 [--ema] [--fold_weight_norm]

    # full GAN state -> official HiFi-GAN repo g_/do_ pair (weights only)
    python -m efficient_tts_tpu.bin.export_torch \
        --model HiFiGANFull --checkpoint exp_voc/checkpoint-50000steps \
        --out exp_voc/torch_export
"""

from __future__ import annotations

import argparse
import logging
import os


def get_parser():
    p = argparse.ArgumentParser(description="Export checkpoints to torch files")
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--model", default="EfficientTTSCNN",
                   choices=["EfficientTTSCNN", "HiFiGANGenerator", "HiFiGANFull"])
    p.add_argument("--out", required=True,
                   help="output file (or directory for HiFiGANFull)")
    p.add_argument("--config", default=None,
                   help="YAML with model/vocoder params (default: config.yml "
                        "next to the checkpoint, else library defaults)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA generator copy when tracked")
    p.add_argument("--fold_weight_norm", action="store_true",
                   help="export folded '.weight' keys (post "
                        "remove_weight_norm) instead of weight_v/weight_g")
    return p


def _to_torch(sd: dict) -> dict:
    import numpy as np
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _voc_cfg(args):
    from efficient_tts_tpu.utils.config import (
        load_config,
        vocoder_config_from_dict,
        vocoder_config_near_checkpoint,
    )

    if args.config:
        return vocoder_config_from_dict(load_config(args.config))
    return vocoder_config_near_checkpoint(args.checkpoint)


def main(argv=None):
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import orbax.checkpoint as ocp
    import torch

    from efficient_tts_tpu.nn.layers import fold_weight_norm

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
    step = int(restored.get("step", 0))

    if args.model == "EfficientTTSCNN":
        from efficient_tts_tpu.compat.torch_export import efts_cnn_to_state_dict
        from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
        from efficient_tts_tpu.utils.config import load_config, model_config_from_dict

        cfg_path = args.config or os.path.join(
            os.path.dirname(os.path.abspath(args.checkpoint)), "config.yml"
        )
        cfg = (
            model_config_from_dict(load_config(cfg_path))
            if os.path.exists(cfg_path)
            else EftsCNNConfig()
        )
        params = restored["params"]
        if args.fold_weight_norm:
            params = fold_weight_norm(params)
        sd = efts_cnn_to_state_dict(params, cfg)
        # reference trainer checkpoint dict (efficient_tts_trainer.py:78-99)
        torch.save({"model": _to_torch(sd), "steps": step, "epochs": 0}, args.out)
        logging.info("wrote %s (%d tensors, step %d)", args.out, len(sd), step)
        return

    voc_cfg = _voc_cfg(args)
    gen = restored["ema"] if args.ema and "ema" in restored else (
        restored["gen"]["params"] if "gen" in restored else restored["params"]
    )
    if args.fold_weight_norm:
        gen = fold_weight_norm(gen)

    if args.model == "HiFiGANGenerator":
        from efficient_tts_tpu.compat.torch_export import (
            hifigan_generator_to_state_dict,
        )

        sd = hifigan_generator_to_state_dict(gen, voc_cfg)
        torch.save({"generator": _to_torch(sd)}, args.out)
        logging.info("wrote %s (%d tensors)", args.out, len(sd))
        return

    # HiFiGANFull: official g_/do_ pair
    from efficient_tts_tpu.compat.torch_export import gan_state_to_torch_checkpoints

    state = {
        "gen": {"params": gen},
        "disc": restored["disc"],
        "step": step,
    }
    g, do = gan_state_to_torch_checkpoints(state, voc_cfg)
    os.makedirs(args.out, exist_ok=True)
    g_path = os.path.join(args.out, f"g_{step:08d}")
    do_path = os.path.join(args.out, f"do_{step:08d}")
    torch.save({"generator": _to_torch(g["generator"])}, g_path)
    torch.save(
        {
            "mpd": _to_torch(do["mpd"]),
            "msd": _to_torch(do["msd"]),
            "steps": do["steps"],
            "epoch": do["epoch"],
        },
        do_path,
    )
    logging.info("wrote %s and %s", g_path, do_path)


if __name__ == "__main__":
    main()
