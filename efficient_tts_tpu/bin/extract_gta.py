"""Extract ground-truth-aligned (GTA) mels for vocoder fine-tuning.

The reference's best checkpoint pairs EFTS-CNN with a HiFi-GAN
"finetuned with GTA mels" (reference README.md:9); the fine-tuning
dataset path exists (`meldataset.py:152-169`) but the extraction tool
does not. This CLI runs the *training-style* forward (teacher-forced
alignment from ground-truth mel, so frame counts match the audio
exactly) over a corpus and saves predicted mels as `<utt>.npy`
([n_mels, T2], the layout `MelDataset` fine-tuning expects).

    python -m efficient_tts_tpu.bin.extract_gta \
        --fid_scp data/train.txt --checkpoint exp/lj/checkpoint-...steps \
        --outdir gta_mels/
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="GTA mel extraction")
    p.add_argument("--fid_scp", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    from efficient_tts_tpu.data.collate import collate_text_mel
    from efficient_tts_tpu.data.dataset import TextMelDataset
    from efficient_tts_tpu.data.loader import data_loader
    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.efts_train_step import make_eval_step
    from efficient_tts_tpu.train.optim import adam_warmup
    from efficient_tts_tpu.train.state import create_state
    from efficient_tts_tpu.utils.config import load_config, model_config_from_dict

    ckpt_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    config = load_config(os.path.join(ckpt_dir, "config.yml"))
    cfg = model_config_from_dict(config)

    params = efts.init(jax.random.PRNGKey(0), cfg)
    template = create_state(params, adam_warmup())
    state = ckpt.load_checkpoint(args.checkpoint, template, load_only_params=True)
    eval_step = make_eval_step(cfg)

    ds = TextMelDataset(args.fid_scp, **dict(config.get("dataset_params", {})))
    os.makedirs(args.outdir, exist_ok=True)

    # keep utterance ids alongside features
    ids = [os.path.splitext(os.path.basename(it[0]))[0] for it in ds.items]

    def collate_with_ids(batch_items):
        # order-preserving: rows must map back to utterance ids
        return collate_text_mel(batch_items, sort=False)

    n_done = 0
    idx = 0
    for batch in data_loader(
        ds, args.batch_size, collate_with_ids, shuffle=False, drop_last=False
    ):
        out = eval_step(state["params"], batch)
        mel_pred = np.asarray(jax.device_get(out["mel_pred"]))
        for i in range(mel_pred.shape[0]):
            t2 = int(batch["mel_lengths"][i])
            # collate sorts by text length; recover original order offset
            utt = ids[idx]
            np.save(
                os.path.join(args.outdir, utt + ".npy"),
                mel_pred[i, :t2].T.astype(np.float32),
            )
            idx += 1
            n_done += 1
        if n_done % 200 < args.batch_size:
            logging.info("extracted %d/%d", n_done, len(ds))
    logging.info("done: %d GTA mels -> %s", n_done, args.outdir)


if __name__ == "__main__":
    main()
