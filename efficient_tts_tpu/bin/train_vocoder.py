"""HiFi-GAN vocoder training CLI (new capability vs the reference, which
ships discriminators/losses but no vocoder trainer -- SURVEY.md §2.5).

    python -m efficient_tts_tpu.bin.train_vocoder \
        --wav_scp wavs.txt --outdir exp_vocoder [--config hifigan.yaml]

`--wav_scp` is a file with one wav path per line (or `path|text` lines,
text ignored).
"""

from __future__ import annotations

import argparse
import logging


def get_parser():
    p = argparse.ArgumentParser(description="Train HiFi-GAN vocoder (TPU-native)")
    p.add_argument("--wav_scp", required=True)
    p.add_argument("--dev_wav_scp", default=None, help="validation wav list")
    p.add_argument("--outdir", required=True)
    p.add_argument("--config", default=None, help="optional YAML overriding defaults")
    p.add_argument("--resume", default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--train_max_steps", type=int, default=400000)
    p.add_argument("--save_interval_steps", type=int, default=5000)
    p.add_argument("--use_stft_loss", action="store_true")
    p.add_argument("--compute_dtype", default=None, choices=["bfloat16"],
                   help="bf16 conv towers (params/losses stay f32)")
    p.add_argument("--max_keep_checkpoints", type=int, default=None,
                   help="retain only the newest N checkpoints (default: all, "
                        "matching the reference)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="track an EMA of generator weights for eval/serving")
    p.add_argument("--lr_decay_steps", type=int, default=None,
                   help="steps per lr_decay application (default: one "
                   "epoch, the official HiFi-GAN semantics). The official "
                   "config assumes LJ-scale epochs (~800 steps); on a "
                   "tiny corpus 1-batch epochs decay 0.999 PER STEP and "
                   "freeze the lr near zero within a few thousand steps "
                   "- set this to ~800-1000 to keep reference-like decay "
                   "dynamics (measured: the micro vocoder run plateaued "
                   "from step ~5k with lr ~1e-6 until this was exposed)")
    p.add_argument("--fine_tuning", action="store_true",
                   help="GTA fine-tuning: generator input from --base_mels_path")
    p.add_argument("--base_mels_path", default=None,
                   help="dir of GTA mels from efficient_tts_tpu.bin.extract_gta")
    p.add_argument("--device_corpus", choices=["auto", "on", "off"],
                   default="auto",
                   help="hold the whole wav corpus in HBM and do random "
                   "cropping + mel extraction on device inside the jitted "
                   "GAN step (zero steady-state host->device transfer; see "
                   "data/device_corpus.py for the relay-leak postmortem). "
                   "auto = on when the corpus fits a 2 GiB budget on a "
                   "single local device and not --fine_tuning")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    from efficient_tts_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    logging.basicConfig(level=logging.INFO)

    import jax

    from efficient_tts_tpu.data.collate import collate_mel_audio
    from efficient_tts_tpu.data.dataset import MelAudioSegmentDataset
    from efficient_tts_tpu.data.loader import infinite_loader
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.hifigan_train_step import (
        init_gan_state,
        make_gan_eval_step,
        make_gan_train_step,
    )
    from efficient_tts_tpu.train.hifigan_trainer import HiFiGANTrainer
    from efficient_tts_tpu.train.optim import hifigan_adam
    from efficient_tts_tpu.utils.config import (
        dump_config,
        load_config,
        vocoder_config_from_dict,
    )

    config = load_config(args.config) if args.config else {}
    voc_cfg = vocoder_config_from_dict(config)
    # re-dump next to the checkpoints so inference/serving rebuild the
    # same generator topology (reference pattern, train.py:98-99)
    dump_config(config, args.outdir)
    lr = float(config.get("learning_rate", 2e-4))
    betas = tuple(config.get("adam_betas", (0.8, 0.99)))
    lr_decay = float(config.get("lr_decay", 0.999))

    with open(args.wav_scp) as f:
        files = [line.strip().split("|")[0] for line in f if line.strip()]
    ds = MelAudioSegmentDataset(
        files,
        segment_size=voc_cfg.segment_size,
        fine_tuning=args.fine_tuning,
        base_mels_path=args.base_mels_path,
    )
    steps_per_epoch = args.lr_decay_steps or max(len(ds) // args.batch_size, 1)

    gen_tx = hifigan_adam(lr, betas, lr_decay, steps_per_epoch)
    disc_tx = hifigan_adam(lr, betas, lr_decay, steps_per_epoch)
    state = init_gan_state(
        jax.random.PRNGKey(0), voc_cfg, gen_tx, disc_tx, ema_decay=args.ema_decay
    )
    import jax.numpy as jnp

    step = make_gan_train_step(
        voc_cfg, gen_tx, disc_tx, use_stft_loss=args.use_stft_loss,
        ema_decay=args.ema_decay,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else None,
    )

    from efficient_tts_tpu.data import device_corpus as dc
    from efficient_tts_tpu.parallel.mesh import fit_data_extent, make_mesh

    use_device_corpus = args.device_corpus == "on"
    if args.device_corpus == "auto":
        use_device_corpus = (
            not args.fine_tuning
            and jax.local_device_count() == 1
            and jax.process_count() == 1
            and dc.corpus_nbytes(files) <= 2 << 30
        )
    mesh = None
    if use_device_corpus:
        # the steady-state train loop does zero host->device data motion:
        # corpus placed once, crops + mels computed on device per step
        corpus = jax.device_put(
            dc.load_corpus(files, segment_size=voc_cfg.segment_size)
        )
        batch_fn = dc.make_device_batch_fn(
            args.batch_size, segment_size=voc_cfg.segment_size
        )
        step = dc.make_device_gan_train_step(step, batch_fn)
        import itertools

        train_iter = itertools.repeat((0, corpus))
        logging.info(
            "device-resident corpus: %d wavs, %.1f MB in HBM",
            corpus["wav"].shape[0], corpus["wav"].nbytes / 2**20,
        )
    else:
        mesh = make_mesh(
            data=fit_data_extent(args.batch_size, jax.local_device_count()),
            model=1,
        )
        from efficient_tts_tpu.data.loader import background_prefetch

        # outer prefetch decouples epochs from steps: on one-batch epochs
        # the next batch's wav reads + segment mels collate while the
        # device runs the current GAN step (measured 6.7 -> ~10 steps/s
        # on the micro run)
        train_iter = background_prefetch(infinite_loader(
            ds, args.batch_size, collate_mel_audio,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
        ))
    eval_step, eval_batches = None, []
    if args.dev_wav_scp:
        with open(args.dev_wav_scp) as f:
            dev_files = [line.strip().split("|")[0] for line in f if line.strip()]
        dev_ds = MelAudioSegmentDataset(
            dev_files, segment_size=voc_cfg.segment_size, shuffle=False,
            fine_tuning=args.fine_tuning, base_mels_path=args.base_mels_path,
        )
        eval_batches = [
            collate_mel_audio([dev_ds[i] for i in range(lo, min(lo + args.batch_size, len(dev_ds)))])
            for lo in range(0, min(len(dev_ds), 4 * args.batch_size), args.batch_size)
        ]
        eval_step = make_gan_eval_step(voc_cfg)

    trainer = HiFiGANTrainer(
        step, state, train_iter, outdir=args.outdir,
        train_max_steps=args.train_max_steps, mesh=mesh,
        save_interval_steps=args.save_interval_steps,
        eval_step=eval_step, eval_batches=eval_batches,
        max_keep_checkpoints=args.max_keep_checkpoints,
    )
    if args.resume:
        trainer.load(args.resume)
    else:
        latest = ckpt.latest_checkpoint(args.outdir)
        if latest:
            trainer.load(latest)
    trainer.run()
    # final save must be durable before main() returns (interval saves
    # during the run are async and overlap training)
    trainer.save(wait=True)


if __name__ == "__main__":
    main()
