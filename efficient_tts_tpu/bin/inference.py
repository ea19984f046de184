"""Synthesis CLI.

Counterpart of `/root/reference/nntts/bin/inference.py:25-181`: load the
config dumped next to the checkpoint, rebuild the model, synthesize the
test utterances through EFTS-CNN + HiFi-GAN, report RTF, and save
PCM_16 wavs plus alignment/mel plots.

TPU redesign: weight norm is folded once at load
(`nn/layers.py:fold_weight_norm`, the analog of remove_weight_norm at
`inference.py:79-82`); synthesis is *batched* over shape buckets instead
of one utterance at a time.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="EFTS-CNN + HiFi-GAN synthesis")
    p.add_argument("--test_fid_scp", required=True, help="test filelist (path|text)")
    p.add_argument("--checkpoint", required=True, help="trained EFTS checkpoint dir")
    p.add_argument("--outdir", required=True)
    p.add_argument("--vocoder_checkpoint", default=None,
                   help="HiFi-GAN generator checkpoint (torch state dict or orbax)")
    p.add_argument("--num_utts", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--use_cpu", action="store_true")
    p.add_argument(
        "--duration_correction", action="store_true",
        help="apply the analytic last-token truncation correction to "
        "predicted durations (ops/alignment.py:boundary_truncation_"
        "correction; default off = reference parity). Gated per "
        "utterance on the correction's own validity model: only applied "
        "where the predicted bias exceeds --duration_correction_threshold "
        "of total length, so it helps short texts and is a no-op at LJ "
        "shapes (where ungated it overshoots, VALIDATION.md 3b)",
    )
    p.add_argument(
        "--duration_correction_threshold", type=float, default=0.02,
        help="relative-bias gate for --duration_correction "
        "(0 = always apply, the ungated round-3 behavior)",
    )
    p.add_argument(
        "--repeats", type=int, default=1,
        help="synthesize the utterance set N times and report RTF per "
        "pass: pass 1 includes compile/cache-load and first-use param "
        "transfer, later passes are the warm in-process rate (the "
        "number comparable to bench.py)")
    p.add_argument(
        "--timing_json", default=None,
        help="write a phase breakdown (checkpoint load, vocoder load, "
        "per-batch wall, per-pass RTF) for throughput attribution")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    from efficient_tts_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    if args.use_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from efficient_tts_tpu.data.dataset import load_filepaths_and_text
    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.pipeline import synthesize
    from efficient_tts_tpu.text import load_phone_vocab, phones_to_sequence, text_to_sequence
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.optim import adam_warmup
    from efficient_tts_tpu.train.state import create_state
    from efficient_tts_tpu.utils.config import load_config, model_config_from_dict
    from efficient_tts_tpu.utils.masks import pad_list
    from efficient_tts_tpu.utils.plotting import save_alignment_plot, save_mel_comparison

    timing = {"phases": {}, "batches": [], "passes": []}
    t_phase = time.time()
    ckpt_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    config = load_config(os.path.join(ckpt_dir, "config.yml"))
    cfg = model_config_from_dict(config)

    from efficient_tts_tpu.models import model_module_for

    params = model_module_for(cfg).init(jax.random.PRNGKey(0), cfg)
    template = create_state(params, adam_warmup())
    state = ckpt.load_checkpoint(args.checkpoint, template, load_only_params=True)
    efts_params = fold_weight_norm(state["params"])
    timing["phases"]["efts_load_s"] = round(time.time() - t_phase, 3)
    t_phase = time.time()

    from efficient_tts_tpu.utils.config import vocoder_config_near_checkpoint

    voc_cfg = vocoder_config_near_checkpoint(args.vocoder_checkpoint)
    if args.vocoder_checkpoint:
        voc_params = _load_vocoder(args.vocoder_checkpoint, voc_cfg)
    else:
        logging.warning("no --vocoder_checkpoint: using random vocoder weights")
        voc_params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), voc_cfg))

    timing["phases"]["vocoder_load_s"] = round(time.time() - t_phase, 3)
    ds_params = dict(config.get("dataset_params", {}))
    use_phnseq = bool(ds_params.get("use_phnseq", False))
    phn2idx = (
        load_phone_vocab(ds_params["phnset_path"]) if use_phnseq else None
    )

    items = load_filepaths_and_text(args.test_fid_scp)[: args.num_utts]
    os.makedirs(args.outdir, exist_ok=True)

    sr = voc_cfg.sampling_rate
    first_audio = 0.0
    for rep in range(max(args.repeats, 1)):
        total_audio, total_time = 0.0, 0.0
        for lo in range(0, len(items), args.batch_size):
            chunk = items[lo : lo + args.batch_size]
            seqs = [
                np.asarray(
                    phones_to_sequence(text, phn2idx)
                    if use_phnseq
                    else text_to_sequence(text),
                    np.int32,
                )
                for _, text in chunk
            ]
            text_ids = pad_list(seqs)
            lengths = np.asarray([len(s) for s in seqs], np.int32)
            t0 = time.time()
            wav, wav_lengths = synthesize(
                efts_params, voc_params, text_ids, lengths, cfg, voc_cfg,
                duration_correction=(
                    args.duration_correction_threshold
                    if args.duration_correction else False
                ),
            )
            dt = time.time() - t0
            total_time += dt
            timing["batches"].append({
                "pass": rep, "n": len(chunk), "t1": int(text_ids.shape[1]),
                "wall_s": round(dt, 3),
            })
            if rep:
                continue  # wavs identical across passes; write once
            for i, (path, _) in enumerate(chunk):
                n = int(wav_lengths[i])
                total_audio += n / sr
                name = os.path.splitext(os.path.basename(path))[0]
                _write_wav(
                    os.path.join(args.outdir, f"{name}_gen.wav"), wav[i, :n], sr
                )
            first_audio = total_audio
        total_audio = total_audio or first_audio
        rtf = total_time / max(total_audio, 1e-9)
        timing["passes"].append({
            "pass": rep, "audio_s": round(total_audio, 2),
            "wall_s": round(total_time, 2), "rtf": round(rtf, 4),
            "audio_s_per_s": round(1.0 / max(rtf, 1e-9), 1),
        })
        logging.info(
            "pass %d: synthesized %.1f s of audio in %.2f s "
            "(RTF %.4f, %.1f audio-s/s)%s",
            rep, total_audio, total_time, rtf, 1.0 / max(rtf, 1e-9),
            "" if rep else " [includes compile/cache-load + param transfer]",
        )
    if args.timing_json:
        import json

        with open(args.timing_json, "w") as f:
            json.dump(timing, f, indent=1)


def _write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    from scipy.io.wavfile import write

    pcm = np.clip(wav, -1.0, 1.0)
    write(path, sr, (pcm * 32767).astype(np.int16))


def _load_vocoder(path: str, voc_cfg):
    from efficient_tts_tpu.nn.layers import fold_weight_norm

    if path.endswith((".pt", ".pkl")) or os.path.isfile(path):
        from efficient_tts_tpu.compat.torch_import import (
            hifigan_generator_from_state_dict,
            load_reference_checkpoint,
        )

        state = load_reference_checkpoint(path)
        sd = state["model"]
        # reference vocoder checkpoints store {"generator": sd}
        return fold_weight_norm(hifigan_generator_from_state_dict(sd, voc_cfg))
    if os.path.isdir(path):
        # orbax checkpoint from efts-train-vocoder ({gen, disc, step[, ema]})
        # or a params-only generator tree; serve the EMA copy when tracked
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if "ema" in restored:
            gen = restored["ema"]
        elif "gen" in restored:
            gen = restored["gen"]["params"]
        else:
            gen = restored.get("params", restored)
        import jax

        gen = jax.tree_util.tree_map(jnp.asarray, gen)
        return fold_weight_norm(gen)
    raise ValueError(f"unsupported vocoder checkpoint: {path}")


if __name__ == "__main__":
    main()
