"""Mel-domain acoustic control rows: attribute the pipeline-over-bound
residual WITHOUT the vocoder (round-3 verdict items 1b and 4).

The full pipeline sits several dB above its own copy-synthesis bound;
this harness decomposes the acoustic model's contribution into three
frame-level control rows, all in the mel/cepstral domain so the vocoder
never enters:

  tf        teacher-forced mel_pred vs GT mel (frame-aligned): pure
            spectral error of the decoder stack at the GT alignment
            (reference forward, `nntts/models/efficient_tts.py:120-228`);
  gt_dur    inference-mode decode driven by the TEACHER-FORCED aligned
            positions e at the GT mel length (frame-aligned): adds the
            inference alignment reconstruction, removes duration
            prediction (reference inference `efficient_tts.py:230-285`
            with e substituted);
  pred_dur  full inference (predicted durations, DTW-aligned): adds the
            duration predictor's warp.

pred_dur − gt_dur isolates the duration-warp contribution; gt_dur − tf
the alignment-reconstruction contribution; tf the spectral floor. Also
reports duration-predictor calibration against its OWN training target
(aligned_e, reference `:203-216`) — the diagnostic for the transformer
quality-inversion question (verdict item 4).

CPU-friendly (acoustic model only):
  JAX_PLATFORMS=cpu python scripts/acoustic_controls.py \
      --checkpoint exp/micro_efts/checkpoint-20000steps \
      --dev_fid_scp exp/micro_corpus/dev_filelist.txt --json_out ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np

from golden_compare import dct_cepstra, dtw_path  # noqa: E402 (same dir)

MCD_CONST = 10.0 / np.log(10.0)


def cep_dist_db(ca: np.ndarray, cb: np.ndarray) -> float:
    """MCD-style dB distance of frame-ALIGNED cepstra [T, 13]."""
    return float(MCD_CONST * np.mean(np.sqrt(2.0 * ((ca - cb) ** 2).sum(axis=1))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dev_fid_scp", required=True)
    ap.add_argument("--num_utts", type=int, default=10)
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--vocoder_checkpoint", default=None,
                    help="also vocode the GT-duration mels into "
                    "--synth_outdir (control row (c): predicted mel + "
                    "GT durations through the vocoder, scoreable with "
                    "golden_compare.py)")
    ap.add_argument("--synth_outdir", default=None)
    args = ap.parse_args()

    import jax

    # the boot shim re-registers the TPU plugin and overrides the env
    # var — pin the requested platform back (tests/conftest.py dance) so
    # JAX_PLATFORMS=cpu actually runs on CPU instead of the relay
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from efficient_tts_tpu.data.dataset import (
        load_filepaths_and_text,
        load_wav_float,
    )
    from efficient_tts_tpu.dsp.mel import MelConfig, mel_spectrogram_np
    from efficient_tts_tpu.models import model_module_for
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.text import load_phone_vocab, phones_to_sequence, text_to_sequence
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.optim import adam_warmup
    from efficient_tts_tpu.train.state import create_state
    from efficient_tts_tpu.utils.config import load_config, model_config_from_dict

    ckpt_dir = os.path.dirname(os.path.abspath(args.checkpoint))
    config = load_config(os.path.join(ckpt_dir, "config.yml"))
    cfg = model_config_from_dict(config)
    mod = model_module_for(cfg)
    params = mod.init(jax.random.PRNGKey(0), cfg)
    template = create_state(params, adam_warmup())
    state = ckpt.load_checkpoint(args.checkpoint, template, load_only_params=True)
    params = fold_weight_norm(state["params"])

    ds_params = dict(config.get("dataset_params", {}))
    use_phnseq = bool(ds_params.get("use_phnseq", False))
    phn2idx = load_phone_vocab(ds_params["phnset_path"]) if use_phnseq else None
    wav_dir = ds_params.get("wav_path", "")

    rows = []
    gtdur_mels = []
    for path, text in load_filepaths_and_text(args.dev_fid_scp)[: args.num_utts]:
        wav_path = path if os.path.exists(path) else os.path.join(
            wav_dir, os.path.basename(path)
        )
        audio, sr = load_wav_float(wav_path)
        assert sr == 22050, (wav_path, sr)
        mel_gt = np.asarray(mel_spectrogram_np(audio, MelConfig())).T  # [T2, 80]
        t2 = mel_gt.shape[0]

        ids = np.asarray(
            phones_to_sequence(text, phn2idx) if use_phnseq
            else text_to_sequence(text),
            np.int32,
        )[None]
        tl = np.asarray([ids.shape[1]], np.int32)

        out = mod.forward(
            params, cfg, ids, tl, mel_gt[None], np.asarray([t2], np.int32),
            deterministic=True,
        )
        mel_tf = np.asarray(out["mel_pred"])[0]
        e_gt = np.asarray(out["aligned_e"])  # [1, T1] teacher-forced positions
        # alignment sharpness: mean over valid mel frames of the max
        # text weight in the reconstructed alignment [T1, T2]
        ra = np.asarray(out["reconst_alpha"])[0]
        align_peak = float(ra.max(axis=0)[:t2].mean())

        # inference-path text encodings + predicted durations
        e_pred, value, tmask = mod.infer_durations(params, cfg, ids, tl)
        e_pred = np.asarray(e_pred)

        # gt_dur row: inference decode with the teacher-forced e at GT T2
        mel_gtdur = np.asarray(
            mod.infer_decode(params, cfg, value, e_gt, tmask, t2)[0]
        )[0]
        # pred_dur row: the production inference path
        t2_pred = max(int(np.round(float(e_pred[0, -1]))), 1)
        mel_pred = np.asarray(
            mod.infer_decode(params, cfg, value, e_pred, tmask, t2_pred)[0]
        )[0]

        gtdur_mels.append((os.path.splitext(os.path.basename(path))[0], mel_gtdur))
        c_gt = dct_cepstra(mel_gt)
        row_tf = cep_dist_db(dct_cepstra(mel_tf), c_gt)
        row_gtdur = cep_dist_db(dct_cepstra(mel_gtdur), c_gt)
        cp = dct_cepstra(mel_pred)
        pi, pj = dtw_path(cp, c_gt)
        row_pred = cep_dist_db(cp[pi], c_gt[pj])

        # duration calibration vs the predictor's own training target
        de_gt = np.diff(np.concatenate([[0.0], e_gt[0]]))
        de_pred = np.diff(np.concatenate([[0.0], e_pred[0]]))
        rows.append({
            "utt": os.path.splitext(os.path.basename(path))[0],
            "t2_gt": t2,
            "t2_pred": t2_pred,
            "cep_db_tf": round(row_tf, 3),
            "cep_db_gt_dur": round(row_gtdur, 3),
            "cep_db_pred_dur": round(row_pred, 3),
            "dur_total_rel_err": round(abs(t2_pred - t2) / t2, 4),
            # predicted total vs the aligned target's total: predictor
            # miscalibration net of the alignment's own end truncation
            "dur_vs_target_rel": round(
                float((e_pred[0, -1] - e_gt[0, -1]) / e_gt[0, -1]), 4
            ),
            "dur_token_mae_frames": round(
                float(np.mean(np.abs(de_pred - de_gt))), 3
            ),
            "align_peak": round(align_peak, 4),
        })
        r = rows[-1]
        print(
            f"{r['utt']}: tf={r['cep_db_tf']:6.2f}  gt_dur={r['cep_db_gt_dur']:6.2f}  "
            f"pred_dur={r['cep_db_pred_dur']:6.2f} dB  "
            f"dur_err={r['dur_total_rel_err']:5.1%}  "
            f"(vs target {r['dur_vs_target_rel']:+.1%}, "
            f"token MAE {r['dur_token_mae_frames']:.2f} fr)"
        )

    mean = lambda k: round(float(np.mean([r[k] for r in rows])), 3)  # noqa: E731
    summary = {
        "checkpoint": args.checkpoint,
        "model_name": config.get("model_name"),
        "n": len(rows),
        "cep_db_tf": mean("cep_db_tf"),
        "cep_db_gt_dur": mean("cep_db_gt_dur"),
        "cep_db_pred_dur": mean("cep_db_pred_dur"),
        "dur_total_rel_err": mean("dur_total_rel_err"),
        "dur_vs_target_rel": mean("dur_vs_target_rel"),
        "dur_token_mae_frames": mean("dur_token_mae_frames"),
        "align_peak": mean("align_peak"),
        "rows": rows,
    }
    if args.vocoder_checkpoint and args.synth_outdir:
        # control row (c): GT-duration predicted mels -> vocoder -> wavs
        # (score vs the goldens with golden_compare.py; the delta to the
        # full-pipeline row isolates the duration-warp contribution in
        # the WAV-domain MCD)
        from scipy.io.wavfile import write as wav_write

        from efficient_tts_tpu.bin.inference import _load_vocoder
        from efficient_tts_tpu.models import hifigan as hg
        from efficient_tts_tpu.utils.config import (
            vocoder_config_near_checkpoint,
        )

        voc_cfg = vocoder_config_near_checkpoint(args.vocoder_checkpoint)
        voc_params = _load_vocoder(args.vocoder_checkpoint, voc_cfg)
        os.makedirs(args.synth_outdir, exist_ok=True)
        for name, mel in gtdur_mels:
            wav = np.asarray(hg.generator(voc_params, mel[None], voc_cfg))[0]
            pcm = (np.clip(wav, -1.0, 1.0) * 32767).astype(np.int16)
            wav_write(
                os.path.join(args.synth_outdir, f"{name}_gtdur.wav"),
                voc_cfg.sampling_rate, pcm,
            )
        print(f"wrote {len(gtdur_mels)} GT-duration wavs to {args.synth_outdir}")

    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
