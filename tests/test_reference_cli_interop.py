"""Drive the reference's OWN `nntts-inference` entry point end-to-end on
artifacts exported by this framework (round-3 verdict item 7).

`/root/reference/nntts/bin/inference.py:42-85` loads a `config.yml`, a
trainer `.pkl` checkpoint (`torch.load(...)["model"]`), and the default
HiFi-GAN generator (`hifigan_model.py:15-28`), then synthesizes wavs for
a `test_fid_scp`. Here the checkpoint and the generator file are BOTH
produced by `efficient_tts_tpu.compat.torch_export` from our pytrees,
the config.yml is written in the reference's own format, and the
reference CLI runs UNMODIFIED (in-process `run_tts`). Its output wav is
then compared sample-by-sample against our pipeline's synthesis of the
same text.

Harness accommodations, all outside the reference code path's logic:
- `librosa`/`soundfile`/`unidecode`/`inflect` are not installed in this
  image; benign stubs are registered in sys.modules (soundfile.write
  actually writes the PCM16 wav via stdlib `wave` and records the float
  samples for the comparison; unidecode is identity — the test text is
  pure ASCII with no digits, where the real libraries are identity too).
- `hifigan_model.DEFAULT_CKPT` points at `HiFiGAN_LJ_V1/generator_v1`,
  which the read-only mount does NOT include (only config.json is
  committed); it is monkeypatched to our exported generator file.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest
import torch
import yaml

sys.path.insert(0, "/root/reference")

TEXT = "The birch canoe slid on the smooth planks of the river."


def _stub_missing_modules():
    if "librosa" not in sys.modules:
        try:
            import librosa  # noqa: F401
        except ImportError:
            sys.modules["librosa"] = types.ModuleType("librosa")
    if "unidecode" not in sys.modules:
        try:
            import unidecode  # noqa: F401
        except ImportError:
            m = types.ModuleType("unidecode")
            m.unidecode = lambda s: s  # identity: ASCII-only test text
            sys.modules["unidecode"] = m
    if "inflect" not in sys.modules:
        try:
            import inflect  # noqa: F401
        except ImportError:
            m = types.ModuleType("inflect")
            m.engine = lambda: types.SimpleNamespace()  # no digits in text
            sys.modules["inflect"] = m
    written = {}
    if "soundfile" not in sys.modules:
        try:
            import soundfile  # noqa: F401
        except ImportError:
            m = types.ModuleType("soundfile")

            def write(path, data, sr, subtype="PCM_16"):
                import wave

                arr = np.asarray(data, np.float64)
                written[os.path.basename(path)] = np.asarray(data, np.float32)
                pcm = np.round(np.clip(arr, -1.0, 1.0) * 32767.0).astype("<i2")
                with wave.open(path, "wb") as f:
                    f.setnchannels(1)
                    f.setsampwidth(2)
                    f.setframerate(sr)
                    f.writeframes(pcm.tobytes())

            m.write = write
            sys.modules["soundfile"] = m
    return written


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Export a random EFTS-CNN + HiFi-GAN V1 to reference-format files."""
    import jax

    from efficient_tts_tpu.compat.torch_export import (
        efts_cnn_to_state_dict,
        hifigan_generator_to_state_dict,
    )
    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig

    root = tmp_path_factory.mktemp("ref_cli")
    # LJ-shaped model at reduced width (model_params carries the widths to
    # the reference side, so both models are built identically)
    model_params = dict(
        num_symbols=148,
        symbol_embedding_dim=128,
        n_channels=128,
        n_text_encoder_layer=2,
        n_mel_encoder_layer=1,
        n_decoder_layer=2,
        dropout_rate=0.0,
        use_masking=True,
    )
    cfg = EftsCNNConfig(**model_params)
    params = efts.init(jax.random.PRNGKey(0), cfg)
    torch_sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in efts_cnn_to_state_dict(params, cfg).items()
    }
    ckpt = root / "checkpoint-1000steps.pkl"
    torch.save({"model": torch_sd}, ckpt)

    # reference-format config.yml next to the checkpoint (the CLI's
    # default lookup, inference.py:42-46)
    with open(root / "config.yml", "w") as f:
        yaml.safe_dump(
            {
                "model_name": "EfficientTTSCNN",
                "model_params": model_params,
                "dataset_params": {"use_phnseq": False},
            },
            f,
        )

    voc_cfg = HiFiGANConfig()  # V1: matches the mounted config.json
    voc_params = hg.init_generator(jax.random.PRNGKey(1), voc_cfg)
    voc_sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in hifigan_generator_to_state_dict(voc_params, voc_cfg).items()
    }
    gen_file = root / "generator_v1"
    torch.save({"generator": voc_sd}, gen_file)

    scp = root / "test.scp"
    scp.write_text(f"wavs/utt1.wav|{TEXT}\n")
    outdir = root / "out"
    return dict(
        root=root, ckpt=ckpt, gen_file=gen_file, scp=scp, outdir=outdir,
        cfg=cfg, params=params, voc_cfg=voc_cfg, voc_params=voc_params,
    )


def test_reference_inference_cli_runs_on_exported_artifacts(artifacts, monkeypatch):
    written = _stub_missing_modules()

    import nntts.vocoders.hifigan_model as ref_hg

    assert not os.path.exists(ref_hg.DEFAULT_CKPT), (
        "mount now ships generator_v1; drop the monkeypatch"
    )
    monkeypatch.setattr(ref_hg, "DEFAULT_CKPT", str(artifacts["gen_file"]))

    from nntts.bin.inference import run_tts

    args = types.SimpleNamespace(
        checkpoint=str(artifacts["ckpt"]),
        config=None,  # exercise the default config.yml-next-to-checkpoint path
        outdir=str(artifacts["outdir"]),
        test_fid_scp=str(artifacts["scp"]),
        verbose=0,
        use_cpu=True,
    )
    run_tts(args)

    wavs = [f for f in os.listdir(artifacts["outdir"]) if f.endswith(".wav")]
    assert wavs == ["utt1_1000steps.wav"], wavs
    ref_wav = written["utt1_1000steps.wav"]
    assert ref_wav.ndim == 1 and ref_wav.size > 0

    # --- our pipeline on the same text, same artifacts ---
    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.text import text_to_sequence
    from nntts.text import text_to_sequence as ref_text_to_sequence

    ids = text_to_sequence(TEXT, ["english_cleaners"])
    assert ids == list(ref_text_to_sequence(TEXT, ["english_cleaners"]))

    cfg, params = artifacts["cfg"], artifacts["params"]
    text = np.asarray(ids, np.int32)[None]
    tl = np.array([len(ids)], np.int32)
    e, value, tmask = efts.infer_durations(params, cfg, text, tl)
    t2 = int(np.round(float(np.asarray(e)[0, -1])))
    mel, _ = efts.infer_decode(params, cfg, value, e, tmask, t2)
    wav = hg.generator(
        fold_weight_norm(artifacts["voc_params"]), mel, artifacts["voc_cfg"]
    )
    ours = np.asarray(wav)[0]

    assert ours.shape == ref_wav.shape, (ours.shape, ref_wav.shape)
    np.testing.assert_allclose(ours, ref_wav, atol=2e-3)
    # and the PCM16 file on disk round-trips to the same samples
    import wave as wave_mod

    with wave_mod.open(os.path.join(args.outdir, wavs[0]), "rb") as f:
        pcm = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    np.testing.assert_allclose(
        pcm / 32767.0, ref_wav, atol=1.0 / 32767.0
    )
