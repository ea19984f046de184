"""End-to-end CLI smoke test: train a tiny model for a few steps on a
synthetic corpus, checkpoint, then synthesize with the inference CLI."""

import os

import numpy as np
import pytest
import yaml
from scipy.io.wavfile import write as wav_write

PHONES = ["!", "HH", "AH0", "L", "OW1", "W", "ER1", "D"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    wavdir = root / "wavs"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        n = 16000
        t = np.arange(n) / 22050.0
        y = (0.3 * np.sin(2 * np.pi * (220 + 30 * i) * t)).astype(np.float32)
        wav_write(str(wavdir / f"u{i}.wav"), 22050, (y * 32767).astype(np.int16))
        phones = " ".join(rng.choice(PHONES[1:], size=6))
        lines.append(f"DUMMY/u{i}.wav|{phones}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    (root / "phnset.txt").write_text("\n".join(PHONES) + "\n")
    config = {
        "dataset_type": "TextMelDataset",
        "dataset_params": {
            "wav_path": str(wavdir),
            "use_phnseq": True,
            "phnset_path": str(root / "phnset.txt"),
        },
        "model_name": "EfficientTTSCNN",
        "model_params": {
            "num_symbols": 8,
            "symbol_embedding_dim": 32,
            "n_channels": 32,
            "n_text_encoder_layer": 1,
            "n_mel_encoder_layer": 1,
            "n_decoder_layer": 1,
            "dropout_rate": 0.0,
            "use_masking": True,
        },
        "batch_size": 2,
        "optimizer_type": "Adam",
        "optimizer_params": {"lr": 1.0e-3, "betas": [0.9, 0.99], "eps": 1.0e-9,
                             "weight_decay": 1.0e-5, "amsgrad": True},
        "grad_norm": 1.0,
        "scheduler_type": "WarmupLR",
        "scheduler_params": {"warmup_steps": 10},
        "mesh": {"data": None, "model": 1},
        "train_max_steps": 4,
        "save_interval_steps": 4,
        "eval_interval_steps": 1000,
        "log_interval_steps": 2,
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    return {"root": root, "config": str(cfg_path)}


def test_train_and_infer_cli(setup):
    from efficient_tts_tpu.bin.train import main as train_main

    outdir = str(setup["root"] / "exp")
    train_main(
        [
            "--config", setup["config"],
            "--train_fid_scp", str(setup["root"] / "train.txt"),
            "--outdir", outdir,
        ]
    )
    ckpts = [d for d in os.listdir(outdir) if d.startswith("checkpoint-")]
    assert ckpts, "no checkpoint written"
    assert os.path.exists(os.path.join(outdir, "config.yml"))

    from efficient_tts_tpu.bin.inference import main as infer_main

    gendir = str(setup["root"] / "gen")
    timing_json = str(setup["root"] / "timing.json")
    infer_main(
        [
            "--test_fid_scp", str(setup["root"] / "train.txt"),
            "--checkpoint", os.path.join(outdir, sorted(ckpts)[-1]),
            "--outdir", gendir,
            "--num_utts", "2",
            "--repeats", "2",
            "--timing_json", timing_json,
        ]
    )
    wavs = [f for f in os.listdir(gendir) if f.endswith(".wav")]
    assert len(wavs) == 2
    import json

    timing = json.load(open(timing_json))
    assert len(timing["passes"]) == 2
    # pass 1 reuses pass 0's compiles; audio accounting carries over
    assert timing["passes"][1]["audio_s"] == timing["passes"][0]["audio_s"]
    assert "efts_load_s" in timing["phases"]
    from scipy.io.wavfile import read

    sr, data = read(os.path.join(gendir, wavs[0]))
    assert sr == 22050 and data.dtype == np.int16 and len(data) > 0


def test_resume_restores_step(setup):
    from efficient_tts_tpu.bin.train import main as train_main

    outdir = str(setup["root"] / "exp_resume")
    args = [
        "--config", setup["config"],
        "--train_fid_scp", str(setup["root"] / "train.txt"),
        "--outdir", outdir,
    ]
    train_main(args)
    # second invocation auto-resumes from checkpoint-4steps and stops
    # immediately (train_max_steps reached)
    train_main(args)
    ckpts = sorted(d for d in os.listdir(outdir) if d.startswith("checkpoint-"))
    assert "checkpoint-4steps" in ckpts
