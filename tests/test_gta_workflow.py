"""Full GTA fine-tuning workflow: train EFTS briefly -> extract GTA mels
-> vocoder fine-tuning step consumes them."""

import os

import numpy as np
import pytest
import yaml
from scipy.io.wavfile import write as wav_write

PHONES = ["!", "HH", "AH0", "L", "OW1", "W"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("gta")
    wavdir = root / "wavs"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        n = 12000
        t = np.arange(n) / 22050.0
        y = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
        wav_write(str(wavdir / f"g{i}.wav"), 22050, (y * 32767).astype(np.int16))
        lines.append(f"DUMMY/g{i}.wav|{' '.join(rng.choice(PHONES[1:], size=5))}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    (root / "phnset.txt").write_text("\n".join(PHONES) + "\n")
    config = {
        "dataset_params": {
            "wav_path": str(wavdir),
            "use_phnseq": True,
            "phnset_path": str(root / "phnset.txt"),
        },
        "model_name": "EfficientTTSCNN",
        "model_params": {
            "num_symbols": 6, "symbol_embedding_dim": 32, "n_channels": 32,
            "n_text_encoder_layer": 1, "n_mel_encoder_layer": 1,
            "n_decoder_layer": 1, "dropout_rate": 0.0, "use_masking": True,
        },
        "batch_size": 2,
        "optimizer_params": {"lr": 1.0e-3},
        "scheduler_params": {"warmup_steps": 5},
        "mesh": {"data": 1, "model": 1},
        "train_max_steps": 2,
        "save_interval_steps": 2,
        "eval_interval_steps": 100,
        "log_interval_steps": 1,
    }
    (root / "config.yaml").write_text(yaml.safe_dump(config))
    return root


def test_gta_end_to_end(setup):
    from efficient_tts_tpu.bin.extract_gta import main as gta_main
    from efficient_tts_tpu.bin.train import main as train_main

    outdir = str(setup / "exp")
    train_main([
        "--config", str(setup / "config.yaml"),
        "--train_fid_scp", str(setup / "train.txt"),
        "--outdir", outdir,
    ])
    ckpt = os.path.join(outdir, "checkpoint-2steps")
    assert os.path.isdir(ckpt)

    gta_dir = str(setup / "gta")
    gta_main([
        "--fid_scp", str(setup / "train.txt"),
        "--checkpoint", ckpt,
        "--outdir", gta_dir,
        "--batch_size", "2",
    ])
    mels = sorted(os.listdir(gta_dir))
    assert len(mels) == 3
    mel = np.load(os.path.join(gta_dir, mels[0]))
    assert mel.shape[0] == 80  # [n_mels, T2]

    # fine-tuning dataset pairs GTA mel (input) with true audio (target)
    from efficient_tts_tpu.data.dataset import MelAudioSegmentDataset

    files = [str(setup / "wavs" / f"g{i}.wav") for i in range(3)]
    ds = MelAudioSegmentDataset(
        files, segment_size=2048, fine_tuning=True, base_mels_path=gta_dir,
        shuffle=False,
    )
    mel_in, audio, mel_loss = ds[0]
    assert audio.shape == (2048,)
    assert mel_in.shape[0] == 2048 // 256
    assert mel_loss.shape[0] == mel_in.shape[0]
    # input is the GTA mel, loss target is ground-truth -> they differ
    assert not np.allclose(mel_in, mel_loss)
