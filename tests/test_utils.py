"""Utility tests: config resolution, profiling meter, masks."""

import numpy as np
import yaml

from efficient_tts_tpu.utils.config import (
    dump_config,
    load_config,
    model_config_from_dict,
    optimizer_from_dict,
)
from efficient_tts_tpu.utils.masks import (
    bucket_length,
    pad_list,
    round_up,
    sequence_mask,
)
from efficient_tts_tpu.utils.profiling import RTFMeter


def test_sequence_mask():
    m = np.asarray(sequence_mask(np.array([2, 4]), 5))
    assert m.tolist() == [
        [True, True, False, False, False],
        [True, True, True, True, False],
    ]


def test_pad_and_buckets():
    out = pad_list([np.array([1, 2]), np.array([1, 2, 3])])
    assert out.shape == (2, 3) and out[0, 2] == 0
    assert round_up(65, 64) == 128
    assert bucket_length(100, 32) == 128
    assert bucket_length(1, 32) == 32


def test_config_roundtrip(tmp_path):
    cfg = {"model_name": "EfficientTTSCNN", "model_params": {"num_symbols": 76}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    loaded = load_config(str(p), overrides={"batch_size": 4, "ignored": None})
    assert loaded["batch_size"] == 4 and "ignored" not in loaded
    dump_config(loaded, str(tmp_path / "out"))
    re = load_config(str(tmp_path / "out" / "config.yml"))
    assert re["model_params"]["num_symbols"] == 76


def test_model_config_reference_kwargs():
    """Reference-style YAML kwargs translate to dataclass fields."""
    cfg = model_config_from_dict(
        {
            "model_name": "EfficientTTSCNN",
            "model_params": {
                "num_symbols": 76,
                "use_weighted_masking": False,
                "nonlinear_activation": "LeakyReLU",
                "nonlinear_activation_params": {"negative_slope": 0.2},
            },
        }
    )
    assert cfg.num_symbols == 76 and cfg.leaky_slope == 0.2


def test_optimizer_from_reference_config():
    tx = optimizer_from_dict(
        {
            "optimizer_type": "Adam",
            "optimizer_params": {
                "lr": 1.0e-3, "betas": [0.9, 0.99], "eps": 1.0e-9,
                "weight_decay": 1.0e-5, "amsgrad": True,
            },
            "grad_norm": 1.0,
            "scheduler_type": "WarmupLR",
            "scheduler_params": {"warmup_steps": 4000},
        }
    )
    import jax.numpy as jnp

    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1)}
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_rtf_meter():
    m = RTFMeter(sample_rate=22050)
    with m.measure(22050):
        pass
    assert m.audio_seconds == 1.0
    assert m.throughput > 0


def test_data_utils_split_combine_subset(tmp_path):
    """Recipe tooling analog of the reference's Kaldi data-dir utils
    (utils/split_data.sh auto-balanced counts, combine_data.sh dedup,
    make_subset_data.sh near-equal shards)."""
    from efficient_tts_tpu.bin.data_utils import main

    src = tmp_path / "all.txt"
    src.write_text("".join(f"wavs/{i:03d}.wav|text {i}\n" for i in range(11)))

    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    assert main(["split", str(src), str(a), str(b), "--num_first", "8"]) == 0
    assert len(a.read_text().splitlines()) == 8
    assert len(b.read_text().splitlines()) == 3

    # shuffle is deterministic per seed and partitions exactly
    a2, b2 = tmp_path / "a2.txt", tmp_path / "b2.txt"
    assert main(["split", str(src), str(a2), str(b2), "--shuffle"]) == 0
    la, lb = a2.read_text().splitlines(), b2.read_text().splitlines()
    assert len(la) == 5 and len(lb) == 6
    assert sorted(la + lb) == sorted(src.read_text().splitlines())

    # combine dedups by wav path, first occurrence wins
    dup = tmp_path / "dup.txt"
    dup.write_text("wavs/003.wav|OTHER\nwavs/100.wav|new\n")
    out = tmp_path / "comb.txt"
    assert main(["combine", str(out), str(src), str(dup)]) == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 12
    assert "wavs/003.wav|text 3" in lines  # first occurrence kept

    # subset: near-equal contiguous shards covering everything once
    sub = tmp_path / "shards"
    assert main(["subset", str(src), "4", str(sub)]) == 0
    shards = [
        (sub / f"split.{i}.txt").read_text().splitlines() for i in range(1, 5)
    ]
    assert [len(s) for s in shards] == [3, 3, 3, 2]
    assert [ln for s in shards for ln in s] == src.read_text().splitlines()

    # error paths return nonzero
    assert main(["split", str(src), str(a), str(b), "--num_first", "11"]) == 1
    assert main(["subset", str(src), "0", str(sub)]) == 1


def test_train_cli_config_overrides():
    """--set KEY=VALUE merges YAML-parsed values into the config
    (reference argv-merge parity, train.py:94-96)."""
    from efficient_tts_tpu.bin.train import apply_overrides

    cfg = {"train_max_steps": 100, "batch_size": 8}
    out = apply_overrides(cfg, ["train_max_steps=20000", "mesh={data: 2}"])
    assert out["train_max_steps"] == 20000
    assert out["mesh"] == {"data": 2}
    assert out["batch_size"] == 8
    import pytest

    with pytest.raises(SystemExit):
        apply_overrides(cfg, ["notakeyvalue"])
