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
