"""`efts-export-torch` CLI: orbax checkpoints -> torch files that the
reference tooling actually loads (trainer .pkl layout, `generator_v1`,
official g_/do_ pair)."""

import os
import sys

import numpy as np
import jax
import optax
import torch

sys.path.insert(0, "/root/reference")

from efficient_tts_tpu.bin.export_torch import main as export_main
from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.train import checkpoint as ckpt
from efficient_tts_tpu.train.hifigan_train_step import init_gan_state
from efficient_tts_tpu.train.optim import adam_warmup
from efficient_tts_tpu.train.state import create_state
from efficient_tts_tpu.utils.config import dump_config

VOC_CFG = HiFiGANConfig(
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def test_export_gan_full_pair(tmp_path):
    tx = optax.adam(2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), VOC_CFG, tx, tx)
    state["step"] = jax.numpy.asarray(7, jax.numpy.int32)
    path = ckpt.save_checkpoint(str(tmp_path / "exp"), state)

    out = str(tmp_path / "torch")
    cfg_yaml = str(tmp_path / "voc.yaml")
    dump_config(
        {"vocoder_params": {
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
        }},
        str(tmp_path),
    )
    os.rename(str(tmp_path / "config.yml"), cfg_yaml)
    export_main([
        "--model", "HiFiGANFull", "--checkpoint", path, "--out", out,
        "--config", cfg_yaml,
    ])
    g = torch.load(os.path.join(out, "g_00000007"), weights_only=True)
    do = torch.load(os.path.join(out, "do_00000007"), weights_only=True)
    assert do["steps"] == 7
    assert any(k.startswith("conv_pre") for k in g["generator"])

    # discriminators strict-load into the reference modules
    from nntts.vocoders.hifigan_model import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )

    mpd = MultiPeriodDiscriminator()
    missing, unexpected = mpd.load_state_dict(do["mpd"], strict=False)
    assert not unexpected and not missing
    msd = MultiScaleDiscriminator()
    missing, unexpected = msd.load_state_dict(do["msd"], strict=False)
    assert not unexpected
    assert all(m.endswith(".weight") for m in missing)  # sn 'weight' buffer


def test_export_efts_pkl_loads_in_reference_layout(tmp_path):
    cfg = EftsCNNConfig(
        num_symbols=40, symbol_embedding_dim=32, n_channels=32,
        n_text_encoder_layer=1, n_mel_encoder_layer=1, n_decoder_layer=1,
        dropout_rate=0.0, use_masking=True,
    )
    params = efts.init(jax.random.PRNGKey(1), cfg)
    state = create_state(params, adam_warmup())
    outdir = str(tmp_path / "exp")
    path = ckpt.save_checkpoint(outdir, state)
    dump_config(
        {"model_name": "EfficientTTSCNN", "model_params": {
            "num_symbols": 40, "symbol_embedding_dim": 32, "n_channels": 32,
            "n_text_encoder_layer": 1, "n_mel_encoder_layer": 1,
            "n_decoder_layer": 1, "dropout_rate": 0.0, "use_masking": True,
        }},
        outdir,
    )
    out = str(tmp_path / "ckpt.pkl")
    export_main(["--model", "EfficientTTSCNN", "--checkpoint", path, "--out", out])
    loaded = torch.load(out, weights_only=True)
    assert set(loaded) == {"model", "steps", "epochs"}
    assert "text_embedding_table.weight" in loaded["model"]
    np.testing.assert_allclose(
        loaded["model"]["text_embedding_table.weight"].numpy(),
        np.asarray(params["text_embedding"]["table"]),
    )


def test_load_vocoder_from_orbax_gan_checkpoint(tmp_path):
    """`--vocoder_checkpoint <orbax dir>` (the recipe's stage-3 path with
    a trained vocoder, `recipes/lj/test.sh`) loads the generator — EMA
    copy when tracked — and matches direct use of those params."""
    import jax.numpy as jnp

    from efficient_tts_tpu.bin.inference import _load_vocoder
    from efficient_tts_tpu.nn.layers import fold_weight_norm

    tx = optax.adam(2e-4)
    state = init_gan_state(jax.random.PRNGKey(2), VOC_CFG, tx, tx, ema_decay=0.99)
    # make the EMA copy distinguishable from the raw iterate
    state["ema"] = jax.tree_util.tree_map(lambda x: x * 1.5, state["gen"]["params"])
    path = ckpt.save_checkpoint(str(tmp_path / "voc"), state)

    params = _load_vocoder(path, VOC_CFG)
    mel = np.random.default_rng(0).standard_normal((1, 9, 80)).astype(np.float32)
    wav = hg.generator(params, jnp.asarray(mel), VOC_CFG)
    ref = hg.generator(fold_weight_norm(state["ema"]), jnp.asarray(mel), VOC_CFG)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(ref), atol=1e-6)


def test_vocoder_config_rebuilt_from_outdir(tmp_path):
    """A non-default generator topology is reconstructed from the
    config.yml the vocoder trainer dumps next to its checkpoints — the
    serve/inference CLIs must not silently assume the V1 defaults."""
    from efficient_tts_tpu.bin.inference import _load_vocoder
    from efficient_tts_tpu.utils.config import (
        dump_config,
        vocoder_config_near_checkpoint,
    )

    vp = {
        "upsample_rates": [8, 8, 4],
        "upsample_kernel_sizes": [16, 16, 8],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 5],
        "resblock_dilation_sizes": [[1, 2], [2, 6]],
    }
    outdir = str(tmp_path / "exp_voc")
    dump_config({"vocoder_params": vp}, outdir)
    cfg = vocoder_config_near_checkpoint(os.path.join(outdir, "checkpoint-5steps"))
    assert cfg.upsample_rates == (8, 8, 4)
    assert cfg.resblock_dilation_sizes == ((1, 2), (2, 6))
    hash(cfg)  # jit-static usable

    tx = optax.adam(2e-4)
    state = init_gan_state(jax.random.PRNGKey(5), cfg, tx, tx)
    path = ckpt.save_checkpoint(outdir, state)
    params = _load_vocoder(path, cfg)
    mel = np.random.default_rng(1).standard_normal((1, 8, 80)).astype(np.float32)
    wav = hg.generator(params, jax.numpy.asarray(mel), cfg)
    assert wav.shape == (1, 8 * 8 * 8 * 4)
