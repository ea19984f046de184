"""Export roundtrip: our params -> torch state_dict -> our params, and a
torch forward with exported weights matches ours."""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

import jax

from efficient_tts_tpu.compat.torch_export import efts_cnn_to_state_dict
from efficient_tts_tpu.compat.torch_import import efts_cnn_from_state_dict
from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig

CFG = EftsCNNConfig(num_symbols=76, dropout_rate=0.0, use_masking=True)


def test_export_import_roundtrip():
    params = efts.init(jax.random.PRNGKey(3), CFG)
    sd = efts_cnn_to_state_dict(params, CFG)
    back = efts_cnn_from_state_dict(sd, CFG)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=str),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(pa))


def test_exported_weights_load_into_reference():
    from nntts.models.efficient_tts import EfficientTTSCNN

    params = efts.init(jax.random.PRNGKey(4), CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          efts_cnn_to_state_dict(params, CFG).items()}
    m = EfficientTTSCNN(num_symbols=76, dropout_rate=0.0, use_masking=True)
    missing, unexpected = m.load_state_dict(sd, strict=True), None
    m.eval()

    rng = np.random.default_rng(5)
    text = rng.integers(1, 76, size=(1, 20)).astype(np.int32)
    with torch.no_grad():
        mel_t, _ = m.inference(torch.from_numpy(text).long())
    e, value, tmask = efts.infer_durations(
        params, CFG, text, np.array([20], np.int32)
    )
    t2 = mel_t.shape[1]
    mel_j, _ = efts.infer_decode(params, CFG, value, e, tmask, t2)
    np.testing.assert_allclose(
        np.asarray(mel_j)[0], mel_t[0].numpy(), atol=5e-3, rtol=1e-2
    )


def test_hifigan_export_roundtrip_and_reference_load():
    """GAN-trained generator -> official `generator_v1` state_dict: exact
    pytree roundtrip, loads strict into the reference torch Generator, and
    the torch forward matches our generator on the same mel."""
    import jax.numpy as jnp

    from efficient_tts_tpu.compat.torch_export import hifigan_generator_to_state_dict
    from efficient_tts_tpu.compat.torch_import import hifigan_generator_from_state_dict
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig

    voc_cfg = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    )
    params = hg.init_generator(jax.random.PRNGKey(7), voc_cfg)
    sd = hifigan_generator_to_state_dict(params, voc_cfg)

    back = hifigan_generator_from_state_dict(sd, voc_cfg)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=str),
    ):
        np.testing.assert_allclose(
            np.asarray(a).reshape(-1), np.asarray(b).reshape(-1),
            atol=1e-6, err_msg=str(pa),
        )

    from nntts.vocoders.hifigan_model import Generator

    class _H(dict):
        __getattr__ = dict.__getitem__

    m = Generator(
        _H(
            resblock="1",
            upsample_rates=[8, 8, 2, 2],
            upsample_kernel_sizes=[16, 16, 4, 4],
            upsample_initial_channel=64,
            resblock_kernel_sizes=[3, 7],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
        )
    )
    m.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    m.eval()

    rng = np.random.default_rng(11)
    mel = rng.standard_normal((1, 17, 80)).astype(np.float32)
    with torch.no_grad():
        wav_t = m(torch.from_numpy(mel).transpose(1, 2)).numpy()[:, 0]
    wav_j = np.asarray(hg.generator(params, jnp.asarray(mel), voc_cfg))
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-5)
