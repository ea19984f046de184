"""HiFi-GAN parity tests vs the reference torch implementation."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from efficient_tts_tpu.compat.torch_import import hifigan_generator_from_state_dict
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig

CFG = HiFiGANConfig()


class _H(dict):
    __getattr__ = dict.__getitem__


REF_H = _H(
    resblock="1",
    upsample_rates=[8, 8, 2, 2],
    upsample_kernel_sizes=[16, 16, 4, 4],
    upsample_initial_channel=512,
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)


@pytest.fixture(scope="module")
def ref_gen():
    from nntts.vocoders.hifigan_model import Generator

    torch.manual_seed(0)
    return Generator(REF_H).eval()


def test_generator_parity(ref_gen):
    sd = {k: v.detach().numpy() for k, v in ref_gen.state_dict().items()}
    params = hifigan_generator_from_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 32)).astype(np.float32)
    with torch.no_grad():
        wav_t = ref_gen(torch.from_numpy(mel))[0, 0].numpy()

    wav_j = np.asarray(hg.generator(params, np.swapaxes(mel, 1, 2), CFG))[0]
    assert wav_j.shape == wav_t.shape == (32 * 256,)
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-4, rtol=1e-3)


def test_generator_folded_parity(ref_gen):
    """After remove_weight_norm the folded-weight path must agree too."""
    from nntts.vocoders.hifigan_model import Generator

    g2 = Generator(REF_H)
    g2.load_state_dict(ref_gen.state_dict())
    g2.eval()
    g2.remove_weight_norm()
    sd = {k: v.detach().numpy() for k, v in g2.state_dict().items()}
    params = hifigan_generator_from_state_dict(sd, CFG)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 17)).astype(np.float32)
    with torch.no_grad():
        wav_t = g2(torch.from_numpy(mel))[:, 0].numpy()
    wav_j = np.asarray(hg.generator(params, np.swapaxes(mel, 1, 2), CFG))
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-4, rtol=1e-3)


def _transplant_conv2d(tconv):
    w_v = tconv.weight_v.detach().numpy()  # [out, in, kh, kw]
    w_g = tconv.weight_g.detach().numpy()
    return {
        "v": np.ascontiguousarray(np.transpose(w_v, (2, 3, 1, 0))),
        "g": w_g.reshape(1, 1, 1, -1),
        "b": tconv.bias.detach().numpy(),
    }


def _transplant_conv1d(tconv):
    w_v = tconv.weight_v.detach().numpy()  # [out, in/g, k]
    w_g = tconv.weight_g.detach().numpy()
    return {
        "v": np.ascontiguousarray(np.transpose(w_v, (2, 1, 0))),
        "g": w_g.reshape(1, 1, -1),
        "b": tconv.bias.detach().numpy(),
    }


def test_period_discriminator_parity():
    from nntts.vocoders.hifigan_model import DiscriminatorP

    torch.manual_seed(1)
    ref = DiscriminatorP(3).eval()
    params = {
        "convs": [_transplant_conv2d(c) for c in ref.convs],
        "conv_post": _transplant_conv2d(ref.conv_post),
    }
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((2, 8192)).astype(np.float32) * 0.1
    with torch.no_grad():
        logits_t, fmap_t = ref(torch.from_numpy(wav)[:, None, :])
    logits_j, fmap_j = hg.period_discriminator(params, wav, period=3)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=1e-4, rtol=1e-3
    )
    assert len(fmap_j) == len(fmap_t)


def test_scale_discriminator_parity():
    from nntts.vocoders.hifigan_model import DiscriminatorS

    torch.manual_seed(2)
    ref = DiscriminatorS(use_spectral_norm=False).eval()
    params = {
        "convs": [_transplant_conv1d(c) for c in ref.convs],
        "conv_post": _transplant_conv1d(ref.conv_post),
    }
    rng = np.random.default_rng(3)
    wav = rng.standard_normal((2, 8192)).astype(np.float32) * 0.1
    with torch.no_grad():
        logits_t, fmap_t = ref(torch.from_numpy(wav)[:, None, :])
    logits_j, fmap_j = hg.scale_discriminator(params, wav)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=1e-4, rtol=1e-3
    )
    assert len(fmap_j) == len(fmap_t)


def test_gan_losses_parity():
    from nntts.vocoders.hifigan_model import (
        discriminator_loss as ref_d,
        feature_loss as ref_f,
        generator_loss as ref_g,
    )

    from efficient_tts_tpu.losses.gan import (
        discriminator_loss,
        feature_loss,
        generator_loss,
    )

    rng = np.random.default_rng(4)
    reals = [rng.standard_normal((2, 10)).astype(np.float32) for _ in range(3)]
    fakes = [rng.standard_normal((2, 10)).astype(np.float32) for _ in range(3)]
    fr = [[rng.standard_normal((2, 4, 4)).astype(np.float32)] for _ in range(3)]
    fg = [[rng.standard_normal((2, 4, 4)).astype(np.float32)] for _ in range(3)]

    t = lambda x: torch.from_numpy(x)
    d_ref, _, _ = ref_d([t(x) for x in reals], [t(x) for x in fakes])
    d_j, _, _ = discriminator_loss(reals, fakes)
    assert abs(float(d_j) - float(d_ref)) < 1e-5

    g_ref, _ = ref_g([t(x) for x in fakes])
    g_j, _ = generator_loss(fakes)
    assert abs(float(g_j) - float(g_ref)) < 1e-5

    f_ref = ref_f([[t(a) for a in m] for m in fr], [[t(a) for a in m] for m in fg])
    f_j = feature_loss(fr, fg)
    assert abs(float(f_j) - float(f_ref)) < 1e-5


def _torch_stft_mag(x, fft_size, hop, win_length):
    """Oracle per the reference spec (`stft_loss.py:12-32`): torch.stft
    defaults (center=True), magnitude clamped at 1e-7. (The reference's own
    legacy no-return_complex call cannot execute on modern torch.)"""
    spec = torch.stft(
        x, fft_size, hop, win_length, torch.hann_window(win_length),
        return_complex=True,
    )
    return torch.sqrt(torch.clamp(spec.real**2 + spec.imag**2, min=1e-7)).transpose(2, 1)


def test_multi_resolution_stft_loss_parity():
    from efficient_tts_tpu.losses.stft_loss import multi_resolution_stft_loss

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.3
    y = rng.standard_normal((2, 16000)).astype(np.float32) * 0.3
    sc_t, mag_t = 0.0, 0.0
    with torch.no_grad():
        for fft_size, hop, win in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
            xm = _torch_stft_mag(torch.from_numpy(x), fft_size, hop, win)
            ym = _torch_stft_mag(torch.from_numpy(y), fft_size, hop, win)
            sc_t += float(torch.norm(ym - xm, p="fro") / torch.norm(ym, p="fro"))
            mag_t += float(torch.nn.functional.l1_loss(torch.log(ym), torch.log(xm)))
    sc_t /= 3.0
    mag_t /= 3.0
    sc_j, mag_j = multi_resolution_stft_loss(x, y)
    assert abs(float(sc_j) - sc_t) < 1e-4
    assert abs(float(mag_j) - mag_t) < 1e-4


def test_generator_v2_resblock2_parity():
    """resblock='2' (HiFi-GAN V2/V3 family, `hifigan_model.py:71-88`):
    weight transplant parity against the torch reference."""
    from nntts.vocoders.hifigan_model import Generator

    ref_h = _H(
        resblock="2",
        upsample_rates=[8, 8, 4],
        upsample_kernel_sizes=[16, 16, 8],
        upsample_initial_channel=256,
        resblock_kernel_sizes=[3, 5, 7],
        resblock_dilation_sizes=[[1, 2], [2, 6], [3, 12]],
    )
    cfg = HiFiGANConfig(
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    )
    torch.manual_seed(1)
    ref = Generator(ref_h).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hifigan_generator_from_state_dict(sd, cfg)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 17)).astype(np.float32)
    with torch.no_grad():
        wav_t = ref(torch.from_numpy(mel))[:, 0].numpy()
    wav_j = np.asarray(hg.generator(params, np.swapaxes(mel, 1, 2), cfg))
    assert wav_j.shape == wav_t.shape == (2, 17 * 256)
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-4, rtol=1e-3)
