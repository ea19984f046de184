"""MPD/MSD torch interop: import official-layout discriminator weights,
match the reference forward, and export back strict-loadable.

Completes the GAN-state torch interop story: generator (see
`test_torch_export.py`) plus both discriminator families, so a vocoder
run can warm-start from, or hand back to, the official torch recipe
(`/root/reference/nntts/vocoders/hifigan_model.py:148-268`).
"""

import sys

import numpy as np
import jax
import pytest
import torch

sys.path.insert(0, "/root/reference")

from efficient_tts_tpu.compat.torch_export import (
    gan_state_to_torch_checkpoints,
    hifigan_mpd_to_state_dict,
    hifigan_msd_to_state_dict,
)
from efficient_tts_tpu.compat.torch_import import (
    hifigan_mpd_from_state_dict,
    hifigan_msd_from_state_dict,
)
from efficient_tts_tpu.models import hifigan as hg


def _torch_mpd():
    from nntts.vocoders.hifigan_model import MultiPeriodDiscriminator

    torch.manual_seed(7)
    return MultiPeriodDiscriminator().eval()


def _torch_msd():
    from nntts.vocoders.hifigan_model import MultiScaleDiscriminator

    torch.manual_seed(8)
    return MultiScaleDiscriminator().eval()


def _wavs(b=2, t=4096):
    rng = np.random.default_rng(5)
    y = np.tanh(rng.standard_normal((b, t))).astype(np.float32) * 0.5
    y_hat = np.tanh(rng.standard_normal((b, t))).astype(np.float32) * 0.5
    return y, y_hat


def test_mpd_import_forward_parity():
    ref = _torch_mpd()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hifigan_mpd_from_state_dict(sd)
    y, y_hat = _wavs()
    with torch.no_grad():
        rs_t, gs_t, fr_t, fg_t = ref(
            torch.from_numpy(y)[:, None], torch.from_numpy(y_hat)[:, None]
        )
    rs_j, gs_j, fr_j, fg_j = hg.mpd_forward(params, y, y_hat)
    assert len(rs_j) == len(rs_t) == 5
    for a, b in zip(rs_j, rs_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4, rtol=1e-3)
    for fa, fb in zip(fg_j, fg_t):
        assert len(fa) == len(fb)


def test_msd_import_forward_parity():
    """Includes the spectral-normed first discriminator: the permuted u/v
    buffers must reproduce torch's sigma exactly (eval-mode forward)."""
    ref = _torch_msd()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hifigan_msd_from_state_dict(sd)
    y, y_hat = _wavs()
    with torch.no_grad():
        rs_t, gs_t, _, _ = ref(
            torch.from_numpy(y)[:, None], torch.from_numpy(y_hat)[:, None]
        )
    rs_j, gs_j, _, _ = hg.msd_forward(params, y, y_hat)
    assert len(rs_j) == len(rs_t) == 3
    for a, b in zip(list(rs_j) + list(gs_j), list(rs_t) + list(gs_t)):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("family", ["mpd", "msd"])
def test_disc_export_roundtrip_and_strict_load(family):
    """Our randomly initialized discriminators -> torch state_dict: strict
    load into the reference module, byte-exact pytree roundtrip."""
    if family == "mpd":
        params = hg.init_mpd(jax.random.PRNGKey(3))
        sd = hifigan_mpd_to_state_dict(params)
        back = hifigan_mpd_from_state_dict(sd)
        ref = _torch_mpd()
    else:
        params = hg.init_msd(jax.random.PRNGKey(4))
        sd = hifigan_msd_to_state_dict(params)
        back = hifigan_msd_from_state_dict(sd)
        ref = _torch_msd()
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=str),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=0, err_msg=str(pa)
        )
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    # torch spectral_norm keeps an extra `weight` buffer we don't carry
    assert all(m.endswith(".weight") for m in missing), missing


def test_gan_state_to_torch_checkpoints():
    import optax

    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.train.hifigan_train_step import init_gan_state

    cfg = HiFiGANConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    tx = optax.adam(2e-4)
    state = init_gan_state(jax.random.PRNGKey(0), cfg, tx, tx)
    g, do = gan_state_to_torch_checkpoints(state, cfg)
    assert set(do) == {"mpd", "msd", "steps", "epoch"}
    assert "generator" in g and do["steps"] == 0
    assert any(k.startswith("conv_pre") for k in g["generator"])
