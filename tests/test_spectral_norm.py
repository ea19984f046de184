"""Spectral-norm parity vs torch (first MSD discriminator)."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from efficient_tts_tpu.models import hifigan as hg


def _transplant_sn_conv1d(tconv):
    """torch spectral_norm state (weight_orig [out,in/g,k], weight_u [out],
    weight_v [in*k]) -> our {w_orig [k,in,out], u, v, b}.

    torch's matrix columns are (in, k)-ordered; ours are (k, in)-ordered,
    so the stored v permutes accordingly."""
    w_orig = tconv.weight_orig.detach().numpy()  # [out, in, k]
    out_ch, in_ch, k = w_orig.shape
    v = tconv.weight_v.detach().numpy().reshape(in_ch, k).T.reshape(-1)
    return {
        "w_orig": np.ascontiguousarray(np.transpose(w_orig, (2, 1, 0))),
        "u": tconv.weight_u.detach().numpy(),
        "v": np.ascontiguousarray(v),
        "b": tconv.bias.detach().numpy(),
    }


def test_sn_matrix_layout_matches_torch():
    """Our [k,in,out] -> [out, k*in] matrix must equal torch's
    weight.reshape(out, -1) so the stored u/v vectors transfer."""
    rng = np.random.default_rng(0)
    w_torch = rng.standard_normal((6, 4, 5)).astype(np.float32)  # [out,in,k]
    ours = np.asarray(
        hg._sn_matrix(np.ascontiguousarray(np.transpose(w_torch, (2, 1, 0))))
    )
    theirs = w_torch.reshape(6, -1)
    # column ordering differs ((k,in) vs (in,k)) but sigma is invariant only
    # if u/v transfer consistently — verify via the actual torch buffers in
    # the full parity test below; here check shapes.
    assert ours.shape == theirs.shape


def test_spectral_scale_discriminator_parity():
    from nntts.vocoders.hifigan_model import DiscriminatorS

    torch.manual_seed(3)
    ref = DiscriminatorS(use_spectral_norm=True).eval()
    rng = np.random.default_rng(4)
    wav = rng.standard_normal((2, 4096)).astype(np.float32) * 0.1
    with torch.no_grad():
        logits_t, fmap_t = ref(torch.from_numpy(wav)[:, None, :])

    params = {
        "convs": [_transplant_sn_conv1d(c) for c in ref.convs],
        "conv_post": _transplant_sn_conv1d(ref.conv_post),
    }
    logits_j, fmap_j = hg.scale_discriminator(params, wav)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=2e-4, rtol=1e-3
    )
    assert len(fmap_j) == len(fmap_t)


def test_power_iteration_contracts_to_sigma_max():
    rng = np.random.default_rng(5)
    base = {
        "w": rng.standard_normal((3, 8, 16)).astype(np.float32),
        "b": np.zeros(16, np.float32),
    }
    import jax

    p = hg.spectral_norm_init(jax.random.PRNGKey(0), base)
    for _ in range(50):
        p = hg.spectral_power_iteration(p)
    w_mat = np.asarray(hg._sn_matrix(p["w_orig"]))
    sigma_est = float(np.asarray(p["u"]) @ w_mat @ np.asarray(p["v"]))
    sigma_true = np.linalg.svd(w_mat, compute_uv=False)[0]
    assert abs(sigma_est - sigma_true) / sigma_true < 1e-3
    # normalized kernel has unit top singular value
    kern = hg._sn_kernel(p)
    sn_sigma = np.linalg.svd(np.asarray(hg._sn_matrix(kern["w"])), compute_uv=False)[0]
    assert abs(sn_sigma - 1.0) < 1e-3
