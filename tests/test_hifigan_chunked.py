"""Chunked generator inference must equal the full pass (interior-exact)."""

import numpy as np
import jax

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig

CFG = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=64,
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_chunked_matches_full():
    params = hg.init_generator(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 70, 80)).astype(np.float32)
    full = np.asarray(hg.generator(params, mel, CFG))
    chunked = np.asarray(
        hg.generator_chunked(params, mel, CFG, chunk_frames=32, overlap_frames=24)
    )
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=1e-5)


def test_chunked_long_input():
    params = hg.init_generator(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 300, 80)).astype(np.float32)
    wav = np.asarray(
        hg.generator_chunked(params, mel, CFG, chunk_frames=128, overlap_frames=24)
    )
    assert wav.shape == (1, 300 * 256)
    assert np.isfinite(wav).all()
