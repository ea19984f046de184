"""Pallas MRF kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig, _resblock1
from efficient_tts_tpu.ops.pallas.mrf import mrf_stage, pack_resblock_weights


def test_mrf_stage_matches_xla():
    cfg = HiFiGANConfig()
    params = hg.init_generator(jax.random.PRNGKey(1), cfg)
    c, stage_i = 32, 3
    blocks = [params["resblocks"][stage_i * 3 + j] for j in range(3)]
    ks, ds = cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4096, c)).astype(np.float32))

    acc = None
    for j, (k, dd) in enumerate(zip(ks, ds)):
        y = _resblock1(blocks[j], x, k, dd)
        acc = y if acc is None else acc + y
    ref = np.asarray(acc / 3)

    ws, bs = zip(*[pack_resblock_weights(blocks[j], ks[j], c) for j in range(3)])
    out = np.asarray(
        mrf_stage(x, tuple(ws), tuple(bs), ks, ds, t_tile=2048, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
