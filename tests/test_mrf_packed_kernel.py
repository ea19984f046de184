"""Fused packed-MRF Pallas kernel (bf16 + W8A8 int8): correctness.

- bf16 mode must match both the jnp reference twin and the production
  XLA packed resblock path (bf16 tolerance), including across tile
  boundaries and with a padded tail (M not a tile multiple).
- int8 mode must match the reference twin's quantized math exactly on a
  single tile, and stay within a small relative error of the exact bf16
  path (quantization noise bound).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.ops.pallas.mrf_packed import (
    mrf_stage_packed,
    mrf_stage_packed_reference,
    pack_stage_weights,
    quantize_weights,
    stage_plan,
)

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
R, C = 4, 32


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 19)
    blocks = []
    i = 0
    for k, dils in zip(KS, DILS):
        blocks.append(
            {
                "convs1": [
                    {"w": 0.15 * jax.random.normal(keys[i + j], (k, C, C)),
                     "b": 0.1 * jax.random.normal(keys[i + j + 3], (C,))}
                    for j in range(3)
                ],
                "convs2": [
                    {"w": 0.15 * jax.random.normal(keys[i + j + 6], (k, C, C)),
                     "b": 0.1 * jax.random.normal(keys[i + j + 9], (C,))}
                    for j in range(3)
                ],
            }
        )
        i += 2
    wp, biases = pack_stage_weights(blocks, KS, DILS, R, C)
    plan, halo = stage_plan(KS, DILS, R)
    wq, scales = quantize_weights(wp, plan)
    x = jnp.asarray(
        0.5 * np.random.default_rng(0).standard_normal((2, 96, 128)),
        jnp.bfloat16,
    )
    return blocks, wp, wq, scales, biases, x


def _exact(blocks, x):
    """Production XLA packed path output for the same stage."""
    acc = None
    for block, k, dils in zip(blocks, KS, DILS):
        y = hg._resblock1_packed(block, x, k, dils, R, C)
        acc = y if acc is None else acc + y
    return np.asarray((acc / len(KS)).astype(jnp.float32))


def test_bf16_kernel_matches_reference_and_exact(setup):
    blocks, wp, wq, scales, biases, x = setup
    ref = np.asarray(
        mrf_stage_packed_reference(x, wp, scales, biases, KS, DILS, R,
                                   int8=False).astype(jnp.float32)
    )
    out = mrf_stage_packed(
        x, wp.astype(jnp.bfloat16), scales, biases, KS, DILS, R,
        t_tile=32, int8=False, interpret=True,
    )
    out = np.asarray(out.astype(jnp.float32))
    # multi-tile (3 tiles + halos) must equal single-tile bit-for-bit:
    # proves the halo/mask/tiling machinery introduces nothing
    out_single = np.asarray(
        mrf_stage_packed(
            x, wp.astype(jnp.bfloat16), scales, biases, KS, DILS, R,
            t_tile=96, int8=False, interpret=True,
        ).astype(jnp.float32)
    )
    np.testing.assert_array_equal(out, out_single)
    # vs the jnp twin and the production XLA packed path: bf16 rounding
    # accumulated over the 6-conv chain -> bound the relative RMS
    rel_twin = np.sqrt(np.mean((out - ref) ** 2) / np.mean(ref**2))
    assert rel_twin < 0.01, rel_twin
    exact = _exact(blocks, x)
    rel = np.sqrt(np.mean((out - exact) ** 2) / np.mean(exact**2))
    assert rel < 0.02, rel


def test_bf16_kernel_padded_tail(setup):
    """M=80 with t_tile=32 -> padded tail blocks must stay exact zeros in
    influence: compare against the same input truncated."""
    blocks, wp, wq, scales, biases, x = setup
    x80 = x[:, :80]
    out = mrf_stage_packed(
        x80, wp.astype(jnp.bfloat16), scales, biases, KS, DILS, R,
        t_tile=32, int8=False, interpret=True,
    )
    ref = np.asarray(
        mrf_stage_packed(
            x80, wp.astype(jnp.bfloat16), scales, biases, KS, DILS, R,
            t_tile=80, int8=False, interpret=True,
        ).astype(jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)), ref)


def test_int8_kernel_matches_quantized_reference_single_tile(setup):
    """One tile -> the kernel's per-tile activation scales equal the
    reference twin's per-tensor scales; outputs must agree to bf16
    rounding."""
    blocks, wp, wq, scales, biases, x = setup
    out = mrf_stage_packed(
        x, wq, scales, biases, KS, DILS, R,
        t_tile=96, int8=True, interpret=True,
    )
    ref = mrf_stage_packed_reference(x, wq, scales, biases, KS, DILS, R,
                                     int8=True)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)),
        atol=3e-2, rtol=3e-2,
    )


def test_int8_quantization_error_bounded(setup):
    """W8A8 output must stay close to the exact path: the MRF stage output
    is O(1); per-conv int8 noise accumulated over 6 convs should keep
    the error well under 5% relative RMS."""
    blocks, wp, wq, scales, biases, x = setup
    out = np.asarray(
        mrf_stage_packed(
            x, wq, scales, biases, KS, DILS, R,
            t_tile=96, int8=True, interpret=True,
        ).astype(jnp.float32)
    )
    exact = _exact(blocks, x)
    rel_rms = np.sqrt(np.mean((out - exact) ** 2)) / np.sqrt(
        np.mean(exact**2)
    )
    assert rel_rms < 0.05, rel_rms


def test_int8_static_act_scales_match_exact(setup):
    """Static calibrated activation scales (verdict r1 item 10): on data
    drawn from the calibration distribution the static-scale W8A8 output
    must stay within the same quantization-noise bound as dynamic
    scales."""
    from efficient_tts_tpu.ops.pallas.mrf_packed import calibrate_act_scales

    blocks, wp, wq, scales, biases, x = setup
    act = calibrate_act_scales(x, KS, DILS, R, blocks, C)
    assert act.shape == (18,) and bool(jnp.all(act > 0))
    out = np.asarray(
        mrf_stage_packed(
            x, wq, scales, biases, KS, DILS, R,
            t_tile=96, int8=True, interpret=True, act_scales=act,
        ).astype(jnp.float32)
    )
    exact = _exact(blocks, x)
    rel_rms = np.sqrt(np.mean((out - exact) ** 2)) / np.sqrt(
        np.mean(exact**2)
    )
    assert rel_rms < 0.05, rel_rms
