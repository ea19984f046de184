"""Property tests for the IMV alignment ops (random inputs, invariants
that must hold regardless of weights)."""

import numpy as np
import jax.numpy as jnp

from efficient_tts_tpu.ops.alignment import (
    aligned_positions,
    alignment_from_positions,
    imv_from_alpha,
    index_vector,
    masked_softmax,
    scaled_dot_attention,
)
from efficient_tts_tpu.utils.masks import sequence_mask


def _random_case(seed, b=3, t1=17, t2=53):
    rng = np.random.default_rng(seed)
    t1s = rng.integers(t1 // 2, t1 + 1, size=b).astype(np.int32)
    t2s = rng.integers(t2 // 2, t2 + 1, size=b).astype(np.int32)
    text_mask = np.asarray(sequence_mask(t1s, t1))
    mel_mask = np.asarray(sequence_mask(t2s, t2))
    q = rng.standard_normal((b, t2, 8)).astype(np.float32)
    k = rng.standard_normal((b, t1, 8)).astype(np.float32)
    return t1s, t2s, text_mask, mel_mask, q, k


def test_attention_rows_sum_to_one():
    t1s, t2s, text_mask, mel_mask, q, k = _random_case(0)
    alpha = np.asarray(scaled_dot_attention(q, k, jnp.asarray(text_mask)))
    # softmax over text axis: columns sum to 1 for every mel frame
    sums = alpha.sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    # padded text rows are zero
    for b in range(alpha.shape[0]):
        assert np.abs(alpha[b, t1s[b]:, :]).max() == 0.0


def test_imv_monotone_bounded():
    t1s, t2s, text_mask, mel_mask, q, k = _random_case(1)
    alpha = scaled_dot_attention(q, k, jnp.asarray(text_mask))
    alpha = alpha * (text_mask[:, :, None] & mel_mask[:, None, :])
    p = index_vector(jnp.asarray(text_mask))
    imv = np.asarray(imv_from_alpha(alpha, p, jnp.asarray(mel_mask), jnp.asarray(t1s)))
    for b in range(imv.shape[0]):
        valid = imv[b, : t2s[b]]
        assert (np.diff(valid) >= -1e-5).all(), "IMV must be monotone"
        assert valid[0] >= -1e-5
        assert abs(valid.max() - (t1s[b] - 1)) < 1e-3, "rescaled to T1-1"
        # padded frames zeroed before rescale contribute nothing
        assert imv[b, t2s[b]:].max() <= valid.max() + 1e-4


def test_aligned_positions_in_range_and_monotone_for_monotone_imv():
    t1s, t2s, text_mask, mel_mask, q, k = _random_case(2)
    b, t1 = text_mask.shape
    t2 = mel_mask.shape[1]
    # synthetic perfectly linear imv
    imv = np.zeros((b, t2), np.float32)
    for i in range(b):
        imv[i, : t2s[i]] = np.linspace(0, t1s[i] - 1, t2s[i])
    p = index_vector(jnp.asarray(text_mask))
    e = np.asarray(
        aligned_positions(jnp.asarray(imv), p, jnp.asarray(mel_mask),
                          jnp.asarray(text_mask))
    )
    for i in range(b):
        valid = e[i, : t1s[i]]
        assert (valid >= -1e-4).all() and (valid <= t2s[i]).all()
        assert (np.diff(valid) >= -1e-3).all(), "monotone imv -> monotone e"
        assert np.abs(e[i, t1s[i]:]).max() == 0.0


def test_alignment_from_positions_is_softmax_over_text():
    t1s, t2s, text_mask, mel_mask, _, _ = _random_case(3)
    b, t1 = text_mask.shape
    rng = np.random.default_rng(3)
    e = np.sort(rng.uniform(0, 40, size=(b, t1)).astype(np.float32), axis=1)
    e = e * text_mask
    alpha = np.asarray(
        alignment_from_positions(jnp.asarray(e), 48, sigma=0.01,
                                 mel_mask=None, text_mask=jnp.asarray(text_mask))
    )
    np.testing.assert_allclose(alpha.sum(axis=1), 1.0, atol=1e-5)
    assert (alpha >= 0).all()


def test_masked_softmax_fully_masked_rows_are_zero():
    scores = np.random.default_rng(4).standard_normal((2, 4, 5)).astype(np.float32)
    mask = np.ones((2, 4, 5), bool)
    mask[1, 2, :] = False  # fully masked row
    out = np.asarray(masked_softmax(jnp.asarray(scores), jnp.asarray(mask), axis=-1))
    assert np.isfinite(out).all()
    assert np.abs(out[1, 2]).max() == 0.0
    np.testing.assert_allclose(out[0].sum(-1), 1.0, atol=1e-5)
