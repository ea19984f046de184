"""Layer-library tests: transformer blocks, length regulator, postnet,
conv primitives vs torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from efficient_tts_tpu.nn.attention import (
    add_positional_encoding,
    multi_head_attention,
    multi_head_attention_init,
    positional_encoding,
)
from efficient_tts_tpu.nn.layers import (
    conv1d,
    conv1d_init,
    conv_transpose1d,
    conv_transpose1d_init,
    layer_norm,
    layer_norm_init,
)
from efficient_tts_tpu.nn.length_regulator import length_regulator
from efficient_tts_tpu.nn.postnet import postnet, postnet_init
from efficient_tts_tpu.nn.transformer import transformer_block, transformer_block_init


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 50, 16)).astype(np.float32)
    for k, d in [(5, 1), (3, 2), (7, 3)]:
        p = conv1d_init(jax.random.PRNGKey(0), 16, 24, k)
        w = np.asarray(p["w"])  # [k, in, out]
        tconv = torch.nn.Conv1d(16, 24, k, padding=(k - 1) // 2 * d, dilation=d)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
            tconv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
            ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        ours = np.asarray(conv1d(p, x, dilation=d)).transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)
    for k, s in [(16, 8), (4, 2)]:
        p = conv_transpose1d_init(jax.random.PRNGKey(1), 8, 6, k)
        w = np.asarray(p["w"])  # [k, in, out]
        tconv = torch.nn.ConvTranspose1d(8, 6, k, stride=s, padding=(k - s) // 2)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(1, 2, 0)))
            tconv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
            ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        ours = np.asarray(
            conv_transpose1d(p, x, stride=s, padding=(k - s) // 2)
        ).transpose(0, 2, 1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 32)).astype(np.float32)
    p = layer_norm_init(32)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), eps=1e-12
    ).numpy()
    np.testing.assert_allclose(np.asarray(layer_norm(p, x)), ref, atol=1e-5)


def test_multi_head_attention_shapes_and_mask():
    p = multi_head_attention_init(jax.random.PRNGKey(0), 4, 32)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 7, 32)).astype(np.float32)
    kv = rng.standard_normal((2, 9, 32)).astype(np.float32)
    mask = np.ones((2, 9), bool)
    mask[1, 5:] = False
    out = multi_head_attention(p, q, kv, kv, 4, mask=jnp.asarray(mask))
    assert out.shape == (2, 7, 32)
    # masked keys don't affect output
    kv2 = kv.copy()
    kv2[1, 5:] += 100.0
    out2 = multi_head_attention(p, q, kv2, kv2, 4, mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-4)


def test_positional_encoding_matches_formula():
    pe = np.asarray(positional_encoding(50, 16))
    assert pe.shape == (50, 16)
    assert abs(pe[0, 0]) < 1e-7 and abs(pe[0, 1] - 1.0) < 1e-7
    x = np.zeros((1, 50, 16), np.float32)
    y = np.asarray(add_positional_encoding(jnp.asarray(x), xscale=4.0))
    np.testing.assert_allclose(y[0], pe, atol=1e-6)


def test_transformer_block_runs():
    p = transformer_block_init(jax.random.PRNGKey(0), 2, 32, 4, 64)
    x = np.random.default_rng(4).standard_normal((2, 11, 32)).astype(np.float32)
    y = transformer_block(p, jnp.asarray(x), 4)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_length_regulator_matches_repeat_interleave():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 3)).astype(np.float32)
    d = np.array([[2, 0, 3, 1], [1, 1, 1, 1]], np.int32)
    out = np.asarray(length_regulator(jnp.asarray(x), jnp.asarray(d), max_len=8))
    for b in range(2):
        expected = np.repeat(x[b], d[b], axis=0)
        np.testing.assert_allclose(out[b, : len(expected)], expected, atol=1e-6)
        assert (out[b, len(expected) :] == 0).all()


def test_postnet_shapes():
    p = postnet_init(jax.random.PRNGKey(0), odim=80, n_chans=64)
    x = np.random.default_rng(6).standard_normal((2, 30, 80)).astype(np.float32)
    y = postnet(p, jnp.asarray(x))
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
