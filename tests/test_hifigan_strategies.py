"""Per-conv MRF strategy equivalence: plain / packed / phase must be exact.

Packing is a contiguous reshape, so the three conv implementations can be
mixed freely inside a resblock; each must reproduce the unpacked
generator bit-near-exactly (f32 reassociation tolerance only).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig

# reaches ch=64 -> r=2, ch=32 -> r=4, ch=16 -> r=8 with the full V1
# kernel/dilation menu so every strategy sees every (k, d)
CFG = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=256,
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
)


@pytest.fixture(scope="module")
def setup():
    params = hg.init_generator(jax.random.PRNGKey(0), CFG)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 24, CFG.num_mels)),
        jnp.float32,
    )
    ref = np.asarray(hg.generator(params, mel, CFG, pack_small_channels=False))
    return params, mel, ref


@pytest.mark.parametrize("name", ["packed", "plain", "phase"])
def test_forced_strategy_matches_plain(setup, name):
    params, mel, ref = setup
    out = hg.generator(params, mel, CFG, mrf_strategy=lambda ch, k, d: name)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-5)


def test_mixed_strategy_matches_plain(setup):
    params, mel, ref = setup

    def strat(ch, k, d):  # deliberately heterogeneous
        if d == 5:
            return "phase"
        if k == 11:
            return "plain"
        return "packed"

    out = hg.generator(params, mel, CFG, mrf_strategy=strat)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-5)


def test_default_table_matches_plain(setup):
    params, mel, ref = setup
    out = hg.generator(params, mel, CFG)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-5)


def test_phase_handles_length_not_divisible_by_dilation(setup):
    """T2=22 -> stage lengths 176/1408/2816/5632: not divisible by 3 or 5,
    exercising the zero-pad + slice path inside the phase conv."""
    params, mel, _ = setup
    mel = mel[:, :22]
    ref = np.asarray(hg.generator(params, mel, CFG, pack_small_channels=False))
    out = hg.generator(params, mel, CFG, mrf_strategy=lambda ch, k, d: "phase")
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-5)


def test_generator_pallas_mrf_impl_matches_xla(setup):
    """mrf_impl='pallas' (fused whole-stage kernel, interpret mode on CPU)
    must match the XLA path at bf16-chain tolerance. The kernel computes
    convs in bf16 with f32 accumulation, so compare against the bf16 XLA
    generator."""
    params, mel, _ = setup
    ref16 = np.asarray(
        hg.generator(params, mel, CFG, compute_dtype=jnp.bfloat16),
        np.float32,
    )
    out = np.asarray(
        hg.generator(
            params, mel, CFG, compute_dtype=jnp.bfloat16,
            mrf_impl="pallas", pallas_interpret=True,
        ),
        np.float32,
    )
    assert out.shape == ref16.shape
    # tanh-compressed waveform in (-1, 1): absolute tolerance covers the
    # bf16 rounding divergence across 3 fused stages
    np.testing.assert_allclose(out, ref16, atol=4e-2)
    assert np.abs(out - ref16).mean() < 5e-3


@pytest.mark.parametrize(
    "impl", ["dilated", "subpixel", "subpixel_packed", "auto"]
)
def test_generator_ups_impl_matches_dilated(setup, impl):
    """Every upsample implementation (input-dilated conv / dense sub-pixel
    form / sub-pixel inside packed residency) must reproduce the plain
    generator; `subpixel_packed` falls back per-stage where its layout
    preconditions don't hold."""
    params, mel, ref = setup
    out = hg.generator(params, mel, CFG, ups_impl=impl)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-5)


def test_subpixel_transpose_matches_dilated_lowering():
    from efficient_tts_tpu.nn.layers import (
        conv_transpose1d,
        conv_transpose1d_init,
        conv_transpose1d_subpixel,
    )

    rng = np.random.default_rng(7)
    for k, s, p, cin, cout, t in [
        (16, 8, 4, 8, 4, 13),   # V1 ups0/1 geometry
        (4, 2, 1, 6, 3, 17),    # V1 ups2/3 geometry
        (6, 4, 1, 4, 4, 11),    # k - 2p == s, k_eff == 2
        (3, 1, 1, 3, 5, 9),     # stride 1 degenerate
    ]:
        params = conv_transpose1d_init(jax.random.PRNGKey(k + s), cin, cout, k)
        x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
        a = conv_transpose1d(params, x, stride=s, padding=p)
        b = conv_transpose1d_subpixel(params, x, stride=s, padding=p)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_conv_post_matches_plain():
    """The strided packed conv_post (128 output positions per matmul row)
    is engaged whenever the tail stays packed with T % 128 == 0; compare
    against the direct N=1 lowering."""
    from efficient_tts_tpu.nn.layers import conv1d, conv1d_init

    rng = np.random.default_rng(3)
    c, r_in, t = 32, 4, 1024
    kern = conv1d_init(jax.random.PRNGKey(0), c, 1, 7)
    x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
    ref = conv1d(kern, x, padding=3)[..., 0]
    xp = x.reshape(2, t // r_in, r_in * c)
    out = hg._packed_conv_post(kern, xp, r_in, c)
    np.testing.assert_allclose(
        np.asarray(out).reshape(2, t), np.asarray(ref), atol=1e-5
    )


def test_generator_gradients_match_across_impls(setup):
    """Training runs through ups_impl='auto' (sub-pixel packed ups) and
    the packed conv_post; gradients w.r.t. every generator parameter must
    match the plain/dilated lowering (same math, fp reassociation only)."""
    params, mel, _ = setup

    def loss(p, **kw):
        return jnp.mean(jnp.abs(hg.generator(p, mel, CFG, **kw)))

    g_ref = jax.grad(loss)(params, pack_small_channels=False, ups_impl="dilated")
    g_new = jax.grad(loss)(params, ups_impl="auto")
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_new, _ = jax.tree_util.tree_flatten(g_new)
    assert len(flat_ref) == len(flat_new)
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
        )


@pytest.mark.parametrize(
    "impl",
    ["bgc", "dense", "vjp:bgc,tap", "vjp:bgc,dense", "vjp:fgc,tap"],
)
def test_msd_grouped_impl_matches_fgc(impl):
    """The grouped-conv lowerings of the scale discriminators
    (`hg._grouped_conv1d`: feature_group_count / group-to-batch /
    block-diagonal dense / custom-VJP per-direction combinations) are the
    same op — outputs and parameter gradients must match f32-exactly
    (reassociation tolerance)."""
    msd = hg.init_msd(jax.random.PRNGKey(4))
    for _ in range(8):  # converge spectral-norm u/v so grad scales are sane
        msd = hg.msd_power_iteration(msd)
    rng = np.random.default_rng(5)
    y = jnp.asarray(np.tanh(rng.standard_normal((2, 2048))) * 0.5, jnp.float32)
    y_hat = jnp.asarray(np.tanh(rng.standard_normal((2, 2048))) * 0.5, jnp.float32)

    def score(params, gi):
        rs, gs, fr, fg = hg.msd_forward(params, y, y_hat, grouped_impl=gi)
        return sum(jnp.mean(o) for o in rs + gs) + sum(
            jnp.mean(f) for fm in fr + fg for f in fm
        )

    ref_out, ref_grad = jax.value_and_grad(score)(msd, "fgc")
    new_out, new_grad = jax.value_and_grad(score)(msd, impl)
    np.testing.assert_allclose(
        np.asarray(new_out), np.asarray(ref_out), atol=1e-5, rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_grad), jax.tree_util.tree_leaves(new_grad)
    ):
        a, b = np.asarray(a), np.asarray(b)
        # per-leaf scale-relative tolerance: same op, fp reassociation only
        tol = 2e-6 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, atol=tol, rtol=2e-4)


def test_msd_grouped_impl_per_layer_callable():
    """Per-layer impl selection (callable) mixes lowerings exactly."""
    msd = hg.init_msd(jax.random.PRNGKey(6))
    rng = np.random.default_rng(7)
    y = jnp.asarray(np.tanh(rng.standard_normal((2, 2048))) * 0.5, jnp.float32)

    def table(i, spec):
        return ["fgc", "bgc", "dense"][i % 3]

    ref, _ = hg.scale_discriminator(msd["discriminators"][1], y)
    out, _ = hg.scale_discriminator(msd["discriminators"][1], y, grouped_impl=table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
