"""Flash-attention correctness check on TPU: forward + gradients vs XLA.

The Pallas TPU flash kernel is Mosaic-only (no CPU interpret in our test
suite), so its equivalence to the XLA attention path is asserted here on
real hardware: masked self-attention at the transformer's training shape
(dk=96 heads), forward allclose + input/param gradient allclose, and the
full EFTS-Transformer train-step loss with attn_impl=flash vs xla.

Run on TPU: python scripts/check_flash_attention.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.attention import (
    multi_head_attention,
    multi_head_attention_init,
)


def main():
    B, T, C, H = 4, 256, 384, 4
    params = multi_head_attention_init(jax.random.PRNGKey(0), H, C)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C), jnp.float32)
    lengths = np.array([256, 200, 129, 64])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])[:, None, :]

    def fwd(impl):
        return multi_head_attention(params, x, x, x, H, mask=mask, impl=impl)

    y_xla = jax.jit(lambda: fwd("xla"))()
    y_fl = jax.jit(lambda: fwd("flash"))()
    # compare only valid rows (flash computes garbage on pad queries by
    # design; the models mask them downstream)
    err = 0.0
    for b in range(B):
        n = int(lengths[b])
        err = max(err, float(jnp.abs(y_xla[b, :n] - y_fl[b, :n]).max()))
    print(f"forward max|diff| on valid rows: {err:.2e}")
    # the fused kernel feeds the MXU at bf16 (f32 accumulation), same as
    # our bf16 compute towers — bf16-rounding-level agreement expected
    assert err < 5e-3, err

    def loss(p, x, impl):
        y = multi_head_attention(p, x, x, x, H, mask=mask, impl=impl)
        m = mask[:, 0, :, None].astype(y.dtype)
        return jnp.sum((y * m) ** 2)

    g_xla = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        params, x, "xla"
    )
    g_fl = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        params, x, "flash"
    )
    for (ga, gb, name) in [
        (g_xla[1], g_fl[1], "dx"),
        (g_xla[0]["q"]["w"], g_fl[0]["q"]["w"], "dWq"),
        (g_xla[0]["v"]["w"], g_fl[0]["v"]["w"], "dWv"),
    ]:
        rel = float(jnp.abs(ga - gb).max() / (jnp.abs(ga).max() + 1e-9))
        print(f"grad {name}: max rel diff {rel:.2e}")
        assert rel < 1e-2, (name, rel)  # bf16 MXU rounding through the VJP

    # full train-step loss equivalence
    from efficient_tts_tpu.models import efficient_tts_transformer as mod
    from efficient_tts_tpu.models.efficient_tts_transformer import (
        EftsTransformerConfig,
    )

    rng = np.random.RandomState(1)
    batch = dict(
        text=jnp.asarray(rng.randint(1, 75, (4, 128)), jnp.int32),
        text_lengths=jnp.asarray([128, 100, 80, 64], jnp.int32),
        mel=jnp.asarray(rng.randn(4, 256, 80), jnp.float32),
        mel_lengths=jnp.asarray([256, 250, 199, 128], jnp.int32),
    )
    losses = {}
    for attn in ("xla", "flash"):
        cfg = EftsTransformerConfig(
            num_symbols=76, dropout_rate=0.0, use_masking=True, attn_impl=attn,
        )
        params_m = mod.init(jax.random.PRNGKey(0), cfg)
        out = jax.jit(
            lambda p, b, c=cfg: mod.forward(
                p, c, b["text"], b["text_lengths"], b["mel"], b["mel_lengths"],
                deterministic=True,
            )["loss"]
        )(params_m, batch)
        losses[attn] = float(out)
    print(f"train loss xla={losses['xla']:.6f} flash={losses['flash']:.6f}")
    assert abs(losses["xla"] - losses["flash"]) < 1e-3 * abs(losses["xla"])
    print("FLASH ATTENTION: PASS")


if __name__ == "__main__":
    main()
