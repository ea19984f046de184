"""Where do the EFTS-Transformer's 67 ms/step go?

bf16 compute barely moves the whole train step although the isolated
attention layer is 6x faster in bf16 — so the step is NOT matmul-bound.
This script times the pieces at the training shape (B=32, T1=128,
T2=896) to attribute the cost: full step, forward-only, the transformer
towers alone, the IMV alignment chain alone, and the optimizer update.

Run on TPU: python scripts/transformer_step_breakdown.py [--compute_dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficient_tts_tpu.models import efficient_tts_transformer as mod
from efficient_tts_tpu.models.efficient_tts_transformer import (
    EftsTransformerConfig,
    _encode_text,
)
from efficient_tts_tpu.nn.transformer import transformer_block
from efficient_tts_tpu.ops.alignment import (
    aligned_positions,
    alignment_from_positions,
    imv_from_alpha,
    index_vector,
    scaled_dot_attention,
)
from efficient_tts_tpu.utils.masks import sequence_mask
from efficient_tts_tpu.utils.profiling import time_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--t1", type=int, default=128)
    ap.add_argument("--t2", type=int, default=896)
    args = ap.parse_args()
    B, T1, T2 = args.b, args.t1, args.t2
    cdt = None if args.compute_dtype == "float32" else args.compute_dtype

    cfg = EftsTransformerConfig(
        num_symbols=76, dropout_rate=0.0, use_masking=True, compute_dtype=cdt,
    )
    params = mod.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = dict(
        text=jnp.asarray(rng.randint(1, 75, (B, T1)), jnp.int32),
        text_lengths=jnp.full((B,), T1, jnp.int32),
        mel=jnp.asarray(rng.randn(B, T2, 80), jnp.float32),
        mel_lengths=jnp.full((B,), T2, jnp.int32),
    )
    key = jax.random.PRNGKey(1)

    rows = []

    def bench(name, fn, *a):
        jfn = jax.jit(fn)
        out = jfn(*a)
        t = time_step(jfn, *a, iters=10)
        rows.append((name, t * 1e3))
        print(f"{name:34s} {t*1e3:7.2f} ms", flush=True)
        return out

    # 1. forward-only loss
    def fwd(p):
        return mod.forward(
            p, cfg, batch["text"], batch["text_lengths"], batch["mel"],
            batch["mel_lengths"], rng=key, deterministic=True,
        )["loss"]

    bench("forward (loss)", fwd, params)

    # 2. forward + backward (no optimizer)
    def fwd_bwd(p):
        return jax.grad(fwd)(p)

    bench("forward+backward", fwd_bwd, params)

    # 3. full train step (fwd+bwd+clip+adam)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def step(p, o):
        g = jax.grad(fwd)(p)
        updates, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o2

    bench("train step (fwd+bwd+adam)", step, params, opt_state)

    # 4. the transformer towers alone, fwd and fwd+bwd
    dt = jnp.bfloat16 if cdt else jnp.float32
    x_mel = jnp.asarray(rng.randn(B, T2, cfg.n_channels), dt)
    mel_mask = sequence_mask(batch["mel_lengths"], T2)

    def towers(p, x):
        h = transformer_block(
            p["mel_encoder"], x, cfg.n_heads, mask=mel_mask[:, None, :],
            use_conv_ff=cfg.use_conv_ff,
        )
        h = transformer_block(
            p["decoder"], h, cfg.n_heads, mask=mel_mask[:, None, :],
            use_conv_ff=cfg.use_conv_ff,
        )
        return h.astype(jnp.float32).sum()

    bench("mel towers (2+4 layers) fwd", towers, params, x_mel)
    bench("mel towers fwd+bwd", lambda p, x: jax.grad(towers, 1)(p, x),
          params, x_mel)

    # 5. text encoder fwd+bwd
    text_mask = sequence_mask(batch["text_lengths"], T1)

    def text_enc(p):
        k, v = _encode_text(p, cfg, batch["text"], text_mask, None, True)
        return (k.astype(jnp.float32).sum() + v.astype(jnp.float32).sum())

    bench("text encoder fwd+bwd", lambda p: jax.grad(text_enc)(p), params)

    # 6. alignment chain alone (f32), fwd and fwd+bwd
    q = jnp.asarray(rng.randn(B, T2, cfg.n_channels), jnp.float32)
    k = jnp.asarray(rng.randn(B, T1, cfg.n_channels), jnp.float32)

    def align(q, k):
        alpha = scaled_dot_attention(q, k, text_mask)
        p_idx = index_vector(text_mask)
        imv = imv_from_alpha(alpha, p_idx, mel_mask, batch["text_lengths"])
        e = aligned_positions(imv, p_idx, mel_mask, text_mask, sigma_e=cfg.sigma_e)
        ra = alignment_from_positions(
            e, T2, sigma=cfg.sigma, mel_mask=mel_mask, text_mask=text_mask
        )
        return ra.sum()

    bench("alignment chain fwd", align, q, k)
    bench("alignment chain fwd+bwd",
          lambda q, k: jax.grad(align, (0, 1))(q, k)[0].sum(), q, k)

    print("\nsummary:")
    for name, ms in rows:
        print(f"  {name:34s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
