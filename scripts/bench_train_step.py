"""Acoustic-model train-step timing: f32 vs bf16 compute, XLA vs flash
attention (transformer), device-resident batch.

Run on TPU:
  python scripts/bench_train_step.py --model cnn
  python scripts/bench_train_step.py --model transformer [--breakdown]

`--breakdown` additionally times the transformer's forward-only
sub-graphs (mel-encoder self-attention vs FF towers at T2) to attribute
the step time (round-1 verdict item 5).
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


def time_fn(run, tail, k_small=2, k_large=10, reps=3):
    def chain(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = run()
        float(tail(out))
        return time.perf_counter() - t0

    estimates = []
    for _ in range(reps):
        estimates.append(
            max((chain(k_large) - chain(k_small)) / (k_large - k_small), 1e-9)
        )
    return sorted(estimates)[len(estimates) // 2]


def bench_step(mod, cfg, batch, B):
    from efficient_tts_tpu.train.efts_train_step import make_train_step

    tx = optax.adam(1e-3)
    key = jax.random.PRNGKey(0)
    params = mod.init(jax.random.PRNGKey(0), cfg)
    state = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=0)
    state, m = step(state, batch, key)
    holder = {"s": state}

    def run():
        s, m = step(holder["s"], batch, key)
        holder["s"] = s
        return m

    return time_fn(run, lambda m: m["loss"])


def transformer_breakdown(cfg, B, T2):
    """Forward-only timing of one mel-side encoder layer's attention vs
    FF tower at the training shape."""
    from efficient_tts_tpu.nn.attention import multi_head_attention
    from efficient_tts_tpu.nn.transformer import (
        encoder_layer_init,
        multi_layered_conv1d,
    )

    c = cfg.n_channels
    layer = encoder_layer_init(
        jax.random.PRNGKey(0), c, cfg.n_heads, cfg.ff_hidden,
        cfg.use_conv_ff, cfg.kernel_size,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, T2, c),
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )
    mask = jnp.ones((B, 1, T2), bool)

    for name, fn in (
        ("attn_xla", lambda x: multi_head_attention(
            layer["self_attn"], x, x, x, cfg.n_heads, mask=mask, impl="xla")),
        ("attn_flash", lambda x: multi_head_attention(
            layer["self_attn"], x, x, x, cfg.n_heads, mask=mask, impl="flash")),
        ("ff_conv", lambda x: multi_layered_conv1d(layer["ff"], x)),
    ):
        jf = jax.jit(fn)
        jf(x)  # compile
        t = time_fn(lambda: jf(x), lambda y: y[0, 0, 0])
        print(f"    {name:10s}: {t*1e3:6.2f} ms fwd "
              f"(layer at B={B}, T={T2}, C={c})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("cnn", "transformer"), default="cnn")
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--t1", type=int, default=128)
    ap.add_argument("--t2", type=int, default=896)
    args = ap.parse_args()

    B, T1, T2 = args.b, args.t1, args.t2
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(1, 75, (B, T1)), jnp.int32),
        "text_lengths": jnp.full((B,), T1, jnp.int32),
        "mel": jnp.asarray(rng.randn(B, T2, 80), jnp.float32),
        "mel_lengths": jnp.full((B,), T2, jnp.int32),
    }

    if args.model == "cnn":
        from efficient_tts_tpu.models import efficient_tts as mod
        from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig

        for dtype in (None, "bfloat16"):
            cfg = EftsCNNConfig(
                num_symbols=76, dropout_rate=0.0, use_masking=True,
                compute_dtype=dtype,
            )
            t = bench_step(mod, cfg, batch, B)
            print(f"cnn compute_dtype={dtype or 'float32':9s}: "
                  f"{t*1e3:6.2f} ms/step ({B/t:7.0f} utts/s/chip)")
        return

    from efficient_tts_tpu.models import efficient_tts_transformer as mod
    from efficient_tts_tpu.models.efficient_tts_transformer import (
        EftsTransformerConfig,
    )

    for dtype in (None, "bfloat16"):
        for attn in ("xla", "flash"):
            cfg = EftsTransformerConfig(
                num_symbols=76, dropout_rate=0.0, use_masking=True,
                compute_dtype=dtype, attn_impl=attn,
            )
            t = bench_step(mod, cfg, batch, B)
            print(f"transformer compute_dtype={dtype or 'float32':9s} "
                  f"attn={attn:5s}: {t*1e3:6.2f} ms/step "
                  f"({B/t:7.0f} utts/s/chip)", flush=True)
        if args.breakdown:
            cfg = EftsTransformerConfig(
                num_symbols=76, dropout_rate=0.0, use_masking=True,
                compute_dtype=dtype,
            )
            transformer_breakdown(cfg, B, T2)


if __name__ == "__main__":
    main()
