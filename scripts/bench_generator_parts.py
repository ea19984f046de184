"""Per-component timing of the HiFi-GAN generator at serving shape.

Breaks the generator into conv_pre / per-stage upsample conv_transpose /
per-stage MRF / conv_post and times each as its own jitted graph to find
the next optimization lever. In-context numbers (whole generator) remain
the decision metric; this is for locating time, not for choosing tables.

Run on TPU:  python scripts/bench_generator_parts.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.nn.layers import conv1d, conv_transpose1d, fold_weight_norm, leaky_relu


def time_fn(run, tail, k_small=2, k_large=12, reps=3):
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


def main():
    B, T2 = 16, 512
    cfg = hg.HiFiGANConfig()
    dtype = jnp.bfloat16
    params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(0), cfg))
    mel = jnp.asarray(np.random.RandomState(0).randn(B, T2, cfg.num_mels), dtype)

    # conv_pre
    f_pre = jax.jit(lambda m: conv1d(params["conv_pre"], m, padding=3))
    x = f_pre(mel)
    t = time_fn(lambda: f_pre(mel), lambda o: o[0, 0, 0])
    print(f"conv_pre  in={mel.shape} out={x.shape}: {t*1e3:7.2f} ms")
    total = t

    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up_p = params["ups"][i]

        def f_up(xx, up_p=up_p, u=u, k=k):
            return conv_transpose1d(up_p, leaky_relu(xx, hg.LRELU_SLOPE),
                                    stride=u, padding=(k - u) // 2)

        f_up_j = jax.jit(f_up)
        y = f_up_j(x)
        t = time_fn(lambda: f_up_j(x), lambda o: o[0, 0, 0])
        print(f"ups[{i}] (k={k},s={u}) in={x.shape} out={y.shape}: {t*1e3:7.2f} ms")
        total += t
        x = y

        ch = x.shape[-1]

        def f_mrf(xx, i=i, ch=ch):
            r = 128 // ch if (ch < 128 and 128 % ch == 0) else 1
            if r > 1 and xx.shape[1] % r != 0:
                r = 1
            if r > 1:
                b_, t_, _ = xx.shape
                xx = xx.reshape(b_, t_ // r, r * ch)
            acc = None
            for j, (rk, dils) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                block = params["resblocks"][i * n_kernels + j]
                if r > 1:
                    yj = hg._resblock1_packed(block, xx, rk, dils, r, ch, None)
                else:
                    yj = hg._resblock1(block, xx, rk, dils)
                acc = yj if acc is None else acc + yj
            out = acc / n_kernels
            if r > 1:
                out = out.reshape(out.shape[0], out.shape[1] * r, ch)
            return out

        f_mrf_j = jax.jit(f_mrf)
        y = f_mrf_j(x)
        t = time_fn(lambda: f_mrf_j(x), lambda o: o[0, 0, 0])
        print(f"mrf[{i}] ch={ch} T={x.shape[1]}: {t*1e3:7.2f} ms")
        total += t
        x = y

    def f_post(xx):
        h = leaky_relu(xx, 0.01)
        h = conv1d(params["conv_post"], h, padding=3)
        return jnp.tanh(h.astype(jnp.float32))[..., 0]

    f_post_j = jax.jit(f_post)
    t = time_fn(lambda: f_post_j(x), lambda o: o[0, 0])
    print(f"conv_post in={x.shape}: {t*1e3:7.2f} ms")
    total += t
    print(f"sum of parts: {total*1e3:.1f} ms (whole-generator in-context ~54 ms)")


if __name__ == "__main__":
    main()
