"""Measure per-conv MRF strategies (plain/packed/phase) on the real chip.

For every small-channel HiFi-GAN stage (ch < 128) and every (kernel,
dilation) the MRF uses, times a single conv in packed-resident layout at
the LJ serving shape and prints the winner. The resulting table is baked
into `models/hifigan._MRF_STRATEGY`.

Run on TPU:  python scripts/bench_mrf_variants.py [--batch 8] [--t2 512]
"""

from __future__ import annotations

import argparse
import os
import sys

# NOTE: do not use PYTHONPATH for this — any PYTHONPATH value breaks the
# axon TPU-relay registration in this image's sitecustomize.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from efficient_tts_tpu.models.hifigan import (
    HiFiGANConfig,
    _CONV_IMPLS,
)
from efficient_tts_tpu.utils.profiling import time_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t2", type=int, default=512, help="mel frames")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    cfg = HiFiGANConfig()
    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)

    table = {}
    t = args.t2
    for i, u in enumerate(cfg.upsample_rates):
        t *= u
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        if ch >= 128 or 128 % ch:
            continue
        r = 128 // ch
        x = jax.random.normal(key, (args.batch, t // r, r * ch), dtype)
        print(f"--- stage {i}: ch={ch} r={r} T={t} x={x.shape} {dtype} ---")
        for k, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            w = 0.1 * jax.random.normal(key, (k, ch, ch), dtype)
            b = jnp.zeros((ch,), dtype)
            kern = {"w": w, "b": b}
            for d in sorted(set(dils)):
                times = {}
                for name, impl in _CONV_IMPLS.items():
                    if name == "phase" and d == 1:
                        continue
                    fn = jax.jit(
                        lambda xx, kern=kern, impl=impl, k=k, d=d: impl(
                            kern, xx, k, d, r, ch
                        )
                    )
                    times[name] = time_step(fn, x, iters=args.iters) * 1e3
                best = min(times, key=times.get)
                table[(ch, k, d)] = best
                msg = "  ".join(f"{n}={v:7.3f}ms" for n, v in sorted(times.items()))
                print(f"k={k:2d} d={d}:  {msg}  -> {best}")

    print("\n_MRF_STRATEGY = {")
    for (ch, k, d), best in sorted(table.items()):
        print(f"    ({ch}, {k}, {d}): {best!r},")
    print("}")


if __name__ == "__main__":
    main()
