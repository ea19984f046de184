"""On-chip timing: fused packed-MRF Pallas kernel vs the XLA packed path.

Stage-3 serving shape (ch=32, r=4, B=16, T2=512 -> M=65536 packed
blocks). Expectation from PERF.md roofline: bf16 fused ≈ XLA packed
(both compute-bound); int8 fused ~1.9x faster (337 vs 177 TF/s measured
MXU rates).

Run on TPU: python scripts/bench_mrf_fused.py [--t_tile 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.ops.pallas.mrf_packed import (
    calibrate_act_scales,
    mrf_stage_packed,
    pack_stage_weights,
    quantize_weights,
    stage_plan,
)
from efficient_tts_tpu.utils.profiling import time_step

KS = (3, 7, 11)
DILS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t_tile", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--ch", type=int, default=32)
    args = ap.parse_args()

    c = args.ch
    r = 128 // c
    key = jax.random.PRNGKey(0)
    keys = iter(jax.random.split(key, 64))
    blocks = []
    for k in KS:
        blocks.append(
            {
                "convs1": [
                    {"w": 0.15 * jax.random.normal(next(keys), (k, c, c)),
                     "b": 0.1 * jax.random.normal(next(keys), (c,))}
                    for _ in range(3)
                ],
                "convs2": [
                    {"w": 0.15 * jax.random.normal(next(keys), (k, c, c)),
                     "b": 0.1 * jax.random.normal(next(keys), (c,))}
                    for _ in range(3)
                ],
            }
        )
    wp, biases = pack_stage_weights(blocks, KS, DILS, r, c)
    plan, halo = stage_plan(KS, DILS, r)
    wq, scales = quantize_weights(wp, plan)
    x = jnp.asarray(
        0.5 * np.random.default_rng(0).standard_normal((args.batch, args.m, 128)),
        jnp.bfloat16,
    )
    print(f"shape {x.shape} r={r} halo={halo} t_tile={args.t_tile}")

    def xla_path(xx):
        acc = None
        for block, k, dils in zip(blocks, KS, DILS):
            y = hg._resblock1_packed(block, xx, k, dils, r, c)
            acc = y if acc is None else acc + y
        return acc / len(KS)

    fns = {
        "xla-packed bf16": jax.jit(xla_path),
        "pallas bf16": jax.jit(
            lambda xx: mrf_stage_packed(
                xx, wp.astype(jnp.bfloat16), scales, biases, KS, DILS, r,
                t_tile=args.t_tile, int8=False,
            )
        ),
        "pallas int8": jax.jit(
            lambda xx: mrf_stage_packed(
                xx, wq, scales, biases, KS, DILS, r,
                t_tile=args.t_tile, int8=True,
            )
        ),
    }
    # static-activation-scale W8A8 (verdict r1 item 10): calibrated
    # per-conv scales, no absmax reduction on the hot path
    act = calibrate_act_scales(x, KS, DILS, r, blocks, c)
    fns["pallas int8-static"] = jax.jit(
        lambda xx: mrf_stage_packed(
            xx, wq, scales, biases, KS, DILS, r,
            t_tile=args.t_tile, int8=True, act_scales=act,
        )
    )
    outs = {}
    for name, fn in fns.items():
        try:
            outs[name] = np.asarray(fn(x)[0, :4, :2], np.float32)
            dt = time_step(fn, x, iters=20)
            print(f"{name:18s} {dt*1e3:8.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:400]}")
    if "pallas bf16" in outs:
        print("bf16 sample parity vs xla:",
              np.abs(outs["pallas bf16"] - outs["xla-packed bf16"]).max())
    if "pallas int8" in outs:
        print("int8 sample dev vs xla:",
              np.abs(outs["pallas int8"] - outs["xla-packed bf16"]).max())


if __name__ == "__main__":
    main()
