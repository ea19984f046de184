"""Probe: does an int8 Pallas matmul reach ~2x bf16 MXU rate on this v5e?

Decides whether a W8A8 path for the small-channel HiFi-GAN stages is
worth building (PERF.md roofline section). Compares a tiled Pallas
matmul [M,128] x [128,128] in bf16 vs int8 (int32 accumulation), plus
the XLA dot for reference.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_tts_tpu.utils.profiling import time_step

M, K, N = 1 << 20, 128, 128
TILE = 2048
REPEAT = 8  # do 8 matmuls per tile to amortize memory traffic


def kernel(x_ref, w_ref, o_ref, acc_dtype, out_dtype):
    x = x_ref[...]
    acc = jnp.dot(x, w_ref[...], preferred_element_type=acc_dtype)
    for _ in range(REPEAT - 1):
        acc = jnp.dot(
            acc.astype(x.dtype), w_ref[...], preferred_element_type=acc_dtype
        )
    o_ref[...] = acc.astype(out_dtype)


def make(dtype, acc_dtype, out_dtype):
    return pl.pallas_call(
        functools.partial(kernel, acc_dtype=acc_dtype, out_dtype=out_dtype),
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )


def main():
    rng = np.random.default_rng(0)
    flops = 2 * M * K * N * REPEAT

    for name, dtype, acc, out in [
        ("bf16", jnp.bfloat16, jnp.float32, jnp.bfloat16),
        ("int8", jnp.int8, jnp.int32, jnp.int8),
    ]:
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-3, 3, (M, K)), jnp.int8)
            w = jnp.asarray(rng.integers(-3, 3, (K, N)), jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((M, K)), dtype)
            w = jnp.asarray(0.05 * rng.standard_normal((K, N)), dtype)
        try:
            fn = jax.jit(make(dtype, acc, out))
            fn(x, w).block_until_ready()
            dt = time_step(fn, x, w, iters=20)
            print(f"pallas {name}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"pallas {name}: FAILED: {type(e).__name__}: {str(e)[:300]}")

    # XLA reference dots
    for name, dtype, acc in [("bf16", jnp.bfloat16, jnp.float32),
                             ("int8", jnp.int8, jnp.int32)]:
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-3, 3, (M, K)), jnp.int8)
            w = jnp.asarray(rng.integers(-3, 3, (K, N)), jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((M, K)), dtype)
            w = jnp.asarray(0.05 * rng.standard_normal((K, N)), dtype)

        def xla_fn(x, w, acc=acc, dtype=dtype):
            y = x
            for _ in range(REPEAT):
                y = jnp.dot(y, w, preferred_element_type=acc).astype(dtype)
            return y

        fn = jax.jit(xla_fn)
        fn(x, w).block_until_ready()
        dt = time_step(fn, x, w, iters=20)
        print(f"xla    {name}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
