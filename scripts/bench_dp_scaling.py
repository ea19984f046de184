"""Data-parallel scaling efficiency for batched synthesis.

BASELINE.json asks for >=90% DP scaling efficiency on a multi-chip
slice. This harness weak-scales the serving batch over the 'data' axis
(per-chip micro-batch held constant) and reports

    efficiency(N) = throughput(N) / (N * throughput(1))

Run on a real slice:  python scripts/bench_dp_scaling.py
Smoke-run anywhere:   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                      python scripts/bench_dp_scaling.py --per_chip_batch 2 --t2 64 --tiny

(this round's machine exposes ONE physical v5e chip through a relay, so
the real-slice numbers await a multi-chip round; the harness and its
sharding path are validated on the virtual mesh and by
tests/test_sharded_synthesis.py.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_chip_batch", type=int, default=16)
    ap.add_argument("--t1", type=int, default=96)
    ap.add_argument("--t2", type=int, default=512)
    ap.add_argument("--tiny", action="store_true", help="tiny model configs (CPU smoke)")
    ap.add_argument("--max_data", type=int, default=32,
                    help="largest 'data' extent to sweep")
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax

    # the boot shim (sitecustomize) re-registers the TPU plugin and forces
    # jax_platforms AFTER env vars are read — pin the requested platform
    # back (same dance as tests/conftest.py) so the virtual mesh exists
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.parallel.mesh import make_mesh
    from efficient_tts_tpu.pipeline import synthesize_fixed_sharded

    n_avail = len(jax.devices())
    if args.tiny:
        efts_cfg = EftsCNNConfig(
            num_symbols=76, symbol_embedding_dim=32, n_channels=32,
            n_text_encoder_layer=1, n_mel_encoder_layer=1, n_decoder_layer=1,
            dropout_rate=0.0, use_masking=True,
        )
        voc_cfg = HiFiGANConfig(
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        )
    else:
        efts_cfg = EftsCNNConfig(num_symbols=76, dropout_rate=0.0, use_masking=True)
        voc_cfg = HiFiGANConfig()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None

    efts_params = efts.init(jax.random.PRNGKey(0), efts_cfg)
    voc_params = hg.init_generator(jax.random.PRNGKey(1), voc_cfg)
    rng = np.random.default_rng(0)
    frame_s = voc_cfg.hop_size / voc_cfg.sampling_rate

    extents = [
        n for n in (1, 2, 4, 8, 16, 32) if n <= min(n_avail, args.max_data)
    ]
    base = None
    rows = []
    for n in extents:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        b = args.per_chip_batch * n
        text = rng.integers(1, 75, size=(b, args.t1)).astype(np.int32)
        tl = np.full((b,), args.t1, np.int32)

        def run():
            return synthesize_fixed_sharded(
                efts_params, voc_params, text, tl, efts_cfg, voc_cfg,
                args.t2, mesh, mode="dp", compute_dtype=dtype,
            )

        run()  # compile
        t = time_fn(run, lambda out: out[0].astype(jnp.float32).sum())
        thr = b * args.t2 * frame_s / t  # audio-s synthesized per second
        if base is None:
            base = thr
        eff = thr / (n * base)
        rows.append({
            "data": n,
            "batch": b,
            "ms_per_batch": round(t * 1e3, 2),
            "audio_s_per_s": round(thr, 2),
            "efficiency": round(eff, 4),
        })
        print(
            f"data={n:2d}: {t*1e3:8.1f} ms/batch  {thr:9.1f} audio-s/s "
            f"({thr/n:8.1f}/chip)  efficiency {eff*100:5.1f}%"
        )
    if args.json_out:
        import json

        payload = {
            "backend": jax.default_backend(),
            "n_devices": n_avail,
            "virtual_mesh": jax.default_backend() != "tpu",
            "per_chip_batch": args.per_chip_batch,
            "t1": args.t1,
            "t2": args.t2,
            "tiny": args.tiny,
            "rows": rows,
        }
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
