"""Serving-under-load benchmark: latency percentiles at fixed QPS.

Drives the production serving stack (TTSEngine + DynamicBatcher, the
same objects `efts-serve` wraps) with an open-loop Poisson arrival
process at several offered loads and records per-request latency
p50/p95/p99 plus achieved audio-s/s. Random weights (perf-only), with
the duration predictor's output head pinned so every symbol maps to
~5.5 mel frames — production-shaped work through the REAL dynamic
bucketing path (unlike bench.py, which fixes the mel bucket).

Run on TPU: python scripts/bench_serving_load.py [--qps 4,16,32,64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from efficient_tts_tpu.utils.jax_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

SENTENCES = [
    # ~40 / ~90 / ~140 symbols after cleaning: spans 3 text buckets
    "The quick brown fox jumps over the dog.",
    "Under these circumstances, with proper management, the bean will "
    "thrust forth its radicle quickly.",
    "It is not possible to state with scientific certainty that a "
    "particular small group of fibers come from a certain piece of "
    "clothing, he said slowly.",
]


def build_engine(compute_dtype, legacy=False, detailed=False, max_batch=16):
    import jax

    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.serve import TTSEngine

    efts_cfg = EftsCNNConfig(num_symbols=148, dropout_rate=0.0, use_masking=True)
    voc_cfg = HiFiGANConfig()
    efts_params = fold_weight_norm(efts.init(jax.random.PRNGKey(0), efts_cfg))
    voc_params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), voc_cfg))
    # pin durations to ~5.5 frames/symbol: log(5.5 + offset 1.0) = 1.872
    out = efts_params["duration_predictor"]["out"]
    out["w"] = np.zeros_like(out["w"])
    out["b"] = np.full_like(out["b"], np.log(6.5))
    return TTSEngine(
        efts_params, voc_params, efts_cfg, voc_cfg,
        max_batch=max_batch, compute_dtype=compute_dtype, mrf_impl="auto",
        # legacy reproduces the round-3 serving path (f32 transfer, no
        # dispatch/fetch overlap) for before/after attribution
        pcm16_transfer=not legacy,
        pipeline_fetch=not legacy,
        detailed_timing=detailed,
    )


def run_load(engine, qps: float, duration_s: float, rng,
             max_queue=None, deadline_ms=None) -> dict:
    from efficient_tts_tpu.serve import AdmissionError, DynamicBatcher

    batcher = DynamicBatcher(engine, max_wait_ms=10.0,
                             max_queue=max_queue, deadline_ms=deadline_ms)
    engine.stats.__init__()  # reset counters
    lat: list = []
    lock = threading.Lock()
    pending = []
    offered = 0

    def on_done(fut, t_submit):
        try:
            fut.result()
        except AdmissionError:
            return  # shed: counted via batcher.shed_*
        with lock:
            lat.append(time.perf_counter() - t_submit)

    t_end = time.perf_counter() + duration_s
    i = 0
    try:
        while time.perf_counter() < t_end:
            text = SENTENCES[i % len(SENTENCES)]
            i += 1
            offered += 1
            t_submit = time.perf_counter()
            try:
                fut = batcher.submit(text)
            except AdmissionError:
                time.sleep(rng.exponential(1.0 / qps))
                continue
            fut.add_done_callback(
                lambda f, t=t_submit: on_done(f, t)
            )
            pending.append(fut)
            # Poisson arrivals
            time.sleep(rng.exponential(1.0 / qps))
        for f in pending:
            try:
                f.result(timeout=120)
            except AdmissionError:
                pass
    finally:
        batcher.close()
    wall = duration_s
    lat_ms = np.sort(np.array(lat)) * 1e3
    s = engine.stats
    nb = max(s.batches, 1)
    return {
        "offered_qps": qps,
        "offered": offered,
        "completed": len(lat),
        "shed_queue_full": batcher.shed_full,
        "shed_deadline": batcher.shed_deadline,
        "shed_pct": round(
            100.0 * (batcher.shed_full + batcher.shed_deadline)
            / max(offered, 1), 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "mean_batch": round(float(np.mean(s.batch_sizes)), 2),
        "audio_s_per_s": round(s.audio_seconds / wall, 1),
        "device_util": round(s.compute_seconds / wall, 3),
        # per-batch phase attribution (ms): where a batch's wall goes
        "per_batch_ms": {
            "lock_wait": round(1e3 * s.lock_wait_seconds / nb, 1),
            "stage1_readback": round(1e3 * s.stage1_seconds / nb, 1),
            "dispatch": round(1e3 * s.dispatch_seconds / nb, 1),
            "device_compute": round(1e3 * s.device_seconds / nb, 1),
            "wav_fetch": round(1e3 * s.fetch_seconds / nb, 1),
            "total": round(1e3 * s.compute_seconds / nb, 1),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qps", default="4,16,32,64")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--legacy", action="store_true",
                    help="round-3 path: f32 transfer, no fetch overlap")
    ap.add_argument("--max_queue", type=int, default=256,
                    help="admission bound (0 = unbounded, round-4 behavior)")
    ap.add_argument("--deadline_ms", type=float, default=2000.0,
                    help="queue-wait SLO; aged requests are shed "
                    "(0 = none)")
    ap.add_argument("--attribution", action="store_true",
                    help="block after stage-2 dispatch to split device "
                         "compute from transfer wait (defeats pipelining; "
                         "use for the phase table, not throughput)")
    args = ap.parse_args()

    import jax.numpy as jnp

    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
    engine = build_engine(cdt, legacy=args.legacy, detailed=args.attribution,
                          max_batch=args.max_batch)
    # production warmup over the served grid: t1 buckets of the bench
    # sentences, every pow-2 batch bucket, organic t2 + neighbors
    # (TTSEngine.warmup — the same call efts-serve makes)
    t1s = sorted({len(engine.encode(s)) for s in SENTENCES})
    engine.warmup(t1_lengths=t1s)
    # mixed-length residual groups still hit one extra combo shape
    engine.synthesize(list(SENTENCES) * (2 * args.max_batch // len(SENTENCES) + 1))
    engine.stats.__init__()

    rng = np.random.default_rng(0)
    rows = []
    for qps in [float(q) for q in args.qps.split(",")]:
        row = run_load(engine, qps, args.seconds, rng,
                       max_queue=args.max_queue or None,
                       deadline_ms=args.deadline_ms or None)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
