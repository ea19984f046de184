"""Per-chip autotune of the HiFi-GAN serving strategy tables.

The baked `_MRF_STRATEGY` / `_UPS_IMPL` constants in `models/hifigan.py`
were measured on one v5e at LJ serving shapes; on any other chip they
may be stale (round-1 verdict item 7). This script re-measures the
candidates on the CURRENT chip with greedy coordinate descent per stage
and writes the winning table to
`efficient_tts_tpu/configs/serving_tables/<device_kind>.json`, which
`generator(...)`'s 'auto' paths load automatically (env override:
$EFTS_TPU_SERVING_TABLES).

The candidate objective is the FULL serving pipeline
(`pipeline.synthesize_body`: EFTS text->mel + generator, the same graph
bench.py times), not the generator in isolation: XLA fuses across the
mel->generator boundary, so a strategy that wins alone can lose in
context (measured on the v5e round 3 — the isolated metric proposed
ups->subpixel, which a whole-bench A/B rejected; "only in-context
timing decides", PERF.md). A final baseline-vs-winner confirmation at
higher iteration count gates the write: the table is only replaced when
the tuned assignment beats the active one beyond noise (--min_gain).

Run on the target chip:
  python scripts/autotune_serving.py [--b 16 --t2 512] [--rounds 2]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t2", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--include_phase", action="store_true",
                    help="also try the 'phase' MRF strategy (documented "
                    "XLA-level loser on v5e; cheap to re-check elsewhere)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default: the per-chip path "
                    "generator() loads)")
    ap.add_argument("--min_gain", type=float, default=0.01,
                    help="fractional speedup the tuned table must show "
                    "over the active one in the final confirmation "
                    "before it is written (noise gate)")
    ap.add_argument("--confirm_iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficient_tts_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig, device_kind_slug
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.utils.profiling import time_step

    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.pipeline import synthesize_body

    cfg = HiFiGANConfig()
    params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(0), cfg))
    # full-pipeline candidate context: same workload shape as bench.py
    efts_cfg = EftsCNNConfig(num_symbols=76, dropout_rate=0.0, use_masking=True)
    efts_params = fold_weight_norm(efts.init(jax.random.PRNGKey(2), efts_cfg))
    rng = np.random.default_rng(0)
    t1 = 96
    text = rng.integers(1, 76, size=(args.b, t1)).astype(np.int32)
    text_lengths = np.full((args.b,), t1, np.int32)

    # enumerate stages: channel counts after each upsample
    ch = cfg.upsample_initial_channel
    stages = []  # [(stage_idx, u, k_ups, cin_ups, ch_out)]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        stages.append((i, u, k, ch, ch // 2))
        ch //= 2

    # current assignment: per-stage MRF strategy + per-stage ups impl,
    # seeded from whatever the active tables resolve today
    mrf_assign = {}
    ups_assign = {}
    for i, u, k, cin, cout in stages:
        packed = cout < 128 and 128 % cout == 0
        if packed:
            mrf_assign[cout] = hg._strategy(cout, cfg.resblock_kernel_sizes[0], 1)
        ups_assign[(u, k, cin)] = hg.resolve_ups_impl("auto", u, k, cin)

    def mrf_fn(assign):
        return lambda c, k, d: assign.get(c, "packed")

    def ups_fn(assign):
        return lambda u, k, cin: assign[(u, k, cin)]

    def build_run(mrf_a, ups_a):
        m = dict(mrf_a)
        u = dict(ups_a)

        @jax.jit
        def run(ep, vp, tx, tl):
            # whole serving pipeline (text -> waveform): candidates are
            # timed in the exact fusion context production uses
            wav, _, _ = synthesize_body(
                ep, vp, tx, tl, efts_cfg, cfg, args.t2,
                compute_dtype=jnp.bfloat16, mrf_impl="xla",
                mrf_strategy=mrf_fn(m), ups_impl=ups_fn(u),
            )
            return wav

        return run

    def measure(mrf_a, ups_a, iters=None) -> float:
        run = build_run(mrf_a, ups_a)
        return time_step(
            run, efts_params, params, text, text_lengths,
            iters=iters or args.iters,
        ) * 1e3

    t_start = time.time()
    base_mrf, base_ups = dict(mrf_assign), dict(ups_assign)
    best_ms = measure(mrf_assign, ups_assign)
    print(f"baseline (active tables): {best_ms:.2f} ms pipeline", flush=True)

    mrf_cands = ["plain", "packed"] + (["phase"] if args.include_phase else [])
    for rnd in range(args.rounds):
        improved = False
        for i, u, k, cin, cout in stages:
            # ups candidates (subpixel_packed legality: u*cout == cin, k <= 2u)
            cands = ["dilated", "subpixel"]
            if u * cout == cin and k <= 2 * u:
                cands.append("subpixel_packed")
            for cand in cands:
                if cand == ups_assign[(u, k, cin)]:
                    continue
                trial = dict(ups_assign)
                trial[(u, k, cin)] = cand
                ms = measure(mrf_assign, trial)
                print(f"  ups[{i}] (u={u},k={k},cin={cin}) {cand}: "
                      f"{ms:.2f} ms", flush=True)
                if ms < best_ms:
                    best_ms, ups_assign, improved = ms, trial, True
            if cout in mrf_assign:
                for cand in mrf_cands:
                    if cand == mrf_assign[cout]:
                        continue
                    trial = dict(mrf_assign)
                    trial[cout] = cand
                    ms = measure(trial, ups_assign)
                    print(f"  mrf[ch={cout}] {cand}: {ms:.2f} ms", flush=True)
                    if ms < best_ms:
                        best_ms, mrf_assign, improved = ms, trial, True
        print(f"round {rnd}: best {best_ms:.2f} ms "
              f"mrf={mrf_assign} ups={ups_assign}", flush=True)
        if not improved:
            break

    # final confirmation at higher iteration count: the tuned table must
    # beat the active one beyond the noise gate, through the same
    # whole-pipeline objective. This IS the A/B — the tuner cannot
    # propose something the A/B would reject, by construction.
    changed = mrf_assign != base_mrf or ups_assign != base_ups
    if changed:
        base_conf = measure(base_mrf, base_ups, iters=args.confirm_iters)
        tuned_conf = measure(mrf_assign, ups_assign, iters=args.confirm_iters)
        gain = (base_conf - tuned_conf) / base_conf
        print(f"confirmation: active {base_conf:.2f} ms vs tuned "
              f"{tuned_conf:.2f} ms (gain {gain * 100:.1f}%)", flush=True)
        if gain < args.min_gain:
            print(f"gain below --min_gain={args.min_gain:.0%}: keeping the "
                  "active tables", flush=True)
            mrf_assign, ups_assign = base_mrf, base_ups
            best_ms, changed = base_conf, False
        else:
            best_ms = tuned_conf
        provenance = ("tuned == accepted (whole-pipeline objective, "
                      f"confirmed at {args.confirm_iters} iters)"
                      if changed else
                      "tuned proposal below noise gate; active tables kept")
    else:
        provenance = ("coordinate descent found no better assignment than "
                      "the active tables (whole-pipeline objective)")

    kind = device_kind_slug() or "unknown"
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "efficient_tts_tpu", "configs", "serving_tables", f"{kind}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    table = {
        "device_kind": kind,
        "provenance": provenance,
        "measured": {
            "b": args.b, "t2": args.t2, "t1": t1,
            "pipeline_ms": round(best_ms, 3),
            "objective": "synthesize_body (EFTS + generator, bench.py shape)",
            "wall_s": round(time.time() - t_start, 1),
        },
        "mrf_strategy": {
            f"{c},{k},{d}": s
            for c, s in mrf_assign.items()
            for k, dils in zip(cfg.resblock_kernel_sizes,
                               cfg.resblock_dilation_sizes)
            for d in dils
        },
        "ups_impl": {
            f"{u},{k},{cin}": impl for (u, k, cin), impl in ups_assign.items()
        },
        "pallas_t_tile": {},  # xla is the production MRF impl; tiles used
        #                       only under mrf_impl='pallas' (bench scripts)
    }
    with open(out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {out} ({best_ms:.2f} ms pipeline at "
          f"B={args.b}, T2={args.t2}; {provenance})")
    hg.reset_serving_tables()


if __name__ == "__main__":
    main()
