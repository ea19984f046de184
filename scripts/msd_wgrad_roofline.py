"""MSD kernel-gradient roofline study at its OWN shapes (verdict r3 #5).

The GAN step's bulk is the discriminator backward, dominated by the
MSD's grouped k=41 kernel-gradients (PERF.md round-3 attribution). All
XLA-expressible lowerings measured neutral-to-negative in-context; the
open question was whether a hand Pallas weight-gradient kernel could
win AT THESE shapes (ch 128-1024, g=4/16, stride 1/2/4 — not the ch=32
MRF regime the earlier Mosaic findings covered).

This harness settles it with numbers instead of extrapolation. Per MSD
conv (all 3 scales, B=16, segment 8192, bf16 inputs / f32 dw — the
production training dtype):

  * measures XLA's kernel-gradient (fgc autodiff transpose) and the
    per-tap batched-matmul formulation (`hifigan._tap_wgrad` — the
    arithmetic any hand kernel would run: k einsums with contraction
    B*L_out and output [g, C/g, Cout/g]);
  * computes the conv's *layout-bound* MXU time: the wgrad contraction
    has N = Cout/g in {16..64} < 128 lanes and M = (Cin/g)*k, so no
    kernel, Pallas or otherwise, can exceed
        peak * (min(N,128)/128) * (M / (ceil(M/128)*128))
    without changing the math (a dense reformulation fills N but does
    g x the FLOPs — measured loser, PERF.md round 3);
  * computes the HBM-traffic bound (read x + dy once, write dw).

If the measured time already sits near max(layout, HBM) bound, the
remaining headroom IS the max any Pallas kernel could recover; the
aggregate over the step (x2: the D tower backward runs for both D- and
G-updates) is printed as "pallas ceiling" next to the measured GAN step.

Run on TPU:  python scripts/msd_wgrad_roofline.py [--json_out ...]
Reference spec: hifigan_model.py:211-268 (MSD), :271-302 (losses).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np

PEAK_BF16_TFS = 197.0  # v5e MXU peak (bf16, f32 accum)
HBM_GBS = 819.0  # v5e HBM bandwidth


def conv_out_len(t, k, s, p):
    return (t + 2 * p - k) // s + 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficient_tts_tpu.models.hifigan import (
        _SCALE_SPECS,
        _grouped_conv1d,
        _tap_wgrad,
    )
    from efficient_tts_tpu.utils.profiling import time_step

    b = args.batch
    rows = []
    for scale, pool in enumerate((1, 2, 4)):
        t = args.segment // pool
        for li, (ic, oc, k, s, g, p) in enumerate(_SCALE_SPECS):
            lo = conv_out_len(t, k, s, p)
            key = jax.random.PRNGKey(li)
            x = jax.random.normal(key, (b, t, ic), jnp.bfloat16)
            dy = jax.random.normal(key, (b, lo, oc), jnp.bfloat16)
            w = jax.random.normal(key, (k, ic // g, oc), jnp.bfloat16)
            zb = jnp.zeros((oc,), jnp.bfloat16)

            def fwd(w_, x_):
                return _grouped_conv1d(
                    {"w": w_, "b": zb}, x_, s, p, g, impl="fgc"
                )

            # XLA kernel-gradient = vjp wrt w (includes one forward; the
            # forward is timed separately and subtracted)
            f_fwd = jax.jit(fwd)
            f_wg_fgc = jax.jit(
                lambda w_, x_, dy_: jax.vjp(lambda ww: fwd(ww, x_), w_)[1](dy_)[0]
            )
            f_wg_tap = jax.jit(
                lambda x_, dy_: _tap_wgrad(x_, dy_, s, p, g, k, jnp.float32)
            )

            t_fwd = time_step(f_fwd, w, x)
            t_fgc = max(time_step(f_wg_fgc, w, x, dy) - t_fwd, 1e-9)
            t_tap = time_step(f_wg_tap, x, dy)

            flops = 2.0 * b * lo * (ic // g) * k * oc
            m = (ic // g) * k
            n = oc // g
            mxu_frac = (min(n, 128) / 128.0) * (
                m / (int(np.ceil(m / 128.0)) * 128.0)
            )
            t_layout = flops / (PEAK_BF16_TFS * 1e12 * mxu_frac)
            bytes_min = 2.0 * (x.size + dy.size) + 4.0 * w.size
            t_hbm = bytes_min / (HBM_GBS * 1e9)
            bound = max(t_layout, t_hbm)
            best = min(t_fgc, t_tap)
            rows.append({
                "scale": scale, "layer": li,
                "shape": f"{ic}->{oc} k{k} s{s} g{g} T{t}",
                "flops_g": round(flops / 1e9, 2),
                "ms_fwd": round(t_fwd * 1e3, 3),
                "ms_wgrad_fgc": round(t_fgc * 1e3, 3),
                "ms_wgrad_tap": round(t_tap * 1e3, 3),
                "ms_layout_bound": round(t_layout * 1e3, 3),
                "ms_hbm_bound": round(t_hbm * 1e3, 3),
                "headroom_x": round(best / bound, 2),
                "mxu_frac": round(mxu_frac, 3),
            })
            r = rows[-1]
            print(
                f"s{scale} L{li} {r['shape']:>26}: fwd {r['ms_fwd']:7.3f}  "
                f"wgrad fgc {r['ms_wgrad_fgc']:7.3f}  tap {r['ms_wgrad_tap']:7.3f}  "
                f"bound(layout/hbm) {r['ms_layout_bound']:.3f}/{r['ms_hbm_bound']:.3f} ms  "
                f"headroom {r['headroom_x']:.2f}x"
            )

    tot_best = sum(min(r["ms_wgrad_fgc"], r["ms_wgrad_tap"]) for r in rows)
    tot_bound = sum(
        max(r["ms_layout_bound"], r["ms_hbm_bound"]) for r in rows
    )
    # the D tower backward runs twice per GAN step (D update + G update)
    print(
        f"\nper-step MSD wgrad (x2): measured-best {2*tot_best:.1f} ms, "
        f"shape-bound {2*tot_bound:.1f} ms -> max possible Pallas recovery "
        f"{2*(tot_best-tot_bound):.1f} ms"
    )
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump({
                "batch": b, "segment": args.segment,
                "sum_ms_best_x2": round(2 * tot_best, 2),
                "sum_ms_bound_x2": round(2 * tot_bound, 2),
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
