"""Benchmark: audio-seconds synthesized per second per chip.

Flagship path: batched EFTS-CNN text->mel + HiFi-GAN mel->waveform at a
static mel bucket (the production batched-synthesis configuration;
BASELINE.json north-star metric). The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against real-time (1.0
audio-second/s = a single listener's playback rate).

Timing methodology: on this TPU relay a host readback carries a fixed
RTT and block_until_ready returns early, so we time "enqueue k steps +
one readback" for k in {1, K} and use (t_K - t_1)/(K - 1) -- the RTT and
dispatch constants cancel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np


def _time_chain(run, tail, k: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = run()
    float(tail(out))
    return time.perf_counter() - t0


def main():
    import jax

    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.pipeline import synthesize_fixed

    efts_cfg = EftsCNNConfig(num_symbols=76, dropout_rate=0.0, use_masking=True)
    voc_cfg = HiFiGANConfig()
    efts_params = fold_weight_norm(efts.init(jax.random.PRNGKey(0), efts_cfg))
    voc_params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), voc_cfg))

    # LJSpeech-like serving workload: 16 utterances x 512 mel frames (~5.9 s each)
    b, t1, t2 = 16, 96, 512
    rng = np.random.default_rng(0)
    text = rng.integers(1, 76, size=(b, t1)).astype(np.int32)
    text_lengths = np.full((b,), t1, np.int32)

    import jax.numpy as jnp

    def run():
        wav, _, _ = synthesize_fixed(
            efts_params, voc_params, text, text_lengths, efts_cfg, voc_cfg, t2,
            compute_dtype=jnp.bfloat16, mrf_impl="auto",
        )
        return wav

    tail = jax.jit(lambda w: w[0, -1])
    float(tail(run()))  # compile + warm
    float(tail(run()))

    # median of repeated chain-difference estimates (relay timing jitters)
    k_small, k_large = 2, 22
    estimates = []
    for _ in range(3):
        t_small = _time_chain(run, tail, k_small)
        t_large = _time_chain(run, tail, k_large)
        estimates.append(max((t_large - t_small) / (k_large - k_small), 1e-9))
    dt = sorted(estimates)[1]

    sr = voc_cfg.sampling_rate
    audio_seconds = b * t2 * voc_cfg.hop_size / sr
    value = audio_seconds / dt

    # roofline fraction + active serving-table provenance (verdict r1 #7)
    from efficient_tts_tpu.models.hifigan import device_kind_slug, serving_tables
    from efficient_tts_tpu.utils.flops import (
        efts_cnn_infer_flops,
        generator_flops,
        peak_flops_for,
    )

    flops = efts_cnn_infer_flops(efts_cfg, b, t1, t2) + generator_flops(
        voc_cfg, b, t2
    )
    peak = peak_flops_for(device_kind_slug())
    mfu = round(flops / dt / peak, 4) if peak else None
    print(
        json.dumps(
            {
                "metric": "audio_seconds_synthesized_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value, 2),
                "mfu": mfu,
                "device_kind": device_kind_slug(),
                "serving_tables": serving_tables()["source"],
            }
        )
    )


if __name__ == "__main__":
    main()
