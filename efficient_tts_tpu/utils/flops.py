"""Analytic FLOP accounting for the serving pipeline + chip peak table.

Used by bench.py to report an MFU estimate next to the throughput number
(round-1 verdict item 7: the bench artifact should carry a roofline
fraction, not just audio-s/s). Counts algorithmic MACs*2 of the dense
formulations actually computed on the MXU:

  * 1D convs: 2*B*T_out*K*Cin*Cout
  * transposed convs: counted in sub-pixel form — ceil(K/u) useful taps
    per output (the zero taps of the input-dilated lowering are NOT
    counted as useful work, so MFU is honest w.r.t. speed-of-light)
  * the [B,T1,T2] alignment/expansion batched matmuls.
"""

from __future__ import annotations

import math


def conv1d_flops(b: int, t_out: int, cin: int, cout: int, k: int) -> float:
    return 2.0 * b * t_out * k * cin * cout


def generator_flops(cfg, b: int, t_mel: int) -> float:
    """HiFi-GAN generator (V1-family) on a [b, t_mel, num_mels] input."""
    ch = cfg.upsample_initial_channel
    t = t_mel
    total = conv1d_flops(b, t, cfg.num_mels, ch, 7)  # conv_pre
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cout = ch // 2
        t_out = t * u
        total += conv1d_flops(b, t_out, ch, cout, math.ceil(k / u))
        ch, t = cout, t_out
        for rk, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            n_convs = (2 if cfg.resblock == "1" else 1) * len(dils)
            total += n_convs * conv1d_flops(b, t, ch, ch, rk)
    total += conv1d_flops(b, t, ch, 1, 7)  # conv_post
    return total


def efts_cnn_infer_flops(cfg, b: int, t1: int, t2: int) -> float:
    """EFTS-CNN two-stage inference: text encode + duration predictor
    (stage 1) and alignment expansion + decoder (stage 2)."""
    c = cfg.n_channels
    total = 0.0
    # text encoder: n resconv layers + K/V projections
    total += cfg.n_text_encoder_layer * conv1d_flops(b, t1, c, c, cfg.k_size)
    total += 2 * conv1d_flops(b, t1, c, c, 1)
    # duration predictor: n conv k=3 + out proj
    total += cfg.n_duration_layer * conv1d_flops(b, t1, c, c, 3)
    total += conv1d_flops(b, t1, c, 1, 1)
    # alignment reconstruction energies + softmax ~ O(T1*T2) (non-MXU,
    # small) ignored; expansion bmm alpha'^T V:
    total += 2.0 * b * t1 * t2 * c
    # decoder: n resconv + mel head
    total += cfg.n_decoder_layer * conv1d_flops(b, t2, c, c, cfg.k_size)
    total += conv1d_flops(b, t2, c, cfg.odim, 1)
    return total


# Peak dense bf16 matmul throughput per chip, FLOP/s. Sources: public
# TPU spec sheets (v4 275 TF/s bf16; v5e 197; v5p 459; v6e 918).
PEAK_BF16_FLOPS = {
    "tpu_v4": 275e12,
    "tpu_v5_lite": 197e12,
    "tpu_v5e": 197e12,
    "tpu_v5": 459e12,
    "tpu_v5p": 459e12,
    "tpu_v6_lite": 918e12,
    "tpu_v6e": 918e12,
}


def peak_flops_for(kind_slug: str | None) -> float | None:
    if not kind_slug:
        return None
    if kind_slug in PEAK_BF16_FLOPS:
        return PEAK_BF16_FLOPS[kind_slug]
    # prefix match ('tpu_v5_lite_podslice' etc.)
    for k, v in sorted(PEAK_BF16_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind_slug.startswith(k):
            return v
    return None
