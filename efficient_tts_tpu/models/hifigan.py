"""HiFi-GAN vocoder: generator + multi-period/multi-scale discriminators.

TPU-native redesign of `/root/reference/nntts/vocoders/hifigan_model.py`:
same V1 topology (conv_pre k7, 4x [leaky -> transposed-conv upsample ->
MRF of 3 parallel dilated ResBlock1s averaged], conv_post k7 + tanh,
256x total upsampling = one mel hop), rebuilt channels-last so every
conv is an MXU matmul and the transposed convs lower as input-dilated
convolutions (`nn/layers.py:conv_transpose1d`).

The reference uses the generator only as a frozen inference vocoder
(`nntts/bin/inference.py:85,109`) but ships discriminators + GAN losses
with no trainer; this framework provides both the inference path and a
full GAN trainer (`train/hifigan_trainer.py`) per SURVEY.md §2.5.

Spectral norm (first MSD discriminator, `hifigan_model.py:243`) is
implemented as one power-iteration step per forward with the `u` vector
carried in a separate mutable state tree -- the functional analog of
torch's persistent buffer.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from efficient_tts_tpu.nn.layers import (
    avg_pool1d,
    conv1d,
    conv1d_init,
    conv2d,
    conv2d_init,
    conv_transpose1d,
    conv_transpose1d_init,
    conv_transpose1d_subpixel,
    leaky_relu,
    maybe_wn_kernel,
    subpixel_transpose_weight,
    weight_norm_init,
)

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    """Mirrors `HiFiGAN_LJ_V1/config.json`."""

    resblock: str = "1"
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050
    segment_size: int = 8192
    hop_size: int = 256

    @property
    def total_upsampling(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# generator


def _wn_conv1d_init(key, in_ch, out_ch, k, init="normal"):
    return weight_norm_init(conv1d_init(key, in_ch, out_ch, k, init=init))


def init_generator(key, cfg: HiFiGANConfig = HiFiGANConfig()) -> dict:
    """Weight-normed generator params; init N(0, 0.01) like the reference
    (`vocoders/utils.py:22`, applied at `hifigan_model.py:43,53,117-118`)."""
    n_ups = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    keys = iter(jax.random.split(key, 2 + n_ups + n_ups * n_kernels * 6))

    params = {
        "conv_pre": _wn_conv1d_init(
            next(keys), cfg.num_mels, cfg.upsample_initial_channel, 7, init="torch"
        ),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_ch = cfg.upsample_initial_channel // (2**i)
        out_ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        p = conv_transpose1d_init(next(keys), in_ch, out_ch, k, init="normal")
        # transposed conv weight norm preserves the *input* axis (axis 1 in WIO)
        params["ups"].append(weight_norm_init(p, preserved_axis=1))
    ch = cfg.upsample_initial_channel
    for i in range(n_ups):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        for k, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                block = {
                    "convs1": [
                        _wn_conv1d_init(next(keys), ch, ch, k) for _ in dils
                    ],
                    "convs2": [
                        _wn_conv1d_init(next(keys), ch, ch, k) for _ in dils
                    ],
                }
            else:
                block = {"convs": [_wn_conv1d_init(next(keys), ch, ch, k) for _ in dils]}
            params["resblocks"].append(block)
    params["conv_post"] = _wn_conv1d_init(next(keys), ch, 1, 7, init="torch")
    return params


def _resblock1(params: dict, x: jnp.ndarray, kernel_size: int, dilations) -> jnp.ndarray:
    """`ResBlock1` (`hifigan_model.py:31-62`)."""
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(maybe_wn_kernel(c1), xt, dilation=d,
                    padding=_get_padding(kernel_size, d))
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d(maybe_wn_kernel(c2), xt, dilation=1,
                    padding=_get_padding(kernel_size, 1))
        x = xt + x
    return x


def _resblock2(params: dict, x: jnp.ndarray, kernel_size: int, dilations) -> jnp.ndarray:
    """`ResBlock2` (`hifigan_model.py:71-88`)."""
    for c, d in zip(params["convs"], dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(maybe_wn_kernel(c), xt, dilation=d,
                    padding=_get_padding(kernel_size, d))
        x = xt + x
    return x


def generator(
    params: dict,
    mel: jnp.ndarray,
    cfg: HiFiGANConfig = HiFiGANConfig(),
    compute_dtype=None,
    pack_small_channels: bool = True,
    mrf_strategy=None,
    mrf_impl: str = "xla",
    ups_impl: str = "auto",
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """[B, T, num_mels] log-mel -> [B, T*256] waveform in (-1, 1).

    (Reference takes [B, num_mels, T]; we are channels-last end-to-end.)
    `compute_dtype=jnp.bfloat16` runs the conv stacks on the MXU in bf16
    with f32 accumulation; the final tanh output is float32 either way.
    `pack_small_channels` evaluates MRF stages with < 128 channels in
    space-to-depth packed layout (exact, ~2-3x faster on TPU); each conv
    individually picks plain/packed/phase per the measured `_MRF_STRATEGY`
    table (override with `mrf_strategy(ch, k, d) -> str` for benching).
    `mrf_impl="pallas"` runs each packed (< 128 ch, ResBlock1) MRF stage
    as ONE fused Pallas kernel (`ops/pallas/mrf_packed.py`: all 18 convs
    over a VMEM tile, 2 HBM passes per stage) — inference/serving only
    (no custom VJP) and computes in bf16 internally; per-stage tile sizes
    come from `_PALLAS_T_TILE`. Stages the kernel can't host fall back to
    the XLA strategy table.
    """
    n_kernels = len(cfg.resblock_kernel_sizes)
    if compute_dtype is not None:
        mel = mel.astype(compute_dtype)
    x = conv1d(maybe_wn_kernel(params["conv_pre"]), mel, padding=3)
    # `packed_r` tracks residency: x is [B, M, packed_r * ch] holding
    # packed_r consecutive positions per row (1 = plain). The late
    # upsamples are evaluated *inside* this layout (sub-pixel form, see
    # `_upsample`) so the small-channel tail never relayouts.
    packed_r = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        x, packed_r = _upsample(
            maybe_wn_kernel(params["ups"][i]), x, packed_r, u, k,
            resolve_ups_impl(ups_impl, u, k, x.shape[-1] // packed_r),
        )
        ch = (x.shape[-1] // packed_r) if packed_r > 1 else x.shape[-1]
        r = 128 // ch if (pack_small_channels and ch < 128 and 128 % ch == 0) else 1
        if r > 1 and x.shape[1] * packed_r % r != 0:
            r = 1
        if r != packed_r:
            b_, m_, _ = x.shape
            x = x.reshape(b_, m_ * packed_r // r, r * ch)
        packed_r = r
        impl = resolve_mrf_impl(mrf_impl)
        impl = impl(ch) if callable(impl) else impl
        if r > 1 and impl == "pallas" and cfg.resblock == "1":
            from efficient_tts_tpu.ops.pallas import mrf_packed as mp

            blocks = [
                params["resblocks"][i * n_kernels + j] for j in range(n_kernels)
            ]
            wp, biases = mp.pack_stage_weights(
                blocks, cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes, r, ch,
            )
            plan, _ = mp.stage_plan(
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes, r
            )
            x = mp.mrf_stage_packed(
                x,
                wp.astype(jnp.bfloat16),
                jnp.zeros((len(plan), 128), jnp.float32),  # scales: bf16 mode
                biases,
                cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes,
                r,
                t_tile=_t_tile(ch),
                int8=False,
                interpret=pallas_interpret,
            )
        else:
            acc = None
            for j, (rk, dils) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                block = params["resblocks"][i * n_kernels + j]
                if r > 1:
                    fn = _resblock1_packed if cfg.resblock == "1" else _resblock2_packed
                    y = fn(block, x, rk, dils, r, ch, mrf_strategy)
                else:
                    fn = _resblock1 if cfg.resblock == "1" else _resblock2
                    y = fn(block, x, rk, dils)
                acc = y if acc is None else acc + y
            x = acc / n_kernels
    # reference `F.leaky_relu(x)` at :132 uses torch's default slope 0.01
    x = leaky_relu(x, 0.01)
    ch = x.shape[-1] // packed_r
    if (
        packed_r > 1
        and packed_r * ch == 128
        and (x.shape[1] * packed_r) % 128 == 0
        and params["conv_post"].get("w", params["conv_post"].get("v")).shape[-1] == 1
    ):
        # conv_post in packed layout: 128 output positions per matmul row
        # (N=1 output channel would otherwise waste 127/128 MXU lanes).
        y = _packed_conv_post(
            maybe_wn_kernel(params["conv_post"]), x, packed_r, ch
        )
        wav = jnp.tanh(y.astype(jnp.float32))
        return wav.reshape(wav.shape[0], -1)
    if packed_r > 1:
        x = x.reshape(x.shape[0], x.shape[1] * packed_r, ch)
    x = conv1d(maybe_wn_kernel(params["conv_post"]), x, padding=3)
    return jnp.tanh(x.astype(jnp.float32))[..., 0]


# ---------------------------------------------------------------------------
# space-to-depth packed convolutions for small-channel stages
#
# HiFi-GAN's late stages run at 64/32 channels over very long sequences;
# a direct conv maps to MXU matmuls with N = channels (25-50% lane
# utilization, ~8 TF/s measured at ch=32). Packing r = 128//ch output
# positions into the channel dimension makes every matmul 128x128-dense:
# y_packed[m, i*C+co] = sum_{tap,ci} x_packed[m+blk, j*C+ci] * W[tap,ci,co]
# with (blk, j) = divmod(i + tap*d - pad - blo*r, r). The packed weight is
# built by a fixed 0/1 scatter (einsum below), so the transform is exact
# (bit-identical contraction per output) and works on the raw or
# weight-normed parameters under jit. Measured: 2.4-3.4x faster per conv
# despite the kp*r/k FLOP inflation.


# Per-conv strategy. Packing/unpacking is a *free* contiguous reshape
# ([B, T, C] <-> [B, T/r, r*C] share memory layout), so plain, packed and
# phase-decomposed convs can be mixed freely inside one resblock while the
# activations stay resident in packed layout.
#
#   'packed' — space-to-depth scattered weights (below). FLOP inflation
#              ~((k-1)*d + r)/k, but every matmul is 128-dense. Wins for
#              d=1 and small dilations.
#   'plain'  — direct conv at C output channels (C/128 lane utilization).
#   'phase'  — dilation-d conv == d independent dilation-1 convs on the
#              stride-d subsequences ("phases"); phases move to the batch
#              dim (one transpose each way) and the d=1 conv runs packed
#              at ~(k-1+r)/k inflation — kills the dilation factor from
#              the packed inflation at the cost of 2 transposes. Wins for
#              large k*d (k=11, d=5: 5.45x -> 1.82x FLOPs).
#
# The default table below is measured on a v5e chip at the LJ serving
# shapes by timing the whole jitted generator per candidate table
# (scripts/bench_mrf_whole.py); unlisted combinations fall back to
# 'packed'. Measured (B=16, T2=512, bf16): stage 2 (ch=64, r=2) runs
# fastest all-plain (56 ms vs 58 all-packed; mixing plain/packed inside
# the stage is *worse* — 67-73 ms — the layout boundary breaks XLA
# fusion), stage 3 (ch=32, r=4) all-packed. 'phase' loses everywhere at
# the XLA level: the phases-to-batch transposes at [B, T, 32ch] cost more
# than the saved matmul FLOPs (128 ms all-phase-d5). It is kept (exact,
# tested) because inside a future Pallas MRF kernel the same relayout is
# a VMEM shuffle, where the 3x FLOP cut should win.

_MRF_STRATEGY: dict = {
    (64, k, d): "plain" for k in (3, 7, 11) for d in (1, 3, 5)
}


# ---------------------------------------------------------------------------
# per-chip serving tables
#
# The _MRF_STRATEGY / _UPS_IMPL / _PALLAS_T_TILE constants in this file
# are whole-generator measurements on one v5e at LJ serving shapes
# (B=16, T2=512, bf16). On any other chip they may be stale, so every
# lookup first consults a per-chip JSON table measured by
# `scripts/autotune_serving.py`. Search order:
#   1. $EFTS_TPU_SERVING_TABLES       (explicit file, any name)
#   2. efficient_tts_tpu/configs/serving_tables/<device_kind>.json
#      (the autotuner's default output location, committed per chip)
#   3. the baked v5e constants above/below.
# JSON schema: {"device_kind": str, "mrf_strategy": {"ch,k,d": impl},
# "ups_impl": {"u,k,in_ch": impl}, "pallas_t_tile": {"ch": int}, ...}.

_serving_tables_cache: dict | None = None


def _tables_dir() -> str:
    import os

    return os.path.join(os.path.dirname(__file__), "..", "configs",
                        "serving_tables")


def device_kind_slug() -> str | None:
    """Sanitized `device_kind` of device 0 ('TPU v5 lite' -> 'tpu_v5_lite');
    None off-TPU (no table lookup happens there)."""
    import jax

    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return None
    if dev.platform != "tpu":
        return None
    return "".join(
        c if c.isalnum() else "_" for c in dev.device_kind.lower()
    ).strip("_")


def _parse_int_key(k: str) -> tuple:
    return tuple(int(x) for x in k.split(","))


def serving_tables() -> dict:
    """The active serving tables: parsed tuned entries + provenance.

    {"source": "builtin-v5e" | <path>, "device_kind": slug | None,
     "mrf_strategy": {(ch,k,d): impl}, "ups_impl": {(u,k,cin): impl},
     "pallas_t_tile": {ch: int}}  (tuned dicts empty under builtins).
    """
    global _serving_tables_cache
    if _serving_tables_cache is not None:
        return _serving_tables_cache
    import json
    import logging
    import os

    kind = device_kind_slug()
    candidates = []
    env = os.environ.get("EFTS_TPU_SERVING_TABLES")
    if env:
        candidates.append(env)
    if kind:
        candidates.append(os.path.join(_tables_dir(), f"{kind}.json"))
    tables = {
        "source": "builtin-v5e",
        "device_kind": kind,
        "mrf_strategy": {},
        "ups_impl": {},
        "pallas_t_tile": {},
    }
    for path in candidates:
        if not os.path.exists(path):
            continue
        try:
            with open(path) as f:
                raw = json.load(f)
            tables["mrf_strategy"] = {
                _parse_int_key(k): v
                for k, v in raw.get("mrf_strategy", {}).items()
            }
            tables["ups_impl"] = {
                _parse_int_key(k): v for k, v in raw.get("ups_impl", {}).items()
            }
            tables["pallas_t_tile"] = {
                int(k): int(v) for k, v in raw.get("pallas_t_tile", {}).items()
            }
            tables["source"] = os.path.abspath(path)
            break
        except (ValueError, OSError) as e:
            logging.getLogger(__name__).warning(
                "ignoring malformed serving table %s: %s", path, e
            )
    _serving_tables_cache = tables
    return tables


def reset_serving_tables() -> None:
    """Drop the cached tables (tests / after writing a new table file)."""
    global _serving_tables_cache
    _serving_tables_cache = None


def _t_tile(ch: int) -> int:
    tuned = serving_tables()["pallas_t_tile"]
    if ch in tuned:
        return tuned[ch]
    return _PALLAS_T_TILE.get(ch, 1024)

# ---------------------------------------------------------------------------
# upsample (transposed conv) strategy
#
# XLA's input-dilated lowering of ConvTranspose1d does NOT skip the s-1
# zeros between samples (measured at the full k-tap FLOP count), and at
# the late small-channel stages it runs ~10x off roofline. The sub-pixel
# reformulation (`nn/layers.py:subpixel_transpose_weight`) is one dense
# (k_eff+1)-tap conv producing s*Cout channels — but its depth-to-space
# reshape is a physical retile on TPU's (sublane, lane) tiling, which
# eats the win when the result must land in plain layout. The production
# path therefore fuses the phase dimension into the packed-128 layout
# the small-channel MRF stages already use:
#
#   'subpixel'        — dense subpixel conv; output [B, T, s*Cout]. When
#                       s*Cout == 128 this IS the packed r=s layout the
#                       next MRF stage wants (ups2: 128->2x64) — zero
#                       relayout. Also wins standalone at ch>=256 (ups0).
#   'subpixel_packed' — subpixel conv evaluated inside the current packed
#                       residency via the scatter-plan machinery (ups3:
#                       packed r=2 over 64ch -> packed r=4 over 32ch);
#                       requires s*Cout == Cin and k <= 2s.
#   'dilated'         — lax input-dilated conv (plain layout); the right
#                       call where channels are large enough that XLA's
#                       lowering is already at roofline (ups1: 256->128).
#
# Defaults measured in-context on a v5e (B=16, T2=512, bf16): see PERF.md.


def _ups_key(u: int, k: int, in_ch: int):
    return (u, k, in_ch)


# Isolated timings mislead here (subpixel wins standalone at ups0/ups2
# but loses 0.4-28 ms in-context to lost XLA fusion); the table below is
# chosen by whole-generator timing (B=16, T2=512, bf16, v5e):
#   all dilated 51.07 ms / subpixel@ups0 51.47 / subpixel@ups2 78.87 /
#   subpixel_packed@ups3 50.78.
_UPS_IMPL: dict = {
    (2, 4, 64): "subpixel_packed",  # ups3: stays in packed residency
}


def resolve_ups_impl(impl, u: int, k: int, in_ch: int) -> str:
    if impl == "auto":
        tuned = serving_tables()["ups_impl"]
        key = _ups_key(u, k, in_ch)
        if key in tuned:
            return tuned[key]
        return _UPS_IMPL.get(key, "dilated")
    if callable(impl):
        return impl(u, k, in_ch)
    return impl


def _upsample(kern: dict, x: jnp.ndarray, packed_r: int, u: int, k: int, impl: str):
    """Dispatch one upsample stage; returns (x, packed_r) in the layout
    the impl produces. `x` is [B, M, packed_r*Cin]."""
    pad = (k - u) // 2
    cin = x.shape[-1] // packed_r
    cout = kern["w"].shape[-1]
    k_eff = -(-k // u)
    if impl == "subpixel_packed":
        ok = (
            packed_r > 1
            and u * cout == cin
            and k - 2 * pad == u
            and k_eff == 2
        )
        if not ok:
            impl = "subpixel"  # fall through
        else:
            wt, _ = subpixel_transpose_weight(kern["w"], u, pad)
            # square (Cin -> u*Cout == Cin) dilation-1 conv, window
            # k_eff+1=3, symmetric pad 1 == the packed plan's own padding
            sub = {"w": wt, "b": jnp.tile(kern["b"], u)}
            y = _packed_conv1d(sub, x, k_eff + 1, 1, packed_r, cin)
            # lane order: (j, f, co) == position i = j*u+f over Cout ==
            # packed r*u layout over Cout
            return y, packed_r * u
    if packed_r > 1:
        x = x.reshape(x.shape[0], x.shape[1] * packed_r, cin)
    if impl == "subpixel" and k - 2 * pad == u:
        z = conv_transpose1d_subpixel(kern, x, stride=u, padding=pad)
        # conv_transpose1d_subpixel already reshaped to [B, T*u, Cout];
        # recover the pre-reshape packed interpretation when it is the
        # 128-lane layout downstream wants (free: same buffer).
        if u * cout == 128:
            return z.reshape(z.shape[0], z.shape[1] // u, u * cout), u
        return z, 1
    return conv_transpose1d(kern, x, stride=u, padding=pad), 1


def _conv_post_plan(k: int, r_in: int, c: int):
    """Static scatter plan for the packed conv_post: 128 output positions
    (Cout=1) per matmul row from packed [*, r_in*C] input rows.
    Returns (wp_map [k, kp, r_in*C, 128], stride, lo, hi)."""
    import numpy as np

    pad = (k - 1) // 2
    r_out = 128
    stride = r_out // r_in
    offs = [i + tap - pad for i in range(r_out) for tap in range(k)]
    blo, bhi = min(offs) // r_in, max(offs) // r_in
    kp = bhi - blo + 1
    wmap = np.zeros((k, kp, r_in * c, r_out), np.float32)
    for i in range(r_out):
        for tap in range(k):
            blk, j = divmod(i + tap - pad - blo * r_in, r_in)
            wmap[tap, blk, j * c : (j + 1) * c, i] = 1.0
    return wmap, stride, -blo, bhi - stride + 1


_CONV_POST_PLAN_CACHE: dict = {}


def _packed_conv_post(kern: dict, x_packed: jnp.ndarray, r_in: int, c: int):
    """conv_post (C->1, k=7) on packed-resident activations: the direct
    lowering has N=1 output channel (1/128 MXU lanes, measured 2.8 ms at
    the LJ serving shape); packing 128 output positions into N makes it
    one dense strided conv (~0.1 ms compute + the unavoidable HBM read).
    Output [B, T/128, 128] — the caller reshapes to the waveform."""
    w = kern["w"]  # [k, C, 1]
    k = w.shape[0]
    key = (k, r_in, c)
    if key not in _CONV_POST_PLAN_CACHE:
        _CONV_POST_PLAN_CACHE[key] = _conv_post_plan(k, r_in, c)
    wmap, stride, lo, hi = _CONV_POST_PLAN_CACHE[key]
    # wp[kp, j*C+ci, i] = sum_tap wmap[tap, kp, j*C+ci, i] * w[tap, ci, 0]
    wc = jnp.tile(w[:, :, 0], (1, r_in))  # [k, r_in*C] (ci per j slot)
    wp = jnp.einsum("tbmi,tm->bmi", jnp.asarray(wmap), wc)
    y = jax.lax.conv_general_dilated(
        x_packed,
        wp.astype(x_packed.dtype),
        window_strides=(stride,),
        padding=[(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        # MXU accumulates f32 internally either way; an f32
        # preferred_element_type would break the conv transpose (autodiff)
        # rule for bf16 operands in bf16 GAN training (cf. nn/layers.conv1d)
        preferred_element_type=x_packed.dtype,
    )
    return y + kern["b"][0].astype(x_packed.dtype)

# Fused-Pallas-stage tile sizes (rows of 128-lane packed blocks per VMEM
# tile), measured per stage channel count on a v5e (scripts/
# bench_mrf_fused.py sweep: ch=32 best at 2048, ch=64 at 1024).
_PALLAS_T_TILE: dict = {32: 2048, 64: 1024}


def serving_mrf_impl(ch: int) -> str:
    """Measured-in-context production MRF impl per stage channel count
    (whole-generator timing on a v5e, B=16/T2=512 bf16). History: with a
    plain conv_post the fused Pallas stage-3 kernel won (53.9 vs 55.1 ms
    generator); after the packed conv_post + packed-residency rework the
    XLA path fuses mrf[3] into the packed tail and the kernel boundary
    now LOSES (60.3 vs 51.0 ms) — production is all-XLA again. The
    kernel stays (exact, tested) as the scaffold for workloads where the
    stage runs standalone."""
    return "xla"


def resolve_mrf_impl(impl):
    """'auto' -> the measured serving table on TPU, plain XLA elsewhere
    (the fused kernel is TPU-Mosaic-only and has no sharding rules, so
    'auto' is for single-chip serving entry points)."""
    if impl == "auto":
        import jax

        return serving_mrf_impl if jax.default_backend() == "tpu" else "xla"
    return impl


def _strategy(ch: int, k: int, d: int) -> str:
    tuned = serving_tables()["mrf_strategy"]
    if (ch, k, d) in tuned:
        return tuned[(ch, k, d)]
    return _MRF_STRATEGY.get((ch, k, d), "packed")


def _pack_plan(k: int, dilation: int, r: int):
    """Static (numpy) scatter plan: T_map [k, kp, r_in, r_out], blo."""
    import numpy as np

    pad = _get_padding(k, dilation)
    offs = [i + tap * dilation - pad for i in range(r) for tap in range(k)]
    blo, bhi = min(offs) // r, max(offs) // r
    kp = bhi - blo + 1
    t_map = np.zeros((k, kp, r, r), np.float32)
    for i in range(r):
        for tap in range(k):
            o = i + tap * dilation - pad - blo * r
            blk, j = divmod(o, r)
            t_map[tap, blk, j, i] = 1.0
    return t_map, blo, bhi, kp


_PACK_PLAN_CACHE: dict = {}


def _packed_conv1d(kern: dict, x_packed: jnp.ndarray, k: int, dilation: int, r: int, c: int):
    """Dilated conv on space-to-depth packed activations [B, T/r, r*C]."""
    key = (k, dilation, r)
    if key not in _PACK_PLAN_CACHE:
        _PACK_PLAN_CACHE[key] = _pack_plan(k, dilation, r)
    t_map, blo, bhi, kp = _PACK_PLAN_CACHE[key]
    w = kern["w"]  # [k, C, C]
    # Wp[kp, j*C+ci, i*C+co] = sum_tap t_map[tap,kp,j,i] * w[tap,ci,co]
    wp = jnp.einsum("tbji,tcd->bjcid", jnp.asarray(t_map), w)
    wp = wp.reshape(kp, r * c, r * c)
    y = jax.lax.conv_general_dilated(
        x_packed,
        wp.astype(x_packed.dtype),
        (1,),
        [(-blo, bhi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        # see _packed_conv_post: compute-dtype preference keeps the conv
        # differentiable under bf16 (f32 MXU accumulation is internal)
        preferred_element_type=x_packed.dtype,
    )
    bias = jnp.tile(kern["b"], r).astype(x_packed.dtype)
    return y + bias


def _plain_conv1d_in_packed(kern, x_packed, k, dilation, r, c):
    """Direct conv on packed-resident activations; the two reshapes are
    contiguous (no data movement)."""
    b, m, _ = x_packed.shape
    y = conv1d(kern, x_packed.reshape(b, m * r, c), dilation=dilation,
               padding=_get_padding(k, dilation))
    return y.reshape(b, m, r * c)


def _phase_conv1d_in_packed(kern, x_packed, k, dilation, r, c):
    """Dilation-d conv as d phase-wise dilation-1 convs, phases batched.

    Exact: output position t = s*d + p reads inputs (s + tap - (k-1)//2)*d
    + p — entirely within phase p, at dilation-1 offsets; out-of-range
    positions are zeros both as the original conv's implicit padding and
    as the explicit tail padding here (sliced off before returning, so
    nothing leaks into subsequent ops)."""
    b, m, _ = x_packed.shape
    t = m * r
    x = x_packed.reshape(b, t, c)
    tp = -(-t // (dilation * r)) * (dilation * r)
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    s = tp // dilation
    xph = x.reshape(b, s, dilation, c).transpose(0, 2, 1, 3)
    xph = xph.reshape(b * dilation, s // r, r * c)
    y = _packed_conv1d(kern, xph, k, 1, r, c)
    y = y.reshape(b, dilation, s, c).transpose(0, 2, 1, 3).reshape(b, tp, c)
    return y[:, :t].reshape(b, m, r * c)


_CONV_IMPLS = {
    "packed": _packed_conv1d,
    "plain": _plain_conv1d_in_packed,
    "phase": _phase_conv1d_in_packed,
}


def _mixed_conv1d(kern, x_packed, k, dilation, r, c, strategy=None):
    name = strategy(c, k, dilation) if strategy else _strategy(c, k, dilation)
    if dilation == 1 and name == "phase":
        name = "packed"  # phase degenerates to packed at d=1
    return _CONV_IMPLS[name](kern, x_packed, k, dilation, r, c)


def _resblock1_packed(params, x_packed, kernel_size, dilations, r, c, strategy=None):
    """`_resblock1` evaluated on packed-resident activations (elementwise
    ops are layout-invariant; each conv dispatches per-strategy)."""
    for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
        xt = leaky_relu(x_packed, LRELU_SLOPE)
        xt = _mixed_conv1d(maybe_wn_kernel(c1), xt, kernel_size, d, r, c, strategy)
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = _mixed_conv1d(maybe_wn_kernel(c2), xt, kernel_size, 1, r, c, strategy)
        x_packed = xt + x_packed
    return x_packed


def _resblock2_packed(params, x_packed, kernel_size, dilations, r, c, strategy=None):
    for conv_p, d in zip(params["convs"], dilations):
        xt = leaky_relu(x_packed, LRELU_SLOPE)
        xt = _mixed_conv1d(maybe_wn_kernel(conv_p), xt, kernel_size, d, r, c, strategy)
        x_packed = xt + x_packed
    return x_packed


# ---------------------------------------------------------------------------
# discriminators


def init_period_discriminator(key, period: int, kernel_size: int = 5, stride: int = 3) -> dict:
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    keys = jax.random.split(key, len(chans) + 1)
    convs = []
    for i, (ic, oc) in enumerate(chans):
        convs.append(
            weight_norm_init(conv2d_init(keys[i], ic, oc, (kernel_size, 1)))
        )
    post = weight_norm_init(conv2d_init(keys[-1], 1024, 1, (3, 1)))
    return {"convs": convs, "conv_post": post}


def period_discriminator(
    params: dict,
    x: jnp.ndarray,
    period: int,
    kernel_size: int = 5,
    stride: int = 3,
    compute_dtype=None,
):
    """`DiscriminatorP` (`hifigan_model.py:148-181`). x: [B, T] waveform.

    Returns (logits [B, N], fmaps list). Pad T to a multiple of `period`
    with reflect padding, fold to [B, T/p, p, 1] (NHWC).
    """
    b, t = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    h = x.reshape(b, t // period, period, 1)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    fmap = []
    for i, c in enumerate(params["convs"]):
        s = (stride, 1) if i < 4 else (1, 1)
        pad = (_get_padding(5, 1), 0) if i < 4 else (2, 0)
        h = conv2d(maybe_wn_kernel(c), h, stride=s, padding=pad)
        h = leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = conv2d(maybe_wn_kernel(params["conv_post"]), h, padding=(1, 0))
    fmap.append(h)
    return h.reshape(b, -1), fmap


# ---------------------------------------------------------------------------
# spectral norm (first MSD discriminator, `hifigan_model.py:243`)
#
# torch applies spectral_norm to the weight matrix [out, in*k] with one
# power iteration per training forward; functionally the u/v vectors are
# explicit state: {w_orig, u, v, b}. `spectral_power_iteration` advances
# u/v (called once per GAN step, outside the gradient); `_sn_kernel`
# normalizes with the current u/v exactly like torch's compute_weight.


def spectral_norm_init(key, conv_params: dict) -> dict:
    w = conv_params["w"]  # [k, in, out]
    out_ch = w.shape[-1]
    in_k = w.shape[0] * w.shape[1]
    ku, kv = jax.random.split(key)
    u = jax.random.normal(ku, (out_ch,))
    v = jax.random.normal(kv, (in_k,))
    return {
        "w_orig": w,
        "u": u / jnp.linalg.norm(u),
        "v": v / jnp.linalg.norm(v),
        "b": conv_params["b"],
    }


def _sn_matrix(w):
    """WIO [k, in, out] -> torch spectral-norm matrix [out, k*in]."""
    return w.reshape(-1, w.shape[-1]).T


def _sn_kernel(p: dict) -> dict:
    # u/v are buffers (torch semantics): no gradient flows through them
    u = jax.lax.stop_gradient(p["u"])
    v = jax.lax.stop_gradient(p["v"])
    w_mat = _sn_matrix(p["w_orig"])
    sigma = jnp.dot(u, w_mat @ v)
    return {"w": p["w_orig"] / sigma, "b": p["b"]}


def spectral_power_iteration(p: dict, eps: float = 1e-12) -> dict:
    """One torch-style power iteration (v then u), gradients stopped."""
    w_mat = jax.lax.stop_gradient(_sn_matrix(p["w_orig"]))
    v = w_mat.T @ p["u"]
    v = v / jnp.maximum(jnp.linalg.norm(v), eps)
    u = w_mat @ v
    u = u / jnp.maximum(jnp.linalg.norm(u), eps)
    return {**p, "u": jax.lax.stop_gradient(u), "v": jax.lax.stop_gradient(v)}


def _resolve_kernel(p: dict) -> dict:
    if "w_orig" in p:
        return _sn_kernel(p)
    return maybe_wn_kernel(p)


def msd_power_iteration(msd_params: dict) -> dict:
    """Advance all spectral-norm u/v state in an MSD param tree."""

    def visit(p):
        if isinstance(p, dict):
            if "w_orig" in p:
                return spectral_power_iteration(p)
            return {k: visit(v) for k, v in p.items()}
        if isinstance(p, list):
            return [visit(v) for v in p]
        return p

    return visit(msd_params)


def init_scale_discriminator(key, use_spectral_norm: bool = False) -> dict:
    specs = _SCALE_SPECS
    keys = jax.random.split(key, 2 * (len(specs) + 1))
    convs = []
    for i, (ic, oc, k, s, g, p) in enumerate(specs):
        base = conv1d_init(keys[i], ic // g, oc, k)
        convs.append(
            spectral_norm_init(keys[len(specs) + 1 + i], base)
            if use_spectral_norm
            else weight_norm_init(base)
        )
    post = conv1d_init(keys[len(specs)], 1024, 1, 3)
    post = (
        spectral_norm_init(keys[-1], post)
        if use_spectral_norm
        else weight_norm_init(post)
    )
    return {"convs": convs, "conv_post": post}


# (in_ch, out_ch, kernel, stride, groups, padding) — hifigan_model.py:215-223
_SCALE_SPECS = [
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
]


def _grouped_conv1d(kernel, x, stride, padding, groups, impl="fgc"):
    """Grouped conv with a selectable XLA lowering (all numerically the
    same op; f32-exact across impls, exercised by
    `test_hifigan_strategies.py`):

    - "fgc":   `feature_group_count` (the direct lowering)
    - "bgc":   group-to-batch via `batch_group_count` — groups move to the
               lhs batch dim; group j of output features is computed from
               lhs batch group j, which is exactly grouped-conv semantics
               for the group-blocked [k, C/g, Cout] weight layout
    - "dense": block-diagonal densified weight, feature_group_count=1 —
               g× the FLOPs but full-K MXU tiles; wins for the grouped
               kernel-gradient (D update) at small per-group channels

    Selected per-call-site because the optimal lowering differs between
    the D update (needs weight gradients) and the G update (input
    gradients only) — measured in `scripts/bench_gan_step.py`.
    """
    w, b = kernel["w"], kernel["b"]
    if groups == 1 or impl == "fgc":
        return conv1d(kernel, x, stride=stride, padding=padding, groups=groups)
    pad = [(padding, padding)]
    if impl == "bgc":
        bsz, t, c = x.shape
        cg = c // groups
        xg = (
            x.reshape(bsz, t, groups, cg)
            .transpose(2, 0, 1, 3)
            .reshape(groups * bsz, t, cg)
        )
        y = jax.lax.conv_general_dilated(
            xg,
            w.astype(x.dtype),
            window_strides=(stride,),
            padding=pad,
            dimension_numbers=("NWC", "WIO", "NWC"),
            batch_group_count=groups,
            preferred_element_type=x.dtype,
        )
        return y + b.astype(x.dtype)
    if impl == "dense":
        k, cg, cout = w.shape
        og = cout // groups
        wd = jnp.zeros((k, cg * groups, cout), w.dtype)
        for i in range(groups):
            wd = wd.at[:, i * cg : (i + 1) * cg, i * og : (i + 1) * og].set(
                w[:, :, i * og : (i + 1) * og]
            )
        y = jax.lax.conv_general_dilated(
            x,
            wd.astype(x.dtype),
            window_strides=(stride,),
            padding=pad,
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )
        return y + b.astype(x.dtype)
    if impl.startswith("vjp:"):
        igrad_impl, wgrad_impl = impl[len("vjp:"):].split(",")
        return _grouped_conv1d_custom_grads(
            w, b, x, stride, padding, groups, igrad_impl, wgrad_impl
        )
    raise ValueError(f"unknown grouped conv impl {impl!r}")


def _tap_wgrad(x, dy, stride, padding, groups, k, out_dtype):
    """Grouped-conv kernel-gradient as per-tap batched matmuls.

    dw[t, i, g*og+o] = sum_{b,l} x_pad[b, l*stride + t, g, i] dy[b, l, g, o]

    A `lax.scan` over the k taps turns each tap into one einsum with a
    huge contraction dim (B*L_out) and a tiny [g, C/g, Cout/g] output —
    pure MXU batched-matmul work with no conv-emitter involvement, the
    candidate replacement for XLA's grouped kernel-gradient lowering
    (the measured bulk of the GAN D update; PERF.md round-3 section).
    """
    bsz, lo, cout = dy.shape
    cin = x.shape[2]
    cg, og = cin // groups, cout // groups
    # pad so every tap can slice a full [lo*stride] window
    x_pad = jnp.pad(x, ((0, 0), (padding, padding + k + stride), (0, 0)))
    dy_g = dy.reshape(bsz, lo, groups, og)

    def body(_, t):
        xs = jax.lax.dynamic_slice(
            x_pad, (0, t, 0), (bsz, lo * stride, cin)
        ).reshape(bsz, lo, stride, cin)[:, :, 0, :]
        xs = xs.reshape(bsz, lo, groups, cg)
        dwt = jnp.einsum(
            "blgi,blgo->gio", xs, dy_g, preferred_element_type=jnp.float32
        )
        return None, dwt

    _, dw = jax.lax.scan(body, None, jnp.arange(k))  # [k, g, cg, og]
    dw = dw.transpose(0, 2, 1, 3).reshape(k, cg, cout)
    return dw.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _grouped_conv1d_custom_grads(
    w, b, x, stride, padding, groups, igrad_impl, wgrad_impl
):
    """Grouped conv: fgc forward with independently selected gradient
    lowerings (`impl="vjp:<igrad>,<wgrad>"`).

    XLA's autodiff derives BOTH gradients from whichever forward lowering
    is chosen, so no single choice can combine e.g. the group-to-batch
    input-gradient with a matmul kernel-gradient; this custom VJP frees
    the two directions. igrad: fgc | bgc (transpose of that forward
    lowering). wgrad: fgc | dense (transpose) | tap (`_tap_wgrad`).
    Numerics are f32-exact vs the fgc autodiff
    (`test_hifigan_strategies.py`)."""
    return _grouped_conv1d(
        {"w": w, "b": b}, x, stride, padding, groups, impl="fgc"
    )


def _gconv_fwd(w, b, x, stride, padding, groups, igrad_impl, wgrad_impl):
    y = _grouped_conv1d_custom_grads(
        w, b, x, stride, padding, groups, igrad_impl, wgrad_impl
    )
    return y, (w, b, x)


def _gconv_bwd(stride, padding, groups, igrad_impl, wgrad_impl, res, dy):
    w, b, x = res
    zero_b = jnp.zeros_like(b)
    _, vjp_x = jax.vjp(
        lambda xx: _grouped_conv1d(
            {"w": w, "b": zero_b}, xx, stride, padding, groups, impl=igrad_impl
        ),
        x,
    )
    (dx,) = vjp_x(dy)
    if wgrad_impl == "tap":
        dw = _tap_wgrad(x, dy, stride, padding, groups, w.shape[0], w.dtype)
    else:
        _, vjp_w = jax.vjp(
            lambda ww: _grouped_conv1d(
                {"w": ww, "b": zero_b}, x, stride, padding, groups,
                impl=wgrad_impl,
            ),
            w,
        )
        (dw,) = vjp_w(dy)
    db = dy.sum((0, 1)).astype(b.dtype)
    return dw, db, dx


_grouped_conv1d_custom_grads.defvjp(_gconv_fwd, _gconv_bwd)


def scale_discriminator(
    params: dict, x: jnp.ndarray, compute_dtype=None, grouped_impl=None
):
    """`DiscriminatorS` (`hifigan_model.py:211-236`). x: [B, T] waveform.

    Kernels resolve through weight norm or spectral norm depending on the
    param structure (the first MSD discriminator is spectral-normed).
    `compute_dtype=jnp.bfloat16` runs the conv tower on the MXU in bf16
    (params/losses stay f32; the GAN losses reduce in f32).
    `grouped_impl`: None/str/callable(layer_idx, spec)->str selecting the
    grouped-conv lowering per layer (see `_grouped_conv1d`)."""
    h = x[:, :, None]  # [B, T, 1]
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    fmap = []
    for i, (c, spec) in enumerate(zip(params["convs"], _SCALE_SPECS)):
        ic, oc, k, s, g, p = spec
        impl = (
            "fgc"
            if grouped_impl is None
            else (grouped_impl if isinstance(grouped_impl, str) else grouped_impl(i, spec))
        )
        h = _grouped_conv1d(_resolve_kernel(c), h, s, p, g, impl=impl)
        h = leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = conv1d(_resolve_kernel(params["conv_post"]), h, padding=1)
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


def generator_chunked(
    params: dict,
    mel: jnp.ndarray,
    cfg: HiFiGANConfig = HiFiGANConfig(),
    compute_dtype=None,
    chunk_frames: int = 256,
    overlap_frames: int = 24,
) -> jnp.ndarray:
    """Memory-bounded synthesis for unbounded-length mels.

    The generator's receptive field is ~14 mel frames per side (conv_pre
    + per-stage MRF halos divided by the cumulative upsampling), so
    decoding overlapping chunks and keeping only interiors is exact.
    One [chunk + 2*overlap] graph compiles once and serves any length;
    peak activation memory is O(chunk), not O(T).
    `tests/test_hifigan_chunked.py` asserts equality with the full pass.
    """
    b, t, _ = mel.shape
    hop = cfg.total_upsampling
    ov = overlap_frames
    if t <= chunk_frames + 2 * ov:
        return generator(params, mel, cfg, compute_dtype=compute_dtype)
    n_chunks = -(-t // chunk_frames)
    pieces = []
    for i in range(n_chunks):
        lo = i * chunk_frames
        hi = min(t, lo + chunk_frames)
        if i == 0:
            # true left edge: layer-wise zero padding must match the full pass
            seg = mel[:, : chunk_frames + ov]
            keep_lo = 0
        elif i == n_chunks - 1:
            # true right edge: fixed-size window ending exactly at t
            seg = mel[:, t - (chunk_frames + ov) :]
            keep_lo = (chunk_frames + ov) - (hi - lo)
        else:
            seg = mel[:, lo - ov : hi + ov]
            keep_lo = ov
        wav = generator(params, seg, cfg, compute_dtype=compute_dtype)
        pieces.append(wav[:, keep_lo * hop : (keep_lo + hi - lo) * hop])
    return jnp.concatenate(pieces, axis=1)


MPD_PERIODS = (2, 3, 5, 7, 11)


def init_mpd(key) -> dict:
    """`MultiPeriodDiscriminator` periods (2,3,5,7,11) (`:184-193`)."""
    keys = jax.random.split(key, len(MPD_PERIODS))
    return {
        "discriminators": [
            init_period_discriminator(k, p) for k, p in zip(keys, MPD_PERIODS)
        ],
    }


def mpd_forward(
    params: dict,
    y: jnp.ndarray,
    y_hat: jnp.ndarray,
    compute_dtype=None,
    fused: bool = False,
):
    """`fused=True` runs each period discriminator ONCE on the [2B]
    real/fake concat — numerically identical (all ops batch-parallel),
    half the op count. Right for the D step, where weight gradients are
    needed for both halves anyway; the G step keeps separate forwards so
    the real branch (constant w.r.t. generator params) costs no backward."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    if fused:
        b = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        for d, p in zip(params["discriminators"], MPD_PERIODS):
            o, fm = period_discriminator(d, both, p, compute_dtype=compute_dtype)
            y_d_rs.append(o[:b])
            y_d_gs.append(o[b:])
            fmap_rs.append([f[:b] for f in fm])
            fmap_gs.append([f[b:] for f in fm])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
    for d, p in zip(params["discriminators"], MPD_PERIODS):
        r, fr = period_discriminator(d, y, p, compute_dtype=compute_dtype)
        g, fg = period_discriminator(d, y_hat, p, compute_dtype=compute_dtype)
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def init_msd(key) -> dict:
    """`MultiScaleDiscriminator` (`:239-250`): 3 scales, 2 avg-pools; the
    first discriminator spectral-normed (`:243`), the rest weight-normed.
    The GAN train step advances the power-iteration state once per step
    via `msd_power_iteration`."""
    keys = jax.random.split(key, 3)
    return {
        "discriminators": [
            init_scale_discriminator(k, use_spectral_norm=(i == 0))
            for i, k in enumerate(keys)
        ]
    }


def msd_forward(
    params: dict,
    y: jnp.ndarray,
    y_hat: jnp.ndarray,
    compute_dtype=None,
    fused: bool = False,
    grouped_impl=None,
):
    """See `mpd_forward` for `fused` semantics (exact [2B] concat).
    `grouped_impl` selects the grouped-conv lowering (`_grouped_conv1d`)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    if fused:
        b = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        for i, d in enumerate(params["discriminators"]):
            if i != 0:
                both = avg_pool1d(both[:, :, None], 4, 2, 2)[:, :, 0]
            o, fm = scale_discriminator(
                d, both, compute_dtype=compute_dtype, grouped_impl=grouped_impl
            )
            y_d_rs.append(o[:b])
            y_d_gs.append(o[b:])
            fmap_rs.append([f[:b] for f in fm])
            fmap_gs.append([f[b:] for f in fm])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
    for i, d in enumerate(params["discriminators"]):
        if i != 0:
            y = avg_pool1d(y[:, :, None], 4, 2, 2)[:, :, 0]
            y_hat = avg_pool1d(y_hat[:, :, None], 4, 2, 2)[:, :, 0]
        r, fr = scale_discriminator(
            d, y, compute_dtype=compute_dtype, grouped_impl=grouped_impl
        )
        g, fg = scale_discriminator(
            d, y_hat, compute_dtype=compute_dtype, grouped_impl=grouped_impl
        )
        y_d_rs.append(r)
        y_d_gs.append(g)
        fmap_rs.append(fr)
        fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs
