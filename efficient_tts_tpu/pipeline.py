"""End-to-end synthesis pipeline: text ids -> waveform.

The TPU-native counterpart of `nntts/bin/inference.py:97-125`: EFTS-CNN
predicts durations and decodes mel, HiFi-GAN renders the waveform. The
reference synthesizes one utterance at a time with a data-dependent mel
length (`efficient_tts.py:358-363`); here synthesis is *batched* with
static shape buckets:

  stage 1 (tiny graph): text -> aligned positions e; host rounds
      e[:, -1] and picks the smallest bucket >= max length;
  stage 2 (bucketed graph): decode mel at the bucket length and run the
      vocoder; the tail beyond each utterance's true length is masked.

Each bucket compiles once; the jit cache makes steady-state synthesis
allocation-free.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.models import efficient_tts as efts  # noqa: F401
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models import model_module_for
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.utils.masks import bucket_length, sequence_mask


def _maybe_correct(e, text_lengths, efts_cfg, duration_correction):
    """duration_correction: False/None = off (reference parity);
    True = gated correction at the default 2% validity threshold;
    a float = gate threshold (0.0 = always apply, the round-3 behavior).
    See ops/alignment.py:boundary_truncation_correction."""
    if duration_correction is False or duration_correction is None:
        return e
    from efficient_tts_tpu.ops.alignment import boundary_truncation_correction

    thresh = 0.02 if duration_correction is True else float(duration_correction)
    return boundary_truncation_correction(
        e, text_lengths, efts_cfg.sigma_e, rel_threshold=thresh
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "efts_cfg", "voc_cfg", "t2", "compute_dtype", "mrf_impl",
        "duration_correction", "output",
    ),
)
def synthesize_fixed(
    efts_params: dict,
    voc_params: dict,
    text: jnp.ndarray,
    text_lengths: jnp.ndarray,
    efts_cfg: EftsCNNConfig,
    voc_cfg: HiFiGANConfig,
    t2: int,
    compute_dtype=None,
    mrf_impl: str = "xla",
    duration_correction: bool = False,
    output: str = "f32",
):
    """Fully jitted text -> waveform at a static mel length `t2`.

    Returns (wav [B, t2*hop], wav_lengths [B], mel [B, t2, odim]).
    `compute_dtype=jnp.bfloat16` runs decoder + vocoder conv stacks in
    bf16 on the MXU (alignment math stays float32).
    `duration_correction` opts into the analytic last-token truncation
    correction (`ops/alignment.py:boundary_truncation_correction`;
    default off = reference parity).
    `output="pcm16"` quantizes the waveform to int16 PCM *on device*
    (same clip+scale+truncate as `serve.encode_wav_bytes`) so the
    device->host transfer moves 4x fewer bytes — the dominant serving
    cost over a relay-attached chip.
    """
    return synthesize_body(
        efts_params, voc_params, text, text_lengths, efts_cfg, voc_cfg, t2,
        compute_dtype=compute_dtype, mrf_impl=mrf_impl,
        duration_correction=duration_correction, output=output,
    )


def synthesize_body(
    efts_params: dict,
    voc_params: dict,
    text: jnp.ndarray,
    text_lengths: jnp.ndarray,
    efts_cfg: EftsCNNConfig,
    voc_cfg: HiFiGANConfig,
    t2: int,
    compute_dtype=None,
    mrf_impl: str = "xla",
    duration_correction: bool = False,
    output: str = "f32",
    mrf_strategy=None,
    ups_impl: str = "auto",
):
    """Traced body of `synthesize_fixed` (callable under a caller's jit).

    Exposes the generator's per-stage `mrf_strategy` / `ups_impl`
    overrides so the serving autotuner can time candidate tables in the
    FULL pipeline context — layout boundaries break XLA fusion, so only
    in-context timing decides (PERF.md; `scripts/autotune_serving.py`)."""
    m = model_module_for(efts_cfg)
    e, value, tmask = m.infer_durations(efts_params, efts_cfg, text, text_lengths)
    e = _maybe_correct(e, text_lengths, efts_cfg, duration_correction)
    mel, _ = m.infer_decode(
        efts_params, efts_cfg, value, e, tmask, t2, compute_dtype=compute_dtype
    )
    # true per-utterance mel length from the last valid aligned position
    last = jnp.take_along_axis(e, (text_lengths - 1)[:, None], axis=1)[:, 0]
    mel_lengths = jnp.clip(jnp.round(last).astype(jnp.int32), 1, t2)
    mel = mel * sequence_mask(mel_lengths, t2, dtype=mel.dtype)[:, :, None]
    wav = hg.generator(
        voc_params, mel, voc_cfg, compute_dtype=compute_dtype, mrf_impl=mrf_impl,
        mrf_strategy=mrf_strategy, ups_impl=ups_impl,
    )
    wav_lengths = mel_lengths * voc_cfg.hop_size
    wav = wav * sequence_mask(wav_lengths, t2 * voc_cfg.hop_size, dtype=wav.dtype)
    if output == "pcm16":
        wav = jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    elif output != "f32":
        raise ValueError(f"output={output!r}: expected 'f32' or 'pcm16'")
    return wav, wav_lengths, mel


@functools.partial(jax.jit, static_argnames=("efts_cfg", "duration_correction"))
def predict_lengths(
    efts_params: dict, text, text_lengths, efts_cfg: EftsCNNConfig,
    duration_correction: bool = False,
):
    """Stage-1 graph: aligned positions only (for host bucket choice)."""
    e, _, _ = model_module_for(efts_cfg).infer_durations(
        efts_params, efts_cfg, text, text_lengths
    )
    e = _maybe_correct(e, text_lengths, efts_cfg, duration_correction)
    last = jnp.take_along_axis(e, (text_lengths - 1)[:, None], axis=1)[:, 0]
    return jnp.round(last).astype(jnp.int32)


def synthesize_dispatch(
    efts_params: dict,
    voc_params: dict,
    text: np.ndarray,
    text_lengths: np.ndarray,
    efts_cfg: EftsCNNConfig = EftsCNNConfig(),
    voc_cfg: HiFiGANConfig = HiFiGANConfig(),
    bucket_multiple: int = 64,
    max_t2: int = 2048,
    compute_dtype=None,
    mesh=None,
    mrf_impl: str = "xla",
    duration_correction: bool = False,
    output: str = "f32",
    timings: dict | None = None,
):
    """Dispatch batched synthesis; do NOT fetch the waveform.

    Runs stage 1 (duration prediction + the one unavoidable host
    readback that picks the mel bucket), dispatches the fully-jitted
    stage 2, kicks off an async device->host copy of the result, and
    returns ``(wav_device, wav_lengths_numpy)``. The caller fetches the
    waveform later (`_to_host`) — overlapping that transfer with the
    next batch's dispatch is how serving hides the relay's bandwidth
    (the trainers' lagged-fetch pattern applied to inference).

    ``wav_lengths`` is computed on the host from the stage-1 readback
    (identical to stage 2's device value: clip(round(e_last), 1, t2) *
    hop), so no second readback is needed.

    If ``timings`` is a dict, it receives {"stage1_s", "dispatch_s",
    "t2"} wall splits for attribution.
    """
    t_a = _now()
    if mesh is not None:
        from efficient_tts_tpu.parallel.sharding import batch_sharding, replicated

        rep = replicated(mesh)
        efts_params = jax.device_put(efts_params, rep)
        voc_params = jax.device_put(voc_params, rep)
        text = jax.device_put(text, batch_sharding(mesh, ndim=2))
        text_lengths = jax.device_put(text_lengths, batch_sharding(mesh, ndim=1))
    mel_lengths = _to_host(predict_lengths(
        efts_params, text, text_lengths, efts_cfg,
        duration_correction=duration_correction,
    ))
    t_b = _now()
    t2 = min(bucket_length(int(mel_lengths.max()), bucket_multiple), max_t2)
    wav, _, _ = synthesize_fixed(
        efts_params, voc_params, text, text_lengths, efts_cfg, voc_cfg, t2,
        compute_dtype=compute_dtype, mrf_impl=mrf_impl,
        duration_correction=duration_correction, output=output,
    )
    if getattr(wav, "is_fully_addressable", True):
        try:
            wav.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass  # fetch will do a plain blocking copy
    wav_lengths = np.clip(mel_lengths, 1, t2).astype(np.int64) * voc_cfg.hop_size
    if timings is not None:
        timings["stage1_s"] = t_b - t_a
        timings["dispatch_s"] = _now() - t_b
        timings["t2"] = t2
    return wav, wav_lengths.astype(np.int32)


_now = time.perf_counter


def synthesize(
    efts_params: dict,
    voc_params: dict,
    text: np.ndarray,
    text_lengths: np.ndarray,
    efts_cfg: EftsCNNConfig = EftsCNNConfig(),
    voc_cfg: HiFiGANConfig = HiFiGANConfig(),
    bucket_multiple: int = 64,
    max_t2: int = 2048,
    compute_dtype=None,
    mesh=None,
    mrf_impl: str = "xla",
    duration_correction: bool = False,
    output: str = "f32",
):
    """Host-driven batched synthesis with automatic bucket selection.

    With a mesh, the utterance batch is sharded over the 'data' axis
    (data-parallel multi-chip synthesis; the data extent must divide the
    batch size).
    Returns (wav [B, T_bucket*hop] numpy, wav_lengths [B] numpy).
    """
    wav, wav_lengths = synthesize_dispatch(
        efts_params, voc_params, text, text_lengths, efts_cfg, voc_cfg,
        bucket_multiple=bucket_multiple, max_t2=max_t2,
        compute_dtype=compute_dtype, mesh=mesh, mrf_impl=mrf_impl,
        duration_correction=duration_correction, output=output,
    )
    return _to_host(wav), wav_lengths


def _to_host(x) -> np.ndarray:
    """Fetch a (possibly globally-sharded) device array as full numpy.

    Under a multi-process mesh (serving sharded over hosts, SURVEY.md L5)
    outputs are not fully addressable from any one process;
    `process_allgather` assembles the global value on every host — the
    serving-side analog of DDP's implicit all-reduce."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


# ---------------------------------------------------------------------------
# streaming synthesis (low time-to-first-audio)


@functools.partial(
    jax.jit, static_argnames=("efts_cfg", "t2", "compute_dtype",
                              "duration_correction")
)
def decode_mel_fixed(
    efts_params: dict,
    text: jnp.ndarray,
    text_lengths: jnp.ndarray,
    efts_cfg: EftsCNNConfig,
    t2: int,
    compute_dtype=None,
    duration_correction: bool = False,
):
    """Text -> (mel [B, t2, odim], mel_lengths [B]) at a static bucket.

    The mel half of `synthesize_fixed`, for workflows that vocode
    separately (streaming, GTA-style inspection)."""
    m = model_module_for(efts_cfg)
    e, value, tmask = m.infer_durations(efts_params, efts_cfg, text, text_lengths)
    e = _maybe_correct(e, text_lengths, efts_cfg, duration_correction)
    mel, _ = m.infer_decode(
        efts_params, efts_cfg, value, e, tmask, t2, compute_dtype=compute_dtype
    )
    last = jnp.take_along_axis(e, (text_lengths - 1)[:, None], axis=1)[:, 0]
    mel_lengths = jnp.clip(jnp.round(last).astype(jnp.int32), 1, t2)
    mel = mel * sequence_mask(mel_lengths, t2, dtype=mel.dtype)[:, :, None]
    return mel, mel_lengths


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "compute_dtype", "mrf_impl", "pallas_interpret",
    ),
)
def _vocode_window(voc_params, mel, cfg, compute_dtype=None, mrf_impl="xla",
                   pallas_interpret=False):
    from efficient_tts_tpu.models import hifigan as hg

    return hg.generator(
        voc_params, mel, cfg, compute_dtype=compute_dtype, mrf_impl=mrf_impl,
        pallas_interpret=pallas_interpret,
    )


def stream_vocoder(
    voc_params: dict,
    mel: np.ndarray,
    voc_cfg: HiFiGANConfig = HiFiGANConfig(),
    chunk_frames: int = 64,
    overlap_frames: int = 24,
    compute_dtype=None,
    mrf_impl: str = "xla",
    pallas_interpret: bool = False,
):
    """Yield waveform chunks for a host mel [T, odim], exactly equal to
    the full-pass generator output (same overlap-interior scheme as
    `hifigan.generator_chunked`; the generator's receptive field is
    ~14 mel frames per side, so overlap_frames >= 24 keeps interiors
    bit-equal). Compiles at most three window shapes, each reused for
    any utterance length; the first chunk arrives after one small
    window's latency rather than the whole utterance's."""
    t = mel.shape[0]
    hop = voc_cfg.total_upsampling
    ov = overlap_frames
    kw = dict(compute_dtype=compute_dtype, mrf_impl=mrf_impl,
              pallas_interpret=pallas_interpret)
    if t <= chunk_frames + 2 * ov:
        # short utterance: single window (padded to a fixed small bucket
        # so repeat calls share one executable)
        pad_t = min(bucket_length(t, chunk_frames), chunk_frames + 2 * ov)
        seg = np.zeros((1, pad_t, mel.shape[1]), mel.dtype)
        seg[0, :t] = mel
        wav = _vocode_window(voc_params, jnp.asarray(seg), voc_cfg, **kw)
        yield np.asarray(jax.device_get(wav[0, : t * hop]))
        return
    n_chunks = -(-t // chunk_frames)
    for i in range(n_chunks):
        lo = i * chunk_frames
        hi = min(t, lo + chunk_frames)
        if i == 0:
            seg = mel[: chunk_frames + ov]
            keep_lo = 0
        elif i == n_chunks - 1:
            seg = mel[t - (chunk_frames + ov):]
            keep_lo = (chunk_frames + ov) - (hi - lo)
        else:
            seg = mel[lo - ov : hi + ov]
            keep_lo = ov
        wav = _vocode_window(voc_params, jnp.asarray(seg[None]), voc_cfg, **kw)
        yield np.asarray(
            jax.device_get(wav[0, keep_lo * hop : (keep_lo + hi - lo) * hop])
        )


# ---------------------------------------------------------------------------
# multi-chip synthesis: dp / tp / sp over a ('data', 'model') mesh


@functools.lru_cache(maxsize=None)
def _sharded_synth_fn(mesh, mode, efts_cfg, voc_cfg, t2, compute_dtype):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from efficient_tts_tpu.parallel.mesh import MODEL_AXIS

    tokens = set(mode.split("+"))
    seq_par = "sp" in tokens
    # tp/sp shard channels or time across chips; the packed space-to-depth
    # fast paths fold positions into channels, which would fight those
    # shardings, so they use the plain lowering (single-chip serving keeps
    # the packed production path via synthesize_fixed).
    plain = ("tp" in tokens) or seq_par

    def fn(efts_params, voc_params, text, text_lengths):
        m = model_module_for(efts_cfg)
        e, value, tmask = m.infer_durations(
            efts_params, efts_cfg, text, text_lengths
        )
        mel, _ = m.infer_decode(
            efts_params, efts_cfg, value, e, tmask, t2, compute_dtype=compute_dtype
        )
        last = jnp.take_along_axis(e, (text_lengths - 1)[:, None], axis=1)[:, 0]
        mel_lengths = jnp.clip(jnp.round(last).astype(jnp.int32), 1, t2)
        mel = mel * sequence_mask(mel_lengths, t2, dtype=mel.dtype)[:, :, None]
        if seq_par:
            # shard mel time across chips: GSPMD partitions the conv
            # stacks spatially (halo exchange via collective-permute), so
            # peak per-chip activation memory is O(T2 / model_extent)
            mel = jax.lax.with_sharding_constraint(
                mel, NamedSharding(mesh, P(None, MODEL_AXIS, None))
            )
        wav = hg.generator(
            voc_params,
            mel,
            voc_cfg,
            compute_dtype=compute_dtype,
            mrf_impl="xla",
            pack_small_channels=not plain,
            ups_impl="dilated" if plain else "auto",
        )
        if seq_par:
            wav = jax.lax.with_sharding_constraint(
                wav, NamedSharding(mesh, P(None, MODEL_AXIS))
            )
        wav_lengths = mel_lengths * voc_cfg.hop_size
        wav = wav * sequence_mask(wav_lengths, t2 * voc_cfg.hop_size, dtype=wav.dtype)
        return wav, wav_lengths, mel

    return jax.jit(fn)


def synthesize_fixed_sharded(
    efts_params: dict,
    voc_params: dict,
    text,
    text_lengths,
    efts_cfg: EftsCNNConfig,
    voc_cfg: HiFiGANConfig,
    t2: int,
    mesh,
    mode: str = "dp",
    compute_dtype=None,
):
    """Multi-chip batched synthesis (BASELINE north star: "the HiFi-GAN
    generator sharded across chips when it exceeds one chip's HBM,
    alignment/IMV state exchanged via collectives").

    `mode` is a '+'-joined set of axes to use:
      "dp"     batch over the 'data' axis — throughput scale-out (the
               reference's only strategy, DDP, covers just this case for
               training; it has no batched synthesis at all)
      "tp"     parameter channels over 'model' (`parallel/sharding.py`
               rules) — generator weights/activations split across chips;
               GSPMD inserts the all-gathers/psums
      "sp"     mel/waveform time axis over 'model' — long-utterance
               synthesis where the activation footprint, not the weights,
               exceeds a chip; conv halos ride collective-permute, and the
               alignment-chain tensors ([B, T1, T2] energies, IMV cumsum)
               are partitioned over T2 by propagation
      "dp+tp", "dp+sp"  combinations

    Outputs are numerically identical to `synthesize_fixed` modulo f32
    reassociation (`tests/test_sharded_synthesis.py`). Returns device
    arrays (wav, wav_lengths, mel).
    """
    from efficient_tts_tpu.parallel.sharding import (
        batch_sharding,
        param_sharding,
        replicated,
    )

    unknown = set(mode.split("+")) - {"dp", "tp", "sp"}
    if unknown or not mode:
        raise ValueError(
            f"mode {mode!r}: expected '+'-joined tokens from dp/tp/sp"
        )
    rep = replicated(mesh)
    tokens = set(mode.split("+"))
    if "tp" in tokens:
        efts_params = jax.device_put(efts_params, param_sharding(efts_params, mesh))
        voc_params = jax.device_put(voc_params, param_sharding(voc_params, mesh))
    else:
        efts_params = jax.device_put(efts_params, rep)
        voc_params = jax.device_put(voc_params, rep)
    if "dp" in tokens:
        text = jax.device_put(jnp.asarray(text), batch_sharding(mesh, ndim=2))
        text_lengths = jax.device_put(
            jnp.asarray(text_lengths), batch_sharding(mesh, ndim=1)
        )
    else:
        text = jax.device_put(jnp.asarray(text), rep)
        text_lengths = jax.device_put(jnp.asarray(text_lengths), rep)
    fn = _sharded_synth_fn(mesh, mode, efts_cfg, voc_cfg, t2, compute_dtype)
    return fn(efts_params, voc_params, text, text_lengths)
