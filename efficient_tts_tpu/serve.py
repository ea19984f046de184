"""Production serving: micro-batching TTS engine + stdlib HTTP server.

The reference's only serving surface is a script loop that synthesizes
one utterance at a time (`nntts/bin/inference.py:97-125`). On TPU the
unit of work must be a *batch* at a *static shape* (XLA compiles one
executable per shape), so the engine here:

  * encodes text (char or phone front-end, `efficient_tts_tpu.text`),
  * pads to a small grid of text-length / mel-length buckets
    (`utils.masks.bucket_length`) so the jit cache stays small,
  * groups concurrent requests into micro-batches (up to ``max_batch``,
    padding the tail of a batch with dummy rows),
  * runs the two-stage bucketed pipeline (`pipeline.synthesize_fixed`),
  * trims every waveform to its true length before returning.

`TTSEngine` is transport-agnostic; `DynamicBatcher` adds a background
thread that coalesces single-utterance requests arriving within
``max_wait_ms`` of each other; `serve_http` exposes both over a
dependency-free `http.server` endpoint (JSON in, RIFF/WAV out).
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
import wave
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

log = logging.getLogger(__name__)


class AdmissionError(RuntimeError):
    """Request rejected at admission (bounded queue full). HTTP: 503."""


class DeadlineExceededError(AdmissionError):
    """Request shed because it aged past its queue-wait deadline before
    dispatch. HTTP: 503. Past saturation every admitted request must
    either meet the latency SLO or be shed — an unbounded queue turns
    overload into unbounded latency for everyone (round-4 load bench:
    p50 15-21 s at 96-128 offered QPS)."""


def encode_wav_bytes(wav: np.ndarray, sampling_rate: int) -> bytes:
    """float32 waveform in (-1, 1) — or int16 PCM — -> RIFF/WAV bytes.

    Same output format as the reference's synthesis artifacts
    (22050 Hz PCM_16 per SURVEY.md; `inference.py:115-124`; rounding
    matches libsndfile's float->PCM_16 conversion). int16 input (the
    engine's device-quantized transfer format) passes through."""
    wav = np.asarray(wav)
    if wav.dtype == np.int16:
        pcm = wav.astype("<i2")
    else:
        pcm = np.clip(wav.astype(np.float32), -1.0, 1.0)
        pcm = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sampling_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


@dataclass
class EngineStats:
    requests: int = 0
    batches: int = 0
    audio_seconds: float = 0.0
    compute_seconds: float = 0.0
    batch_sizes: list = field(default_factory=list)
    # per-phase wall attribution (summed over batches; dispatch-side
    # phases and the fetch overlap under pipelining, so these sums can
    # legitimately exceed the wall clock)
    lock_wait_seconds: float = 0.0
    stage1_seconds: float = 0.0  # duration predict + bucket readback
    dispatch_seconds: float = 0.0  # stage-2 jit dispatch (async)
    fetch_seconds: float = 0.0  # device->host waveform transfer wait
    device_seconds: float = 0.0  # only with detailed_timing (blocking)

    def as_dict(self) -> dict:
        mean_b = float(np.mean(self.batch_sizes)) if self.batch_sizes else 0.0
        rtf = self.compute_seconds / max(self.audio_seconds, 1e-9)
        return {
            "requests": self.requests,
            "batches": self.batches,
            "audio_seconds": round(self.audio_seconds, 3),
            "compute_seconds": round(self.compute_seconds, 3),
            "mean_batch_size": round(mean_b, 2),
            "rtf": round(rtf, 6),
            "audio_s_per_s": round(1.0 / max(rtf, 1e-9), 1),
            "lock_wait_seconds": round(self.lock_wait_seconds, 3),
            "stage1_seconds": round(self.stage1_seconds, 3),
            "dispatch_seconds": round(self.dispatch_seconds, 3),
            "fetch_seconds": round(self.fetch_seconds, 3),
            "device_seconds": round(self.device_seconds, 3),
        }


@dataclass
class _BatchHandle:
    """A dispatched-but-not-fetched serving micro-batch."""

    wav: object  # device array [max_batch, t2*hop] (f32 or int16)
    wav_lengths: np.ndarray  # [max_batch] true sample counts (host)
    n: int  # real (non-padding) utterances
    t0: float  # dispatch-entry wall time
    timings: dict  # phase attribution (lock_wait/stage1/dispatch/...)


class TTSEngine:
    """Bucketed batch synthesis around folded (inference-ready) params.

    Thread-safe: a lock serializes device work (one TPU executable runs
    at a time anyway); encoding/trimming happen outside the lock.
    """

    def __init__(
        self,
        efts_params,
        voc_params,
        efts_cfg=None,
        voc_cfg=None,
        *,
        max_batch: int = 16,
        t1_multiple: int = 16,
        max_t1: int = 512,
        t2_multiple: int = 64,
        max_t2: int = 2048,
        compute_dtype=None,
        mrf_impl: str = "auto",
        phone_vocab: dict | None = None,
        cleaner_names=("english_cleaners",),
        mesh=None,
        pcm16_transfer: bool = True,
        pipeline_fetch: bool = True,
        batch_bucketing: bool = True,
        detailed_timing: bool = False,
    ):
        from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
        from efficient_tts_tpu.models.hifigan import HiFiGANConfig

        self.efts_params = efts_params
        self.voc_params = voc_params
        self.efts_cfg = efts_cfg or EftsCNNConfig()
        self.voc_cfg = voc_cfg or HiFiGANConfig()
        self.max_batch = int(max_batch)
        self.t1_multiple = int(t1_multiple)
        self.max_t1 = int(max_t1)
        self.t2_multiple = int(t2_multiple)
        self.max_t2 = int(max_t2)
        self.compute_dtype = compute_dtype
        # multi-chip serving host: utterance micro-batches sharded over
        # the mesh's 'data' axis (its extent must divide max_batch);
        # the packed fast paths stay per-chip-local under pure dp
        self.mesh = mesh
        if mesh is not None:
            import jax

            from efficient_tts_tpu.parallel.sharding import replicated

            if self.max_batch % mesh.shape["data"]:
                raise ValueError(
                    f"max_batch={self.max_batch} not divisible by the "
                    f"mesh data extent {mesh.shape['data']}"
                )
            # place params once; per-batch device_put is then a no-op
            rep = replicated(mesh)
            self.efts_params = jax.device_put(self.efts_params, rep)
            self.voc_params = jax.device_put(self.voc_params, rep)
        if mesh is not None and mrf_impl not in ("auto", "xla"):
            logging.getLogger(__name__).warning(
                "mrf_impl=%r is not supported under a mesh (Pallas calls "
                "are not GSPMD-partitionable); serving with 'xla'", mrf_impl
            )
        self.mrf_impl = mrf_impl if mesh is None else "xla"
        self.phone_vocab = phone_vocab
        self.cleaner_names = tuple(cleaner_names)
        # pcm16_transfer: quantize waveforms to int16 *on device* and move
        # 4x fewer bytes over the (relay-attached) host link; the engine
        # still returns float32 (exactly pcm/32767, so re-encoding to WAV
        # is byte-identical to the device PCM). pipeline_fetch: overlap
        # batch k's device->host transfer with batch k+1's dispatch
        # (the trainers' lagged-fetch pattern; see synthesize_ids and
        # DynamicBatcher's fetch thread). detailed_timing: block after
        # stage-2 dispatch to split device compute from transfer wait —
        # attribution runs only (it defeats pipelining).
        self.pcm16_transfer = bool(pcm16_transfer)
        self.pipeline_fetch = bool(pipeline_fetch)
        self.batch_bucketing = bool(batch_bucketing)
        self.detailed_timing = bool(detailed_timing)
        self.stats = EngineStats()
        self._lock = threading.Lock()
        self._stats_lock = threading.Lock()

    # -- text front-end ----------------------------------------------------

    def encode(self, text: str) -> np.ndarray:
        from efficient_tts_tpu.text import phones_to_sequence, text_to_sequence

        if self.phone_vocab is not None:
            seq = phones_to_sequence(text, self.phone_vocab)
        else:
            seq = text_to_sequence(text, self.cleaner_names)
        if not seq:
            raise ValueError(f"text encodes to an empty sequence: {text!r}")
        if len(seq) > self.max_t1:
            raise ValueError(
                f"text too long: {len(seq)} symbols > max_t1={self.max_t1}"
            )
        return np.asarray(seq, np.int32)

    # -- synthesis ---------------------------------------------------------

    def synthesize_ids(self, seqs: list) -> list:
        """list of int32 id sequences -> list of float32 waveforms.

        With ``pipeline_fetch`` the device->host transfer of each
        micro-batch overlaps the next micro-batch's dispatch."""
        out: list = [None] * len(seqs)

        def drain(lo_handle):
            lo, handle = lo_handle
            for i, w in enumerate(self._fetch_batch(handle)):
                out[lo + i] = w

        pending = None
        for lo in range(0, len(seqs), self.max_batch):
            handle = self._dispatch_batch(seqs[lo : lo + self.max_batch])
            if self.pipeline_fetch:
                if pending is not None:
                    drain(pending)
                pending = (lo, handle)
            else:
                drain((lo, handle))
        if pending is not None:
            drain(pending)
        return out

    def synthesize(self, texts: list) -> list:
        return self.synthesize_ids([self.encode(t) for t in texts])

    def _dispatch_batch(self, seqs: list) -> "_BatchHandle":
        """Pad/bucket a micro-batch and dispatch it; no waveform fetch.

        Holds the engine lock only for the dispatch side: the stage-1
        duration readback (one small RTT, it picks the mel bucket) and
        the async stage-2 dispatch. The bulky waveform transfer happens
        in `_fetch_batch`, outside the lock."""
        from efficient_tts_tpu.pipeline import synthesize_dispatch
        from efficient_tts_tpu.utils.masks import bucket_length

        n = len(seqs)
        lengths = np.asarray([len(s) for s in seqs], np.int32)
        t1 = min(
            bucket_length(int(lengths.max()), self.t1_multiple), self.max_t1
        )
        # bucket the batch dim to the next power of two <= max_batch and
        # pad with dummy rows (length-1, pad symbol); masks zero their
        # contribution and the rows are dropped before returning. A
        # partially-filled batch then pays proportional device compute
        # AND device->host transfer instead of always max_batch's (the
        # round-4 load attribution showed a B=2 gather paying the full
        # B=16 batch: ~7x wasted relay bytes at low offered load). The
        # jit grid grows by the log2(max_batch)+1 batch buckets.
        bb = self.max_batch if not self.batch_bucketing else 1
        while bb < n:
            bb *= 2
        bb = min(bb, self.max_batch)
        if self.mesh is not None:
            # keep the batch dividable over the mesh 'data' axis
            d = self.mesh.shape["data"]
            bb = min(((bb + d - 1) // d) * d, self.max_batch)
        text = np.zeros((bb, t1), np.int32)
        for i, s in enumerate(seqs):
            text[i, : len(s)] = s
        full_lengths = np.ones((bb,), np.int32)
        full_lengths[:n] = lengths

        timings: dict = {}
        t0 = time.perf_counter()
        with self._lock:
            t_lock = time.perf_counter()
            wav, wav_lengths = synthesize_dispatch(
                self.efts_params,
                self.voc_params,
                text,
                full_lengths,
                self.efts_cfg,
                self.voc_cfg,
                bucket_multiple=self.t2_multiple,
                max_t2=self.max_t2,
                compute_dtype=self.compute_dtype,
                mrf_impl=self.mrf_impl,
                mesh=self.mesh,
                output="pcm16" if self.pcm16_transfer else "f32",
                timings=timings,
            )
            if self.detailed_timing:
                # attribution mode: block so fetch measures pure transfer
                import jax

                t_d = time.perf_counter()
                jax.block_until_ready(wav)
                timings["device_block_s"] = time.perf_counter() - t_d
        timings["lock_wait_s"] = t_lock - t0
        return _BatchHandle(wav=wav, wav_lengths=wav_lengths, n=n, t0=t0,
                            timings=timings)

    def _fetch_batch(self, handle: "_BatchHandle") -> list:
        """Fetch a dispatched micro-batch's waveforms (no engine lock)."""
        from efficient_tts_tpu.pipeline import _to_host

        t_f = time.perf_counter()
        wav = _to_host(handle.wav)
        fetch_s = time.perf_counter() - t_f
        wavs = []
        for i in range(handle.n):
            w = wav[i, : int(handle.wav_lengths[i])]
            if w.dtype == np.int16:
                # exact reconstruction of the device quantization; WAV
                # re-encoding (round) recovers the identical PCM bytes
                w = w.astype(np.float32) / 32767.0
            wavs.append(w)
        t = handle.timings
        sr = self.voc_cfg.sampling_rate
        with self._stats_lock:
            s = self.stats
            s.requests += handle.n
            s.batches += 1
            s.batch_sizes.append(handle.n)
            s.audio_seconds += sum(len(w) for w in wavs) / sr
            s.compute_seconds += time.perf_counter() - handle.t0
            s.lock_wait_seconds += t.get("lock_wait_s", 0.0)
            s.stage1_seconds += t.get("stage1_s", 0.0)
            s.dispatch_seconds += t.get("dispatch_s", 0.0)
            s.fetch_seconds += fetch_s
            s.device_seconds += t.get("device_block_s", 0.0)
        return wavs

    def _run_batch(self, seqs: list) -> list:
        """Serial dispatch+fetch of one micro-batch (warmup, tests)."""
        return self._fetch_batch(self._dispatch_batch(seqs))

    def stream(self, text: str, chunk_frames: int = 64, overlap_frames: int = 24):
        """Yield float32 waveform chunks for one utterance.

        Time-to-first-audio is one mel decode plus one small vocoder
        window instead of the whole utterance: the text is decoded to a
        bucketed mel (stage 1+2), then the mel is vocoded window-by-window
        (`pipeline.stream_vocoder`, exact w.r.t. the full generator pass;
        interior chunks need overlap_frames >= the generator's ~14-frame
        receptive field)."""
        from efficient_tts_tpu.pipeline import decode_mel_fixed, stream_vocoder
        from efficient_tts_tpu.utils.masks import bucket_length

        seq = self.encode(text)
        t1 = min(bucket_length(len(seq), self.t1_multiple), self.max_t1)
        text_ids = np.zeros((1, t1), np.int32)
        text_ids[0, : len(seq)] = seq
        lengths = np.asarray([len(seq)], np.int32)

        t0 = time.perf_counter()
        # stage 1+2 at a coarse bucket, then trim the host mel to a fine
        # bucket of the true length (zero mel frames beyond L, the
        # batched-pipeline tail semantic). Only the decode holds the
        # engine lock — window vocoding interleaves with batch traffic
        # (jit dispatch is thread-safe; the device serializes).
        import jax

        with self._lock:
            mel, mel_len = decode_mel_fixed(
                self.efts_params, text_ids, lengths, self.efts_cfg, self.max_t2,
                compute_dtype=self.compute_dtype,
            )
            L = int(jax.device_get(mel_len)[0])
        lb = min(bucket_length(L, 32), self.max_t2)
        mel_host = np.asarray(jax.device_get(mel[0, :lb]))

        hop = self.voc_cfg.hop_size
        remaining = L * hop
        for piece in stream_vocoder(
            self.voc_params,
            mel_host,
            self.voc_cfg,
            chunk_frames=chunk_frames,
            overlap_frames=overlap_frames,
            compute_dtype=self.compute_dtype,
            mrf_impl=self.mrf_impl,
        ):
            if remaining <= 0:
                break
            piece = piece[: max(remaining, 0)]
            remaining -= len(piece)
            if len(piece):
                yield piece
        dt = time.perf_counter() - t0
        self.stats.requests += 1
        self.stats.batches += 1
        self.stats.batch_sizes.append(1)
        self.stats.audio_seconds += L * hop / self.voc_cfg.sampling_rate
        self.stats.compute_seconds += dt

    def warmup(
        self,
        t1_lengths=(16, 64),
        text_id: int = 1,
        batch_buckets=None,
        t2_neighbors: int = 1,
    ) -> None:
        """Pre-compile the jit grid the dispatcher actually serves.

        The dispatcher buckets THREE axes: text length t1 (multiples of
        ``t1_multiple``), mel length t2 (multiples of ``t2_multiple``,
        chosen per batch from predicted durations), and — with
        ``batch_bucketing`` — the batch dim to powers of two up to
        ``max_batch``. A warmup that compiles only B=1 leaves every
        loaded batch bucket cold (round-4's 8-QPS p50 of 4.5 s was
        exactly this). For each (batch bucket, t1) this compiles the
        organic t2 bucket the duration predictor emits for dummy text,
        plus ``t2_neighbors`` buckets on either side to absorb the
        duration spread of real text at the same t1.

        Resets the stats counters afterwards so compile time doesn't
        pollute the served RTF."""
        from efficient_tts_tpu.pipeline import synthesize_fixed
        from efficient_tts_tpu.utils.masks import bucket_length

        if batch_buckets is None:
            if self.batch_bucketing:
                batch_buckets, bb = [], 1
                while bb < self.max_batch:
                    batch_buckets.append(bb)
                    bb *= 2
                batch_buckets.append(self.max_batch)
            else:
                batch_buckets = [self.max_batch]
        if self.mesh is not None:
            # the dispatcher rounds batch buckets up to a multiple of the
            # mesh 'data' extent; warm the grid it actually emits
            d = self.mesh.shape["data"]
            batch_buckets = sorted({
                min(((b + d - 1) // d) * d, self.max_batch)
                for b in batch_buckets
            })
        for t1 in t1_lengths:
            t1 = min(t1, self.max_t1)
            organic_t2 = None
            for nb in batch_buckets:
                seqs = [np.full((t1,), text_id, np.int32)] * nb
                handle = self._dispatch_batch(seqs)
                organic_t2 = int(handle.timings.get("t2", 0)) or None
                self._fetch_batch(handle)
            if not t2_neighbors or organic_t2 is None:
                continue
            # neighbor t2 buckets at every batch bucket (stage 2 only;
            # stage 1 is t2-independent and already compiled above)
            t2s = [
                organic_t2 + d * self.t2_multiple
                for d in range(-t2_neighbors, t2_neighbors + 1)
                if d != 0
            ]
            t2s = sorted({
                min(max(t2, self.t2_multiple), self.max_t2) for t2 in t2s
            } - {organic_t2})
            t1b = min(bucket_length(t1, self.t1_multiple), self.max_t1)
            for nb in batch_buckets:
                text = np.full((nb, t1b), 0, np.int32)
                text[:, :t1] = text_id
                lengths = np.full((nb,), t1, np.int32)
                if self.mesh is not None:
                    import jax

                    from efficient_tts_tpu.parallel.sharding import (
                        batch_sharding,
                    )

                    text = jax.device_put(
                        text, batch_sharding(self.mesh, ndim=2)
                    )
                    lengths = jax.device_put(
                        lengths, batch_sharding(self.mesh, ndim=1)
                    )
                for t2 in t2s:
                    wav, _, _ = synthesize_fixed(
                        self.efts_params, self.voc_params, text, lengths,
                        self.efts_cfg, self.voc_cfg, t2,
                        compute_dtype=self.compute_dtype,
                        mrf_impl=self.mrf_impl,
                        output="pcm16" if self.pcm16_transfer else "f32",
                    )
                    import jax

                    jax.block_until_ready(wav)
        self.stats = EngineStats()


class DynamicBatcher:
    """Coalesce concurrent single requests into engine micro-batches.

    `submit(text)` returns a `concurrent.futures.Future` resolving to a
    float32 waveform. A worker thread drains the queue: it blocks for
    the first request, then keeps gathering until ``max_batch`` requests
    are pending or ``max_wait_ms`` has elapsed since the first one.
    """

    _STOP = object()

    def __init__(self, engine, max_batch: int | None = None,
                 max_wait_ms: float = 10.0, pipeline_depth: int = 2,
                 sort_ahead: int = 3, max_queue: int | None = None,
                 deadline_ms: float | None = None):
        self.engine = engine
        self.max_batch = max_batch or engine.max_batch
        self.max_wait = max_wait_ms / 1000.0
        # pipelined engines: gather up to sort_ahead*max_batch requests
        # per window and sort them by length before chunking into
        # micro-batches (see _loop) — under backlog this produces
        # length-homogeneous full batches at no added wait
        self.sort_ahead = max(1, int(sort_ahead))
        # Admission control: `max_queue` bounds the number of pending
        # requests (submit raises AdmissionError when full -> HTTP 503);
        # `deadline_ms` bounds queue WAIT — a gathered request older
        # than this is shed with DeadlineExceededError instead of
        # dispatched, so latency for admitted traffic stays
        # ~deadline + one batch's service time no matter the offered
        # load. Both default off (reference-compatible unbounded
        # behavior for library users; the HTTP server turns them on).
        self.max_queue = max_queue
        self.deadline = deadline_ms / 1000.0 if deadline_ms else None
        self.shed_full = 0  # rejected at submit (queue full)
        self.shed_deadline = 0  # shed after admission (aged out)
        self._q: queue.Queue = queue.Queue(maxsize=max_queue or 0)
        # dispatch->fetch pipeline: the gather thread dispatches batches
        # to the device and hands them to a fetch thread, so batch k's
        # device->host waveform transfer overlaps batch k+1's dispatch
        # and device compute. pipeline_depth bounds dispatch-ahead
        # (backpressure keeps device-queue latency in check). Engines
        # without the dispatch/fetch split (plain synthesize_ids duck
        # type) run the old serial path.
        self._pipelined = (
            getattr(engine, "pipeline_fetch", False)
            and hasattr(engine, "_dispatch_batch")
            # one gathered batch must fit one engine micro-batch
            and self.max_batch <= getattr(engine, "max_batch", 0)
        )
        self._fetch_q: queue.Queue = queue.Queue(maxsize=max(1, pipeline_depth))
        self._fetch_thread = None
        if self._pipelined:
            self._fetch_thread = threading.Thread(
                target=self._fetch_loop, daemon=True
            )
            self._fetch_thread.start()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, text: str) -> Future:
        fut: Future = Future()
        item = (text, fut, time.perf_counter())
        if self.max_queue:
            try:
                self._q.put_nowait(item)
            except queue.Full:
                self.shed_full += 1
                raise AdmissionError(
                    f"request queue full ({self.max_queue} pending)"
                ) from None
        else:
            self._q.put(item)
        return fut

    def close(self) -> None:
        self._q.put(self._STOP)
        self._thread.join(timeout=5)
        if self._fetch_thread is not None:
            self._fetch_thread.join(timeout=5)

    def _gather(self):
        first = self._q.get()
        if first is self._STOP:
            return None
        items = [first]
        limit = self.max_batch * (self.sort_ahead if self._pipelined else 1)
        deadline = time.perf_counter() + self.max_wait
        while len(items) < limit:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is self._STOP:
                self._q.put(self._STOP)  # re-post for the outer loop
                break
            items.append(nxt)
        return items

    def _length_groups(self, items: list, ratio: float = 0.7) -> list:
        """Split a desc-length-sorted chunk into groups whose padded
        (batch-bucket x length-bucket) transfer cost is lower than the
        single mixed batch's — mel frames scale with symbol count, so
        symbol length is the cost proxy. Returns list of item groups."""
        if len(items) <= 1:
            return [items]
        groups = [[items[0]]]
        for it in items[1:]:
            if len(it[0]) < ratio * len(groups[-1][0][0]):
                groups.append([it])
            else:
                groups[-1].append(it)
        if len(groups) == 1:
            return groups

        def pow2(n):
            b = 1
            while b < n:
                b *= 2
            return b

        m = getattr(self.engine, "t1_multiple", 16)

        def cost(gs):
            return sum(pow2(len(g)) * (-(-len(g[0][0]) // m)) for g in gs)

        merged = [groups[0]]
        for g in groups[1:]:
            if cost([merged[-1] + g]) <= cost([merged[-1], g]):
                merged[-1] = merged[-1] + g
            else:
                merged.append(g)
        return merged

    def _loop(self) -> None:
        while True:
            items = self._gather()
            if items is None:
                if self._fetch_thread is not None:
                    self._fetch_q.put(self._STOP)
                return
            # deadline shedding: a request that already waited past its
            # deadline gets a fast 503 instead of aging further in a
            # batch — bounded latency for what remains admitted
            if self.deadline is not None:
                now = time.perf_counter()
                fresh = []
                for text, fut, ts in items:
                    waited = now - ts
                    if waited > self.deadline:
                        self.shed_deadline += 1
                        fut.set_exception(DeadlineExceededError(
                            f"queue wait {waited * 1e3:.0f} ms exceeded "
                            f"deadline {self.deadline * 1e3:.0f} ms"
                        ))
                    else:
                        fresh.append((text, fut, ts))
                items = fresh
                if not items:
                    continue
            # encode per request so one bad text fails only its own future
            # instead of poisoning the whole coalesced batch
            good: list = []
            for text, fut, _ts in items:
                try:
                    good.append((self.engine.encode(text), fut))
                except Exception as e:  # noqa: BLE001
                    fut.set_exception(e)
            if not good:
                continue
            if self._pipelined:
                # Every row of a micro-batch is synthesized AND
                # transferred at the batch's T2 bucket, so mixing a 2 s
                # and an 8 s utterance makes the short row pay ~4x its
                # bytes over the host link — and the round-4 load
                # attribution showed saturation throughput IS the link
                # bandwidth. Sort the (up to sort_ahead*max_batch)
                # gathered requests by length, chunk into micro-batches,
                # and split residual in-chunk spread into homogeneous
                # groups; with the engine's batch-dim bucketing the
                # padding becomes real audio-s/s.
                good.sort(key=lambda it: len(it[0]), reverse=True)
                for lo in range(0, len(good), self.max_batch):
                    for group in self._length_groups(
                        good[lo : lo + self.max_batch]
                    ):
                        futs = [f for _, f in group]
                        try:
                            handle = self.engine._dispatch_batch(
                                [s for s, _ in group]
                            )
                        except Exception as e:  # noqa: BLE001
                            for f in futs:
                                f.set_exception(e)
                            continue
                        self._fetch_q.put((handle, futs))
                continue
            futs = [f for _, f in good]
            seqs = [s for s, _ in good]
            try:
                wavs = self.engine.synthesize_ids(seqs)  # serial fallback
            except Exception as e:  # noqa: BLE001 - propagate per-request
                for f in futs:
                    f.set_exception(e)
                continue
            for f, w in zip(futs, wavs):
                f.set_result(w)

    def _fetch_loop(self) -> None:
        while True:
            item = self._fetch_q.get()
            if item is self._STOP:
                return
            handle, futs = item
            try:
                wavs = self.engine._fetch_batch(handle)
            except Exception as e:  # noqa: BLE001
                for f in futs:
                    f.set_exception(e)
                continue
            for f, w in zip(futs, wavs):
                f.set_result(w)


def make_http_server(engine, host: str = "0.0.0.0", port: int = 8080,
                     max_wait_ms: float = 10.0,
                     max_request_bytes: int = 1 << 20,
                     max_queue: int | None = 256,
                     deadline_ms: float | None = 10_000.0):
    """Build (without starting) a ThreadingHTTPServer around the engine.

    Endpoints:
      POST /synthesize          {"text": "..."}   -> audio/wav
      POST /synthesize_stream   {"text": "..."}   -> chunked raw PCM_16
           (headers X-Sample-Rate / X-Audio-Format: pcm_s16le; first
           chunk arrives after one vocoder window, not the whole utt)
      GET  /healthz                               -> {"ok": true}
      GET  /stats                                 -> engine counters
                                                     + shed counters

    Error contract: malformed JSON / missing-non-string-empty `text` /
    bodies over ``max_request_bytes`` / text the front-end rejects
    (empty encoding, > max_t1 symbols) are CLIENT errors (400/413);
    overload (queue full at admission, or queue wait past
    ``deadline_ms``) is 503 with Retry-After — the server bounds
    latency for admitted traffic and sheds the rest; only unexpected
    engine failures return 500. ``max_queue=None``/``deadline_ms=None``
    disable the respective bound.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = DynamicBatcher(engine, max_wait_ms=max_wait_ms,
                             max_queue=max_queue, deadline_ms=deadline_ms)
    sr = engine.voc_cfg.sampling_rate

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # required for chunked streaming

        def log_message(self, fmt, *args):  # route through logging
            log.debug("http: " + fmt, *args)

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                d = engine.stats.as_dict()
                d["shed_queue_full"] = batcher.shed_full
                d["shed_deadline"] = batcher.shed_deadline
                self._json(200, d)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/synthesize", "/synthesize_stream"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._json(400, {"error": "bad Content-Length"})
                return
            if n > max_request_bytes:
                # drain nothing; reject before reading an oversized body
                self._json(413, {"error": (
                    f"request body {n} bytes > limit {max_request_bytes}"
                )})
                self.close_connection = True
                return
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
            except (ValueError, KeyError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            if not isinstance(text, str) or not text.strip():
                self._json(400, {"error": "'text' must be a non-empty string"})
                return
            if self.path == "/synthesize_stream":
                self._stream(text)
                return
            try:
                wav = batcher.submit(text).result(timeout=120)
            except AdmissionError as e:  # overload: shed, tell when to retry
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(503)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            except ValueError as e:  # front-end rejection: client error
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})
                return
            body = encode_wav_bytes(wav, sr)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream(self, text: str) -> None:
            try:
                chunks = engine.stream(text)
                first = next(chunks)  # validate before committing to 200
            except ValueError as e:  # front-end rejection: client error
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Audio-Format", "pcm_s16le")
            self.send_header("X-Sample-Rate", str(sr))
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(wav_piece: np.ndarray) -> None:
                pcm = np.clip(wav_piece, -1.0, 1.0)
                data = (pcm * 32767.0).astype("<i2").tobytes()
                self.wfile.write(f"{len(data):x}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            try:
                write_chunk(first)
                for piece in chunks:
                    write_chunk(piece)
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError):
                log.debug("stream client disconnected")

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # for shutdown
    return server


def serve_forever(server) -> None:
    log.info("serving on %s:%d", *server.server_address)
    try:
        server.serve_forever()
    finally:
        server.batcher.close()
        server.server_close()
