"""Pipelined serving: PCM16 device transfer, dispatch/fetch overlap.

Round-4 serving rework (PERF.md "loaded serving" attribution): the
engine quantizes waveforms to int16 on device (4x fewer relay bytes),
fetches outside the engine lock, and overlaps batch k's device->host
transfer with batch k+1's dispatch (TTSEngine.synthesize_ids and
DynamicBatcher's fetch thread). These tests pin the semantics: the fast
path must be output-equivalent to the serial f32 path.
"""

import numpy as np
import jax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.nn.layers import fold_weight_norm
from efficient_tts_tpu.serve import DynamicBatcher, TTSEngine, encode_wav_bytes

EFTS_CFG = EftsCNNConfig(
    num_symbols=148,
    symbol_embedding_dim=32,
    n_channels=32,
    n_text_encoder_layer=1,
    n_mel_encoder_layer=1,
    n_decoder_layer=1,
    dropout_rate=0.0,
    use_masking=True,
)
VOC_CFG = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)
TEXTS = [
    "Hello there.",
    "A somewhat longer sentence to synthesize.",
    "Hi.",
    "Numbers like 42 still work fine.",
    "Final short one.",
]


def _engine(**kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("t2_multiple", 32)
    return TTSEngine(
        fold_weight_norm(efts.init(jax.random.PRNGKey(0), EFTS_CFG)),
        fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG)),
        EFTS_CFG,
        VOC_CFG,
        **kw,
    )


def test_pcm16_engine_matches_f32_engine():
    """Device-side int16 quantization must agree with the f32 path to
    half a PCM16 LSB (1/65534), and produce byte-identical WAV files."""
    fast = _engine(pcm16_transfer=True)
    slow = _engine(pcm16_transfer=False)
    for a, b in zip(fast.synthesize(TEXTS[:3]), slow.synthesize(TEXTS[:3])):
        assert a.dtype == np.float32 and b.dtype == np.float32
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5)
        assert encode_wav_bytes(a, 22050) == encode_wav_bytes(b, 22050)


def test_pipelined_multi_chunk_matches_serial():
    """pipeline_fetch overlaps fetch k with dispatch k+1; outputs must be
    identical to the serial engine's across several micro-batches."""
    fast = _engine(pipeline_fetch=True)
    slow = _engine(pipeline_fetch=False)
    out_fast = fast.synthesize(TEXTS)  # 5 texts @ max_batch=2 -> 3 chunks
    out_slow = slow.synthesize(TEXTS)
    assert fast.stats.batches == 3 and slow.stats.batches == 3
    for a, b in zip(out_fast, out_slow):
        np.testing.assert_array_equal(a, b)


def test_dispatch_fetch_split_roundtrip():
    """_dispatch_batch/_fetch_batch compose to _run_batch, and the
    host-computed wav_lengths match the fetched trim lengths."""
    eng = _engine()
    seqs = [eng.encode(t) for t in TEXTS[:2]]
    handle = eng._dispatch_batch(seqs)
    assert handle.n == 2
    assert handle.wav_lengths.shape[0] == eng.max_batch
    wavs = eng._fetch_batch(handle)
    for w, L in zip(wavs, handle.wav_lengths[:2]):
        assert len(w) == int(L)
    direct = _engine()._run_batch(seqs)
    for a, b in zip(wavs, direct):
        np.testing.assert_array_equal(a, b)


def test_stats_phase_attribution_populated():
    eng = _engine(detailed_timing=True)
    eng.synthesize(TEXTS[:3])
    s = eng.stats.as_dict()
    for key in ("lock_wait_seconds", "stage1_seconds", "dispatch_seconds",
                "fetch_seconds", "device_seconds"):
        assert key in s and s[key] >= 0.0
    # detailed_timing blocks on the device, so it must record real time
    assert eng.stats.device_seconds > 0.0
    assert eng.stats.stage1_seconds > 0.0
    assert eng.stats.fetch_seconds >= 0.0


def test_batcher_uses_pipelined_path():
    eng = _engine(max_batch=4)
    b = DynamicBatcher(eng, max_wait_ms=50.0)
    assert b._pipelined
    try:
        futs = [b.submit(t) for t in TEXTS]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        b.close()
    ref = _engine(max_batch=4).synthesize(TEXTS)
    assert len(outs) == len(ref)
    for o, r, t in zip(outs, ref, TEXTS):
        # same text through the same engine params: identical audio
        # regardless of which coalesced batch it landed in, up to batch
        # padding effects already bounded at 1e-4 by test_serve.py
        assert abs(len(o) - len(r)) == 0
        np.testing.assert_allclose(o, r, atol=1e-4)


def test_batcher_fetch_thread_error_propagates():
    eng = _engine()
    b = DynamicBatcher(eng, max_wait_ms=1.0)
    assert b._pipelined

    def boom(handle):
        raise RuntimeError("fetch kaput")

    eng._fetch_batch = boom
    fut = b.submit("Hello.")
    try:
        fut.result(timeout=120)
        raised = False
    except RuntimeError:
        raised = True
    finally:
        b.close()
    assert raised


def test_encode_wav_bytes_int16_passthrough():
    pcm = (np.sin(np.linspace(0, 40, 1000)) * 12000).astype(np.int16)
    data = encode_wav_bytes(pcm, 22050)
    import io
    import wave

    with wave.open(io.BytesIO(data)) as w:
        back = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_array_equal(back, pcm)


def test_synthesize_dispatch_equals_synthesize():
    from efficient_tts_tpu.pipeline import _to_host, synthesize, synthesize_dispatch

    params = fold_weight_norm(efts.init(jax.random.PRNGKey(0), EFTS_CFG))
    voc = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG))
    rng = np.random.default_rng(0)
    text = rng.integers(1, 76, size=(2, 24)).astype(np.int32)
    tl = np.asarray([24, 17], np.int32)
    ref_wav, ref_len = synthesize(params, voc, text, tl, EFTS_CFG, VOC_CFG,
                                  bucket_multiple=32)
    timings: dict = {}
    wav_dev, lens = synthesize_dispatch(
        params, voc, text, tl, EFTS_CFG, VOC_CFG, bucket_multiple=32,
        timings=timings,
    )
    np.testing.assert_array_equal(_to_host(wav_dev), ref_wav)
    np.testing.assert_array_equal(lens, ref_len)
    assert timings["stage1_s"] > 0 and timings["dispatch_s"] > 0
    assert timings["t2"] % 32 == 0


def test_batch_bucketing_matches_full_pad():
    """Batch-dim bucketing (pad to next pow2 <= max_batch) must be
    waveform-identical to always padding to max_batch: dummy rows are
    masked out of every stage."""
    e_bucket = _engine(max_batch=8)
    e_full = _engine(max_batch=8, batch_bucketing=False)
    seqs = [e_bucket.encode(t) for t in TEXTS[:3]]
    h = e_bucket._dispatch_batch(seqs)
    assert np.asarray(h.wav).shape[0] == 4  # 3 -> pow2 bucket 4
    h_full = e_full._dispatch_batch(seqs)
    assert np.asarray(h_full.wav).shape[0] == 8
    w_a = e_bucket._fetch_batch(h)
    w_b = e_full._fetch_batch(h_full)
    for a, b in zip(w_a, w_b):
        np.testing.assert_array_equal(a, b)


def test_length_groups_partition_and_order():
    class _E:  # duck engine for the grouping policy only
        t1_multiple = 16

    b = DynamicBatcher.__new__(DynamicBatcher)
    b.engine = _E()
    # 140/90/40-symbol classes, desc-sorted as _loop provides
    items = [(np.zeros(n, np.int32), object()) for n in
             (140, 139, 90, 89, 88, 40, 39)]
    groups = DynamicBatcher._length_groups(b, items)
    # every item appears exactly once, order within groups preserved
    flat = [it for g in groups for it in g]
    assert [id(f[1]) for f in flat] == [id(i[1]) for i in items]
    assert len(groups) >= 2  # the 3.5x spread must split somewhere
    for g in groups:  # groups stay desc-sorted; max is first
        lens = [len(s) for s, _ in g]
        assert lens == sorted(lens, reverse=True)
    # near-homogeneous input must NOT split
    near = [(np.zeros(n, np.int32), object()) for n in (100, 99, 98, 97)]
    assert len(DynamicBatcher._length_groups(b, near)) == 1


def test_batcher_sorted_groups_end_to_end():
    """Mixed-length concurrent submits through the sort-ahead batcher
    resolve to the same waveforms as direct synthesis."""
    eng = _engine(max_batch=4)
    want = {t: w for t, w in zip(TEXTS, eng.synthesize(list(TEXTS)))}
    batcher = DynamicBatcher(eng, max_wait_ms=50.0)
    futs = {t: batcher.submit(t) for t in TEXTS}
    try:
        for t, f in futs.items():
            np.testing.assert_array_equal(f.result(timeout=120), want[t])
    finally:
        batcher.close()
