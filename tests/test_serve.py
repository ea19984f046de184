"""Serving engine: micro-batching, trimming, HTTP round-trip."""

import io
import json
import threading
import urllib.request
import wave

import numpy as np
import jax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.models.hifigan import HiFiGANConfig
from efficient_tts_tpu.nn.layers import fold_weight_norm
from efficient_tts_tpu.serve import (
    DynamicBatcher,
    TTSEngine,
    encode_wav_bytes,
    make_http_server,
)

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


def _engine(max_batch=4):
    return TTSEngine(
        fold_weight_norm(efts.init(jax.random.PRNGKey(0), EFTS_CFG)),
        fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG)),
        EFTS_CFG,
        VOC_CFG,
        max_batch=max_batch,
        t2_multiple=32,
    )


def test_engine_synthesize_batches_and_trims():
    eng = _engine(max_batch=2)
    texts = ["Hello there.", "A much longer sentence to synthesize, really.", "Hi."]
    wavs = eng.synthesize(texts)
    assert len(wavs) == 3
    for w in wavs:
        assert w.dtype == np.float32 and w.ndim == 1 and len(w) > 0
        assert len(w) % VOC_CFG.hop_size == 0
    # longer text -> longer audio (monotone in this untrained-net regime is
    # not guaranteed utterance-to-utterance, but 3 chars vs 46 chars is)
    assert len(wavs[1]) > len(wavs[2])
    # 3 texts at max_batch=2 -> 2 micro-batches
    assert eng.stats.batches == 2 and eng.stats.requests == 3


def test_engine_batch_padding_invariance():
    """A request must get identical audio whether it shared its batch with
    dummy padding rows or with other real utterances."""
    eng = _engine(max_batch=4)
    ids = eng.encode("The same utterance.")
    solo = eng.synthesize_ids([ids])[0]
    group = eng.synthesize_ids([ids, eng.encode("Another one entirely."), ids])
    np.testing.assert_allclose(solo, group[0], atol=1e-4)
    np.testing.assert_allclose(solo, group[2], atol=1e-4)


def test_engine_rejects_bad_text():
    eng = _engine()
    try:
        eng.encode("")
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_dynamic_batcher_coalesces():
    calls = []

    class FakeEngine:
        # batcher contract: per-request encode (so a bad text fails only
        # its own future) + batched synthesize_ids (serve.py:340-360)
        max_batch = 8

        def encode(self, text):
            return np.arange(len(text))

        def synthesize_ids(self, seqs):
            calls.append(list(seqs))
            return [np.full((len(s),), 0.5, np.float32) for s in seqs]

    b = DynamicBatcher(FakeEngine(), max_wait_ms=200.0)
    futs = [b.submit(t) for t in ["aa", "bbb", "c", "dddd"]]
    outs = [f.result(timeout=10) for f in futs]
    b.close()
    # results map back to their own request
    for t, o in zip(["aa", "bbb", "c", "dddd"], outs):
        assert len(o) == len(t)
    # the 200 ms window coalesced the burst into fewer batches than requests
    assert len(calls) < 4
    assert sum(len(c) for c in calls) == 4


def test_dynamic_batcher_propagates_errors():
    class Boom:
        max_batch = 4

        def encode(self, text):
            return np.arange(1)

        def synthesize_ids(self, seqs):
            raise RuntimeError("kaput")

    b = DynamicBatcher(Boom(), max_wait_ms=1.0)
    fut = b.submit("x")
    try:
        fut.result(timeout=10)
        raised = False
    except RuntimeError:
        raised = True
    b.close()
    assert raised


def test_encode_wav_bytes_roundtrip():
    wav = np.sin(np.linspace(0, 40, 2205)).astype(np.float32) * 0.4
    data = encode_wav_bytes(wav, 22050)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, wav, atol=1e-4)


def test_http_server_roundtrip():
    eng = _engine(max_batch=2)
    server = make_http_server(eng, host="127.0.0.1", port=0, max_wait_ms=5.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

        req = urllib.request.Request(
            base + "/synthesize",
            data=json.dumps({"text": "Hello server."}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == VOC_CFG.sampling_rate
            assert w.getnframes() > 0

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 1 and stats["batches"] == 1

        # bad request -> 400
        bad = urllib.request.Request(
            base + "/synthesize", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()
        t.join(timeout=5)


def test_stream_vocoder_matches_full_pass():
    """Chunked streaming must reproduce the full generator pass exactly
    on interiors (same guarantee as generator_chunked)."""
    import jax.numpy as jnp
    from efficient_tts_tpu.pipeline import stream_vocoder

    voc_params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG))
    mel = np.random.default_rng(0).standard_normal((150, VOC_CFG.num_mels)).astype(
        np.float32
    )
    full = np.asarray(hg.generator(voc_params, jnp.asarray(mel[None]), VOC_CFG))[0]
    pieces = list(
        stream_vocoder(voc_params, mel, VOC_CFG, chunk_frames=48, overlap_frames=24)
    )
    assert len(pieces) > 1
    streamed = np.concatenate(pieces)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_engine_stream_matches_batch():
    eng = _engine(max_batch=2)
    text = "A reasonably long sentence for streaming synthesis to chunk up."
    batch_wav = eng.synthesize([text])[0]
    pieces = list(eng.stream(text, chunk_frames=8, overlap_frames=8))
    streamed = np.concatenate(pieces)
    assert len(pieces) > 1
    assert len(streamed) == len(batch_wav)
    # interiors are exact; the last ~receptive-field frames differ between
    # the exact-edge streaming window and the zero-mel-padded batch bucket
    n = len(batch_wav) - 20 * VOC_CFG.hop_size
    np.testing.assert_allclose(streamed[:n], batch_wav[:n], atol=1e-4)


def test_http_stream_roundtrip():
    eng = _engine(max_batch=2)
    server = make_http_server(eng, host="127.0.0.1", port=0, max_wait_ms=5.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        text = "Streaming over HTTP with chunked transfer encoding."
        req = urllib.request.Request(
            base + "/synthesize_stream",
            data=json.dumps({"text": text}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["X-Audio-Format"] == "pcm_s16le"
            assert int(r.headers["X-Sample-Rate"]) == VOC_CFG.sampling_rate
            raw = r.read()
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
        assert len(pcm) > 0 and len(pcm) % VOC_CFG.hop_size == 0
        # must match the non-streamed endpoint (PCM16 quantization tol),
        # except the final receptive-field tail (exact-edge vs zero-pad)
        direct = eng.synthesize([text])[0]
        assert len(pcm) == len(direct)
        n = len(direct) - 20 * VOC_CFG.hop_size
        np.testing.assert_allclose(pcm[:n], direct[:n], atol=2e-4)
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()
        t.join(timeout=5)


def test_engine_mesh_data_parallel_matches_single_chip():
    """TTSEngine(mesh=...) shards serving micro-batches over the 'data'
    axis; outputs must equal the single-device engine's."""
    from efficient_tts_tpu.parallel.mesh import make_mesh

    texts = ["Hello there.", "A longer test sentence, with a comma.",
             "Short.", "Numbers like 42 work."]
    ref = _engine(max_batch=4).synthesize(texts)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    eng = TTSEngine(
        fold_weight_norm(efts.init(jax.random.PRNGKey(0), EFTS_CFG)),
        fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG)),
        EFTS_CFG,
        VOC_CFG,
        max_batch=4,
        t2_multiple=32,
        mesh=mesh,
    )
    out = eng.synthesize(texts)
    assert len(out) == len(ref)
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)
