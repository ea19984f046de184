"""Mandarin-path learning sanity: synthetic tone-bearing corpus through
the real DataBaker front-end (`text/mandarin.py`).

The reference claims the DataBaker recipe is config-only on top of the LJ
machinery (`/root/reference/README.md:7`); its front-end splits pinyin
into initial/final phones with separate tone tokens
(`parse_pronounce.py:42-65`). Here we synthesize DataBaker-style
pronunciation lines, run them through `parse_sent` (the actual
production parser: _HEAD/_TAIL, _SPS_SEG syllable markers, word-boundary
tokens), map tokens to ids, and give every token a deterministic
spectral pattern — phones 8 frames, tones and structural markers 2
frames, so the corpus has VARIABLE per-token durations (unlike the
English sanity's fixed 8). A short EFTS-CNN run must then discover the
monotonic alignment, learn the 8-vs-2 duration split per token class,
and decode the patterns.

Run: python scripts/sanity_mandarin.py [--steps 1500]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.text.mandarin import parse_sent
from efficient_tts_tpu.train.efts_train_step import make_train_step
from efficient_tts_tpu.train.optim import adam_warmup
from efficient_tts_tpu.train.state import create_state

N_MELS = 80
PHONE_FRAMES = 8
MARKER_FRAMES = 2  # tones, _SPS_SEG, _HEAD/_TAIL, word segs, punct

INITIALS = ["b", "zh", "sh", "m", "l", "x", "q", "h"]
FINALS = ["a", "ang", "ei", "ong", "u", "ing", "e", "ou"]
TONES = "12345"
PUNCTS = ["0", "0", "0", "dh"]  # mostly none, sometimes a pause mark


def gen_pronoun_lines(rng) -> list:
    """Random DataBaker-style pronunciation lines: a sentence of 1-3
    words, each word 1-2 syllables. Line format consumed by
    `parse_line`: ... punct(col 3) ... seg_sign(col -2) pinyin(col -1)."""
    lines = []
    for _ in range(int(rng.integers(1, 4))):
        n_syll = int(rng.integers(1, 3))
        sylls = []
        for _ in range(n_syll):
            ini = INITIALS[rng.integers(len(INITIALS))]
            fin = FINALS[rng.integers(len(FINALS))]
            tone = TONES[rng.integers(len(TONES))]
            sylls.append(f"{ini}-{fin}{tone}")
        punct = PUNCTS[rng.integers(len(PUNCTS))]
        seg = f"#{int(rng.integers(1, 4))}"
        lines.append(f"w x y {punct} z {seg} {'|'.join(sylls)}")
    return lines


def build_vocab() -> dict:
    """Deterministic token->id covering everything the parser can emit
    (analog of cn_phn_set_from_txdata.txt; id 0 = pad)."""
    toks = ["<pad>"]
    toks += ["_HEAD", "_TAIL", "_SPS_SEG"]
    toks += [f"_WORD_SEG#{i}" for i in range(1, 4)]
    toks += [f"_WORD_SEG#{i}_E" for i in range(1, 4)]  # sentence-final promotion
    toks += ["_DH", "_DH_E", "_JH_E"]
    toks += list(TONES)
    toks += sorted(set(INITIALS) | set(FINALS))
    return {t: i for i, t in enumerate(toks)}


def is_phone(token: str, vocab_inv: dict) -> bool:
    return not token.startswith("_") and token not in TONES


def make_batch(rng, vocab, patterns, b=16, t1_max=28, noise=0.05):
    inv = {i: t for t, i in vocab.items()}
    t2_max = t1_max * PHONE_FRAMES
    text = np.zeros((b, t1_max), np.int32)
    mel = np.zeros((b, t2_max, N_MELS), np.float32)
    t1s = np.zeros((b,), np.int32)
    t2s = np.zeros((b,), np.int32)
    for i in range(b):
        while True:
            toks = parse_sent(gen_pronoun_lines(rng))
            if len(toks) <= t1_max:
                break
        ids = [vocab[t] for t in toks]
        frames = []
        for tid in ids:
            n = PHONE_FRAMES if is_phone(inv[tid], inv) else MARKER_FRAMES
            ramp = np.linspace(0.6, 1.4, n)[:, None]
            frames.append(patterns[tid][None, :] * ramp)
        m = np.concatenate(frames, 0).astype(np.float32)
        text[i, : len(ids)] = ids
        mel[i, : len(m)] = m + noise * rng.standard_normal(m.shape)
        t1s[i] = len(ids)
        t2s[i] = len(m)
    return {"text": text, "text_lengths": t1s, "mel": mel, "mel_lengths": t2s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--log_every", type=int, default=250)
    args = ap.parse_args()

    vocab = build_vocab()
    inv = {i: t for t, i in vocab.items()}
    rng = np.random.default_rng(0)
    patterns = (rng.standard_normal((len(vocab), N_MELS)) * 1.5).astype(
        np.float32
    )

    cfg = EftsCNNConfig(
        num_symbols=len(vocab),
        symbol_embedding_dim=128,
        n_channels=128,
        n_text_encoder_layer=3,
        n_mel_encoder_layer=2,
        n_decoder_layer=3,
        dropout_rate=0.0,
        use_masking=True,
    )
    tx = adam_warmup(lr=1e-3, warmup_steps=200)
    state = create_state(efts.init(jax.random.PRNGKey(0), cfg), tx)
    step = make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    for i in range(1, args.steps + 1):
        batch = jax.device_put(make_batch(rng, vocab, patterns))
        state, metrics = step(state, batch, key)
        if i % args.log_every == 0 or i == 1:
            print(
                f"step {i}: loss={float(metrics['loss']):.4f} "
                f"mel={float(metrics['mel_loss']):.4f} "
                f"dur={float(metrics['duration_loss']):.4f} "
                f"({i/(time.time()-t0):.1f} steps/s)",
                flush=True,
            )

    # ---- verification ------------------------------------------------------
    params = state["params"]
    test = make_batch(np.random.default_rng(7), vocab, patterns, b=4, noise=0.0)
    out = efts.forward(
        params, cfg, test["text"], test["text_lengths"], test["mel"],
        test["mel_lengths"], deterministic=True,
    )
    mel_loss = float(out["mel_loss"])
    print(f"\nheld-out mel MSE: {mel_loss:.4f}")

    # Duration semantics note (measured, reference-inherited): the aligned
    # position e_i is a softmax-weighted mean of mel indices over token
    # i's span — its CENTER, not its end — so per-token deltas are
    # adjacent-pair averages of true durations (alternating 8,2 trains
    # toward ~5,5 while boundaries and totals stay correct). The right
    # calibration check is therefore center tracking: predicted e vs the
    # true span centers.
    e_pred, value, tmask = efts.infer_durations(
        params, cfg, test["text"], test["text_lengths"]
    )
    e_pred = np.asarray(e_pred)
    center_errs = []
    for b in range(4):
        t1 = int(test["text_lengths"][b])
        durs = np.array([
            PHONE_FRAMES if is_phone(inv[int(t)], inv) else MARKER_FRAMES
            for t in test["text"][b, :t1]
        ], float)
        ends = np.cumsum(durs)
        centers = ends - durs / 2.0
        # skip the last token (one-sided boundary truncation, see
        # sanity_convergence.boundary_truncation_frames)
        err = np.abs(e_pred[b, : t1 - 1] - centers[:-1]).mean()
        center_errs.append(err)
    center_err = float(np.mean(center_errs))
    print(f"mean |predicted e - true token center|: {center_err:.2f} frames "
          f"(tokens are {MARKER_FRAMES}-{PHONE_FRAMES} frames long)")

    # alignment monotonicity
    alpha = np.asarray(out["reconst_alpha"])
    mono_ok = 0
    for b in range(4):
        t1, t2 = test["text_lengths"][b], test["mel_lengths"][b]
        path = alpha[b, :t1, :t2].argmax(axis=0)
        mono = (np.diff(path) >= 0).mean()
        mono_ok += mono >= 0.99
        print(f"utt {b}: monotonicity={mono:.2f}")

    # two-stage inference decode vs targets
    t2 = int(test["mel_lengths"].max())
    t2_pad = ((t2 + 31) // 32) * 32
    mel_hat, _ = efts.infer_decode(params, cfg, value, e_pred, tmask, t2_pad)
    mel_hat = np.asarray(mel_hat)
    corrs = []
    for b in range(4):
        n = test["mel_lengths"][b]
        corrs.append(
            np.corrcoef(mel_hat[b, :n].ravel(), test["mel"][b, :n].ravel())[0, 1]
        )
    corr = float(np.mean(corrs))
    print(f"inference mel correlation with targets: {corr:.3f}")

    ok = (
        mel_loss < 0.5
        and mono_ok >= 3
        and corr > 0.8
        and center_err < 2.5
    )
    print("SANITY (mandarin):", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
