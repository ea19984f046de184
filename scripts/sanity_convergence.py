"""End-to-end learning sanity check on a synthetic corpus.

Each phone id maps to a fixed spectral pattern lasting ~8 mel frames;
utterances are random phone sequences. If the IMV mechanism works, the
model must (a) discover the monotonic alignment without supervision,
(b) learn durations from the detached aligned positions, and (c) decode
per-phone patterns — all verifiable numerically. This exercises the full
training + two-stage inference stack exactly as LJ training would,
without needing the (unmounted) corpus.

Run: python scripts/sanity_convergence.py [--steps 1500]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.train.efts_train_step import make_train_step
from efficient_tts_tpu.train.optim import adam_warmup
from efficient_tts_tpu.train.state import create_state

N_PHONES = 12  # 1..11 used, 0 = pad
FRAMES_PER_PHONE = 8
N_MELS = 80


def make_patterns(rng):
    """Fixed per-phone mel pattern [N_PHONES, FRAMES_PER_PHONE, N_MELS]."""
    pats = rng.standard_normal((N_PHONES, 1, N_MELS)) * 1.5
    ramp = np.linspace(0.6, 1.4, FRAMES_PER_PHONE)[None, :, None]
    return (pats * ramp).astype(np.float32)


def make_batch(rng, patterns, b=16, t1_max=12, noise=0.05):
    t2_max = t1_max * FRAMES_PER_PHONE
    text = np.zeros((b, t1_max), np.int32)
    mel = np.zeros((b, t2_max, N_MELS), np.float32)
    t1s = np.zeros((b,), np.int32)
    t2s = np.zeros((b,), np.int32)
    for i in range(b):
        n = int(rng.integers(5, t1_max + 1))
        seq = rng.integers(1, N_PHONES, size=n)
        text[i, :n] = seq
        frames = patterns[seq].reshape(-1, N_MELS)
        mel[i, : len(frames)] = frames + noise * rng.standard_normal(frames.shape)
        t1s[i] = n
        t2s[i] = len(frames)
    return {
        "text": text, "text_lengths": t1s, "mel": mel, "mel_lengths": t2s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--log_every", type=int, default=250)
    args = ap.parse_args()

    cfg = EftsCNNConfig(
        num_symbols=N_PHONES,
        symbol_embedding_dim=128,
        n_channels=128,
        n_text_encoder_layer=3,
        n_mel_encoder_layer=2,
        n_decoder_layer=3,
        dropout_rate=0.0,
        use_masking=True,
    )
    tx = adam_warmup(lr=1e-3, warmup_steps=200)
    params = efts.init(jax.random.PRNGKey(0), cfg)
    state = create_state(params, tx)
    step = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    patterns = make_patterns(rng)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    for i in range(1, args.steps + 1):
        batch = jax.device_put(make_batch(rng, patterns))
        state, metrics = step(state, batch, key)
        if i % args.log_every == 0 or i == 1:
            print(
                f"step {i}: loss={float(metrics['loss']):.4f} "
                f"mel={float(metrics['mel_loss']):.4f} "
                f"dur={float(metrics['duration_loss']):.4f} "
                f"({i/(time.time()-t0):.1f} steps/s)",
                flush=True,
            )

    # ---- verification -----------------------------------------------------
    params = state["params"]
    test = make_batch(np.random.default_rng(123), patterns, b=4, noise=0.0)
    out = efts.forward(
        params, cfg, test["text"], test["text_lengths"], test["mel"],
        test["mel_lengths"], deterministic=True,
    )
    mel_loss = float(out["mel_loss"])
    print(f"\nheld-out mel MSE: {mel_loss:.4f}")

    # alignment diagonality: argmax of alpha' per frame should advance ~1/8
    alpha = np.asarray(out["reconst_alpha"])  # [B, T1, T2]
    diag_ok = 0
    for b in range(4):
        t1, t2 = test["text_lengths"][b], test["mel_lengths"][b]
        path = alpha[b, :t1, :t2].argmax(axis=0)
        mono = (np.diff(path) >= 0).mean()
        expect = np.arange(t2) // FRAMES_PER_PHONE
        acc = (path == expect).mean()
        print(f"utt {b}: monotonicity={mono:.2f} phone-frame accuracy={acc:.2f}")
        diag_ok += acc > 0.8
    # duration prediction: ~FRAMES_PER_PHONE per phone
    e, value, tmask = efts.infer_durations(
        params, cfg, test["text"], test["text_lengths"]
    )
    e = np.asarray(e)
    for b in range(4):
        t1 = test["text_lengths"][b]
        pred_len = e[b, t1 - 1]
        true_len = test["mel_lengths"][b]
        print(f"utt {b}: predicted length {pred_len:.1f} vs true {true_len}")

    # inference decode correlates with target patterns
    t2 = int(test["mel_lengths"].max())
    t2_pad = ((t2 + 31) // 32) * 32
    mel_pred, _ = efts.infer_decode(params, cfg, value, e, tmask, t2_pad)
    mel_pred = np.asarray(mel_pred)
    corrs = []
    for b in range(4):
        n = test["mel_lengths"][b]
        a = mel_pred[b, :n].ravel()
        t = test["mel"][b, :n].ravel()
        corrs.append(np.corrcoef(a, t)[0, 1])
    print(f"inference mel correlation with targets: {np.mean(corrs):.3f}")

    ok = mel_loss < 0.5 and diag_ok >= 3 and np.mean(corrs) > 0.8
    print("SANITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
