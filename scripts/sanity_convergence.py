"""End-to-end learning sanity check on a synthetic corpus.

Each phone id maps to a fixed spectral pattern lasting ~8 mel frames;
utterances are random phone sequences. If the IMV mechanism works, the
model must (a) discover the monotonic alignment without supervision,
(b) learn durations from the detached aligned positions, and (c) decode
per-phone patterns — all verifiable numerically. This exercises the full
training + two-stage inference stack exactly as LJ training would,
without needing the (unmounted) corpus.

Supports both acoustic model families:
    python scripts/sanity_convergence.py --model cnn          [--steps 1500]
    python scripts/sanity_convergence.py --model transformer  [--steps 1500]

Duration calibration (asserted, see `duration_calibration()` below):
the total predicted length is checked (i) against the predictor's actual
training target e[T1-1] (what the predictor can control) and (ii) against
the true length after removing the analytic boundary-truncation offset of
the aligned-position estimator; a long-utterance eval additionally checks
the raw |pred-true|/true error at LJ-like relative shapes.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.train.optim import adam_warmup
from efficient_tts_tpu.train.efts_train_step import make_train_step
from efficient_tts_tpu.train.state import create_state

N_PHONES = 12  # 1..11 used, 0 = pad
FRAMES_PER_PHONE = 8
N_MELS = 80


def make_patterns(rng):
    """Fixed per-phone mel pattern [N_PHONES, FRAMES_PER_PHONE, N_MELS]."""
    pats = rng.standard_normal((N_PHONES, 1, N_MELS)) * 1.5
    ramp = np.linspace(0.6, 1.4, FRAMES_PER_PHONE)[None, :, None]
    return (pats * ramp).astype(np.float32)


def make_batch(rng, patterns, b=16, t1_max=12, t1_min=5, noise=0.05):
    t2_max = t1_max * FRAMES_PER_PHONE
    text = np.zeros((b, t1_max), np.int32)
    mel = np.zeros((b, t2_max, N_MELS), np.float32)
    t1s = np.zeros((b,), np.int32)
    t2s = np.zeros((b,), np.int32)
    for i in range(b):
        n = int(rng.integers(t1_min, t1_max + 1))
        seq = rng.integers(1, N_PHONES, size=n)
        text[i, :n] = seq
        frames = patterns[seq].reshape(-1, N_MELS)
        mel[i, : len(frames)] = frames + noise * rng.standard_normal(frames.shape)
        t1s[i] = n
        t2s[i] = len(frames)
    return {
        "text": text, "text_lengths": t1s, "mel": mel, "mel_lengths": t2s,
    }


def build_model(name: str):
    if name == "cnn":
        from efficient_tts_tpu.models import efficient_tts as mod
        from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig

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
        return mod, cfg
    if name == "transformer":
        from efficient_tts_tpu.models import efficient_tts_transformer as mod
        from efficient_tts_tpu.models.efficient_tts_transformer import (
            EftsTransformerConfig,
        )

        cfg = EftsTransformerConfig(
            num_symbols=N_PHONES,
            n_channels=128,
            n_heads=2,
            ff_hidden=512,
            n_text_encoder_layer=3,
            n_mel_encoder_layer=2,
            n_decoder_layer=3,
            dropout_rate=0.0,
            use_masking=True,
        )
        return mod, cfg
    raise SystemExit(f"unknown --model {name}")


def boundary_truncation_frames(t1: int, t2: int, sigma_e: float) -> float:
    """Analytic shortfall of the last aligned position e[T1-1] vs T2-1.

    `aligned_positions` (reference `efficient_tts.py:326-345`) estimates
    e_i as a softmax-weighted mean of mel indices under Gaussian energies
    -sigma_e (imv_t - p_i)^2. With imv approximately linear of slope
    s = (T1-1)/(T2-1) per frame, the Gaussian in the time variable has
    std tau = 1 / (s * sqrt(2 sigma_e)). For the LAST token the Gaussian
    is truncated one-sidedly at the sequence end, shifting its mean by
    tau * sqrt(2/pi) frames toward the interior. The duration target
    therefore sums to ~T2-1 - tau*sqrt(2/pi), NOT T2-1 — the dominant
    term of the observed total-length underprediction. Relative error
    scales as 1/T1 (~8% at T1=12 toy shapes, <1% at LJ's T1~100), and the
    reference has the identical bias (same math, same constants).
    """
    slope = (t1 - 1) / max(t2 - 1, 1)
    tau = 1.0 / (slope * np.sqrt(2.0 * sigma_e))
    return float(tau * np.sqrt(2.0 / np.pi))


def duration_calibration(mod, cfg, params, test, tol=0.07):
    """Assert the duration pipeline is calibrated. Returns (ok, lines)."""
    out = mod.forward(
        params, cfg, test["text"], test["text_lengths"], test["mel"],
        test["mel_lengths"], deterministic=True,
    )
    e_tgt = np.asarray(out["aligned_e"])  # training target integral
    e_pred, _, _ = mod.infer_durations(
        params, cfg, test["text"], test["text_lengths"]
    )
    e_pred = np.asarray(e_pred)
    ok = True
    lines = []
    for b in range(test["text"].shape[0]):
        t1 = int(test["text_lengths"][b])
        true = float(test["mel_lengths"][b])
        pred = float(e_pred[b, t1 - 1])
        tgt = float(e_tgt[b, t1 - 1])
        shift = boundary_truncation_frames(t1, int(true), cfg.sigma_e)
        cal_err = abs(pred - tgt) / max(tgt, 1.0)          # predictor vs target
        raw_err = abs(pred - true) / true                  # raw (incl. truncation)
        corr_err = abs(pred + shift - true) / true         # truncation-corrected
        this_ok = cal_err <= tol and corr_err <= tol
        ok &= this_ok
        lines.append(
            f"  T1={t1:3d}: pred={pred:6.1f} target={tgt:6.1f} true={true:6.0f}"
            f" | cal={cal_err:5.1%} raw={raw_err:5.1%}"
            f" corrected={corr_err:5.1%} (trunc≈{shift:.1f}f)"
            f" {'OK' if this_ok else 'FAIL'}"
        )
    return ok, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--log_every", type=int, default=250)
    ap.add_argument("--model", choices=("cnn", "transformer"), default="cnn")
    args = ap.parse_args()

    mod, cfg = build_model(args.model)
    tx = adam_warmup(lr=1e-3, warmup_steps=200)
    params = mod.init(jax.random.PRNGKey(0), cfg)
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
    out = mod.forward(
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

    # duration calibration at training shapes (T1 5..12)
    print("\nduration calibration (training shapes):")
    cal_ok, lines = duration_calibration(mod, cfg, params, test)
    print("\n".join(lines))

    # long-utterance generalization: the model is length-agnostic (convs /
    # per-position attention), so at LJ-like RELATIVE shapes (T1=40 -> the
    # boundary truncation is ~2% of total) the RAW error must be < 7%
    long_test = make_batch(
        np.random.default_rng(321), patterns, b=4, t1_max=40, t1_min=36,
        noise=0.0,
    )
    print("duration calibration (long utterances, raw<=7% asserted):")
    long_ok, lines = duration_calibration(mod, cfg, params, long_test)
    print("\n".join(lines))
    e_pred, value, tmask = mod.infer_durations(
        params, cfg, long_test["text"], long_test["text_lengths"]
    )
    e_pred = np.asarray(e_pred)
    raw_errs = [
        abs(float(e_pred[b, long_test["text_lengths"][b] - 1])
            - float(long_test["mel_lengths"][b])) / float(long_test["mel_lengths"][b])
        for b in range(4)
    ]
    raw_ok = all(e <= 0.07 for e in raw_errs)
    print(f"  long-utterance raw errors: {[f'{e:.1%}' for e in raw_errs]}")

    # inference decode correlates with target patterns
    e, value, tmask = mod.infer_durations(
        params, cfg, test["text"], test["text_lengths"]
    )
    e = np.asarray(e)
    t2 = int(test["mel_lengths"].max())
    t2_pad = ((t2 + 31) // 32) * 32
    mel_pred, _ = mod.infer_decode(params, cfg, value, e, tmask, t2_pad)
    mel_pred = np.asarray(mel_pred)
    corrs = []
    for b in range(4):
        n = test["mel_lengths"][b]
        a = mel_pred[b, :n].ravel()
        t = test["mel"][b, :n].ravel()
        corrs.append(np.corrcoef(a, t)[0, 1])
    print(f"inference mel correlation with targets: {np.mean(corrs):.3f}")

    ok = (
        mel_loss < 0.5
        and diag_ok >= 3
        and np.mean(corrs) > 0.8
        and cal_ok
        and long_ok
        and raw_ok
    )
    print(f"SANITY ({args.model}):", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
