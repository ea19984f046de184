"""Numerical parity: our EFTS-CNN vs the reference PyTorch model.

Loads the actual reference implementation (read-only mount), transplants
its randomly-initialized weights into our pytree via the checkpoint
converter, and checks forward/inference outputs agree to float32
tolerance. This is the BASELINE.json config-1 criterion executed with
random weights (no trained checkpoints are mounted).
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from efficient_tts_tpu.compat.torch_import import efts_cnn_from_state_dict
from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig

CFG = EftsCNNConfig(num_symbols=76, dropout_rate=0.0, use_masking=True, sigma=0.01)


@pytest.fixture(scope="module")
def ref_model():
    from nntts.models.efficient_tts import EfficientTTSCNN

    torch.manual_seed(0)
    m = EfficientTTSCNN(
        num_symbols=76, dropout_rate=0.0, use_masking=True, sigma=0.01
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return efts_cnn_from_state_dict(sd, CFG)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    t1s, t2s = [60, 80], [450, 500]
    text = np.zeros((2, 80), dtype=np.int32)
    for i, t1 in enumerate(t1s):
        text[i, :t1] = rng.integers(1, 76, size=t1)
    mel = np.zeros((2, 500, 80), dtype=np.float32)
    for i, t2 in enumerate(t2s):
        mel[i, :t2] = rng.standard_normal((t2, 80)).astype(np.float32)
    return text, np.array(t1s), mel, np.array(t2s)


def test_forward_parity(ref_model, params, batch):
    text, t1s, mel, t2s = batch
    with torch.no_grad():
        loss_t, stats, imv_t, alpha_t, melp_t, _ = ref_model(
            torch.from_numpy(text).long(),
            torch.from_numpy(t1s),
            torch.from_numpy(mel),
            torch.from_numpy(t2s),
        )

    out = efts.forward(params, CFG, text, t1s, mel, t2s, deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out["imv"]), imv_t.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["reconst_alpha"]), alpha_t.numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out["mel_pred"]), melp_t.numpy(), atol=5e-3, rtol=1e-2
    )
    assert abs(float(out["mel_loss"]) - stats["mel_loss"]) < 1e-3
    assert abs(float(out["duration_loss"]) - stats["duration_loss"]) < 1e-3
    assert abs(float(out["loss"]) - float(loss_t)) < 2e-3


def test_inference_parity(ref_model, params, batch):
    text, t1s, _, _ = batch
    single = torch.from_numpy(text[:1, : t1s[0]]).long()
    with torch.no_grad():
        mel_t, alpha_t = ref_model.inference(single)
    t2 = mel_t.shape[1]

    e, value, tmask = efts.infer_durations(params, CFG, text[:1, : t1s[0]], t1s[:1])
    # host-side length decision, exactly the reference round(e[-1]) (:358-363)
    t2_ours = int(np.round(float(np.asarray(e)[0, -1])))
    assert t2_ours == t2

    mel_j, alpha_j = efts.infer_decode(params, CFG, value, e, tmask, t2)
    np.testing.assert_allclose(
        np.asarray(mel_j)[0], mel_t[0].numpy(), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(alpha_j)[0], alpha_t[0].numpy(), atol=2e-3, rtol=1e-2
    )


def test_gradients_flow(params, batch):
    import jax
    import jax.numpy as jnp

    text, t1s, mel, t2s = batch

    def loss_fn(p):
        return efts.forward(p, CFG, text, t1s, mel, t2s, deterministic=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    # every parameter receives gradient signal somewhere
    nonzero = [float(jnp.max(jnp.abs(g))) for g in leaves]
    assert sum(1 for n in nonzero if n > 0) > len(nonzero) * 0.9
