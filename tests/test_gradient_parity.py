"""Gradient parity: jax.grad vs torch autograd on the full EFTS-CNN loss.

Verifies backward semantics through the IMV chain (relu->cumsum->rescale
-> two masked softmaxes), the masked losses, and the stop-gradient
placement of the duration target (`efficient_tts.py:204` detach) -- a
wrong detach or softmax-mask gradient would pass forward parity but fail
here.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

import jax

from efficient_tts_tpu.compat.torch_import import efts_cnn_from_state_dict
from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig

CFG = EftsCNNConfig(num_symbols=76, dropout_rate=0.0, use_masking=True)


@pytest.fixture(scope="module")
def setup():
    from nntts.models.efficient_tts import EfficientTTSCNN

    torch.manual_seed(0)
    model = EfficientTTSCNN(num_symbols=76, dropout_rate=0.0, use_masking=True)
    model.train()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = efts_cnn_from_state_dict(sd, CFG)

    rng = np.random.default_rng(7)
    text = np.zeros((2, 24), np.int32)
    t1s = np.array([24, 18], np.int32)
    for i, t1 in enumerate(t1s):
        text[i, :t1] = rng.integers(1, 76, size=t1)
    mel = np.zeros((2, 120, 80), np.float32)
    t2s = np.array([120, 100], np.int32)
    for i, t2 in enumerate(t2s):
        mel[i, :t2] = rng.standard_normal((t2, 80))
    return model, params, (text, t1s, mel, t2s)


def test_gradient_parity_mel_loss(setup):
    """mel-loss-only gradients: smooth (MSE) objective whose backward
    traverses the ENTIRE alignment chain (decoder -> alpha' -> e -> imv ->
    alpha -> encoders -> embedding). The duration L1 loss is excluded:
    its gradient is sign(pred - target), which legitimately flips under
    ~1e-4 forward noise wherever pred ~= target, so exact L1-grad parity
    is ill-posed (verified: total-loss grads match everywhere except the
    duration path)."""
    model, params, (text, t1s, mel, t2s) = setup

    # torch: zero out the duration term so backward carries mel MSE only
    orig_criterion = model.criterion

    class _MelOnly(torch.nn.Module):
        def forward(self, *a):
            return orig_criterion(*a)[0], torch.zeros(())

    model._modules["criterion"] = _MelOnly()
    try:
        model.zero_grad()
        loss_t, *_ = model(
            torch.from_numpy(text).long(), torch.from_numpy(t1s),
            torch.from_numpy(mel), torch.from_numpy(t2s),
        )
        loss_t.backward()
    finally:
        model._modules["criterion"] = orig_criterion
    tgrads = {k: v.grad.detach().numpy() for k, v in model.named_parameters()
              if v.grad is not None}

    # jax gradients
    def loss_fn(p):
        return efts.forward(p, CFG, text, t1s, mel, t2s, deterministic=True)[
            "mel_loss"
        ]

    jgrads = jax.grad(loss_fn)(params)

    checks = [
        # (torch name, pytree path extractor, transform to torch layout)
        ("text_embedding_table.weight",
         lambda g: g["text_embedding"]["table"], lambda a: a),
        ("text_encoder_key.weight",
         lambda g: g["text_key"]["w"], lambda a: np.asarray(a).T),
        ("text_encoder_value.bias",
         lambda g: g["text_value"]["b"], lambda a: np.asarray(a)),
        ("mel_output_layer.weight",
         lambda g: g["mel_out"]["w"], lambda a: np.asarray(a).T),
        ("decoder.layers.0.conv.0.weight_v",
         lambda g: g["decoder"]["layers"][0]["v"],
         lambda a: np.transpose(np.asarray(a), (2, 1, 0))),
        ("decoder.layers.0.conv.0.weight_g",
         lambda g: g["decoder"]["layers"][0]["g"],
         lambda a: np.asarray(a).reshape(-1, 1, 1)),
        ("mel_encoder.layers.0.conv.0.weight_v",
         lambda g: g["mel_encoder"]["layers"][0]["v"],
         lambda a: np.transpose(np.asarray(a), (2, 1, 0))),
        ("text_encoder.layers.0.conv.0.bias",
         lambda g: g["text_encoder"]["layers"][0]["b"], lambda a: np.asarray(a)),
    ]
    for tname, extract, tfm in checks:
        ref = tgrads[tname]
        ours = tfm(extract(jgrads))
        scale = max(np.abs(ref).max(), 1e-8)
        np.testing.assert_allclose(
            ours / scale, ref / scale, atol=5e-3,
            err_msg=f"gradient mismatch: {tname}",
        )


def test_duration_target_is_detached(setup):
    """Gradient must NOT flow from the duration loss into the alignment
    (the reference detaches e before building the target, :204)."""
    _, params, (text, t1s, mel, t2s) = setup

    def dur_loss_only(p):
        out = efts.forward(p, CFG, text, t1s, mel, t2s, deterministic=True)
        return out["duration_loss"]

    g = jax.grad(dur_loss_only)(params)
    # mel encoder feeds only the alignment; with e detached, the duration
    # loss must produce (near-)zero gradient there
    mel_enc_grad = np.abs(
        np.asarray(g["mel_encoder"]["layers"][0]["v"])
    ).max()
    assert mel_enc_grad < 1e-12, f"duration loss leaks into alignment: {mel_enc_grad}"
    # but it does train the duration predictor and text encoder
    dp_grad = np.abs(np.asarray(g["duration_predictor"]["out"]["w"])).max()
    assert dp_grad > 1e-8
