"""EFTS-Transformer variant: trains, aligns monotonically, infers."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_tts_tpu.models import efficient_tts_transformer as eftst
from efficient_tts_tpu.models.efficient_tts_transformer import EftsTransformerConfig

CFG = EftsTransformerConfig(
    num_symbols=40,
    n_channels=64,
    n_heads=2,
    ff_hidden=128,
    n_text_encoder_layer=1,
    n_mel_encoder_layer=1,
    n_decoder_layer=1,
    dropout_rate=0.0,
)


def _batch(b=2, t1=12, t2=48):
    rng = np.random.default_rng(0)
    text = np.zeros((b, t1), np.int32)
    t1s = [t1, t1 - 3]
    t2s = [t2, t2 - 10]
    for i in range(b):
        text[i, : t1s[i]] = rng.integers(1, 40, size=t1s[i])
    mel = np.zeros((b, t2, 80), np.float32)
    for i in range(b):
        mel[i, : t2s[i]] = rng.standard_normal((t2s[i], 80))
    return text, np.array(t1s, np.int32), mel, np.array(t2s, np.int32)


def test_forward_and_grads():
    params = eftst.init(jax.random.PRNGKey(0), CFG)
    text, t1s, mel, t2s = _batch()
    out = eftst.forward(params, CFG, text, t1s, mel, t2s, deterministic=True)
    assert np.isfinite(float(out["loss"]))
    # IMV is monotonic within valid frames
    imv = np.asarray(out["imv"])
    for i in range(2):
        valid = imv[i, : t2s[i]]
        assert (np.diff(valid) >= -1e-4).all()
        assert abs(valid[-1] - (t1s[i] - 1)) < 1e-3

    def loss_fn(p):
        return eftst.forward(p, CFG, text, t1s, mel, t2s, deterministic=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    assert all(
        bool(np.isfinite(np.asarray(g)).all())
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_inference_two_stage():
    params = eftst.init(jax.random.PRNGKey(0), CFG)
    text, t1s, _, _ = _batch()
    e, value, tmask = eftst.infer_durations(params, CFG, text, t1s)
    t2 = 64
    mel, alpha = eftst.infer_decode(params, CFG, value, e, tmask, t2)
    assert mel.shape == (2, t2, 80)
    assert alpha.shape == (2, text.shape[1], t2)
    assert np.isfinite(np.asarray(mel)).all()


def test_transformer_trains_and_synthesizes_through_stack():
    """The registry's EfficientTTSTransformer is a first-class citizen of
    the trainer/pipeline stack: make_train_step dispatches on the config
    type and the batched synthesis pipeline decodes through the
    transformer decoder."""
    import optax

    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models import model_module_for
    from efficient_tts_tpu.models import efficient_tts_transformer as m
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.pipeline import synthesize
    from efficient_tts_tpu.train.efts_train_step import make_train_step

    assert model_module_for(CFG) is m

    tx = optax.adam(1e-3)
    params = m.init(jax.random.PRNGKey(0), CFG)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)}
    step = make_train_step(CFG, tx)
    rng = np.random.default_rng(0)
    batch = {
        "text": rng.integers(1, CFG.num_symbols, size=(2, 6)).astype(np.int32),
        "text_lengths": np.asarray([6, 5], np.int32),
        "mel": rng.standard_normal((2, 24, CFG.odim)).astype(np.float32),
        "mel_lengths": np.asarray([24, 20], np.int32),
    }
    l0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        l0 = l0 if l0 is not None else loss
    assert float(metrics["loss"]) < l0  # optimizing, not just running

    voc = HiFiGANConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    wav, wav_lengths = synthesize(
        state["params"], hg.init_generator(jax.random.PRNGKey(1), voc),
        batch["text"], batch["text_lengths"], CFG, voc, bucket_multiple=16,
    )
    assert wav.shape[0] == 2 and np.isfinite(wav).all()
    assert (wav_lengths > 0).all()
