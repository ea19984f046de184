"""Training-step tests: loss decreases, sharding works on an 8-device mesh,
checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.parallel.mesh import make_mesh
from efficient_tts_tpu.train.efts_train_step import (
    make_train_step,
    shard_batch,
    shard_state,
)
from efficient_tts_tpu.train.optim import adam_warmup
from efficient_tts_tpu.train.state import create_state

CFG = EftsCNNConfig(
    num_symbols=40,
    symbol_embedding_dim=64,
    n_channels=64,
    n_text_encoder_layer=2,
    n_mel_encoder_layer=1,
    n_decoder_layer=2,
    dropout_rate=0.0,
    use_masking=True,
)


def _batch(b=8, t1=16, t2=64):
    rng = np.random.default_rng(0)
    return {
        "text": rng.integers(1, 40, size=(b, t1)).astype(np.int32),
        "text_lengths": np.full((b,), t1, np.int32),
        "mel": rng.standard_normal((b, t2, 80)).astype(np.float32),
        "mel_lengths": np.full((b,), t2, np.int32),
    }


def test_loss_decreases():
    tx = adam_warmup(lr=1e-3, warmup_steps=10, grad_clip_norm=1.0)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    state = create_state(params, tx)
    step = make_train_step(CFG, tx)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state["step"]) == 30
    assert np.isfinite(float(metrics["grad_norm"]))


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step(model_parallel):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(model=model_parallel)
    tx = adam_warmup(lr=1e-3, warmup_steps=10)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    state = shard_state(params, tx, mesh)
    step = make_train_step(CFG, tx)
    batch = shard_batch(_batch(b=8), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # result equals the single-device run to numerical tolerance
    state_ref = create_state(params, tx)
    state_ref, metrics_ref = step(state_ref, _batch(b=8), jax.random.PRNGKey(1))
    assert abs(float(metrics["loss"]) - float(metrics_ref["loss"])) < 1e-4


def test_sequence_parallel_train_step():
    """dp+tp+sp: mel time axis sharded over 'model' via constraint."""
    mesh = make_mesh(model=2)
    tx = adam_warmup(lr=1e-3, warmup_steps=10)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    state = shard_state(params, tx, mesh)
    step = make_train_step(CFG, tx, mesh=mesh, sequence_parallel=True)
    batch = shard_batch(_batch(b=8), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    state_ref = create_state(params, tx)
    plain = make_train_step(CFG, tx)
    state_ref, metrics_ref = plain(state_ref, _batch(b=8), jax.random.PRNGKey(1))
    assert abs(float(metrics["loss"]) - float(metrics_ref["loss"])) < 1e-4


def test_checkpoint_roundtrip(tmp_path):
    from efficient_tts_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    tx = adam_warmup(lr=1e-3, warmup_steps=10)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    state = create_state(params, tx)
    step = make_train_step(CFG, tx)
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))

    path = save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == path

    template = create_state(efts.init(jax.random.PRNGKey(7), CFG), tx)
    restored = load_checkpoint(path, template)
    assert int(restored["step"]) == 1
    a = jax.tree_util.tree_leaves(state["params"])
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer state must restore exactly too (resume == continuation)
    for x, y in zip(
        jax.tree_util.tree_leaves(state["opt_state"]),
        jax.tree_util.tree_leaves(restored["opt_state"]),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # pretrain mode: params restored, optimizer fresh
    pre = load_checkpoint(path, template, load_only_params=True)
    assert int(pre["step"]) == 0


def test_warmup_schedule_matches_reference_formula():
    from efficient_tts_tpu.train.schedule import warmup_lr

    sched = warmup_lr(1e-3, 4000)
    # peak at warmup_steps
    peak = float(sched(3999))
    assert abs(peak - 1e-3) < 1e-8
    assert float(sched(0)) < 1e-5
    assert float(sched(100000)) < peak
    # reference formula check at arbitrary step (float32 schedule)
    step = 12345 + 1
    expected = 1e-3 * 4000**0.5 * min(step**-0.5, step * 4000**-1.5)
    assert abs(float(sched(12345)) - expected) / expected < 1e-5


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 sweeps micro-batches with lax.scan and must produce
    the same update as the monolithic step when micro-batches are
    balanced (equal valid-element counts; full-length rows here)."""
    tx = adam_warmup(lr=1e-3, warmup_steps=10, grad_clip_norm=1.0)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(1)

    full = make_train_step(CFG, tx)
    acc = make_train_step(CFG, tx, accum_steps=4)

    s_full, m_full = full(create_state(params, tx), batch, rng)
    s_acc, m_acc = acc(create_state(params, tx), batch, rng)

    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s_full["params"], s_acc["params"],
    )
    assert int(s_acc["step"]) == 1


def test_grad_accumulation_rejects_indivisible_batch():
    tx = adam_warmup(lr=1e-3, warmup_steps=10, grad_clip_norm=1.0)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    acc = make_train_step(CFG, tx, accum_steps=3)
    with pytest.raises(AssertionError, match="not divisible"):
        acc(create_state(params, tx), _batch(b=8), jax.random.PRNGKey(1))


def test_grad_accumulation_sharded():
    """accum_steps composes with the mesh: the scan's micro-batches keep
    the dp sharding, GSPMD still inserts the gradient reductions."""
    mesh = make_mesh(model=2)
    tx = adam_warmup(lr=1e-3, warmup_steps=10)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    state = shard_state(params, tx, mesh)
    step = make_train_step(CFG, tx, accum_steps=2)
    batch = shard_batch(_batch(b=8), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    plain = make_train_step(CFG, tx)
    state_ref, metrics_ref = plain(
        create_state(params, tx), _batch(b=8), jax.random.PRNGKey(1)
    )
    assert abs(float(metrics["loss"]) - float(metrics_ref["loss"])) < 1e-4


def test_grad_accumulation_exact_with_ragged_micro_batches():
    """With use_masking=True and UNEQUAL valid-element counts across
    micro-batches, count-weighted accumulation still reproduces the
    monolithic masked-mean step exactly (ADVICE r2: the old uniform
    average skewed toward short micro-batches)."""
    tx = adam_warmup(lr=1e-3, warmup_steps=10, grad_clip_norm=1.0)
    params = efts.init(jax.random.PRNGKey(0), CFG)
    batch = _batch(b=8)
    # make lengths ragged so per-micro counts differ strongly
    rng = np.random.default_rng(7)
    batch["text_lengths"] = rng.integers(6, 17, size=8).astype(np.int32)
    batch["mel_lengths"] = rng.integers(24, 65, size=8).astype(np.int32)
    key = jax.random.PRNGKey(1)

    full = make_train_step(CFG, tx)
    acc = make_train_step(CFG, tx, accum_steps=4)

    s_full, m_full = full(create_state(params, tx), batch, key)
    s_acc, m_acc = acc(create_state(params, tx), batch, key)

    for k in ("loss", "mel_loss", "duration_loss", "grad_norm"):
        np.testing.assert_allclose(
            float(m_full[k]), float(m_acc[k]), rtol=1e-4, err_msg=k
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s_full["params"], s_acc["params"],
    )
