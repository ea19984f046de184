"""EFTS-CNN jit-compiled train/eval steps with mesh sharding.

Replaces the reference's eager loop + DDP
(`trainers/efficient_tts_trainer.py:121-165`): one XLA graph per step --
forward, backward, clip, Adam update -- with the batch sharded over the
'data' mesh axis and parameters replicated (or channel-sharded over
'model'). GSPMD inserts the gradient all-reduce that DDP did via NCCL.
"""

from __future__ import annotations

import functools

import jax
import optax

from efficient_tts_tpu.models import efficient_tts as efts
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.parallel.sharding import batch_sharding, param_sharding
from efficient_tts_tpu.train.state import apply_updates


def make_train_step(
    cfg: EftsCNNConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    sequence_parallel: bool = False,
    accum_steps: int = 1,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `sequence_parallel=True` (requires `mesh`) additionally shards the mel
    time axis over the 'model' mesh axis: GSPMD then partitions the mel
    encoder convs (halo-exchanged) and the [B, T1, T2] alignment tensors
    along T2, inserting the collectives — useful when very long
    utterances make the quadratic alignment tensors the memory bound
    (SURVEY.md §5 long-context strategy).

    `accum_steps > 1` runs gradient accumulation: the batch (leading dim
    divisible by `accum_steps`) is split into micro-batches swept by a
    `lax.scan` — one resident micro-batch of activations at a time, one
    optimizer update per call. This buys the large EFFECTIVE batch that
    unsupervised alignment discovery needs (micro-corpus study: B=16
    collapses to uniform attention where the reference's B=128 trains;
    `scripts/make_micro_corpus.py`) without the [B, T1, T2] alignment
    tensors of the full batch ever co-residing in HBM.

    The accumulated gradient equals the full-batch gradient EXACTLY
    (modulo float reassociation), including with `use_masking=True` and
    ragged micro-batches: each micro-batch's mel/duration losses are
    weighted by its share of the batch's valid-element counts (known
    up-front from text/mel lengths) before differentiation, so the sum
    over micro-batches reproduces the full-batch masked means — not the
    uniform average of per-micro means, which skews toward short
    micro-batches and would feed grad-clip a biased estimate.
    """
    sp_sharding = None
    if sequence_parallel:
        assert mesh is not None, "sequence_parallel requires a mesh"
        from jax.sharding import NamedSharding, PartitionSpec as P

        from efficient_tts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        sp_sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))

    from efficient_tts_tpu.models import model_module_for

    model = model_module_for(cfg)

    def loss_fn(params, batch, rng):
        mel = batch["mel"]
        if sp_sharding is not None:
            mel = jax.lax.with_sharding_constraint(mel, sp_sharding)
        out = model.forward(
            params,
            cfg,
            batch["text"],
            batch["text_lengths"],
            mel,
            batch["mel_lengths"],
            rng=rng,
            deterministic=cfg.dropout_rate <= 0.0,
        )
        return out["loss"], out

    def grads_and_metrics(params, batch, rng):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        metrics = {
            "loss": loss,
            "mel_loss": out["mel_loss"],
            "duration_loss": out["duration_loss"],
        }
        return grads, metrics

    if accum_steps <= 1:

        @jax.jit
        def train_step(state, batch, rng):
            grads, metrics = grads_and_metrics(state["params"], batch, rng)
            new_state = apply_updates(state, grads, tx)
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return train_step

    def weighted_grads_and_metrics(params, batch, rng, w_mel, w_dur):
        def wloss_fn(p):
            _, out = loss_fn(p, batch, rng)
            return w_mel * out["mel_loss"] + w_dur * out["duration_loss"], out

        (wloss, out), grads = jax.value_and_grad(wloss_fn, has_aux=True)(params)
        metrics = {
            "loss": wloss,
            "mel_loss": w_mel * out["mel_loss"],
            "duration_loss": w_dur * out["duration_loss"],
        }
        return grads, metrics

    @jax.jit
    def train_step_accum(state, batch, rng):
        def split(x):
            assert x.shape[0] % accum_steps == 0, (
                f"batch dim {x.shape[0]} not divisible by "
                f"accum_steps={accum_steps}"
            )
            return x.reshape(accum_steps, x.shape[0] // accum_steps,
                             *x.shape[1:])

        import jax.numpy as jnp

        micro = jax.tree.map(split, batch)
        rngs = jax.random.split(rng, accum_steps)
        params = state["params"]

        # per-micro-batch share of the FULL batch's valid-element counts:
        # weighting each micro loss by count_i/total before the backward
        # makes the accumulated gradient the exact full-batch masked mean
        if cfg.use_masking:
            mel_counts = jnp.sum(micro["mel_lengths"], axis=1).astype(jnp.float32)
            dur_counts = jnp.sum(micro["text_lengths"], axis=1).astype(jnp.float32)
        else:
            # unmasked means divide by padded element counts — identical
            # per micro-batch, so the weights reduce to 1/accum_steps
            mel_counts = jnp.ones((accum_steps,), jnp.float32)
            dur_counts = jnp.ones((accum_steps,), jnp.float32)
        w_mel = mel_counts / jnp.maximum(jnp.sum(mel_counts), 1.0)
        w_dur = dur_counts / jnp.maximum(jnp.sum(dur_counts), 1.0)

        def body(carry, xs):
            grads_acc, metrics_acc = carry
            mb, r, wm, wd = xs
            grads, metrics = weighted_grads_and_metrics(params, mb, r, wm, wd)
            grads_acc = jax.tree.map(lambda a, b: a + b, grads_acc, grads)
            metrics_acc = jax.tree.map(lambda a, b: a + b, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        zero_metrics = {
            "loss": jnp.zeros(()),
            "mel_loss": jnp.zeros(()),
            "duration_loss": jnp.zeros(()),
        }
        (grads, metrics), _ = jax.lax.scan(
            body, (zero_grads, zero_metrics), (micro, rngs, w_mel, w_dur)
        )
        new_state = apply_updates(state, grads, tx)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step_accum


def make_eval_step(cfg: EftsCNNConfig):
    from efficient_tts_tpu.models import model_module_for

    model = model_module_for(cfg)

    @jax.jit
    def eval_step(params, batch):
        out = model.forward(
            params,
            cfg,
            batch["text"],
            batch["text_lengths"],
            batch["mel"],
            batch["mel_lengths"],
            deterministic=True,
        )
        return {
            "loss": out["loss"],
            "mel_loss": out["mel_loss"],
            "duration_loss": out["duration_loss"],
            "imv": out["imv"],
            "reconst_alpha": out["reconst_alpha"],
            "mel_pred": out["mel_pred"],
        }

    return eval_step


def shard_state(params, tx: optax.GradientTransformation, mesh) -> dict:
    """Place params on the mesh per the sharding rules and build the train
    state there. The optimizer moments are created from the *placed*
    params (`zeros_like` inherits shardings), so they live alongside the
    parameters they update -- no per-step resharding."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    p_shard = param_sharding(params, mesh)
    placed_params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    rep = NamedSharding(mesh, PartitionSpec())
    return {
        "params": placed_params,
        "opt_state": tx.init(placed_params),
        "step": jax.device_put(jnp.zeros((), jnp.int32), rep),
    }


def shard_batch(batch: dict, mesh) -> dict:
    """Shard every batch array over the 'data' axis."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, ndim=v.ndim))
        for k, v in batch.items()
    }
