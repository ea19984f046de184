"""Step-based EFTS-CNN trainer.

Host driver mirroring `EfficientTTSTrainer`
(`/root/reference/nntts/trainers/efficient_tts_trainer.py:62-281`):
infinite epoch loop to `train_max_steps`; interval-gated logging, eval
(with IMV/alignment/mel plots on the first eval batch) and checkpoint
saves; tensorboard scalars averaged over the log interval. The compute
is one jitted XLA step (`efts_train_step.py`); batches stream from the
prefetching host loader with static-bucket shapes.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict

import numpy as np
import jax

from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
from efficient_tts_tpu.train import checkpoint as ckpt
from efficient_tts_tpu.train.efts_train_step import (
    make_eval_step,
    make_train_step,
    shard_batch,
    shard_state,
)
from efficient_tts_tpu.train.state import create_state
from efficient_tts_tpu.utils.preemption import convert_sigterm

log = logging.getLogger(__name__)


def _is_placed(batch: dict) -> bool:
    """True when the prefetcher already device_put the batch."""
    return isinstance(next(iter(batch.values())), jax.Array)


class EftsTrainer:
    def __init__(
        self,
        cfg: EftsCNNConfig,
        tx,
        train_iter,
        eval_batches=None,
        outdir: str = "exp",
        mesh=None,
        train_max_steps: int = 1_000_000,
        save_interval_steps: int = 5000,
        eval_interval_steps: int = 1000,
        log_interval_steps: int = 1000,
        seed: int = 0,
        writer=None,
        max_keep_checkpoints: int | None = None,
        accum_steps: int = 1,
    ):
        self.cfg = cfg
        self.tx = tx
        self.train_iter = train_iter
        self.eval_batches = eval_batches or []
        self.outdir = outdir
        self.mesh = mesh
        self.train_max_steps = train_max_steps
        self.save_interval_steps = save_interval_steps
        self.eval_interval_steps = eval_interval_steps
        self.log_interval_steps = log_interval_steps
        self.rng = jax.random.PRNGKey(seed)
        self.writer = writer
        self.max_keep_checkpoints = max_keep_checkpoints
        self.state = None
        self._train_step = make_train_step(cfg, tx, accum_steps=accum_steps)
        self._eval_step = make_eval_step(cfg)
        os.makedirs(outdir, exist_ok=True)

    # -- state ------------------------------------------------------------

    def init_state(self, params):
        if self.mesh is not None:
            self.state = shard_state(params, self.tx, self.mesh)
        else:
            self.state = create_state(params, self.tx)

    def save(self, wait: bool = False, name: str | None = None):
        # async: the device->host snapshot happens before return, the
        # disk write overlaps subsequent training steps; pruning only
        # runs under a retention policy, which must wait for the commit
        path = ckpt.save_checkpoint(self.outdir, self.state, wait=wait, name=name)
        log.info("saving checkpoint %s (async)", path)
        if self.max_keep_checkpoints:
            ckpt.wait_for_saves()
            ckpt.prune_checkpoints(self.outdir, self.max_keep_checkpoints)
        return path

    def load(self, path, load_only_params=False):
        self.state = ckpt.load_checkpoint(path, self.state, load_only_params)

    # -- loop -------------------------------------------------------------

    def run(self):
        """Train until `train_max_steps` (reference :62-76,279-281).

        Ctrl-C and SIGTERM (TPU-VM preemption / scheduler eviction) both
        checkpoint before exiting (`utils/preemption.py`; the reference
        handles only Ctrl-C, train.py:250-253)."""
        with convert_sigterm():
            return self._run()

    _METRIC_KEYS = ("loss", "mel_loss", "duration_loss")

    def _run(self):
        assert self.state is not None, "call init_state first"
        import jax.numpy as jnp

        # One packed [3] vector per step instead of three scalar fetches:
        # over a remote-device tunnel each device_get is a full RTT, which
        # at TTS step times (~tens of ms) dominates the loop. The fetch is
        # additionally delayed by one step (consumed after the NEXT step
        # is dispatched) so the RTT overlaps device compute.
        pack = jax.jit(lambda m: jnp.stack([m[k] for k in self._METRIC_KEYS]))
        totals = defaultdict(float)
        count = 0
        t_last = time.time()
        step = int(jax.device_get(self.state["step"]))
        first_step = True
        pending = None  # (step, epoch, packed-metrics) awaiting host fetch

        def consume(p):
            nonlocal count, t_last
            pstep, pepoch, packed = p
            vals = np.asarray(jax.device_get(packed))
            count += 1
            self._check_finite(float(vals[0]), pstep)
            for k, v in zip(self._METRIC_KEYS, vals):
                totals[k] += float(v)
            if pstep % self.log_interval_steps == 0:
                dt = time.time() - t_last
                means = {k: v / max(count, 1) for k, v in totals.items()}
                log.info(
                    "step %d (epoch %d): loss=%.4f mel=%.4f dur=%.4f (%.1f steps/s)",
                    pstep, pepoch, means["loss"], means["mel_loss"],
                    means["duration_loss"], count / max(dt, 1e-9),
                )
                if self.writer is not None:
                    for k, v in means.items():
                        self.writer.add_scalar(f"train/{k}", v, pstep)
                totals.clear()
                count = 0
                t_last = time.time()

        last_src, last_placed = None, None
        try:
            while step < self.train_max_steps:
                epoch, batch = next(self.train_iter)
                if batch is last_src:
                    batch = last_placed  # identity-cached placement
                elif self.mesh is not None and not _is_placed(batch):
                    placed = shard_batch(batch, self.mesh)
                    last_src, last_placed = batch, placed
                    batch = placed
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self._train_step(self.state, batch, sub)
                step += 1
                packed = pack(metrics)
                if first_step:
                    # First host sync = jit trace + (possibly remote) XLA
                    # compile + step; log it so a long compile is
                    # distinguishable from a hang during silent startup.
                    loss_val = float(jax.device_get(metrics["loss"]))
                    log.info("first step done in %.1fs (includes train-step "
                             "compile); loss=%.4f", time.time() - t_last,
                             loss_val)
                    first_step = False
                if pending is not None:
                    consume(pending)
                pending = (step, epoch, packed)

                if self.eval_batches and step % self.eval_interval_steps == 0:
                    self.evaluate(step)

                if step % self.save_interval_steps == 0:
                    self.save()
            if pending is not None:
                consume(pending)
                pending = None
        except KeyboardInterrupt:
            # graceful interrupt checkpoint (reference train.py:250-253)
            self.save(wait=True)
            raise
        return self.state

    def _check_finite(self, loss_val: float, step: int):
        """Divergence guard (absent upstream): a non-finite loss dumps a
        forensic state snapshot and aborts with a clear error instead of
        silently training on NaNs for the rest of a long unattended run.
        Metrics are consumed one step late (see `_run`), so the dumped
        state is one-to-two updates PAST the divergent one and likely
        NaN-propagated: it is written under `diverged-state-{step}` —
        invisible to `latest_checkpoint`, so --resume keeps using the
        last interval checkpoint."""
        import math

        if math.isfinite(loss_val):
            return
        log.error("non-finite loss %r at step %d: dumping forensic state "
                  "and aborting", loss_val, step)
        self.save(wait=True, name=f"diverged-state-{step}")
        raise FloatingPointError(
            f"training diverged: loss={loss_val} at step {step}"
        )

    def evaluate(self, step: int):
        """Eval epoch with diagnostics on the first batch (reference :193-252)."""
        totals = defaultdict(float)
        first_out = None
        first_batch = None
        for batch in self.eval_batches:
            placed = shard_batch(batch, self.mesh) if self.mesh is not None else batch
            out = self._eval_step(self.state["params"], placed)
            if first_out is None:
                first_out = jax.device_get(
                    {k: out[k] for k in ("imv", "reconst_alpha", "mel_pred")}
                )
                first_batch = batch
            for k in ("loss", "mel_loss", "duration_loss"):
                totals[k] += float(jax.device_get(out[k]))
        n = max(len(self.eval_batches), 1)
        means = {k: v / n for k, v in totals.items()}
        # alignment-health diagnostic: mean per-frame peak of the
        # reconstructed alignment. Healthy monotonic alignments approach
        # 1.0; uniform (collapsed) attention sits at ~1/T1 — the
        # predict-the-average fixed point observed at too-fast warmup.
        peak = 0.0
        if first_out is not None and first_batch is not None:
            a = first_out["reconst_alpha"]
            tl = np.asarray(first_batch["text_lengths"])
            ml = np.asarray(first_batch["mel_lengths"])
            peaks = [
                a[i, : tl[i], : ml[i]].max(axis=0).mean()
                for i in range(min(4, a.shape[0]))
            ]
            peak = float(np.mean(peaks))
            means["align_peak"] = peak
            if peak < 2.5 / max(float(tl.max()), 1.0):
                log.warning(
                    "alignment looks collapsed (mean peak %.4f ~ uniform "
                    "1/T1=%.4f): consider a longer warmup or larger batch",
                    peak, 1.0 / max(float(tl.max()), 1.0),
                )
        log.info(
            "eval step %d: loss=%.4f mel=%.4f dur=%.4f align_peak=%.3f",
            step, means["loss"], means["mel_loss"], means["duration_loss"],
            peak,
        )
        if self.writer is not None:
            for k, v in means.items():
                self.writer.add_scalar(f"eval/{k}", v, step)
        if first_out is not None:
            self._plot_diagnostics(step, first_out, first_batch)
        return means

    def _plot_diagnostics(self, step, out, batch, max_items: int = 4):
        from efficient_tts_tpu.utils.plotting import (
            save_alignment_plot,
            save_imv_plot,
            save_mel_comparison,
        )

        imgdir = os.path.join(self.outdir, "images")
        for i in range(min(max_items, out["imv"].shape[0])):
            t1 = int(batch["text_lengths"][i])
            t2 = int(batch["mel_lengths"][i])
            save_imv_plot(
                out["imv"][i][:t2], os.path.join(imgdir, f"step{step}_{i}_imv.png")
            )
            save_alignment_plot(
                out["reconst_alpha"][i][:t1, :t2],
                os.path.join(imgdir, f"step{step}_{i}_align.png"),
            )
            save_mel_comparison(
                out["mel_pred"][i][:t2],
                np.asarray(batch["mel"][i][:t2]),
                os.path.join(imgdir, f"step{step}_{i}_mel.png"),
            )
