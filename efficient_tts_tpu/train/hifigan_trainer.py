"""Host driver for HiFi-GAN vocoder training.

Mirrors the step/interval semantics of the EFTS trainer
(`efts_trainer.py`) with the GAN train step; checkpoints carry both
generator and discriminator states so training resumes exactly
(the reference has no vocoder trainer to mirror -- see SURVEY.md §2.5).
"""

from __future__ import annotations

import logging
import math
import os
import time
from collections import defaultdict

import jax

from efficient_tts_tpu.train import checkpoint as ckpt
from efficient_tts_tpu.utils.preemption import convert_sigterm

log = logging.getLogger(__name__)


def _rss_gb() -> float:
    """Host resident set size in GiB (leak observability: the round-4
    long run wedged at ~51 GB RSS — every interval log line now carries
    the number so a regression is visible in the step log itself, not
    only to an external watchdog)."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**30
    except (OSError, ValueError, IndexError):
        return float("nan")


class HiFiGANTrainer:
    def __init__(
        self,
        train_step,
        state,
        train_iter,
        outdir: str = "exp_vocoder",
        train_max_steps: int = 400_000,
        save_interval_steps: int = 5000,
        log_interval_steps: int = 100,
        writer=None,
        mesh=None,
        eval_step=None,
        eval_batches=None,
        eval_interval_steps: int = 1000,
        max_keep_checkpoints: int | None = None,
    ):
        self.train_step = train_step
        self.state = state
        self.train_iter = train_iter
        self.outdir = outdir
        self.train_max_steps = train_max_steps
        self.save_interval_steps = save_interval_steps
        self.log_interval_steps = log_interval_steps
        self.writer = writer
        self.mesh = mesh
        self.eval_step = eval_step
        self.eval_batches = eval_batches or []
        self.eval_interval_steps = eval_interval_steps
        self.max_keep_checkpoints = max_keep_checkpoints
        os.makedirs(outdir, exist_ok=True)

    def save(self, wait: bool = False, name: str | None = None):
        # async write (see efts_trainer.save): a full GAN state is
        # ~800 MB — minutes of disk time that must not block the loop
        path = ckpt.save_checkpoint(self.outdir, self.state, wait=wait, name=name)
        log.info("saving vocoder checkpoint %s (async)", path)
        if self.max_keep_checkpoints:
            ckpt.wait_for_saves()
            ckpt.prune_checkpoints(self.outdir, self.max_keep_checkpoints)
        return path

    def load(self, path):
        """Resume, reconciling the optional "ema" subtree so a change of
        --ema_decay across runs doesn't die on a raw orbax structure
        mismatch."""
        tracking = "ema" in self.state
        on_disk = "ema" in ckpt.checkpoint_keys(path)
        if on_disk and not tracking:
            log.warning(
                "checkpoint carries an EMA generator but --ema_decay is "
                "unset: the saved EMA will be dropped and not carried "
                "forward (pass --ema_decay to keep tracking it)"
            )
            template = {**self.state, "ema": self.state["gen"]["params"]}
            restored = ckpt.load_checkpoint(path, template)
            restored.pop("ema")
        elif tracking and not on_disk:
            log.warning(
                "checkpoint predates EMA tracking; seeding the EMA from the "
                "restored generator params"
            )
            template = {k: v for k, v in self.state.items() if k != "ema"}
            restored = ckpt.load_checkpoint(path, template)
            restored["ema"] = restored["gen"]["params"]
        else:
            restored = ckpt.load_checkpoint(path, self.state)
        self.state = restored

    def run(self):
        """Ctrl-C and SIGTERM (TPU-VM preemption / scheduler eviction)
        both checkpoint before exiting (`utils/preemption.py`)."""
        with convert_sigterm():
            return self._run()

    def _run(self):
        import numpy as np
        import jax.numpy as jnp

        # Packed single-array metric fetch, consumed one step late so the
        # (possibly remote-tunnel) device->host RTT overlaps the next
        # step's compute — mirrors EftsTrainer._run.
        keys = None
        pack = jax.jit(lambda m, ks: jnp.stack([m[k] for k in ks]),
                       static_argnums=1)
        totals = defaultdict(float)
        count = 0
        t_last = time.time()
        step = int(jax.device_get(self.state["step"]))
        first_step = True
        pending = None  # (step, packed-metrics)

        def consume(p):
            nonlocal count, t_last
            pstep, packed = p
            vals = np.asarray(jax.device_get(packed))
            count += 1
            for k, val in zip(keys, (float(v) for v in vals)):
                if k in ("g_loss", "d_loss") and not math.isfinite(val):
                    log.error(
                        "non-finite %s=%r at step %d: dumping forensic "
                        "state and aborting (divergence guard); resume "
                        "from the last interval checkpoint, NOT this dump "
                        "(it is 1-2 updates past the divergence and "
                        "likely NaN-propagated)", k, val, pstep,
                    )
                    self.save(wait=True, name=f"diverged-state-{pstep}")
                    raise FloatingPointError(
                        f"GAN training diverged: {k}={val} at step {pstep}"
                    )
                totals[k] += val
            if pstep % self.log_interval_steps == 0:
                dt = time.time() - t_last
                means = {k: v / count for k, v in totals.items()}
                log.info(
                    "step %d: g=%.3f d=%.3f mel_l1=%.3f (%.2f steps/s, "
                    "rss %.2f GB)",
                    pstep, means.get("g_loss", 0), means.get("d_loss", 0),
                    means.get("mel_l1", 0), count / max(dt, 1e-9), _rss_gb(),
                )
                if self.writer is not None:
                    for k, v in means.items():
                        self.writer.add_scalar(f"vocoder/{k}", v, pstep)
                totals.clear()
                count = 0
                t_last = time.time()

        last_src, last_placed = None, None
        try:
            while step < self.train_max_steps:
                _, batch = next(self.train_iter)
                if batch is last_src:
                    batch = last_placed  # identity-cached placement
                elif self.mesh is not None:
                    from efficient_tts_tpu.train.efts_train_step import shard_batch

                    placed = shard_batch(batch, self.mesh)
                    last_src, last_placed = batch, placed
                    batch = placed
                self.state, metrics = self.train_step(self.state, batch)
                step += 1
                if keys is None:
                    keys = tuple(sorted(metrics))
                packed = pack(metrics, keys)
                if first_step:
                    jax.block_until_ready(packed)
                    # distinguishes a long (possibly remote) GAN-step
                    # compile from a hang during silent startup
                    log.info("first step done in %.1fs (includes train-step "
                             "compile)", time.time() - t_last)
                    first_step = False
                if pending is not None:
                    consume(pending)
                pending = (step, packed)
                if (
                    self.eval_step is not None
                    and self.eval_batches
                    and step % self.eval_interval_steps == 0
                ):
                    self.evaluate(step)
                if step % self.save_interval_steps == 0:
                    self.save()
            if pending is not None:
                consume(pending)
                pending = None
        except KeyboardInterrupt:
            self.save(wait=True)
            raise
        return self.state

    def evaluate(self, step: int):
        from efficient_tts_tpu.train.hifigan_train_step import ema_generator_params

        total, n = 0.0, 0
        for batch in self.eval_batches:
            out = self.eval_step(ema_generator_params(self.state), batch)
            total += float(jax.device_get(out["mel_l1"]))
            n += 1
        mel_l1 = total / max(n, 1)
        log.info("eval step %d: mel_l1=%.4f", step, mel_l1)
        if self.writer is not None:
            self.writer.add_scalar("vocoder/eval_mel_l1", mel_l1, step)
        return mel_l1
