"""Orbax checkpointing of {params, opt_state, step}.

Same semantics as the reference trainer
(`trainers/efficient_tts_trainer.py:78-119`): `save` writes the full
train state at `outdir/checkpoint-{step}steps`; `load` either restores
everything (--resume) or parameters only (--pretrain,
`load_only_params=True`). Checkpoints are sharding-aware (orbax restores
onto the current mesh).
"""

from __future__ import annotations

import atexit
import os

import jax
import orbax.checkpoint as ocp

_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer():
    """One long-lived AsyncCheckpointer for the process: lets saves
    overlap training (orbax copies device->host synchronously, then
    writes to disk in the background — on this class of disk a full GAN
    state is minutes of write time that should not block steps)."""
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(wait_for_saves)  # never lose the last async save
    return _CKPTR


def wait_for_saves() -> None:
    """Block until every outstanding async save has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(
    outdir: str,
    state: dict,
    step: int | None = None,
    wait: bool = True,
    name: str | None = None,
) -> str:
    """`wait=False` returns as soon as the device->host snapshot is
    taken; the disk write completes in the background (serialized with
    any previous in-flight save). Call `wait_for_saves()` (or let the
    atexit hook) before reading the path back.

    `name` overrides the default `checkpoint-{step}steps` directory name.
    Names that don't match that pattern are invisible to
    `latest_checkpoint` — used for the divergence guard's forensic dump,
    which holds a state 1-2 updates PAST the divergent step (metrics are
    consumed one step late) and must never be auto-resumed."""
    if step is None:
        step = int(jax.device_get(state["step"]))
    path = os.path.join(
        os.path.abspath(outdir), name or f"checkpoint-{step}steps"
    )
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, template_state: dict, load_only_params: bool = False) -> dict:
    """Restore a checkpoint into the structure of `template_state`.

    With `load_only_params` (the reference's --pretrain mode), only the
    parameter subtree is read (template-free, so the saved optimizer
    structure need not match the current one) and optimizer state/step
    come fresh from the template.
    """
    wait_for_saves()  # a just-written async checkpoint must be committed
    ckptr = _checkpointer()
    if load_only_params:
        restored = ckptr.restore(os.path.abspath(path))
        return {
            "params": jax.tree_util.tree_map(
                lambda t, r: jax.numpy.asarray(r, t.dtype),
                template_state["params"],
                restored["params"],
            ),
            "opt_state": template_state["opt_state"],
            "step": template_state["step"],
        }
    restored = ckptr.restore(os.path.abspath(path), template_state)
    return restored


def checkpoint_keys(path: str) -> set:
    """Top-level keys of a saved state tree (from metadata, no data read)."""
    meta = _checkpointer().metadata(os.path.abspath(path))
    tree = getattr(meta, "item_metadata", meta)
    if hasattr(tree, "tree"):
        tree = tree.tree
    return set(tree.keys())


def latest_checkpoint(outdir: str) -> str | None:
    """Scan `outdir` for the highest-step checkpoint
    (analog of `vocoders/utils.py:scan_checkpoint`)."""
    if not os.path.isdir(outdir):
        return None
    best, best_step = None, -1
    for name in os.listdir(outdir):
        if name.startswith("checkpoint-") and name.endswith("steps"):
            try:
                step = int(name[len("checkpoint-") : -len("steps")])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(outdir, name), step
    return best


def prune_checkpoints(outdir: str, keep: int | None) -> list:
    """Delete all but the newest `keep` checkpoints in `outdir` (by step).

    Production disk hygiene for large GAN states (~800 MB each); the
    reference keeps everything (`trainer:259-263`), so `keep=None`
    (default in the trainers) preserves that behavior. Returns the
    removed paths."""
    import shutil

    if not keep or not os.path.isdir(outdir):
        return []
    steps = []
    for name in os.listdir(outdir):
        if name.startswith("checkpoint-") and name.endswith("steps"):
            try:
                steps.append((int(name[len("checkpoint-"):-len("steps")]), name))
            except ValueError:
                continue
    removed = []
    for _, name in sorted(steps)[:-keep]:
        path = os.path.join(outdir, name)
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed
