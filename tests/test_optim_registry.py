"""Torch-semantics optimizer/scheduler registry parity.

The reference lets configs name any torch.optim / torch.optim.lr_scheduler
class (`nntts/optimizers/__init__.py:1`, `nntts/schedulers/__init__.py:1`,
resolved via getattr in `nntts/bin/train.py:190-203`). These tests run the
actual torch implementations side-by-side with our optax transforms and
require the parameter trajectories / lr sequences to match.
"""

import numpy as np
import optax
import pytest
import torch

import jax.numpy as jnp

from efficient_tts_tpu.train.torch_optim import (
    OPTIMIZER_FACTORIES,
    SCHEDULER_FACTORIES,
)
from efficient_tts_tpu.utils.config import optimizer_from_dict

N_STEPS = 7


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    params = [
        rng.normal(size=(4, 3)).astype(np.float32),
        rng.normal(size=(5,)).astype(np.float32),
    ]
    grads = [
        [rng.normal(size=p.shape).astype(np.float32) for p in params]
        for _ in range(N_STEPS)
    ]
    return params, grads


def _run_torch(name, kwargs, params, grads, sched=None, sched_kwargs=None):
    tparams = [torch.tensor(p.copy(), requires_grad=True) for p in params]
    opt = getattr(torch.optim, name)(tparams, **kwargs)
    scheduler = (
        getattr(torch.optim.lr_scheduler, sched)(opt, **sched_kwargs)
        if sched
        else None
    )
    for step_grads in grads:
        for p, g in zip(tparams, step_grads):
            p.grad = torch.tensor(g)
        opt.step()
        if scheduler is not None:
            scheduler.step()
    return [p.detach().numpy() for p in tparams]


def _run_ours(tx, params, grads):
    jparams = [jnp.asarray(p) for p in params]
    state = tx.init(jparams)
    for step_grads in grads:
        updates, state = tx.update(
            [jnp.asarray(g) for g in step_grads], state, jparams
        )
        jparams = optax.apply_updates(jparams, updates)
    return [np.asarray(p) for p in jparams]


OPT_CASES = [
    ("SGD", dict(lr=0.05)),
    ("SGD", dict(lr=0.05, momentum=0.9)),
    ("SGD", dict(lr=0.05, momentum=0.9, dampening=0.1, weight_decay=1e-2)),
    ("SGD", dict(lr=0.05, momentum=0.9, nesterov=True, weight_decay=1e-2)),
    ("Adam", dict(lr=1e-2, betas=(0.9, 0.99), eps=1e-9, weight_decay=1e-2)),
    ("Adam", dict(lr=1e-2, amsgrad=True, weight_decay=1e-2)),
    ("AdamW", dict(lr=1e-2, weight_decay=1e-2)),
    ("Adamax", dict(lr=2e-3, weight_decay=1e-2)),
    ("Adagrad", dict(lr=1e-2, lr_decay=1e-2, weight_decay=1e-2)),
    ("Adadelta", dict(lr=0.5, rho=0.8, weight_decay=1e-2)),
    ("RMSprop", dict(lr=1e-2, alpha=0.95, weight_decay=1e-2)),
    ("RMSprop", dict(lr=1e-2, momentum=0.9, centered=True)),
    ("NAdam", dict(lr=2e-3, weight_decay=1e-2)),
]


@pytest.mark.parametrize(
    "name,kwargs", OPT_CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(OPT_CASES)]
)
def test_optimizer_matches_torch(name, kwargs):
    params, grads = _problem()
    ref = _run_torch(name, kwargs, params, grads)
    got = _run_ours(OPTIMIZER_FACTORIES[name](**kwargs), params, grads)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6)


SCHED_CASES = [
    ("StepLR", dict(step_size=3, gamma=0.5)),
    ("MultiStepLR", dict(milestones=[2, 5, 6], gamma=0.3)),
    ("ExponentialLR", dict(gamma=0.9)),
    ("CosineAnnealingLR", dict(T_max=5, eta_min=1e-4)),
    ("CosineAnnealingWarmRestarts", dict(T_0=3)),
    ("CosineAnnealingWarmRestarts", dict(T_0=2, T_mult=2)),
    ("LinearLR", dict(start_factor=0.25, end_factor=1.0, total_iters=4)),
    ("ConstantLR", dict(factor=0.5, total_iters=4)),
    ("PolynomialLR", dict(total_iters=6, power=2.0)),
]


@pytest.mark.parametrize(
    "name,kwargs",
    SCHED_CASES,
    ids=[f"{n}-{i}" for i, (n, _) in enumerate(SCHED_CASES)],
)
def test_scheduler_matches_torch(name, kwargs):
    base_lr = 0.1
    p = torch.zeros(1, requires_grad=True)
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = getattr(torch.optim.lr_scheduler, name)(opt, **kwargs)
    ref_lrs = []
    for _ in range(10):
        ref_lrs.append(opt.param_groups[0]["lr"])
        p.grad = torch.zeros(1)
        opt.step()
        sched.step()
    schedule = SCHEDULER_FACTORIES[name](base_lr, **kwargs)
    got = [float(schedule(c)) for c in range(10)]
    np.testing.assert_allclose(got, ref_lrs, rtol=1e-5, atol=1e-7)


def test_config_resolves_any_torch_pairing():
    """optimizer_from_dict with AdamW + StepLR matches torch end-to-end."""
    params, grads = _problem(seed=1)
    config = {
        "optimizer_type": "AdamW",
        "optimizer_params": {"lr": 1e-2, "weight_decay": 1e-2},
        "scheduler_type": "StepLR",
        "scheduler_params": {"step_size": 2, "gamma": 0.5},
        "grad_norm": None,
    }
    tx = optimizer_from_dict(config)
    got = _run_ours(tx, params, grads)
    ref = _run_torch(
        "AdamW",
        dict(lr=1e-2, weight_decay=1e-2),
        params,
        grads,
        sched="StepLR",
        sched_kwargs=dict(step_size=2, gamma=0.5),
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6)


def test_config_grad_norm_clip_still_applies():
    config = {
        "optimizer_type": "SGD",
        "optimizer_params": {"lr": 1.0},
        "scheduler_type": "none",
        "grad_norm": 1e-3,
    }
    tx = optimizer_from_dict(config)
    params = [jnp.ones((3,))]
    state = tx.init(params)
    updates, _ = tx.update([jnp.full((3,), 100.0)], state, params)
    assert float(jnp.linalg.norm(updates[0])) <= 1e-3 + 1e-9

    with pytest.raises(ValueError):
        optimizer_from_dict({"optimizer_type": "LBFGS"})
    with pytest.raises(ValueError):
        optimizer_from_dict(
            {"optimizer_type": "SGD", "scheduler_type": "ReduceLROnPlateau"}
        )
