"""Torch-semantics optimizers and LR schedulers for config-name parity.

The reference registry re-exports the ENTIRE torch namespaces —
`from torch.optim import *` (`nntts/optimizers/__init__.py:1`) and
`from torch.optim.lr_scheduler import *` (`nntts/schedulers/__init__.py:1`)
— so any reference YAML may name `SGD`, `AdamW`, `RMSprop`, `StepLR`,
`CosineAnnealingLR`, ... and resolve it by `getattr`
(`nntts/bin/train.py:190-203`). This module provides the same config
surface as optax gradient transformations whose update rules match
torch's documented algorithms step-for-step (verified numerically in
`tests/test_optim_registry.py` against torch.optim itself).

Semantics notes (all per torch master docs / source):
  * `weight_decay` on everything except AdamW is L2: `g += wd * p`
    BEFORE the moment updates (not decoupled).
  * AdamW decays the parameter directly: `p *= (1 - lr*wd)` before the
    Adam update.
  * SGD's first momentum step initializes `buf = g` (NOT
    `(1-dampening)*g`) — a torch quirk we reproduce.
  * Schedulers are stepped once per optimizer step by the reference
    trainer (`trainers/efficient_tts_trainer.py:158-160`); optax hands
    us the 0-based count of completed steps, which equals torch's
    `last_epoch` at the time the lr is consumed.

LBFGS and ReduceLROnPlateau are intentionally not mirrored: LBFGS is a
closure-based line-search optimizer incompatible with a jit-compiled
fixed-step train loop, and ReduceLROnPlateau consumes eval metrics the
reference trainer never passes (calling `.step()` without metrics on it
raises in torch, so no reference config could have used it either).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def _tree_zeros(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


class TraceState(NamedTuple):
    count: chex.Array
    buf: optax.Updates


class ScaleBySgdState(NamedTuple):
    count: chex.Array
    buf: optax.Updates


def sgd_torch(
    lr: float = 1e-3,
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.SGD. First momentum step sets buf = g (torch quirk)."""

    def init(params):
        return ScaleBySgdState(jnp.zeros([], jnp.int32), _tree_zeros(params))

    def update(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        if momentum:
            first = state.count == 0

            def mom(buf, g):
                stepped = momentum * buf + (1.0 - dampening) * g
                return jnp.where(first, g, stepped)

            buf = jax.tree_util.tree_map(mom, state.buf, updates)
            if nesterov:
                updates = jax.tree_util.tree_map(
                    lambda g, b: g + momentum * b, updates, buf
                )
            else:
                updates = buf
        else:
            buf = state.buf
        updates = jax.tree_util.tree_map(lambda g: -lr * g, updates)
        return updates, ScaleBySgdState(state.count + 1, buf)

    return optax.GradientTransformation(init, update)


class ScaleByAdamTorchState(NamedTuple):
    count: chex.Array
    m: optax.Updates
    v: optax.Updates
    vmax: optax.Updates


def adam_torch(
    lr: float = 1e-3,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
    decoupled: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.Adam / AdamW (decoupled=True).

    Torch applies eps OUTSIDE the bias-corrected sqrt:
        p -= lr * m_hat / (sqrt(v_hat) + eps).
    """
    b1, b2 = betas

    def init(params):
        z = _tree_zeros(params)
        return ScaleByAdamTorchState(jnp.zeros([], jnp.int32), z, z, _tree_zeros(params) if amsgrad else z)

    def update(updates, state, params=None):
        if weight_decay and not decoupled:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, updates
        )
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, updates
        )
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t
        if amsgrad:
            vmax = jax.tree_util.tree_map(jnp.maximum, state.vmax, v)
            denom_src = vmax
        else:
            vmax = state.vmax
            denom_src = v
        step = jax.tree_util.tree_map(
            lambda m_, v_: -lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps),
            m,
            denom_src,
        )
        if weight_decay and decoupled:
            step = jax.tree_util.tree_map(
                lambda s, p: s - lr * weight_decay * p, step, params
            )
        return step, ScaleByAdamTorchState(count, m, v, vmax)

    return optax.GradientTransformation(init, update)


class ScaleByAdamaxState(NamedTuple):
    count: chex.Array
    m: optax.Updates
    u: optax.Updates


def adamax_torch(
    lr: float = 2e-3,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.Adamax: u = max(b2*u, |g| + eps); p -= lr/(1-b1^t) * m/u."""
    b1, b2 = betas

    def init(params):
        return ScaleByAdamaxState(
            jnp.zeros([], jnp.int32), _tree_zeros(params), _tree_zeros(params)
        )

    def update(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, updates
        )
        u = jax.tree_util.tree_map(
            lambda u_, g: jnp.maximum(b2 * u_, jnp.abs(g) + eps), state.u, updates
        )
        clr = lr / (1.0 - b1**t)
        step = jax.tree_util.tree_map(lambda m_, u_: -clr * m_ / u_, m, u)
        return step, ScaleByAdamaxState(count, m, u)

    return optax.GradientTransformation(init, update)


class ScaleByAdagradState(NamedTuple):
    count: chex.Array
    sum: optax.Updates


def adagrad_torch(
    lr: float = 1e-2,
    lr_decay: float = 0.0,
    weight_decay: float = 0.0,
    initial_accumulator_value: float = 0.0,
    eps: float = 1e-10,
) -> optax.GradientTransformation:
    """torch.optim.Adagrad: lr_t = lr / (1 + (t-1)*lr_decay)."""

    def init(params):
        acc = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params
        )
        return ScaleByAdagradState(jnp.zeros([], jnp.int32), acc)

    def update(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        count = state.count + 1
        t = count.astype(jnp.float32)
        clr = lr / (1.0 + (t - 1.0) * lr_decay)
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g * g, state.sum, updates
        )
        step = jax.tree_util.tree_map(
            lambda g, a: -clr * g / (jnp.sqrt(a) + eps), updates, acc
        )
        return step, ScaleByAdagradState(count, acc)

    return optax.GradientTransformation(init, update)


class ScaleByAdadeltaState(NamedTuple):
    sq_avg: optax.Updates
    acc_delta: optax.Updates


def adadelta_torch(
    lr: float = 1.0,
    rho: float = 0.9,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.Adadelta."""

    def init(params):
        return ScaleByAdadeltaState(_tree_zeros(params), _tree_zeros(params))

    def update(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        sq_avg = jax.tree_util.tree_map(
            lambda s, g: rho * s + (1 - rho) * g * g, state.sq_avg, updates
        )
        delta = jax.tree_util.tree_map(
            lambda g, s, a: g * jnp.sqrt(a + eps) / jnp.sqrt(s + eps),
            updates,
            sq_avg,
            state.acc_delta,
        )
        acc_delta = jax.tree_util.tree_map(
            lambda a, d: rho * a + (1 - rho) * d * d, state.acc_delta, delta
        )
        step = jax.tree_util.tree_map(lambda d: -lr * d, delta)
        return step, ScaleByAdadeltaState(sq_avg, acc_delta)

    return optax.GradientTransformation(init, update)


class ScaleByRmspropState(NamedTuple):
    count: chex.Array
    sq: optax.Updates
    avg: optax.Updates
    buf: optax.Updates


def rmsprop_torch(
    lr: float = 1e-2,
    alpha: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    centered: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop (eps OUTSIDE the sqrt, unlike optax's)."""

    def init(params):
        z = _tree_zeros(params)
        return ScaleByRmspropState(jnp.zeros([], jnp.int32), z, z, _tree_zeros(params))

    def update(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        sq = jax.tree_util.tree_map(
            lambda s, g: alpha * s + (1 - alpha) * g * g, state.sq, updates
        )
        if centered:
            avg = jax.tree_util.tree_map(
                lambda a, g: alpha * a + (1 - alpha) * g, state.avg, updates
            )
            denom = jax.tree_util.tree_map(
                lambda s, a: jnp.sqrt(s - a * a) + eps, sq, avg
            )
        else:
            avg = state.avg
            denom = jax.tree_util.tree_map(lambda s: jnp.sqrt(s) + eps, sq)
        scaled = jax.tree_util.tree_map(lambda g, d: g / d, updates, denom)
        if momentum:
            buf = jax.tree_util.tree_map(
                lambda b, s: momentum * b + s, state.buf, scaled
            )
            step = jax.tree_util.tree_map(lambda b: -lr * b, buf)
        else:
            buf = state.buf
            step = jax.tree_util.tree_map(lambda s: -lr * s, scaled)
        return step, ScaleByRmspropState(state.count + 1, sq, avg, buf)

    return optax.GradientTransformation(init, update)


class ScaleByNadamState(NamedTuple):
    count: chex.Array
    mu_product: chex.Array
    m: optax.Updates
    v: optax.Updates


def nadam_torch(
    lr: float = 2e-3,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum_decay: float = 4e-3,
) -> optax.GradientTransformation:
    """torch.optim.NAdam with its mu-product bias correction."""
    b1, b2 = betas

    def init(params):
        return ScaleByNadamState(
            jnp.zeros([], jnp.int32),
            jnp.ones([], jnp.float32),
            _tree_zeros(params),
            _tree_zeros(params),
        )

    def update(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * momentum_decay))
        mu_product = state.mu_product * mu_t
        mu_product_next = mu_product * mu_next
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, updates
        )
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, updates
        )
        bc2 = 1.0 - b2**t

        def stepfn(g, m_, v_):
            denom = jnp.sqrt(v_ / bc2) + eps
            return -lr * (
                (1.0 - mu_t) / (1.0 - mu_product) * g
                + mu_next / (1.0 - mu_product_next) * m_
            ) / denom

        step = jax.tree_util.tree_map(stepfn, updates, m, v)
        return step, ScaleByNadamState(count, mu_product, m, v)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------
# torch.optim.lr_scheduler formulas (count = completed optimizer steps,
# equal to torch's last_epoch when the trainer steps the scheduler once
# per optimizer step — `trainers/efficient_tts_trainer.py:158-160`).
# --------------------------------------------------------------------------


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1):
    def schedule(count):
        e = jnp.asarray(count, jnp.float32) // step_size
        return base_lr * gamma**e

    return schedule


def multi_step_lr(base_lr: float, milestones, gamma: float = 0.1):
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(count):
        e = jnp.asarray(count, jnp.float32)
        n = jnp.sum(ms <= e).astype(jnp.float32)
        return base_lr * gamma**n

    return schedule


def exponential_lr(base_lr: float, gamma: float):
    def schedule(count):
        return base_lr * gamma ** jnp.asarray(count, jnp.float32)

    return schedule


def cosine_annealing_lr(base_lr: float, T_max: int, eta_min: float = 0.0):
    def schedule(count):
        e = jnp.asarray(count, jnp.float32)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * e / T_max)) / 2

    return schedule


def cosine_annealing_warm_restarts(
    base_lr: float, T_0: int, T_mult: int = 1, eta_min: float = 0.0
):
    def schedule(count):
        e = jnp.asarray(count, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(e, T_0)
            t_i = jnp.asarray(T_0, jnp.float32)
        else:
            # closed form: find cycle n with sum_{i<n} T_0*mult^i <= e
            n = jnp.floor(
                jnp.log(e / T_0 * (T_mult - 1) + 1) / math.log(T_mult)
            )
            start = T_0 * (T_mult**n - 1) / (T_mult - 1)
            t_cur = e - start
            t_i = T_0 * jnp.asarray(T_mult, jnp.float32) ** n
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * t_cur / t_i)) / 2

    return schedule


def linear_lr(
    base_lr: float,
    start_factor: float = 1.0 / 3,
    end_factor: float = 1.0,
    total_iters: int = 5,
):
    def schedule(count):
        e = jnp.minimum(jnp.asarray(count, jnp.float32), total_iters)
        factor = start_factor + (end_factor - start_factor) * e / total_iters
        return base_lr * factor

    return schedule


def constant_lr(base_lr: float, factor: float = 1.0 / 3, total_iters: int = 5):
    def schedule(count):
        e = jnp.asarray(count, jnp.float32)
        return base_lr * jnp.where(e < total_iters, factor, 1.0)

    return schedule


def polynomial_lr(base_lr: float, total_iters: int = 5, power: float = 1.0):
    def schedule(count):
        e = jnp.minimum(jnp.asarray(count, jnp.float32), total_iters)
        return base_lr * (1.0 - e / total_iters) ** power

    return schedule


OPTIMIZER_FACTORIES = {
    "SGD": sgd_torch,
    "Adam": lambda **kw: adam_torch(**kw),
    "AdamW": lambda **kw: adam_torch(decoupled=True, **kw),
    "Adamax": adamax_torch,
    "Adagrad": adagrad_torch,
    "Adadelta": adadelta_torch,
    "RMSprop": rmsprop_torch,
    "NAdam": nadam_torch,
}

SCHEDULER_FACTORIES = {
    "StepLR": step_lr,
    "MultiStepLR": multi_step_lr,
    "ExponentialLR": exponential_lr,
    "CosineAnnealingLR": cosine_annealing_lr,
    "CosineAnnealingWarmRestarts": cosine_annealing_warm_restarts,
    "LinearLR": linear_lr,
    "ConstantLR": constant_lr,
    "PolynomialLR": polynomial_lr,
}
