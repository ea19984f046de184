"""Whole-model re-initialization utilities.

Counterpart of `/root/reference/nntts/layers/initializer.py:11-41`
(`initialize(model, init_type)` with xavier/kaiming uniform/normal),
operating on pytree params: every rank>=2 kernel leaf is re-drawn, biases
and norm scales are untouched.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape):
    # kernels are [..., in, out] (WIO / [in,out]); embedding [V, C]
    fan_in = int(jnp.prod(jnp.asarray(shape[:-1])))
    fan_out = shape[-1]
    return fan_in, fan_out


def initialize(params, init_type: str, key) -> dict:
    """Re-initialize all kernel leaves: 'xavier_uniform' | 'xavier_normal' |
    'kaiming_uniform' | 'kaiming_normal'."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = list(jax.random.split(key, len(leaves)))
    out = []
    for leaf, k in zip(leaves, keys):
        if not hasattr(leaf, "ndim") or leaf.ndim < 2:
            out.append(leaf)
            continue
        fan_in, fan_out = _fans(leaf.shape)
        if init_type == "xavier_uniform":
            bound = math.sqrt(6.0 / (fan_in + fan_out))
            new = jax.random.uniform(k, leaf.shape, leaf.dtype, -bound, bound)
        elif init_type == "xavier_normal":
            std = math.sqrt(2.0 / (fan_in + fan_out))
            new = std * jax.random.normal(k, leaf.shape, leaf.dtype)
        elif init_type == "kaiming_uniform":
            bound = math.sqrt(6.0 / fan_in)
            new = jax.random.uniform(k, leaf.shape, leaf.dtype, -bound, bound)
        elif init_type == "kaiming_normal":
            std = math.sqrt(2.0 / fan_in)
            new = std * jax.random.normal(k, leaf.shape, leaf.dtype)
        else:
            raise ValueError(f"unknown init_type: {init_type}")
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)
