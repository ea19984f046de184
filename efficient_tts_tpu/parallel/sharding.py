"""Sharding rules: pytree path patterns -> PartitionSpecs.

Replaces the reference's DistributedSampler + DDP wrapping
(`nntts/bin/train.py:136-150,210-216`): data parallelism is expressed by
sharding the batch over the 'data' mesh axis; tensor parallelism by
sharding channel axes over 'model'. GSPMD inserts the psum/all-gathers.

Rules (pattern-matched on array rank/shape inside the param tree):
  conv kernels  [k, in, out]      -> (None, None, 'model')
  conv-T kernels share layout; weight-norm g keeps its broadcast shape
  linear kernels [in, out]        -> (None, 'model')
  embedding table [V, C]          -> (None, 'model')
  biases / norm scales [C]        -> replicated
The 'model' axis is only applied where the axis length is divisible by
the mesh extent; otherwise the leaf is replicated (safe default).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from efficient_tts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _leaf_spec(path: tuple, leaf, model_extent: int) -> P:
    if leaf.ndim >= 2 and leaf.shape[-1] % model_extent == 0 and leaf.shape[-1] > 1:
        # kernels, embedding tables, weight-norm v: shard output channels
        return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
    return P()


def param_specs(params, mesh: Mesh):
    """Pytree of PartitionSpecs for a parameter tree."""
    model_extent = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, model_extent), params
    )


def param_sharding(params, mesh: Mesh):
    """Pytree of NamedShardings matching `param_specs`."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params, mesh)
    )


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
