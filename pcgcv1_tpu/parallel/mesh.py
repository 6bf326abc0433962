"""Device mesh / sharding for the codec and trainer.

The reference has no distribution whatsoever (single GPU, per-cube serial
loops — SURVEY.md §2 checklist). The TPU-native design:

- the cube batch is the data axis: cubes are independent, so data
  parallelism over `Mesh('data')` is the natural (and near-lossless)
  parallelization of both inference and training;
- optional tensor parallelism over `'model'` shards wide conv channels via
  GSPMD sharding constraints — XLA inserts the ICI collectives;
- host-side entropy coding stays embarrassingly parallel per cube
  (OpenMP across cubes) and is concatenated in canonical cube order, so
  multi-host deployment only needs per-host cube shards (DCN carries no
  tensor traffic).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """Create a ('data', 'model') mesh.

    Args:
      n_data: data-parallel size (defaults to n_devices // n_model).
      n_model: tensor-parallel size.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def batch_sharding(mesh):
    """Sharding for [B, ...] arrays: batch over 'data', replicated rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _param_spec(path, leaf, min_shard_dim):
    """Channel-shard large conv kernels over 'model'; replicate the rest.

    Conv kernels are [kd, kh, kw, cin, cout]; shard cout when divisible.
    """
    if leaf.ndim == 5 and leaf.shape[-1] % min_shard_dim == 0 \
            and leaf.shape[-1] >= 2 * min_shard_dim:
        return P(None, None, None, None, "model")
    return P()


def shard_params(params, mesh):
    """NamedShardings for a param tree: TP over conv output channels when
    the 'model' axis is non-trivial, otherwise fully replicated."""
    n_model = mesh.shape["model"]
    if n_model == 1:
        return jax.tree.map(
            lambda _: NamedSharding(mesh, P()), params)
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _param_spec(None, leaf, n_model)),
        params)
