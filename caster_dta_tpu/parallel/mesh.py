"""Device meshes and data-parallel sharding.

The reference is strictly single-device (train_model.py:353-355; SURVEY §2.4).
Scaling here is native: a jax.sharding.Mesh with a 'dp' axis, batches sharded
over the batch dimension with NamedSharding, parameters replicated, and XLA
inserting the psum gradient reduction over ICI. Graph-partition parallelism
for giant proteins lives in parallel/partition.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim; other dims replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pair_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Place every leaf of a PairBatch with its batch dim sharded over dp.

    All leaves of GraphBatch/PairBatch have a leading batch dimension, so a
    single spec applies uniformly. The batch size must be divisible by the
    mesh size (BucketedLoader pads batches to full size).
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def replicate_params(params, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
