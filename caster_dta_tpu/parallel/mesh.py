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


def shard_batch(batch, mesh: Mesh, axis_name=None):
    """Place a training-loop batch for data-parallel execution.

    - PairBatch: every leaf has a leading batch dim -> shard it over the
      mesh's axes (ALL of them flattened by default, so a 2-D dp x gp mesh
      keeps every device busy on standard buckets too).
    - StoreBatch: the graph stores are assumed already replicated (see
      DeviceResidentLoader(store_sharding=...)); the small host-side row/
      target/weight arrays shard their batch dim.
    - MegaBatch: per-step arrays are [k, B] -> shard B (axis 1).

    With params replicated and batches sharded this way, jit/GSPMD inserts
    the cross-device loss psum and gradient all-reduce automatically.
    """
    from caster_dta_tpu.data.device_cache import MegaBatch, StoreBatch

    axis_name = axis_name if axis_name is not None else tuple(mesh.axis_names)
    row = NamedSharding(mesh, P(axis_name))
    if isinstance(batch, StoreBatch):
        put = lambda a: jax.device_put(np.asarray(a), row)
        return StoreBatch(p_store=batch.p_store, m_store=batch.m_store,
                          p_rows=put(batch.p_rows), m_rows=put(batch.m_rows),
                          target=put(batch.target), weight=put(batch.weight),
                          pair_idx=put(batch.pair_idx))
    if isinstance(batch, MegaBatch):
        row2 = NamedSharding(mesh, P(None, axis_name))
        put = lambda a: jax.device_put(np.asarray(a), row2)
        return MegaBatch(p_store=batch.p_store, m_store=batch.m_store,
                         p_rows=put(batch.p_rows), m_rows=put(batch.m_rows),
                         target=put(batch.target), weight=put(batch.weight),
                         pair_idx=put(batch.pair_idx))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), row), batch)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host process setup (SURVEY §2.4 plan: jax.distributed + XLA
    collectives over ICI/DCN).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters. Call once per process before
    any jax computation; afterwards jax.devices() spans all hosts and the
    meshes built here scale across the pod.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_2d_mesh(n_dp: int, n_gp: int):
    """Combined mesh: data parallelism x graph partitioning. Batches shard
    over 'dp', giant protein graphs edge-partition over 'gp'
    (parallel/partition.py); collectives for each axis ride disjoint ICI
    rings."""
    devs = jax.devices()
    if n_dp * n_gp > len(devs):
        raise ValueError(f"mesh {n_dp}x{n_gp} needs {n_dp * n_gp} devices, "
                         f"have {len(devs)}")
    arr = np.asarray(devs[: n_dp * n_gp]).reshape(n_dp, n_gp)
    return Mesh(arr, ("dp", "gp"))
