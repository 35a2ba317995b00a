"""Device meshes and SPMD sharding helpers.

The reference is a single-process, single-GPU codebase with no distributed
backend (SURVEY.md §2.5); the parallel axes that DO exist there — the rollout
batch and the training batch — become first-class sharded axes here:

- ``mesh = make_mesh()`` builds a 1-D ``('data',)`` mesh over all devices
  (rollout shooting batches and training batches shard along it; the scan
  over time is unsharded, matching the physics),
- gradients are reduced with XLA collectives inserted automatically by
  ``jit`` over sharded inputs + replicated params (psum over ICI) — the
  TPU-native replacement for the reference's nonexistent NCCL/MPI layer.

Models here are small (EfficientNet-B0-scale), so pure data parallelism is
the right decomposition; the helpers still accept extra mesh axes for future
model sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch"]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (default) device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``; rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of batched arrays with the leading dim sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)),
        batch)
