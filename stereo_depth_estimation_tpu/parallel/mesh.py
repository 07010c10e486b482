"""Device mesh construction and sharding helpers.

The reference is single-process single-device (SURVEY.md §2: no parallelism
anywhere). Here data-parallel scaling is first-class, the JAX way: a 1-D
``data`` mesh (extendable to 2-D ``(data, model)`` later), batches sharded on
the leading axis with ``NamedSharding``, parameters replicated, and XLA
emitting the gradient all-reduce over ICI. Multi-host enters via
``jax.distributed.initialize`` + per-host feeding with
``jax.make_array_from_process_local_data`` — no NCCL-style backend to manage.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: list[Any] | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_to_mesh(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch pytree with the batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
