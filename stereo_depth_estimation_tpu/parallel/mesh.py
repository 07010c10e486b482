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
SPATIAL_AXIS = "spatial"


def make_mesh(
    devices: list[Any] | None = None,
    axis_name: str = DATA_AXIS,
    spatial: int = 1,
) -> Mesh:
    """Device mesh for training: 1-D ``(data,)`` by default, or a 2-D
    ``(data, spatial)`` mesh when ``spatial > 1``.

    On the 2-D mesh the batch axis shards over ``data`` and image HEIGHT
    shards over ``spatial`` — XLA's SPMD partitioner inserts the halo
    exchanges 3x3 convolutions need at shard edges, so the model code is
    unchanged. This is the honest analog of sequence parallelism for this
    workload (SURVEY.md §2): it scales the resolution axis when one chip's
    HBM can't hold full-resolution activations.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spatial <= 1:
        return Mesh(devices, (axis_name,))
    if len(devices) % spatial != 0:
        raise ValueError(
            f"{len(devices)} devices do not factor into spatial={spatial}"
        )
    return Mesh(
        devices.reshape(len(devices) // spatial, spatial),
        (axis_name, SPATIAL_AXIS),
    )


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for batched NHW[C] arrays: batch over ``data``; on a 2-D
    mesh, height additionally over ``spatial``."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(axis_name, SPATIAL_AXIS))
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _pad_batch_rows(batch: dict[str, Any], pad: int) -> dict[str, Any]:
    """Append ``pad`` wrap-around rows with ``valid_mask`` forced False.

    Pad rows duplicate real samples (so BatchNorm batch statistics see
    plausible images, not zeros), while the mask zeroes their contribution
    to the loss and every metric sum (masked reductions, ops/loss.py).

    When the incoming batch carries no mask, the emitted one is RANK-1
    per-row flags: the step broadcasts it against its own on-device
    ``target > 0`` (train_step.py::_targets_and_mask), so the host ships
    B bools instead of B*H*W (a full bool mask is ~17% extra H2D at
    480x640 batch 24 on the measured 36 MB/s tunneled link). An incoming
    mask of any rank is index-padded with the new rows forced False."""
    n = int(next(iter(batch.values())).shape[0])
    idx = np.concatenate([np.arange(n), np.arange(pad) % n])
    mask = batch.get("valid_mask")
    if mask is None:
        mask = np.ones(len(idx), bool)
    else:
        mask = np.asarray(mask)[idx].copy()
    mask[n:] = False
    out = {k: np.asarray(v)[idx] for k, v in batch.items() if k != "valid_mask"}
    out["valid_mask"] = mask
    return out


def pad_batch_for_mesh(
    batch: dict[str, Any], n_devices: int
) -> dict[str, Any]:
    """Pad a {input, target[, valid_mask]} batch so the leading axis is a
    multiple of ``n_devices``, without perturbing training math.

    The reference never faces this (single device, any batch size —
    train.py:531-550); on a mesh the batch axis must divide, and
    reference-default batch_size=30 on 8 devices would otherwise be
    unshardable. See ``_pad_batch_rows`` for the wrap-and-mask semantics.
    """
    n = int(next(iter(batch.values())).shape[0])
    pad = (-n) % n_devices
    if pad == 0:
        return batch
    return _pad_batch_rows(batch, pad)


def pad_batch_to(batch: dict[str, Any], batch_size: int) -> dict[str, Any]:
    """Pad a batch's leading axis up to exactly ``batch_size``, and give
    EVERY batch (padded or not) an explicit ``valid_mask``.

    Static shapes AND static pytree structure are XLA requirements the
    reference's DataLoader never met: its epoch tail is a smaller batch
    (train.py:531-550, no drop_last), which under jit would compile and
    AOT-cache a SECOND step program per distinct tail shape (measured:
    220 s on the tunneled v5e at 480x640 — docs/PERF.md). Wrap-and-mask
    padding keeps every batch at the one static shape, with the tail
    rows' contribution to loss and metrics exactly zero (same scheme
    ``pad_batch_for_mesh`` uses for indivisible mesh shards). Full
    batches get a rank-1 all-True row mask (the step ANDs it with its
    own on-device ``target > 0`` — train_step.py::_targets_and_mask, so
    the math is identical to having no key at all) — because a tail-only
    key would itself be a second pytree signature, i.e. a second program.
    """
    n = int(next(iter(batch.values())).shape[0])
    if n > batch_size:
        # Silently passing an oversize batch through would quietly
        # recompile — the exact ~220 s cost this function exists to
        # prevent. Fail loudly instead.
        raise ValueError(
            f"batch of {n} rows exceeds the static batch_size={batch_size}"
        )
    if n < batch_size:
        return _pad_batch_rows(batch, batch_size - n)
    if "valid_mask" not in batch:
        batch = dict(batch)
        batch["valid_mask"] = np.ones(n, bool)
    return batch


def shard_batch_to_mesh(
    batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS, *, pad: bool = True
) -> Any:
    """Device-put a host batch pytree with the batch axis sharded over the mesh.

    Dict batches with an indivisible leading axis are pad-and-masked first
    (see ``pad_batch_for_mesh``); set ``pad=False`` to require divisibility.
    """
    n_data = dict(mesh.shape)[axis_name]
    if pad and n_data > 1 and isinstance(batch, dict) and "target" in batch:
        batch = pad_batch_for_mesh(batch, n_data)
    sharding = batch_sharding(mesh, axis_name)
    # Rank-1 leaves (the per-row valid_mask) shard over the data axis
    # only — the batched NHW[C] sharding may also name a spatial axis,
    # which a 1-D array cannot carry.
    rows = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding if np.ndim(x) >= 2 else rows),
        batch,
    )


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh.

    Works on multi-process global meshes too: there ``device_put`` can't
    target non-addressable devices, so each process contributes its full
    local copy via ``make_array_from_process_local_data`` (every host holds
    identical values — same seed, same init)."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    import jax.numpy as jnp

    def replicate(x: Any) -> Any:
        if isinstance(x, jax.Array) and jnp.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            data = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(x))
            )
            return jax.random.wrap_key_data(data)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(replicate, tree)
