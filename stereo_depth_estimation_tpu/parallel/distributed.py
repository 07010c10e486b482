"""Multi-host (multi-process) data-parallel training.

The reference is single-process (SURVEY.md §2: no distributed backend at
all); the TPU-native equivalent is the JAX multi-controller model:

- every host runs the same program and calls ``jax.distributed.initialize``
  (auto-detected on TPU pods; explicit coordinator/process args on CPU test
  farms, where cross-process collectives ride gloo);
- one global ``Mesh`` spans every device of every process; parameters are
  replicated, batches sharded on the leading axis;
- each host decodes ONLY its stripe of every global batch and contributes
  it via ``jax.make_array_from_process_local_data`` — no host ever
  materialises the full batch;
- XLA emits the gradient all-reduce across hosts (ICI within a slice, DCN
  across slices); nothing NCCL-like to manage.

Validated without a pod by a 2-process x 4-virtual-CPU-device farm
(tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-process runtime.

    With no arguments, relies on TPU-pod auto-detection (or the JAX
    coordination env vars). Explicit arguments serve CPU farms, where the
    cross-process collective backend must also be selected.
    """
    from jax._src import distributed as _jax_distributed

    # NB: probing via jax.process_count() would itself initialise the XLA
    # backend, which must not happen before distributed.initialize.
    if _jax_distributed.global_state.client is not None:
        return  # already initialised
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        # No-op on TPU; required for CPU multi-process collectives.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(**kwargs)


def is_main_process() -> bool:
    return jax.process_index() == 0


class MultihostBatcher:
    """Per-host feeding for a global (possibly 2-D-sharded) batch.

    Callable like a fetch function, but takes the GLOBAL index list of a
    batch and returns a global jax.Array batch:

    1. pad the index list (wrapping) to a multiple of the data-axis size, so
       the batch axis shards evenly — padded rows get ``valid_mask=False``
       and therefore contribute nothing to masked losses/metrics;
    2. decode only the samples this host's devices own;
    3. assemble the global arrays — contiguous per-process stripes via
       ``jax.make_array_from_process_local_data`` on a pure-DP mesh, or
       per-device (batch x height) blocks via
       ``jax.make_array_from_single_device_arrays`` on a
       ``(data, spatial)`` mesh, where a process's devices may own partial
       image heights (tests/test_multihost_spatial.py).
    """

    def __init__(
        self,
        fetch: Callable[[np.ndarray], dict[str, np.ndarray]],
        mesh: Mesh,
        axis_name: str = DATA_AXIS,
        pad_to: int | None = None,
    ) -> None:
        """``pad_to``: additionally pad every batch up to this size (rounded
        up to the data-axis multiple), so the epoch's tail batch keeps the
        one static shape and no second step program is compiled/AOT-banked
        per tail shape (see parallel/mesh.py::pad_batch_to)."""
        from .mesh import SPATIAL_AXIS, batch_sharding

        self.fetch = fetch
        self.mesh = mesh
        self.axis_name = axis_name
        self.spatial = SPATIAL_AXIS in mesh.axis_names
        self.n_data = dict(mesh.shape)[axis_name]
        self.sharding = batch_sharding(mesh, axis_name)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.pad_to = pad_to
        if not self.spatial and self.n_data % self.process_count != 0:
            raise ValueError(
                f"batch ('data') mesh axis of {self.n_data} does not divide "
                f"across {self.process_count} processes"
            )

    def __call__(self, global_indices: np.ndarray) -> dict[str, jax.Array]:
        global_indices = np.asarray(global_indices)
        n = len(global_indices)
        target_n = max(n, self.pad_to or 0)
        target_n += (-target_n) % self.n_data
        # Modular tiling, not a slice: pad can exceed n (a 1-sample val
        # batch on an 8-device mesh pads by 7).
        padded = global_indices[np.arange(target_n) % n]
        is_real = np.ones(len(padded), bool)
        is_real[n:] = False
        if self.spatial:
            return self._assemble_per_device(padded, is_real)

        stripe = len(padded) // self.process_count
        lo = self.process_index * stripe
        # Pad rows wrap to real sample ids, so a tail batch's stripe holds
        # duplicates: fetch each distinct sample ONCE (a fetch is a PNG
        # decode + resize on the miss path) and duplicate the decoded rows
        # in memory.
        unique, inverse = np.unique(padded[lo : lo + stripe], return_inverse=True)
        fetched = self.fetch(unique)
        local = {k: np.asarray(v)[inverse] for k, v in fetched.items()}
        # Rank-1 per-row flags (the cheap wire format — B bools instead of
        # B*H*W; see mesh._pad_batch_rows): the step ANDs them with its
        # own on-device target > 0. The 1-D data mesh here shards rank-1
        # arrays with the same P('data') spec as the batched ones.
        local["valid_mask"] = is_real[lo : lo + stripe]

        global_n = len(padded)
        return {
            key: jax.make_array_from_process_local_data(
                self.sharding,
                np.asarray(value),
                global_shape=(global_n, *np.asarray(value).shape[1:]),
            )
            for key, value in local.items()
        }

    def _assemble_per_device(
        self, padded: np.ndarray, is_real: np.ndarray
    ) -> dict[str, jax.Array]:
        """General multihost feeding: one explicit block per local device.

        On a ``(data, spatial)`` mesh every device owns a
        (batch-stripe x height-stripe) BLOCK, and a process's devices need
        not cover full image height (device->process assignment is the
        runtime's, not ours), so contiguous per-process batch stripes can't
        express the local contribution. Instead: decode each batch row at
        most once per host (the union of rows this host's devices touch —
        full images, since fetch is row-granular), slice each device's
        (rows, height) block out, and assemble the global array with
        ``jax.make_array_from_single_device_arrays``. Host work stays
        proportional to the rows this host feeds; H2D bytes are exactly one
        copy of each locally-owned block."""
        global_n = len(padded)
        local_devices, rows, position = owned_rows(
            self.mesh, self.axis_name, global_n
        )

        # Dedup exactly like the stripe branch: wrap-around pad rows must
        # not cost a second decode.
        unique, inverse = np.unique(padded[rows], return_inverse=True)
        fetched = self.fetch(unique)
        local = {k: np.asarray(v)[inverse] for k, v in fetched.items()}
        # Full-rank mask here (unlike the stripe branch's rank-1 flags):
        # assemble_row_blocks slices every key with the one (data, spatial)
        # sharding, and a rank-1 array cannot carry the spatial axis.
        target = np.asarray(local["target"])
        mask = (target > 0.0) & is_real[rows, None, None]
        local = {**local, "valid_mask": mask}
        return assemble_row_blocks(
            self.sharding, local, local_devices, position, global_n
        )


def owned_rows(
    mesh: Mesh, axis_name: str, global_n: int
) -> tuple[list, list[int], dict[int, int]]:
    """Which rows of a ``global_n``-row axis does THIS host feed?

    Determined by the row axis's placement alone, so probe with a rank-1
    sharding. Returns (this host's devices in that placement, the sorted
    union of row ids they own, row id -> local fetch position)."""
    row_map = NamedSharding(mesh, P(axis_name)).devices_indices_map(
        (global_n,)
    )
    process_index = jax.process_index()
    local_devices = [
        d for d in row_map if d.process_index == process_index
    ]
    rows = sorted(
        {
            r
            for d in local_devices
            for r in range(*row_map[d][0].indices(global_n))
        }
    )
    return local_devices, rows, {row: i for i, row in enumerate(rows)}


def assemble_row_blocks(
    sharding: NamedSharding,
    local: dict[str, np.ndarray],
    local_devices: list,
    position: dict[int, int],
    global_n: int,
) -> dict[str, jax.Array]:
    """Assemble global row-sharded arrays from this host's fetched rows:
    slice each local device's (rows x trailing-dims) block out of the
    host-local arrays, ship exactly those bytes, and stitch the global
    array with ``jax.make_array_from_single_device_arrays``."""
    out: dict[str, jax.Array] = {}
    for key, value in local.items():
        value = np.asarray(value)
        global_shape = (global_n, *value.shape[1:])
        shard_map = sharding.devices_indices_map(global_shape)
        shards = []
        for device in local_devices:
            index = shard_map[device]
            batch_rows = [
                position[r] for r in range(*index[0].indices(global_n))
            ]
            block = value[batch_rows][(slice(None), *index[1:])]
            shards.append(jax.device_put(block, device))
        out[key] = jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards
        )
    return out


def stage_rows_multihost(
    fetch: "Callable[[np.ndarray], dict[str, np.ndarray]]",
    indices: np.ndarray,
    sharding: NamedSharding,
    axis_name: str = DATA_AXIS,
) -> dict[str, jax.Array]:
    """Multihost analog of ``device_put(fetch(indices), sharding)``: stage
    a GLOBAL list of store rows as row-sharded global arrays with every
    host decoding and shipping only the blocks its own devices hold. Used
    by the HBM window loader (parallel/window.py) so windowed
    device-resident training works across processes; ``indices`` must be
    identical on every host (the callers derive it from a shared seed)."""
    indices = np.asarray(indices)
    global_n = len(indices)
    local_devices, rows, position = owned_rows(
        sharding.mesh, axis_name, global_n
    )
    local = fetch(indices[rows])
    return assemble_row_blocks(
        sharding, local, local_devices, position, global_n
    )


# --------------------------------------------------------------------------
# Host-side CPU-farm harness: one implementation of the "spawn N
# coordinated children, collect a prefixed result line each" pattern used
# by the driver entry's 2-process leg (__graft_entry__), the multihost AOT
# probe (scripts/multihost_aot_probe.py), and the multihost e2e tests.
# Children are ALWAYS reaped — a wedged gloo rendezvous must not leak
# processes that hold the coordinator port across retries.
# --------------------------------------------------------------------------

_farm_launches = 0


def next_farm_port(base: int) -> int:
    """A coordinator port distinct per (process, launch): retries after a
    wedged farm must not collide with a leaked listener on the old port."""
    global _farm_launches
    import os

    _farm_launches += 1
    return base + (os.getpid() * 7 + _farm_launches * 131) % 2000


def run_process_farm(
    child_source: str,
    argv_for: Callable[[int], list[str]],
    *,
    num_processes: int = 2,
    timeout: float = 600.0,
    result_prefix: str = "RESULT ",
    cwd: str | None = None,
    env: dict | None = None,
) -> list[tuple[str, str]]:
    """Run ``python -c child_source argv_for(i)...`` for each process id and
    return ``[(result_line_without_prefix, full_output), ...]`` in id order.

    Raises RuntimeError (with the child's output tail) on nonzero exit,
    timeout, or a missing result line; every child is killed and reaped on
    ANY exit path."""
    import subprocess
    import sys

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child_source, *argv_for(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=cwd, env=env,
        )
        for i in range(num_processes)
    ]
    outputs: list[str] = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=timeout)
            outputs.append(out)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"farm child rc={proc.returncode}: {out[-2000:]}"
                )
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    results = []
    for out in outputs:
        lines = [ln for ln in out.splitlines() if ln.startswith(result_prefix)]
        if not lines:
            raise RuntimeError(
                f"farm child produced no '{result_prefix.strip()}' line: "
                f"{out[-2000:]}"
            )
        results.append((lines[0][len(result_prefix):], out))
    return results
