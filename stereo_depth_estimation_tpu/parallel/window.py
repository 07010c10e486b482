"""HBM-windowed device-resident training data (mesh-aware).

Lifts the round-3 device-resident restrictions (single device, single
process, whole set <= HBM): the packed training set is staged into device
memory as one or more fixed-size WINDOWS sharded over the mesh's data (and
spatial) axes.

- **Pinned** (whole set fits the HBM budget): one window, staged once,
  reused every epoch — zero steady-state host traffic, now on any
  single-process mesh instead of one device only.
- **Rotating** (set larger than the budget): windows rotate through HBM at
  EPOCH granularity; while the device trains on window k, a background
  thread assembles window k+1 from the packed memmap cache and starts its
  host->device transfer. Per-epoch transport is bounded by the dataset's
  size — paid once per epoch and overlapped with compute — instead of the
  per-step streaming path's steps x batch.

Shuffle semantics: rotating mode draws a fresh GLOBAL host permutation per
epoch to assemble windows (every sample lands in exactly one window; the
final window wrap-fills from the permutation's head so window shapes stay
static for the compiler), and sampling WITHIN a window is an on-device
per-shard permutation gather — shard-LOCAL, so the compiled program
contains no cross-device gather collectives. Pinned mode re-permutes on
device every epoch the same way. This hierarchical (window, then
in-window) shuffle replaces the reference's global per-epoch DataLoader
shuffle (reference train.py:533-540) — the standard windowed-pipeline
trade, statistically equivalent for i.i.d. sample stores.

No reference counterpart (the reference is single-device streaming);
covered by tests/test_window.py.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, SPATIAL_AXIS, batch_sharding


@dataclass(frozen=True)
class WindowPlan:
    n: int                # dataset samples
    batch_size: int       # global batch
    window_samples: int   # samples staged per window (multiple of batch_size)
    num_windows: int
    pinned: bool          # one window holding the whole set, staged once
    steps_per_window: int

    @property
    def steps_per_epoch(self) -> int:
        return self.steps_per_window * self.num_windows


def plan_windows(
    n: int,
    batch_size: int,
    bytes_per_sample: int,
    budget_bytes: int,
    data_degree: int = 1,
) -> WindowPlan:
    """Window geometry from the dataset size and an HBM byte budget.

    Pinned when one resident copy fits the budget; otherwise the budget is
    split in two (current window + the one being staged behind it)."""
    if batch_size % data_degree != 0:
        raise ValueError(
            f"batch_size={batch_size} must divide over the data axis "
            f"({data_degree} shards) for windowed training."
        )
    if n < batch_size:
        raise ValueError(
            f"dataset of {n} samples is smaller than batch_size={batch_size}"
        )
    if n * bytes_per_sample <= budget_bytes:
        return WindowPlan(
            n=n, batch_size=batch_size, window_samples=n, num_windows=1,
            pinned=True, steps_per_window=n // batch_size,
        )
    per_window_budget = budget_bytes // 2
    window_samples = (per_window_budget // bytes_per_sample) // batch_size
    window_samples *= batch_size
    if window_samples < batch_size:
        raise ValueError(
            f"HBM window budget {budget_bytes / 1e9:.2f} GB cannot hold even "
            f"one double-buffered batch of {batch_size} x "
            f"{bytes_per_sample / 1e6:.1f} MB samples."
        )
    num_windows = -(-n // window_samples)  # ceil
    return WindowPlan(
        n=n, batch_size=batch_size, window_samples=window_samples,
        num_windows=num_windows, pinned=False,
        steps_per_window=window_samples // batch_size,
    )


def window_sharding(mesh: jax.sharding.Mesh) -> NamedSharding:
    """Sharding for staged (n, H, W, C) / (n, H, W) window arrays: samples
    over ``data``; on a 2-D mesh, height additionally over ``spatial`` (so
    window storage scales with BOTH mesh axes)."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def make_window_gather(
    mesh: jax.sharding.Mesh,
    batch_size: int,
    window_samples: int,
) -> Callable[..., dict[str, jnp.ndarray]]:
    """Jitted on-device batch gather over a staged window.

    ``gather(images, targets, seed, pos) -> {"input", "target"}`` where the
    window arrays are sharded by :func:`window_sharding`, ``seed`` selects
    the (epoch, window) permutation, and ``pos`` is the step index within
    the window. Each data shard permutes its LOCAL samples (key folded with
    the shard index) and slices its local batch stripe, so the output batch
    is born with the training step's batch sharding and the program
    contains no cross-device gathers.
    """
    try:
        from jax import shard_map
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

    data_degree = dict(mesh.shape)[DATA_AXIS]
    if batch_size % data_degree != 0:
        raise ValueError(
            f"batch_size={batch_size} is not divisible by the data axis "
            f"({data_degree})."
        )
    if window_samples % data_degree != 0:
        raise ValueError(
            f"window of {window_samples} samples is not divisible by the "
            f"data axis ({data_degree})."
        )
    local_batch = batch_size // data_degree
    local_n = window_samples // data_degree
    steps_per_window = window_samples // batch_size
    has_spatial = SPATIAL_AXIS in mesh.axis_names
    array_spec = (
        P(DATA_AXIS, SPATIAL_AXIS) if has_spatial else P(DATA_AXIS)
    )

    def local_gather(images, targets, seed, pos):
        # Same local permutation for every spatial shard of a data row
        # (they hold different height slices of the SAME samples), so the
        # key folds the data index only.
        key = jax.random.fold_in(
            jax.random.key(seed), jax.lax.axis_index(DATA_AXIS)
        )
        perm = jax.random.permutation(key, local_n)
        pos_in_window = pos % steps_per_window
        idx = jax.lax.dynamic_slice(
            perm, (pos_in_window * local_batch,), (local_batch,)
        )
        return {
            "input": jnp.take(images, idx, axis=0),
            "target": jnp.take(targets, idx, axis=0),
        }

    sharded = shard_map(
        local_gather,
        mesh=mesh,
        in_specs=(array_spec, array_spec, P(), P()),
        out_specs=array_spec,
    )
    return jax.jit(sharded)


def _window_seed(base_seed: int, epoch: int, window_index: int) -> np.int32:
    # Distinct permutation per (epoch, window); int32 keeps the jit aval
    # stable across calls.
    return np.int32(
        (base_seed * 1_000_003 + epoch * 4099 + window_index) & 0x7FFFFFFF
    )


class HBMWindowLoader:
    """Stages packed-cache windows into device HBM and serves per-step
    gather arguments; see module docstring for the pinned/rotating modes.

    ``fetch(indices) -> {"input": (k,H,W,6) u8, "target": (k,H,W) f16}`` is
    the packed cache's batched gather (data/packed_cache.py).
    """

    def __init__(
        self,
        fetch: Callable[[np.ndarray], dict[str, np.ndarray]],
        n: int,
        batch_size: int,
        mesh: jax.sharding.Mesh,
        bytes_per_sample: int,
        budget_bytes: int,
        seed: int = 0,
        prefetch: bool = True,
    ) -> None:
        self._fetch = fetch
        self._mesh = mesh
        self._seed = seed
        self._n = n
        self._prefetch = prefetch
        self._sharding = window_sharding(mesh)
        data_degree = dict(mesh.shape)[DATA_AXIS]
        # Pinned windows pad the sample count up to the data axis (wrapped
        # rows) so the staged arrays shard evenly; the <=D-1 duplicated
        # rows only shift in-window sampling odds marginally.
        self._padded_n = n + ((-n) % data_degree)
        self.plan = plan_windows(
            self._padded_n, batch_size, bytes_per_sample, budget_bytes,
            data_degree,
        )
        self.gather = make_window_gather(
            mesh, batch_size, self.plan.window_samples
        )
        self._pinned_window: tuple[jnp.ndarray, jnp.ndarray] | None = None
        if self.plan.pinned:
            order = np.arange(self._padded_n) % n
            self._pinned_window = self._stage(order)

    def _stage(self, indices: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        if jax.process_count() > 1:
            # Multihost: every host fetches and ships only the window rows
            # its own devices hold (indices are identical on all hosts —
            # derived from the shared seed), and the global sharded arrays
            # are stitched per device. Same per-epoch transport bound as
            # single-host, split across hosts.
            from .distributed import stage_rows_multihost

            staged = stage_rows_multihost(
                self._fetch, indices, self._sharding
            )
            return staged["input"], staged["target"]
        host = self._fetch(indices)
        images = jax.device_put(host["input"], self._sharding)
        targets = jax.device_put(host["target"], self._sharding)
        return images, targets

    def _epoch_window_indices(self, epoch: int) -> list[np.ndarray]:
        """Global per-epoch permutation chunked into equal windows; the
        last window wrap-fills from the permutation's head (static shapes
        for the compiler; every sample appears in exactly one window)."""
        rng = np.random.default_rng((self._seed, 17, epoch))
        # plan.n is the data-axis-padded count; fetch indexes the REAL
        # store, so padded rows wrap onto the head samples (mod real n).
        perm = rng.permutation(self.plan.n) % max(self._n, 1)
        windows = []
        ws = self.plan.window_samples
        for w in range(self.plan.num_windows):
            chunk = perm[w * ws : (w + 1) * ws]
            if len(chunk) < ws:
                chunk = np.concatenate([chunk, perm[: ws - len(chunk)]])
            windows.append(chunk)
        return windows

    def epoch_batches(self, epoch: int) -> Iterator[tuple]:
        """Yields ``(images_dev, targets_dev, seed, pos)`` tuples, one per
        train step — feed through :meth:`step_adapter`'s step function."""
        plan = self.plan
        if plan.pinned:
            assert self._pinned_window is not None
            images, targets = self._pinned_window
            seed = _window_seed(self._seed, epoch, 0)
            for pos in range(plan.steps_per_window):
                yield images, targets, seed, np.int32(pos)
            return

        window_indices = self._epoch_window_indices(epoch)
        if not self._prefetch:
            for w, indices in enumerate(window_indices):
                images, targets = self._stage(indices)
                seed = _window_seed(self._seed, epoch, w)
                for pos in range(plan.steps_per_window):
                    yield images, targets, seed, np.int32(pos)
            return

        # Double-buffered rotation: a producer thread assembles window k+1
        # (memmap gather + device_put, both releasing the GIL for the bulk
        # work) while the main thread trains on window k. Residency is
        # bounded to TWO windows — exactly what plan_windows budgeted — by
        # a slot semaphore the producer must acquire BEFORE staging (a
        # bounded queue alone is not enough: q.put evaluates its staged
        # argument first, so window k+2 would sit in HBM while the put
        # blocks, peaking at ~1.5x the budget). The consumer returns a slot
        # only after it drops its window's references. All producer-side
        # blocking is a stop-checking timeout loop so an early consumer
        # exit (exception/break mid-epoch) tears down promptly instead of
        # stalling join() and leaking a staged window for the process
        # lifetime.
        q: queue.Queue = queue.Queue(maxsize=1)
        stop = threading.Event()
        slots = threading.BoundedSemaphore(2)

        def _acquire_slot() -> bool:
            while not stop.is_set():
                if slots.acquire(timeout=0.1):
                    return True
            return False

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for indices in window_indices:
                    if not _acquire_slot():
                        return
                    if not _put(self._stage(indices)):
                        return
                _put(None)
            except BaseException as exc:  # surface in the consumer
                _put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            w = 0
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                images, targets = item
                seed = _window_seed(self._seed, epoch, w)
                for pos in range(plan.steps_per_window):
                    yield images, targets, seed, np.int32(pos)
                del item, images, targets  # release window k's HBM
                slots.release()
                w += 1
        finally:
            stop.set()
            # Unblock a producer waiting on a full queue and drop any
            # staged-but-unconsumed window immediately.
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=60)

    def step_adapter(
        self, step: Callable[[Any, dict[str, jnp.ndarray]], Any]
    ) -> Callable[[Any, tuple], Any]:
        """Wraps a streaming train step so it consumes
        :meth:`epoch_batches` tuples: on-device gather (dispatch 1) then
        the standard step (dispatch 2) — the same pipelined two-dispatch
        shape as the single-device fast path (docs/PERF.md)."""

        def run(state: Any, wb: tuple) -> Any:
            images, targets, seed, pos = wb
            batch = self.gather(images, targets, seed, pos)
            return step(state, batch)

        return run


def default_hbm_budget_bytes(
    mesh: jax.sharding.Mesh, per_device_gb: float = 4.0
) -> int:
    """Window budget scales with the mesh: per-device allowance x device
    count (window arrays are sharded over the mesh, so aggregate HBM is the
    real capacity)."""
    return int(per_device_gb * (1 << 30)) * mesh.devices.size


__all__ = [
    "HBMWindowLoader",
    "WindowPlan",
    "default_hbm_budget_bytes",
    "make_window_gather",
    "plan_windows",
    "window_sharding",
]


# Convenience partial used by tests to build tiny-budget loaders.
rotating_loader = partial(HBMWindowLoader, prefetch=True)
