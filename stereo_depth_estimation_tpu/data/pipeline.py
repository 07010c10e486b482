"""Batch iteration and device prefetch.

Replaces the reference's multi-process DataLoader (train.py:533-550) with a
TPU-idiomatic pipeline: host threads assemble uint8 batches (memmap gather or
npz loader), and a double-buffered prefetcher overlaps the host->device copy
with the running train step so the chip never waits for input.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

import jax
import numpy as np


def epoch_indices(
    n: int, batch_size: int, *, shuffle: bool, seed: int, epoch: int,
    drop_last: bool = False,
) -> list[np.ndarray]:
    """Deterministic per-epoch batch index lists."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(np.random.SeedSequence([seed, epoch])).shuffle(order)
    batches = []
    for start in range(0, n, batch_size):
        chunk = order[start : start + batch_size]
        if drop_last and len(chunk) < batch_size:
            break
        batches.append(chunk)
    return batches


def batch_iterator(
    fetch: Callable[[np.ndarray], dict[str, np.ndarray]],
    n: int,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = False,
) -> Iterator[dict[str, np.ndarray]]:
    for idx in epoch_indices(
        n, batch_size, shuffle=shuffle, seed=seed, epoch=epoch, drop_last=drop_last
    ):
        yield fetch(idx)


def loader_fetch(
    loader, num_workers: int = 0
) -> Callable[[np.ndarray], dict[str, np.ndarray]]:
    """Batch assembly from a per-sample StereoSampleLoader.

    ``num_workers > 0`` decodes samples on a thread pool — the counterpart
    of the reference DataLoader's worker processes (train.py:533-550).
    Threads (not processes) suffice here because PIL/numpy decode and resize
    release the GIL, and they share the page cache with zero IPC cost.
    """

    def fetch_serial(indices: np.ndarray) -> dict[str, np.ndarray]:
        items = [loader[int(i)] for i in indices]
        return {
            "input": np.stack([it["input"] for it in items]),
            "target": np.stack([it["target"] for it in items]),
        }

    if num_workers <= 0:
        return fetch_serial

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=num_workers)

    def fetch_pooled(indices: np.ndarray) -> dict[str, np.ndarray]:
        items = list(pool.map(lambda i: loader[int(i)], indices))
        return {
            "input": np.stack([it["input"] for it in items]),
            "target": np.stack([it["target"] for it in items]),
        }

    return fetch_pooled


def prefetch_to_device(
    iterator: Iterator[dict[str, np.ndarray]],
    *,
    put: Callable[[Any], Any] | None = None,
    depth: int = 2,
) -> Iterator[Any]:
    """Run ``put`` (default jax.device_put) on a background thread, ``depth``
    batches ahead, so H2D transfer overlaps device compute."""
    put_fn = put if put is not None else jax.device_put
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    error: list[BaseException] = []

    def worker() -> None:
        try:
            for item in iterator:
                q.put(put_fn(item))
        except BaseException as exc:  # propagate to consumer
            error.append(exc)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
