"""Read-through .npz sample cache: key scheme and codec.

Capability parity with reference dataset.py:68-128: canonical key
``<scene>/<stem>.npz`` (scene = path segment before "dataset"), blake2s
``misc/`` fallback for non-canonical layouts; npz payload of uint8 HWC
left/right + float16 HW disparity; loads validate keys/ndim/shape and return
None on mismatch.

Unlike the reference (which round-trips through torch tensors), everything
here stays NumPy: images remain uint8 end-to-end so the host->device copy is
4x smaller and normalisation happens on-chip.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np

from .samples import StereoSample


def sample_cache_relpath(sample: StereoSample) -> Path:
    left_parts = sample.left_rgb_path.parts
    if "dataset" in left_parts:
        dataset_index = left_parts.index("dataset")
        if dataset_index > 0:
            scene_name = left_parts[dataset_index - 1]
            return Path(scene_name) / f"{sample.disparity_path.stem}.npz"

    source_key = (
        f"{sample.left_rgb_path.as_posix()}|"
        f"{sample.right_rgb_path.as_posix()}|"
        f"{sample.disparity_path.as_posix()}"
    )
    digest = hashlib.blake2s(source_key.encode("utf-8"), digest_size=8).hexdigest()
    return Path("misc") / f"{sample.disparity_path.stem}_{digest}.npz"


def load_cached_sample(
    cache_file: Path, image_size: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Returns (left u8 HWC, right u8 HWC, disparity f32 HW) or None if the
    entry is malformed or shape-mismatched for the requested size."""
    with np.load(cache_file) as cached:
        if not {"left", "right", "disparity"}.issubset(cached.files):
            return None
        left = cached["left"]
        right = cached["right"]
        disparity = cached["disparity"]

    if left.ndim != 3 or right.ndim != 3 or disparity.ndim != 2:
        return None
    if left.shape[:2] != image_size or right.shape[:2] != image_size:
        return None
    if disparity.shape != image_size:
        return None
    return (
        np.ascontiguousarray(left, dtype=np.uint8),
        np.ascontiguousarray(right, dtype=np.uint8),
        disparity.astype(np.float32),
    )


def save_cached_sample(
    cache_file: Path,
    left_u8: np.ndarray,
    right_u8: np.ndarray,
    disparity: np.ndarray,
    *,
    compress: bool = False,
) -> None:
    cache_file.parent.mkdir(parents=True, exist_ok=True)
    save_fn = np.savez_compressed if compress else np.savez
    save_fn(
        cache_file,
        left=np.asarray(left_u8, dtype=np.uint8),
        right=np.asarray(right_u8, dtype=np.uint8),
        disparity=np.asarray(disparity, dtype=np.float16),
    )
