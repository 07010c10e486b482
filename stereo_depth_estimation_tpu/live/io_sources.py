"""Frame sources for the live viewers: cameras or stored image pairs.

The camera path wraps the UVC capture loop (grab/drop/read); the directory
path iterates ``left_*`` / ``right_*`` pairs, which makes every viewer
runnable headless in CI — a structural upgrade over the reference, whose
viewers require physical cameras.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

from .camera_setup import (
    CameraConfig,
    drop_frames,
    log_camera_info,
    open_camera,
    warmup_cameras,
)

FrameSource = Iterator[tuple[np.ndarray, np.ndarray]]


def camera_source(
    left_index: int, right_index: int, config: CameraConfig
) -> FrameSource:
    cap_l = open_camera(left_index, config)
    cap_r = open_camera(right_index, config)
    if not cap_l.isOpened() or not cap_r.isOpened():
        raise RuntimeError("Could not open both cameras.")
    for label, cap in (("Left", cap_l), ("Right", cap_r)):
        log_camera_info(label, cap)
    warmup_cameras((cap_l, cap_r), config.warmup_frames)
    try:
        while True:
            drop_frames((cap_l, cap_r), config.drop_frames)
            ok_l, frame_l = cap_l.read()
            ok_r, frame_r = cap_r.read()
            if not ok_l or not ok_r:
                continue
            yield frame_l, frame_r
    finally:
        cap_l.release()
        cap_r.release()


def directory_source(input_dir: Path) -> FrameSource:
    """Yield BGR pairs from left_*.{png,jpg} / right_*.{png,jpg} files."""
    import cv2

    lefts = sorted(
        p for p in Path(input_dir).iterdir()
        if p.name.startswith("left") and p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not lefts:
        raise FileNotFoundError(f"No left_* frames found in {input_dir}")
    for left_path in lefts:
        right_path = left_path.with_name(left_path.name.replace("left", "right", 1))
        if not right_path.exists():
            continue
        frame_l = cv2.imread(str(left_path), cv2.IMREAD_COLOR)
        frame_r = cv2.imread(str(right_path), cv2.IMREAD_COLOR)
        if frame_l is None or frame_r is None:
            continue
        yield frame_l, frame_r
