"""``foundation-stereo-calibrate``: interactive chessboard stereo calibration.

Capability parity with reference calibrate.py: capture pairs on Space
(requires the board visible in both views), subpixel corner refinement,
mono calibration x2 -> stereoCalibrate(CALIB_FIX_INTRINSIC) ->
stereoRectify(CALIB_ZERO_DISPARITY), saved as an .npz with the same key set
(mtx/dist/R/T/E/F/R1/R2/P1/P2/Q/image_size/rms stats) so calibration files
are interchangeable with the reference's.

Adds a non-interactive ``--image-dir`` mode (left_*.png / right_*.png pairs)
so calibration is scriptable and CI-testable without cameras.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

import numpy as np

from .camera_setup import (
    CameraConfig,
    drop_frames,
    log_camera_info,
    open_camera,
    warmup_cameras,
)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Calibrate stereo USB cameras using a chessboard."
    )
    parser.add_argument("--left", type=int, default=None, help="Left camera index.")
    parser.add_argument("--right", type=int, default=None, help="Right camera index.")
    parser.add_argument(
        "--image-dir", type=Path, default=None,
        help="Non-interactive mode: directory of left_*.{png,jpg} / "
             "right_*.{png,jpg} pairs instead of live cameras.",
    )
    parser.add_argument(
        "--rows", type=int, default=6, help="Inner chessboard corners per column."
    )
    parser.add_argument(
        "--cols", type=int, default=9, help="Inner chessboard corners per row."
    )
    parser.add_argument(
        "--square-size", type=float, required=True,
        help="Chessboard square size in meters (example: 0.024).",
    )
    parser.add_argument(
        "--samples", type=int, default=25, help="Successful stereo pairs to collect."
    )
    parser.add_argument(
        "--output", type=Path, default=Path("calibration/stereo_calib.npz"),
        help="Output calibration file.",
    )
    parser.add_argument("--width", type=int, default=640, help="Capture width.")
    parser.add_argument("--height", type=int, default=480, help="Capture height.")
    parser.add_argument("--fps", type=int, default=15, help="Capture FPS request.")
    parser.add_argument(
        "--fourcc", type=str, default="MJPG",
        help="Requested pixel format (for example: MJPG, YUYV).",
    )
    parser.add_argument("--buffer-size", type=int, default=1, help="Capture queue size.")
    parser.add_argument(
        "--warmup-frames", type=int, default=20, help="Initial frames to discard."
    )
    parser.add_argument(
        "--drop-frames", type=int, default=1,
        help="Extra frames to drop each loop to reduce latency.",
    )
    parser.add_argument(
        "--min-pairs", type=int, default=8,
        help="Minimum valid pairs required to run calibration.",
    )
    return parser.parse_args(argv)


def make_object_points(rows: int, cols: int, square_size: float) -> np.ndarray:
    grid = np.zeros((rows * cols, 3), np.float32)
    grid[:, :2] = np.mgrid[0:cols, 0:rows].T.reshape(-1, 2)
    grid *= square_size
    return grid


def find_corners(gray, pattern_size, criteria):
    import cv2

    found, corners = cv2.findChessboardCorners(gray, pattern_size, None)
    if found:
        corners = cv2.cornerSubPix(gray, corners, (11, 11), (-1, -1), criteria)
    return found, corners


def collect_pairs_from_images(
    image_dir: Path, pattern_size, criteria, max_pairs: int
) -> tuple[list, list, tuple[int, int] | None]:
    import cv2

    lefts = sorted(
        p for p in image_dir.iterdir()
        if p.name.startswith("left") and p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    img_points_l: list = []
    img_points_r: list = []
    image_size = None
    for left_path in lefts:
        right_path = left_path.with_name(left_path.name.replace("left", "right", 1))
        if not right_path.exists():
            continue
        gray_l = cv2.imread(str(left_path), cv2.IMREAD_GRAYSCALE)
        gray_r = cv2.imread(str(right_path), cv2.IMREAD_GRAYSCALE)
        if gray_l is None or gray_r is None:
            continue
        image_size = gray_l.shape[::-1]
        found_l, corners_l = find_corners(gray_l, pattern_size, criteria)
        found_r, corners_r = find_corners(gray_r, pattern_size, criteria)
        if found_l and found_r:
            img_points_l.append(corners_l)
            img_points_r.append(corners_r)
            print(f"Pair OK: {left_path.name} / {right_path.name}")
        if len(img_points_l) >= max_pairs:
            break
    return img_points_l, img_points_r, image_size


def collect_pairs_interactive(
    args: argparse.Namespace, pattern_size, criteria
) -> tuple[list, list, tuple[int, int] | None]:
    import cv2

    config = CameraConfig(
        width=args.width, height=args.height, fps=args.fps, fourcc=args.fourcc,
        buffer_size=args.buffer_size, warmup_frames=args.warmup_frames,
        drop_frames=args.drop_frames,
    )
    cap_l = open_camera(args.left, config)
    cap_r = open_camera(args.right, config)
    if not cap_l.isOpened() or not cap_r.isOpened():
        raise RuntimeError(
            "Could not open both cameras. Check indices with "
            "foundation-stereo-list-cameras."
        )
    for label, cap in (("Left", cap_l), ("Right", cap_r)):
        log_camera_info(label, cap)
    warmup_cameras((cap_l, cap_r), config.warmup_frames)

    img_points_l: list = []
    img_points_r: list = []
    image_size = None

    print("Calibration capture")
    print("  Space: capture pair when chessboard is found in both views")
    print("  Q or Esc: quit")
    print(f"Need {args.samples} valid pairs.")

    while len(img_points_l) < args.samples:
        drop_frames((cap_l, cap_r), config.drop_frames)
        ok_l, frame_l = cap_l.read()
        ok_r, frame_r = cap_r.read()
        if not ok_l or not ok_r:
            continue
        if frame_l.shape[:2] != frame_r.shape[:2]:
            raise RuntimeError(
                "Camera frame sizes differ: "
                f"left={frame_l.shape[1::-1]}, right={frame_r.shape[1::-1]}. "
                "Set a matching format/resolution on both cameras."
            )
        gray_l = cv2.cvtColor(frame_l, cv2.COLOR_BGR2GRAY)
        gray_r = cv2.cvtColor(frame_r, cv2.COLOR_BGR2GRAY)
        image_size = gray_l.shape[::-1]
        found_l, corners_l = find_corners(gray_l, pattern_size, criteria)
        found_r, corners_r = find_corners(gray_r, pattern_size, criteria)

        display_l = frame_l.copy()
        display_r = frame_r.copy()
        if found_l:
            cv2.drawChessboardCorners(display_l, pattern_size, corners_l, found_l)
        if found_r:
            cv2.drawChessboardCorners(display_r, pattern_size, corners_r, found_r)
        combined = np.hstack([display_l, display_r])
        status = (
            f"pairs {len(img_points_l)}/{args.samples} | "
            f"board L:{found_l} R:{found_r}"
        )
        cv2.putText(combined, status, (15, 30), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                    (50, 240, 50), 2)
        cv2.imshow("Stereo Calibration (left | right)", combined)

        key = cv2.waitKey(1) & 0xFF
        if key in (ord("q"), 27):
            break
        if key == ord(" ") and found_l and found_r:
            img_points_l.append(corners_l)
            img_points_r.append(corners_r)
            print(f"Captured pair {len(img_points_l)}/{args.samples}")

    cap_l.release()
    cap_r.release()
    cv2.destroyAllWindows()
    return img_points_l, img_points_r, image_size


def calibrate_stereo(
    objp: np.ndarray,
    img_points_l: list,
    img_points_r: list,
    image_size: tuple[int, int],
    criteria,
) -> dict[str, Any]:
    import cv2

    obj_points = [objp.copy() for _ in img_points_l]
    cv_none: Any = None
    print("Running mono calibration...")
    rms_l, mtx_l, dist_l, _, _ = cv2.calibrateCamera(
        obj_points, img_points_l, image_size, cv_none, cv_none
    )
    rms_r, mtx_r, dist_r, _, _ = cv2.calibrateCamera(
        obj_points, img_points_r, image_size, cv_none, cv_none
    )
    print(f"Mono RMS left: {rms_l:.4f}, right: {rms_r:.4f}")

    print("Running stereo calibration...")
    rms_stereo, _, _, _, _, R, T, E, F = cv2.stereoCalibrate(
        obj_points, img_points_l, img_points_r,
        mtx_l, dist_l, mtx_r, dist_r, image_size,
        criteria=criteria, flags=cv2.CALIB_FIX_INTRINSIC,
    )
    print(f"Stereo RMS: {rms_stereo:.4f}")

    R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
        mtx_l, dist_l, mtx_r, dist_r, image_size, R, T,
        flags=cv2.CALIB_ZERO_DISPARITY,
    )
    return {
        "image_size": np.array(image_size),
        "mtx_l": mtx_l, "dist_l": dist_l, "mtx_r": mtx_r, "dist_r": dist_r,
        "R": R, "T": T, "E": E, "F": F,
        "R1": R1, "R2": R2, "P1": P1, "P2": P2, "Q": Q,
        "stereo_rms": np.array(rms_stereo),
        "mono_rms_l": np.array(rms_l),
        "mono_rms_r": np.array(rms_r),
    }


def main(argv: list[str] | None = None) -> None:
    import cv2

    args = parse_args(argv)
    pattern_size = (args.cols, args.rows)
    objp = make_object_points(args.rows, args.cols, args.square_size)
    criteria = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 60, 1e-6)

    if args.image_dir is not None:
        img_points_l, img_points_r, image_size = collect_pairs_from_images(
            args.image_dir, pattern_size, criteria, args.samples
        )
    else:
        if args.left is None or args.right is None:
            raise SystemExit("Provide --left/--right camera indices or --image-dir.")
        img_points_l, img_points_r, image_size = collect_pairs_interactive(
            args, pattern_size, criteria
        )

    if len(img_points_l) < args.min_pairs:
        raise RuntimeError(
            "Not enough pairs for reliable calibration. Capture more samples."
        )
    if image_size is None:
        raise RuntimeError("No frames captured.")

    result = calibrate_stereo(objp, img_points_l, img_points_r, image_size, criteria)
    result.update(
        rows=np.array(args.rows),
        cols=np.array(args.cols),
        square_size=np.array(args.square_size),
    )
    args.output.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.output, **result)
    print(f"Saved calibration to {args.output}")


if __name__ == "__main__":
    main()
