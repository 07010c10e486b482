"""``foundation-stereo-sgbm-live``: classical SGBM depth baseline viewer.

Capability parity with reference depth_live.py: load calibration, build
rectify maps, StereoSGBM (P1=8*bs^2, P2=32*bs^2, 3WAY mode), disparity/16
with <=0 -> NaN, reprojectImageTo3D(Q) for metric Z, center-patch nanmedian
readout, TURBO colormap windows.

Adds ``--input-dir``/``--headless`` so the pipeline runs on stored frame
pairs without cameras (CI-testable); results are written as PNGs + a JSON
readout per frame.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from .camera_setup import (
    CameraConfig,
    drop_frames,
    log_camera_info,
    open_camera,
    warmup_cameras,
)
from .io_sources import FrameSource, camera_source, directory_source


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Run live stereo depth estimation.")
    parser.add_argument("--left", type=int, default=None, help="Left camera index.")
    parser.add_argument("--right", type=int, default=None, help="Right camera index.")
    parser.add_argument(
        "--input-dir", type=Path, default=None,
        help="Process stored left_*/right_* frame pairs instead of cameras.",
    )
    parser.add_argument(
        "--headless", action="store_true",
        help="No GUI windows; write outputs to --output-dir.",
    )
    parser.add_argument(
        "--output-dir", type=Path, default=Path("sgbm_out"),
        help="Headless output directory.",
    )
    parser.add_argument(
        "--calibration", type=Path, default=Path("calibration/stereo_calib.npz"),
        help="Calibration file from foundation-stereo-calibrate.",
    )
    parser.add_argument("--width", type=int, default=640, help="Capture width.")
    parser.add_argument("--height", type=int, default=480, help="Capture height.")
    parser.add_argument("--fps", type=int, default=30, help="Capture FPS request.")
    parser.add_argument("--fourcc", type=str, default="MJPG",
                        help="Requested pixel format (for example: MJPG, YUYV).")
    parser.add_argument("--buffer-size", type=int, default=1, help="Capture queue size.")
    parser.add_argument("--warmup-frames", type=int, default=20,
                        help="Initial frames to discard.")
    parser.add_argument("--drop-frames", type=int, default=1,
                        help="Extra frames to drop each loop to reduce latency.")
    parser.add_argument("--min-disparity", type=int, default=0, help="SGBM min disparity.")
    parser.add_argument("--num-disparities", type=int, default=16 * 8,
                        help="SGBM disparity range, multiple of 16.")
    parser.add_argument("--block-size", type=int, default=7, help="SGBM block size (odd).")
    parser.add_argument("--center-window", type=int, default=15,
                        help="Center patch size for distance readout.")
    return parser.parse_args(argv)


def build_matcher(min_disp: int, num_disp: int, block_size: int):
    import cv2

    cn = 1
    return cv2.StereoSGBM.create(
        minDisparity=min_disp,
        numDisparities=num_disp,
        blockSize=block_size,
        P1=8 * cn * block_size * block_size,
        P2=32 * cn * block_size * block_size,
        disp12MaxDiff=1,
        uniquenessRatio=10,
        speckleWindowSize=100,
        speckleRange=2,
        preFilterCap=31,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
    )


def process_pair(frame_l, frame_r, maps, matcher, Q, center_window: int):
    """Rectify -> SGBM -> metric Z -> (rect_l, rect_r, disparity, z, dist_m)."""
    import cv2

    from ..ops.geometry import center_patch_median

    (map_l_1, map_l_2), (map_r_1, map_r_2) = maps
    rect_l = cv2.remap(frame_l, map_l_1, map_l_2, cv2.INTER_LINEAR)
    rect_r = cv2.remap(frame_r, map_r_1, map_r_2, cv2.INTER_LINEAR)
    gray_l = cv2.cvtColor(rect_l, cv2.COLOR_BGR2GRAY)
    gray_r = cv2.cvtColor(rect_r, cv2.COLOR_BGR2GRAY)

    disparity = matcher.compute(gray_l, gray_r).astype(np.float32) / 16.0
    disparity[disparity <= 0.0] = np.nan

    points_3d = cv2.reprojectImageTo3D(np.nan_to_num(disparity, nan=0.0), Q)
    z = points_3d[:, :, 2]
    z[~np.isfinite(disparity)] = np.nan
    dist_m = center_patch_median(z, center_window)
    return rect_l, rect_r, disparity, z, dist_m


def render_disparity(disparity: np.ndarray, dist_m: float):
    import cv2

    disp_vis = np.nan_to_num(disparity, nan=0.0)
    disp_vis = cv2.normalize(disp_vis, np.empty_like(disp_vis), 0, 255,
                             cv2.NORM_MINMAX).astype(np.uint8)
    disp_vis = cv2.applyColorMap(disp_vis, cv2.COLORMAP_TURBO)
    h, w = disparity.shape
    cv2.drawMarker(disp_vis, (w // 2, h // 2), (255, 255, 255), cv2.MARKER_CROSS, 18, 2)
    text = (
        f"center depth: {dist_m:.3f} m" if np.isfinite(dist_m) else "center depth: n/a"
    )
    cv2.putText(disp_vis, text, (15, 30), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                (255, 255, 255), 2)
    return disp_vis


def main(argv: list[str] | None = None) -> None:
    import cv2

    args = parse_args(argv)
    if not args.calibration.exists():
        raise FileNotFoundError(f"Calibration file not found: {args.calibration}")
    if args.num_disparities % 16 != 0:
        raise ValueError("--num-disparities must be a multiple of 16.")
    if args.block_size % 2 == 0 or args.block_size < 3:
        raise ValueError("--block-size must be odd and >= 3.")

    data = np.load(args.calibration)
    image_size_values = data["image_size"].tolist()
    image_size = (int(image_size_values[0]), int(image_size_values[1]))
    maps = (
        cv2.initUndistortRectifyMap(
            data["mtx_l"], data["dist_l"], data["R1"], data["P1"], image_size,
            cv2.CV_16SC2,
        ),
        cv2.initUndistortRectifyMap(
            data["mtx_r"], data["dist_r"], data["R2"], data["P2"], image_size,
            cv2.CV_16SC2,
        ),
    )
    matcher = build_matcher(args.min_disparity, args.num_disparities, args.block_size)
    Q = data["Q"]

    source: FrameSource
    if args.input_dir is not None:
        source = directory_source(args.input_dir)
    else:
        if args.left is None or args.right is None:
            raise SystemExit("Provide --left/--right camera indices or --input-dir.")
        config = CameraConfig(
            width=args.width, height=args.height, fps=args.fps, fourcc=args.fourcc,
            buffer_size=args.buffer_size, warmup_frames=args.warmup_frames,
            drop_frames=args.drop_frames,
        )
        source = camera_source(args.left, args.right, config)

    if args.headless:
        args.output_dir.mkdir(parents=True, exist_ok=True)
    print("Running live depth. Press q or Esc to quit.")

    for frame_index, (frame_l, frame_r) in enumerate(source):
        left_size = (frame_l.shape[1], frame_l.shape[0])
        right_size = (frame_r.shape[1], frame_r.shape[0])
        if left_size != image_size or right_size != image_size:
            raise RuntimeError(
                f"Capture size mismatch. Expected calibration size={image_size}, "
                f"left={left_size}, right={right_size}. Reconfigure camera mode "
                "or recalibrate at the active resolution."
            )
        rect_l, rect_r, disparity, z, dist_m = process_pair(
            frame_l, frame_r, maps, matcher, Q, args.center_window
        )
        disp_vis = render_disparity(disparity, dist_m)

        if args.headless:
            cv2.imwrite(str(args.output_dir / f"disparity_{frame_index:05d}.png"),
                        disp_vis)
            (args.output_dir / f"readout_{frame_index:05d}.json").write_text(
                json.dumps({"center_depth_m": None if not np.isfinite(dist_m)
                            else float(dist_m)})
            )
            continue

        cv2.imshow("Left Camera (Rectified)", rect_l)
        cv2.imshow("Right Camera (Rectified)", rect_r)
        cv2.imshow("Disparity / Depth", disp_vis)
        key = cv2.waitKey(1) & 0xFF
        if key in (ord("q"), 27):
            break

    if not args.headless:
        cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
