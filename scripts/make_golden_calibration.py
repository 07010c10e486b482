"""Produce the repo's shipped calibration artifact from rendered views.

Renders a 9x6-inner-corner chessboard (0.03 m squares) seen by a synthetic
stereo rig — focal 500 px, 640x480, 70 mm baseline, parallel optical axes —
and runs the real ``foundation-stereo-calibrate --image-dir`` pipeline on
the rendered pairs. The resulting ``calibration/stereo_calib.npz`` plays the
role of the reference's shipped real-rig bundle: a known-good geometry file
the live tools and tests can pin against (ground truth is exact here, which
a physical rig can't offer).

Usage:  python scripts/make_golden_calibration.py [output.npz]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stereo_depth_estimation_tpu.live.calibrate import main as calibrate_main

COLS, ROWS = 9, 6  # inner corners
SQUARE_M = 0.03
IMAGE_SIZE = (640, 480)
FOCAL_PX = 500.0
BASELINE_M = 0.07
TEX_PX_PER_SQUARE = 60


def board_texture() -> np.ndarray:
    """(Hpx, Wpx) uint8 chessboard with a 1-square quiet border."""
    sq = TEX_PX_PER_SQUARE
    nx, ny = COLS + 1, ROWS + 1  # full squares
    tex = np.full(((ny + 2) * sq, (nx + 2) * sq), 255, np.uint8)
    for j in range(ny):
        for i in range(nx):
            if (i + j) % 2 == 0:
                y0, x0 = (j + 1) * sq, (i + 1) * sq
                tex[y0 : y0 + sq, x0 : x0 + sq] = 20
    return tex


def render_view(tex: np.ndarray, K: np.ndarray, rvec, tvec) -> np.ndarray:
    """Project the board plane (z=0 world) into a camera at (rvec, tvec)."""
    h_tex, w_tex = tex.shape
    m_per_px = SQUARE_M / TEX_PX_PER_SQUARE
    # Texture corner pixels -> board-plane meters (origin at first inner
    # corner, matching board_object_points' frame: inner corner (0,0) sits
    # 2 squares in from the texture edge).
    origin_px = 2 * TEX_PX_PER_SQUARE
    tex_corners_px = np.array(
        [[0, 0], [w_tex, 0], [w_tex, h_tex], [0, h_tex]], np.float32
    )
    world = np.concatenate(
        [
            (tex_corners_px - origin_px) * m_per_px,
            np.zeros((4, 1), np.float32),
        ],
        axis=1,
    ).astype(np.float32)
    image_pts, _ = cv2.projectPoints(world, rvec, tvec, K, None)
    H = cv2.getPerspectiveTransform(tex_corners_px, image_pts.reshape(4, 2))
    view = cv2.warpPerspective(
        tex, H, IMAGE_SIZE, flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=128,
    )
    return cv2.GaussianBlur(view, (3, 3), 0.6)  # helps subpixel refinement


def main() -> None:
    output = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "calibration/stereo_calib.npz"
    )
    K = np.array(
        [[FOCAL_PX, 0, IMAGE_SIZE[0] / 2], [0, FOCAL_PX, IMAGE_SIZE[1] / 2],
         [0, 0, 1]]
    )
    tex = board_texture()
    rng = np.random.default_rng(7)

    with tempfile.TemporaryDirectory() as tmp:
        frames = Path(tmp)
        rendered = 0
        pose = 0
        while rendered < 14 and pose < 60:
            pose += 1
            rvec = rng.uniform(-0.35, 0.35, 3)
            tvec = np.array([
                rng.uniform(-0.10, 0.03),  # keep board visible in BOTH views
                rng.uniform(-0.06, 0.06),
                rng.uniform(0.45, 0.80),
            ])
            # Board-plane center roughly at the optical axis.
            tvec[0] += -0.5 * (COLS - 1) * SQUARE_M
            tvec[1] += -0.5 * (ROWS - 1) * SQUARE_M
            left = render_view(tex, K, rvec, tvec)
            tvec_r = tvec.copy()
            tvec_r[0] -= BASELINE_M
            right = render_view(tex, K, rvec, tvec_r)
            ok_l, _ = cv2.findChessboardCorners(left, (COLS, ROWS), None)
            ok_r, _ = cv2.findChessboardCorners(right, (COLS, ROWS), None)
            if not (ok_l and ok_r):
                continue
            cv2.imwrite(str(frames / f"left_{rendered:03d}.png"), left)
            cv2.imwrite(str(frames / f"right_{rendered:03d}.png"), right)
            rendered += 1
        print(f"Rendered {rendered} detectable pairs ({pose} poses tried)")

        calibrate_main([
            "--image-dir", str(frames),
            "--rows", str(ROWS), "--cols", str(COLS),
            "--square-size", str(SQUARE_M),
            "--samples", "14",
            "--output", str(output),
        ])

    geo = np.load(output)
    baseline = float(np.linalg.norm(geo["T"]))
    print(
        f"Artifact: f={geo['P1'][0, 0]:.2f} px (truth {FOCAL_PX}), "
        f"baseline={baseline * 1000:.2f} mm (truth {BASELINE_M * 1000}), "
        f"rms={float(geo['stereo_rms']):.4f}"
    )


if __name__ == "__main__":
    main()
