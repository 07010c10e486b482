"""Rectification maps vs cv2.initUndistortRectifyMap and remap vs cv2.remap."""

import numpy as np
import pytest

from stereo_depth_estimation_tpu.ops.remap import (
    Rectifier,
    compute_rectify_map,
    remap_bilinear,
)

cv2 = pytest.importorskip("cv2")


def _synthetic_calibration(w=160, h=120):
    """Plausible stereo rig: mild distortion, small rotation baseline."""
    fx = 0.8 * w
    K_l = np.array([[fx, 0, w / 2 - 2], [0, fx, h / 2 + 1], [0, 0, 1.0]])
    K_r = np.array([[fx * 1.01, 0, w / 2 + 1], [0, fx * 1.01, h / 2 - 1], [0, 0, 1.0]])
    dist_l = np.array([-0.25, 0.08, 1e-3, -5e-4, -0.01])
    dist_r = np.array([-0.22, 0.07, -8e-4, 6e-4, -0.012])
    angle = 0.01
    R = cv2.Rodrigues(np.array([0.0, angle, 0.002]))[0]
    T = np.array([[-0.07], [0.001], [0.002]])
    R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(
        K_l, dist_l, K_r, dist_r, (w, h), R, T, flags=cv2.CALIB_ZERO_DISPARITY
    )
    return {
        "image_size": np.array([w, h]),
        "mtx_l": K_l, "dist_l": dist_l, "mtx_r": K_r, "dist_r": dist_r,
        "R": R, "T": T, "R1": R1, "R2": R2, "P1": P1, "P2": P2, "Q": Q,
    }


def test_rectify_map_matches_cv2() -> None:
    calib = _synthetic_calibration()
    w, h = calib["image_size"]
    for side in ("l", "r"):
        ours_x, ours_y = compute_rectify_map(
            calib[f"mtx_{side}"], calib[f"dist_{side}"],
            calib["R1" if side == "l" else "R2"],
            calib["P1" if side == "l" else "P2"], (int(w), int(h)),
        )
        cv_x, cv_y = cv2.initUndistortRectifyMap(
            calib[f"mtx_{side}"], calib[f"dist_{side}"],
            calib["R1" if side == "l" else "R2"],
            calib["P1" if side == "l" else "P2"], (int(w), int(h)), cv2.CV_32FC1,
        )
        np.testing.assert_allclose(ours_x, cv_x, atol=2e-3, err_msg=side)
        np.testing.assert_allclose(ours_y, cv_y, atol=2e-3, err_msg=side)


def test_remap_bilinear_matches_cv2() -> None:
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (40, 50, 3)).astype(np.float32)
    map_x = rng.uniform(-2, 52, (40, 50)).astype(np.float32)
    map_y = rng.uniform(-2, 42, (40, 50)).astype(np.float32)
    expected = cv2.remap(
        img, map_x, map_y, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
        borderValue=0.0,
    )
    got = np.asarray(remap_bilinear(img, map_x, map_y))
    # cv2 uses 5-bit fixed-point interpolation weights; allow that quantum.
    np.testing.assert_allclose(got, expected, atol=0.04)
    mid = (map_x > 1) & (map_x < 48) & (map_y > 1) & (map_y < 38)
    np.testing.assert_allclose(got[mid], expected[mid], atol=0.04)


def test_rectifier_end_to_end_identity_region() -> None:
    """Rectified output of our device path stays close to cv2's full pipeline."""
    calib = _synthetic_calibration()
    rect = Rectifier.from_calibration(calib)
    rng = np.random.default_rng(1)
    w, h = calib["image_size"]
    img = rng.uniform(0, 1, (int(h), int(w), 3)).astype(np.float32)

    ours = np.asarray(rect.rectify_left(img))
    cv_x, cv_y = cv2.initUndistortRectifyMap(
        calib["mtx_l"], calib["dist_l"], calib["R1"], calib["P1"],
        (int(w), int(h)), cv2.CV_32FC1,
    )
    theirs = cv2.remap(img, cv_x, cv_y, cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, theirs, atol=0.05)
    assert rect.baseline_m is not None and 0.06 < rect.baseline_m < 0.08
