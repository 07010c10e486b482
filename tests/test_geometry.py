"""Geometry ops: depth conversion, baseline estimation, contours, readouts."""

import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.ops.geometry import (
    center_patch_median,
    confidence_from_logvar_np,
    depth_contour_mask,
    disparity_to_depth,
    disparity_to_depth_np,
    estimate_baseline_m,
    scale_focal_to_model,
)


def test_disparity_to_depth_basic() -> None:
    disparity = np.array([[10.0, 0.0], [np.nan, 5.0]], dtype=np.float32)
    depth = disparity_to_depth_np(disparity, focal_length_px=500.0, baseline_m=0.07)
    np.testing.assert_allclose(depth[0, 0], 500.0 * 0.07 / 10.0)
    assert np.isnan(depth[0, 1]) and np.isnan(depth[1, 0])
    np.testing.assert_allclose(depth[1, 1], 500.0 * 0.07 / 5.0)
    depth_j = np.asarray(disparity_to_depth(jnp.asarray(disparity), 500.0, 0.07))
    np.testing.assert_allclose(
        depth_j[np.isfinite(depth)], depth[np.isfinite(depth)], rtol=1e-6
    )
    assert np.isnan(depth_j[0, 1]) and np.isnan(depth_j[1, 0])


def test_estimate_baseline_from_projection() -> None:
    # Shipped-rig style numbers: f=488.87, tx = -f*B => B = 71.5mm
    P1 = np.eye(3, 4)
    P1[0, 0] = 488.87
    P2 = P1.copy()
    P2[0, 3] = -488.87 * 0.0715
    assert abs(estimate_baseline_m(P1, P2, None) - 0.0715) < 1e-9
    # Fallback to ||T||
    T = np.array([0.07, 0.0, 0.01])
    assert abs(estimate_baseline_m(None, None, T) - np.linalg.norm(T)) < 1e-12
    # Degenerate P2 -> fall back to T
    P2_zero = P1.copy()
    P2_zero[0, 3] = 0.0
    assert estimate_baseline_m(P1, P2_zero, T) == np.linalg.norm(T)
    assert estimate_baseline_m(None, None, None) is None


def test_scale_focal_to_model() -> None:
    assert scale_focal_to_model(488.87, 640, 320) == 488.87 * 0.5


def test_confidence_from_logvar() -> None:
    lv = np.array([0.0, 2.0])
    np.testing.assert_allclose(
        confidence_from_logvar_np(lv), [1.0, np.exp(-1.0)]
    )


def test_depth_contour_mask_marks_bin_boundaries() -> None:
    depth = np.array(
        [[0.4, 0.4, 0.9], [0.4, 0.4, 0.9], [np.nan, 2.0, 2.0]], dtype=np.float32
    )
    mask = depth_contour_mask(depth, 0.5, 0.0, 10.0)
    assert mask.dtype == np.uint8
    assert mask[0, 1] == 255  # 0.4|0.9 boundary (bins 0|1)
    assert mask[0, 0] == 0
    assert mask[2, 0] == 0  # NaN neighbour is not an edge
    assert mask[1, 1] == 255  # vertical 0.4|2.0 edge
    # no valid pixels -> all zero
    assert depth_contour_mask(np.full((2, 2), np.nan), 0.5, 0, 10).sum() == 0


def test_center_patch_median() -> None:
    values = np.zeros((11, 11), np.float32)
    values[4:7, 4:7] = 3.0
    assert center_patch_median(values, 3) == 3.0
    # all invalid -> nan
    assert np.isnan(center_patch_median(np.zeros((5, 5), np.float32), 3))
