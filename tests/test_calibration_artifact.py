"""Golden test for the shipped calibration artifact.

``calibration/stereo_calib.npz`` is produced by
``scripts/make_golden_calibration.py`` from rendered chessboard views of a
rig with EXACT known geometry (f=500 px, baseline=70 mm, 640x480), so this
pins the full real-rig path — npz schema, geometry recovery quality, and
the live stack's ability to consume the bundle — the way the reference's
shipped real-rig file anchors its viewers."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ARTIFACT = Path(__file__).resolve().parent.parent / "calibration" / "stereo_calib.npz"

EXPECTED_KEYS = (
    "image_size", "mtx_l", "dist_l", "mtx_r", "dist_r",
    "R", "T", "E", "F", "R1", "R2", "P1", "P2", "Q",
    "stereo_rms", "mono_rms_l", "mono_rms_r", "rows", "cols", "square_size",
)


def test_artifact_schema_is_reference_compatible() -> None:
    with np.load(ARTIFACT) as geo:
        for key in EXPECTED_KEYS:
            assert key in geo, key
        assert tuple(geo["image_size"]) == (640, 480)
        assert geo["mtx_l"].shape == (3, 3) and geo["Q"].shape == (4, 4)


def test_artifact_geometry_matches_ground_truth_rig() -> None:
    from stereo_depth_estimation_tpu.ops.geometry import estimate_baseline_m

    with np.load(ARTIFACT) as geo:
        baseline = estimate_baseline_m(P1=geo["P1"], P2=geo["P2"], T=geo["T"])
        focal = float(geo["P1"][0, 0])
        rms = float(geo["stereo_rms"])
    assert abs(baseline - 0.07) / 0.07 < 0.02, baseline
    assert abs(focal - 500.0) / 500.0 < 0.02, focal
    assert rms < 0.5, rms


def test_live_stack_consumes_the_artifact() -> None:
    from stereo_depth_estimation_tpu.live.depth_live_dl import (
        load_calibration_geometry,
        maybe_load_rectifier,
    )
    from stereo_depth_estimation_tpu.ops.geometry import (
        disparity_to_depth_np,
        scale_focal_to_model,
    )

    focal_px, baseline_m, calib_width = load_calibration_geometry(ARTIFACT)
    assert calib_width == 640
    rectifier = maybe_load_rectifier(ARTIFACT, use_rectification=True)
    assert rectifier is not None
    assert rectifier.image_size == (640, 480)
    assert np.isfinite(np.asarray(rectifier.map_l_x)).all()

    # f*B/d through the scaled focal: a 10 px disparity at model width 320
    # on this rig is (500*320/640) * 0.070 / 10 ~= 1.75 m.
    f_model = scale_focal_to_model(focal_px, calib_width, 320)
    depth = disparity_to_depth_np(np.array([[10.0]]), f_model, baseline_m)
    np.testing.assert_allclose(depth[0, 0], f_model * baseline_m / 10.0)
    assert 1.6 < depth[0, 0] < 1.9
