"""Live stack, headless: DL viewer on stored frames (with and without
rectification), SGBM baseline, calibration math, checkpoint hot-reload."""

import json
import time
from pathlib import Path

import jax
import numpy as np
import pytest

from stereo_depth_estimation_tpu.models import StereoUNet
from stereo_depth_estimation_tpu.parallel import create_train_state, make_adamw
from stereo_depth_estimation_tpu.training.checkpoint import save_checkpoint

cv2 = pytest.importorskip("cv2")

MODEL_HW = 64  # small square model input for CPU test speed


def _write_frames(frame_dir: Path, n: int, size=(120, 160)) -> None:
    rng = np.random.default_rng(0)
    frame_dir.mkdir(parents=True, exist_ok=True)
    h, w = size
    for i in range(n):
        for side in ("left", "right"):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(frame_dir / f"{side}_{i:03d}.png"), img)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("ckpt")
    model = StereoUNet(base_channels=8)  # small width for CPU test speed
    tx = make_adamw(1e-3, 1e-4)
    state = create_train_state(
        model, jax.random.key(0), (MODEL_HW, MODEL_HW), tx
    )
    save_checkpoint(root, "last", state, epoch=5, config={}, metrics={})
    return root / "last"


def test_dl_viewer_headless_no_rectify(tmp_path: Path, checkpoint_dir: Path) -> None:
    from stereo_depth_estimation_tpu.live.depth_live_dl import main

    frames = tmp_path / "frames"
    _write_frames(frames, 2)
    out = tmp_path / "out"
    aot = tmp_path / "aot"
    argv = [
        "--input-dir", str(frames), "--headless",
        "--headless-output", str(out),
        "--checkpoint", str(checkpoint_dir),
        "--no-rectify", "--calibration", str(tmp_path / "missing.npz"),
        "--model-width", str(MODEL_HW), "--model-height", str(MODEL_HW),
        "--base-channels", "8",
        "--max-frames", "2",
        "--aot-cache", str(aot),
    ]
    main(argv)
    assert (out / "depth_00000.png").exists()
    assert (out / "depth_00001.png").exists()
    assert (out / "confidence_00000.png").exists()
    readout = json.loads((out / "readout_00000.json").read_text())
    assert readout["checkpoint_epoch"] == 5
    assert readout["center_disparity"] is None or readout["center_disparity"] >= 0
    # The forward program's executable was banked; a relaunch loads it and
    # produces identical frames (cache hit exercised in-process here; the
    # cross-process load path is covered by tests/test_aot_cache.py).
    blobs = list(aot.glob("aot_*.bin"))
    assert blobs, f"live forward executable not banked in {aot}"
    depth0 = (out / "depth_00000.png").read_bytes()
    out2 = tmp_path / "out2"
    main([a if a != str(out) else str(out2) for a in argv])
    assert (out2 / "depth_00000.png").read_bytes() == depth0


def test_dl_viewer_headless_with_rectification_and_depth(
    tmp_path: Path, checkpoint_dir: Path
) -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_remap import _synthetic_calibration

    from stereo_depth_estimation_tpu.live.depth_live_dl import main

    calib = _synthetic_calibration(w=160, h=120)
    calib_path = tmp_path / "stereo_calib.npz"
    np.savez_compressed(calib_path, **calib)

    frames = tmp_path / "frames"
    _write_frames(frames, 1, size=(120, 160))
    out = tmp_path / "out"
    main([
        "--input-dir", str(frames), "--headless",
        "--headless-output", str(out),
        "--checkpoint", str(checkpoint_dir),
        "--calibration", str(calib_path),
        "--model-width", str(MODEL_HW), "--model-height", str(MODEL_HW),
        "--base-channels", "8",
        "--max-frames", "1", "--ema-alpha", "0.5",
        "--aot-cache", "off",
    ])
    readout = json.loads((out / "readout_00000.json").read_text())
    # depth conversion is enabled (baseline + focal available from calib)
    assert "center_depth_m" in readout
    assert (out / "depth_00000.png").exists()


def test_dl_viewer_size_mismatch_raises(tmp_path: Path, checkpoint_dir: Path) -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_remap import _synthetic_calibration

    from stereo_depth_estimation_tpu.live.depth_live_dl import main

    calib = _synthetic_calibration(w=160, h=120)
    calib_path = tmp_path / "stereo_calib.npz"
    np.savez_compressed(calib_path, **calib)
    frames = tmp_path / "frames"
    _write_frames(frames, 1, size=(64, 64))  # wrong size vs calibration
    with pytest.raises(RuntimeError, match="size mismatch"):
        main([
            "--input-dir", str(frames), "--headless",
            "--headless-output", str(tmp_path / "out"),
            "--checkpoint", str(checkpoint_dir),
            "--calibration", str(calib_path),
            "--model-width", str(MODEL_HW), "--model-height", str(MODEL_HW),
        "--base-channels", "8",
            "--max-frames", "1",
            "--aot-cache", "off",
        ])


def test_sgbm_headless(tmp_path: Path) -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_remap import _synthetic_calibration

    from stereo_depth_estimation_tpu.live.depth_live_sgbm import main

    calib = _synthetic_calibration(w=160, h=120)
    calib_path = tmp_path / "stereo_calib.npz"
    np.savez_compressed(calib_path, **calib)
    frames = tmp_path / "frames"
    _write_frames(frames, 2, size=(120, 160))
    out = tmp_path / "sgbm"
    main([
        "--input-dir", str(frames), "--headless",
        "--output-dir", str(out), "--calibration", str(calib_path),
        "--num-disparities", "32", "--block-size", "5",
    ])
    assert (out / "disparity_00000.png").exists()
    assert (out / "readout_00001.json").exists()


def test_sgbm_validates_args(tmp_path: Path) -> None:
    from stereo_depth_estimation_tpu.live.depth_live_sgbm import main

    calib_path = tmp_path / "c.npz"
    np.savez_compressed(calib_path, image_size=np.array([4, 4]))
    with pytest.raises(ValueError, match="multiple of 16"):
        main(["--calibration", str(calib_path), "--num-disparities", "17",
              "--input-dir", str(tmp_path)])


def test_calibrate_stereo_recovers_geometry() -> None:
    """Feed synthetic projected chessboard points through the calibration
    pipeline; recovered baseline must match the ground-truth rig."""
    from stereo_depth_estimation_tpu.live.calibrate import (
        DetectionBank,
        board_object_points,
        solve_rig_geometry,
    )
    from stereo_depth_estimation_tpu.ops.geometry import estimate_baseline_m

    rng = np.random.default_rng(0)
    w, h = 320, 240
    K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]])
    dist = np.zeros(5)
    baseline = 0.07
    objp = board_object_points(4, 5, 0.03)

    bank = DetectionBank()
    for _ in range(10):
        rvec = rng.uniform(-0.25, 0.25, 3)
        tvec = np.array([
            rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
            rng.uniform(0.4, 0.7),
        ])
        pl, _ = cv2.projectPoints(objp, rvec, tvec, K, dist)
        tvec_r = tvec.copy()
        tvec_r[0] -= baseline  # right camera displaced along +x
        pr, _ = cv2.projectPoints(objp, rvec, tvec_r, K, dist)
        bank.add(pl.astype(np.float32), pr.astype(np.float32), (w, h))

    result = solve_rig_geometry(objp, bank)
    assert float(result["stereo_rms"]) < 1.0
    est = estimate_baseline_m(result["P1"], result["P2"], result["T"])
    assert abs(est - baseline) / baseline < 0.05
    for key in ("mtx_l", "dist_l", "R", "T", "E", "F", "R1", "R2", "Q"):
        assert key in result


def test_checkpoint_watcher_reloads_on_mtime_change(
    tmp_path: Path, checkpoint_dir: Path
) -> None:
    import shutil

    from stereo_depth_estimation_tpu.live.depth_live_dl import (
        CheckpointWatcher,
        LiveDepthEngine,
    )

    local = tmp_path / "ckpt"
    shutil.copytree(checkpoint_dir, local)
    engine = LiveDepthEngine((MODEL_HW, MODEL_HW), rectifier=None, base_channels=8)
    engine.load_checkpoint(local)
    watcher = CheckpointWatcher(engine, local, poll_sec=0.0)

    # touch meta to simulate a new checkpoint; epoch in meta changes
    meta = json.loads((local / "meta.json").read_text())
    meta["epoch"] = 9
    (local / "meta.json").write_text(json.dumps(meta))
    now = time.time_ns()
    import os

    os.utime(local / "meta.json", ns=(now + 10**9, now + 10**9))
    watcher.maybe_reload()
    assert engine.loaded_epoch == 9


def test_capture_settings_fourcc_roundtrip_and_validation() -> None:
    from stereo_depth_estimation_tpu.live.camera_setup import (
        CaptureSettings,
        apply_capture_settings,
        fourcc_int,
        fourcc_str,
    )

    class FakeCap:
        def __init__(self):
            self.calls = []

        def set(self, prop, value):
            self.calls.append((prop, value))

    with pytest.raises(ValueError, match="4 characters"):
        apply_capture_settings(FakeCap(), CaptureSettings(640, 480, 30, fourcc="bad"))
    assert fourcc_str(float(fourcc_int("mjpg"))) == "MJPG"
    assert fourcc_str(float(cv2.VideoWriter.fourcc(*"YUYV"))) == "YUYV"

    cap = FakeCap()
    apply_capture_settings(cap, CaptureSettings(640, 480, 30))
    assert len(cap.calls) == 9  # format, geometry, fps, queue, automation
    assert cap.calls[1][1] == 640.0 and cap.calls[2][1] == 480.0
