"""foundation-stereo-predict: batched offline inference CLI.

Covers both input modes (paired directories / dataset split), the padded
tail batch, npz payload contents, PNG output, and metric depth from a
calibration file (focal scaled calib->model width, baseline from P1/P2 —
same math the live viewer uses, reference depth_live_dl.py:371-377).
"""

from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

from stereo_depth_estimation_tpu.eval.predict import build_parser, predict
from stereo_depth_estimation_tpu.models import StereoUNet
from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np
from stereo_depth_estimation_tpu.parallel import create_train_state, make_adamw
from stereo_depth_estimation_tpu.training.checkpoint import save_checkpoint

HW = (32, 32)
BASE = 4


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("ckpt")
    model = StereoUNet(base_channels=BASE)
    state = create_train_state(
        model, jax.random.key(0), HW, make_adamw(1e-3, 1e-4)
    )
    save_checkpoint(root, "last", state, epoch=1, config={}, metrics={})
    return root / "last"


@pytest.fixture(scope="module")
def pair_dirs(tmp_path_factory) -> tuple[Path, Path]:
    root = tmp_path_factory.mktemp("pairs")
    left_dir, right_dir = root / "left", root / "right"
    left_dir.mkdir(), right_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        for d in (left_dir, right_dir):
            img = rng.integers(0, 256, (*HW, 3), dtype=np.uint8)
            # Mixed extensions: pairing is by stem with extension fallback.
            ext = ".jpg" if (d is right_dir and i == 0) else ".png"
            Image.fromarray(img).save(d / f"frame_{i:03d}{ext}")
    return left_dir, right_dir


def _args(**kw):
    argv = []
    for key, value in kw.items():
        flag = "--" + key.replace("_", "-")
        if value is True:
            argv.append(flag)
        elif value is False:
            argv.append("--no-" + flag[2:])
        else:
            argv += [flag, str(value)]
    return build_parser().parse_args(argv)


def test_pair_dirs_mode_writes_npz_and_png(
    checkpoint_dir: Path, pair_dirs, tmp_path: Path
) -> None:
    left_dir, right_dir = pair_dirs
    out = tmp_path / "pred"
    # batch 2 over 5 pairs -> exercises the padded tail batch
    result = predict(_args(
        left_dir=left_dir, right_dir=right_dir, checkpoint=checkpoint_dir,
        predictions_dir=out, height=HW[0], width=HW[1], batch_size=2,
        base_channels=BASE, save_png=True,
    ))
    assert result["pairs"] == 5
    files = sorted(out.glob("*.npz"))
    assert len(files) == 5
    payload = np.load(files[0])
    assert payload["disparity"].shape == HW
    assert payload["disparity"].dtype == np.float16
    assert np.all(payload["disparity"] >= 0)  # softplus head
    assert payload["logvar"].shape == HW
    np.testing.assert_allclose(
        payload["confidence"].astype(np.float32),
        np.exp(-0.5 * payload["logvar"].astype(np.float32)),
        rtol=2e-3,
    )
    assert "depth_m" not in payload
    pngs = sorted(out.glob("*_disparity.png"))
    assert len(pngs) == 5
    assert Image.open(pngs[0]).size == (HW[1], HW[0])


def test_tail_batch_matches_full_batch(
    checkpoint_dir: Path, pair_dirs, tmp_path: Path
) -> None:
    """The padded tail must produce identical predictions to a batch size
    that divides the pair count evenly."""
    left_dir, right_dir = pair_dirs
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    common = dict(
        left_dir=left_dir, right_dir=right_dir, checkpoint=checkpoint_dir,
        height=HW[0], width=HW[1], base_channels=BASE,
    )
    predict(_args(predictions_dir=out_a, batch_size=2, **common))
    predict(_args(predictions_dir=out_b, batch_size=5, **common))
    for f in sorted(out_a.glob("*.npz")):
        a, b = np.load(f), np.load(out_b / f.name)
        np.testing.assert_array_equal(a["disparity"], b["disparity"])


def test_dataset_split_mode(checkpoint_dir: Path, tmp_path: Path) -> None:
    """Two scenes sharing frame stems (000000.png lives in EVERY scene's
    tree): outputs must be scene-qualified so scenes don't overwrite each
    other."""
    root = tmp_path / "data"
    rng = np.random.default_rng(1)
    for scene in ("scene_01", "scene_02"):
        for i in range(2):
            base = root / scene / "dataset" / "data"
            for sub in ("left/rgb", "right/rgb", "left/disparity"):
                (base / sub).mkdir(parents=True, exist_ok=True)
            for sub in ("left/rgb", "right/rgb"):
                Image.fromarray(
                    rng.integers(0, 256, (*HW, 3), dtype=np.uint8)
                ).save(base / sub / f"{i:06d}.png")
            disparity = rng.uniform(0.5, 20.0, HW).astype(np.float32)
            Image.fromarray(disparity_encode_np(disparity)).save(
                base / "left/disparity" / f"{i:06d}.png"
            )
    out = tmp_path / "pred"
    result = predict(_args(
        dataset_root=root, split="all", checkpoint=checkpoint_dir,
        predictions_dir=out, height=HW[0], width=HW[1], batch_size=4,
        base_channels=BASE,
    ))
    assert result["pairs"] == 4
    names = sorted(f.name for f in out.glob("*.npz"))
    assert names == [
        "scene_01_000000.npz", "scene_01_000001.npz",
        "scene_02_000000.npz", "scene_02_000001.npz",
    ]


def test_duplicate_pair_stems_rejected(
    checkpoint_dir: Path, pair_dirs, tmp_path: Path
) -> None:
    """Directory mode with colliding stems must fail loudly, not overwrite."""
    left_dir, right_dir = pair_dirs
    dup_left, dup_right = tmp_path / "l", tmp_path / "r"
    dup_left.mkdir(), dup_right.mkdir()
    img = Image.fromarray(np.zeros((*HW, 3), np.uint8))
    for d in (dup_left, dup_right):
        img.save(d / "frame.png")
        img.save(d / "frame.jpg")  # same stem, different extension
    with pytest.raises(ValueError, match="Duplicate output key"):
        predict(_args(
            left_dir=dup_left, right_dir=dup_right, checkpoint=checkpoint_dir,
            predictions_dir=tmp_path / "pred", height=HW[0], width=HW[1],
            batch_size=2, base_channels=BASE,
        ))


def test_malformed_calibration_raises_value_error(
    checkpoint_dir: Path, pair_dirs, tmp_path: Path
) -> None:
    left_dir, right_dir = pair_dirs
    common = dict(
        left_dir=left_dir, right_dir=right_dir, checkpoint=checkpoint_dir,
        predictions_dir=tmp_path / "pred", height=HW[0], width=HW[1],
        batch_size=5, base_channels=BASE,
    )
    no_focal = tmp_path / "no_focal.npz"
    np.savez(no_focal, T=np.array([-0.07, 0, 0]),
             image_size=np.array([640, 480]))
    with pytest.raises(ValueError, match="'P1' nor 'mtx_l'"):
        predict(_args(calibration=no_focal, **common))

    no_size = tmp_path / "no_size.npz"
    np.savez(no_size, T=np.array([-0.07, 0, 0]),
             mtx_l=np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]))
    with pytest.raises(ValueError, match="image_size"):
        predict(_args(calibration=no_size, **common))


def test_calibration_adds_metric_depth(
    checkpoint_dir: Path, pair_dirs, tmp_path: Path
) -> None:
    left_dir, right_dir = pair_dirs
    focal, baseline, calib_w = 500.0, 0.07, 640
    calib = tmp_path / "calib.npz"
    p1 = np.array([[focal, 0, 320, 0], [0, focal, 240, 0], [0, 0, 1, 0]])
    p2 = p1.copy()
    p2[0, 3] = -focal * baseline
    np.savez(calib, P1=p1, P2=p2, T=np.array([-baseline, 0, 0]),
             image_size=np.array([calib_w, 480]))
    out = tmp_path / "pred"
    predict(_args(
        left_dir=left_dir, right_dir=right_dir, checkpoint=checkpoint_dir,
        predictions_dir=out, height=HW[0], width=HW[1], batch_size=5,
        base_channels=BASE, calibration=calib, max_samples=2,
    ))
    payload = np.load(sorted(out.glob("*.npz"))[0])
    depth = payload["depth_m"].astype(np.float32)
    disp = payload["disparity"].astype(np.float32)
    # depth = f_model * B / disparity with f_model = f_calib * W_model/W_calib
    focal_model = focal * HW[1] / calib_w
    valid = disp > 1e-2
    np.testing.assert_allclose(
        depth[valid], focal_model * baseline / disp[valid], rtol=2e-2
    )


def test_input_mode_validation(checkpoint_dir: Path, tmp_path: Path) -> None:
    with pytest.raises(ValueError, match="together"):
        predict(_args(left_dir=tmp_path, checkpoint=checkpoint_dir,
                      predictions_dir=tmp_path / "o"))
    with pytest.raises(ValueError, match="either"):
        predict(_args(checkpoint=checkpoint_dir,
                      predictions_dir=tmp_path / "o"))
