"""Resize semantics: exact parity with torch bilinear align_corners=False."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_depth_estimation_tpu.ops import resize

torch = pytest.importorskip("torch")


def _torch_resize(img_hwc: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    t = torch.from_numpy(img_hwc.astype(np.float32)).permute(2, 0, 1).unsqueeze(0)
    out = torch.nn.functional.interpolate(
        t, size=out_hw, mode="bilinear", align_corners=False
    )
    return out.squeeze(0).permute(1, 2, 0).numpy()


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((2, 4), (2, 8)), ((480, 640), (240, 320)), ((7, 13), (5, 29)), ((10, 10), (10, 10))],
)
def test_resize_matches_torch(in_hw, out_hw) -> None:
    rng = np.random.default_rng(42)
    img = rng.uniform(0, 1, size=(*in_hw, 3)).astype(np.float32)
    expected = _torch_resize(img, out_hw)
    got_np = resize.resize_bilinear_np(img, out_hw)
    got_jax = np.asarray(resize.resize_bilinear(jnp.asarray(img), out_hw))
    np.testing.assert_allclose(got_np, expected, atol=1e-5)
    np.testing.assert_allclose(got_jax, expected, atol=1e-5)


def test_resize_batched_jax() -> None:
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, size=(4, 12, 16, 3)).astype(np.float32)
    out = np.asarray(resize.resize_bilinear(jnp.asarray(imgs), (6, 8)))
    for i in range(4):
        np.testing.assert_allclose(
            out[i], resize.resize_bilinear_np(imgs[i], (6, 8)), atol=1e-5
        )


def test_disparity_resize_scales_with_output_width() -> None:
    # Pins the width-scaling rule (reference tests/test_dataset.py:38-61):
    # constant 1.5 disparity at width 4 -> 3.0 at width 8.
    disp = np.full((2, 4), 1.5, dtype=np.float32)
    out = np.asarray(resize.resize_disparity(jnp.asarray(disp), (2, 8)))
    np.testing.assert_allclose(out, np.full((2, 8), 3.0), atol=1e-3)
    out_np = resize.resize_disparity_np(disp, (2, 8))
    np.testing.assert_allclose(out_np, np.full((2, 8), 3.0), atol=1e-3)
