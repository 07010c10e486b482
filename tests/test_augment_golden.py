"""Independent goldens for the augmentation color math.

Round-1 review flagged that the augmentation tests compared the JAX chain
against a numpy transcription by the same author — a shared misreading
would pass. These tests check against genuinely independent references:

- hue: CPython's ``colorsys`` (the same HSV algorithm torchvision's
  float path implements), applied per pixel in pure Python;
- saturation/contrast: the ITU-R BT.601 luma weights stated numerically,
  with the documented torchvision blend ``ratio*img + (1-ratio)*other``;
- gamma: the documented ``gain * img**gamma`` on clamped input;
- blur: a from-scratch numpy separable convolution with reflect padding
  and the torchvision kernel definition.
"""

import colorsys

import jax
import numpy as np

from stereo_depth_estimation_tpu.ops.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_gamma,
    adjust_hue,
    adjust_saturation,
    gaussian_blur,
)


def _img(n=2, h=6, w=5, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, (n, h, w, 3)).astype(np.float32)


def test_hue_matches_colorsys_per_pixel() -> None:
    img = _img(seed=1)
    shifts = np.array([0.07, -0.11], np.float32)
    ours = np.asarray(adjust_hue(img, shifts))
    for n in range(img.shape[0]):
        for y in range(img.shape[1]):
            for x in range(img.shape[2]):
                h, s, v = colorsys.rgb_to_hsv(*img[n, y, x])
                r, g, b = colorsys.hsv_to_rgb((h + shifts[n]) % 1.0, s, v)
                np.testing.assert_allclose(
                    ours[n, y, x], [r, g, b], atol=1e-5,
                    err_msg=f"pixel ({n},{y},{x})",
                )


def test_hue_at_gray_and_primaries() -> None:
    # Degenerate cases where HSV implementations commonly disagree.
    img = np.array(
        [[[[0.5, 0.5, 0.5], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
           [0.0, 0.0, 1.0], [0.0, 0.0, 0.0]]]],
        np.float32,
    )
    shift = np.array([1.0 / 3.0], np.float32)
    out = np.asarray(adjust_hue(img, shift))
    np.testing.assert_allclose(out[0, 0, 0], [0.5, 0.5, 0.5], atol=1e-6)  # gray
    np.testing.assert_allclose(out[0, 0, 1], [0.0, 1.0, 0.0], atol=1e-6)  # R->G
    np.testing.assert_allclose(out[0, 0, 2], [0.0, 0.0, 1.0], atol=1e-6)  # G->B
    np.testing.assert_allclose(out[0, 0, 3], [1.0, 0.0, 0.0], atol=1e-6)  # B->R
    np.testing.assert_allclose(out[0, 0, 4], [0.0, 0.0, 0.0], atol=1e-6)  # black


def _bt601_gray(img: np.ndarray) -> np.ndarray:
    return (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def test_saturation_is_bt601_gray_blend() -> None:
    img = _img(seed=2)
    f = np.array([0.4, 1.7], np.float32)
    ours = np.asarray(adjust_saturation(img, f))
    want = np.clip(
        f[:, None, None, None] * img
        + (1 - f[:, None, None, None]) * _bt601_gray(img),
        0, 1,
    )
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_contrast_blends_against_mean_luma() -> None:
    img = _img(seed=3)
    f = np.array([0.3, 1.5], np.float32)
    ours = np.asarray(adjust_contrast(img, f))
    mean = _bt601_gray(img).mean(axis=(1, 2, 3), keepdims=True)
    want = np.clip(
        f[:, None, None, None] * img + (1 - f[:, None, None, None]) * mean, 0, 1
    )
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_brightness_and_gamma_formulas() -> None:
    img = _img(seed=4)
    f = np.array([0.5, 1.9], np.float32)
    np.testing.assert_allclose(
        np.asarray(adjust_brightness(img, f)),
        np.clip(f[:, None, None, None] * img, 0, 1),
        atol=1e-6,
    )
    g = np.array([0.7, 1.3], np.float32)
    np.testing.assert_allclose(
        np.asarray(adjust_gamma(img, g)),
        np.clip(np.clip(img, 0, 1) ** g[:, None, None, None], 0, 1),
        atol=1e-6,
    )


def test_gaussian_blur_matches_scratch_convolution() -> None:
    img = _img(n=2, h=7, w=9, seed=5)
    sigma = np.array([0.6, 1.4], np.float32)
    k = 5
    ours = np.asarray(gaussian_blur(img, sigma, k))

    # From-scratch reference: torchvision kernel definition + reflect pad.
    half = (k - 1) / 2.0
    xs = np.linspace(-half, half, k)
    for n in range(2):
        w1d = np.exp(-0.5 * (xs / sigma[n]) ** 2)
        w1d /= w1d.sum()
        ref = img[n]
        for axis in (0, 1):
            pad = [(0, 0)] * 3
            pad[axis] = (k // 2, k // 2)
            padded = np.pad(ref, pad, mode="reflect")
            out = np.zeros_like(ref)
            for tap in range(k):
                sl = [slice(None)] * 3
                sl[axis] = slice(tap, tap + ref.shape[axis])
                out += padded[tuple(sl)] * w1d[tap]
            ref = out
        np.testing.assert_allclose(ours[n], ref, atol=1e-5)


def test_chain_order_is_reference_order() -> None:
    """brightness -> contrast -> saturation -> hue -> gamma; verified by
    composing the independent formulas in that order."""
    from stereo_depth_estimation_tpu.ops.augment import (
        AugmentConfig,
        augment_with_factors,
    )

    img = _img(n=1, seed=6)
    factors = {
        "brightness": np.array([1.3], np.float32),
        "contrast": np.array([0.8], np.float32),
        "saturation": np.array([1.2], np.float32),
        "hue": np.array([0.05], np.float32),
        "gamma": np.array([1.1], np.float32),
        "blur_on": np.array([False]),
        "blur_sigma": np.array([0.5], np.float32),
        "noise_std": np.array([0.0], np.float32),
    }
    config = AugmentConfig(noise_std_max=0.0, blur_prob=0.0)
    ours = np.asarray(
        augment_with_factors(
            jax.random.key(0),
            img,
            {k: np.asarray(v) for k, v in factors.items()},
            config,
        )
    )

    x = np.clip(1.3 * img, 0, 1)
    mean = _bt601_gray(x).mean(axis=(1, 2, 3), keepdims=True)
    x = np.clip(0.8 * x + 0.2 * mean, 0, 1)
    x = np.clip(1.2 * x + (1 - 1.2) * _bt601_gray(x), 0, 1)
    hued = np.empty_like(x)
    for y in range(x.shape[1]):
        for xx in range(x.shape[2]):
            h, s, v = colorsys.rgb_to_hsv(*x[0, y, xx])
            hued[0, y, xx] = colorsys.hsv_to_rgb((h + 0.05) % 1.0, s, v)
    x = np.clip(np.clip(hued, 0, 1) ** 1.1, 0, 1)
    np.testing.assert_allclose(ours, x, atol=1e-5)
