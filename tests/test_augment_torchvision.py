"""Pointwise augmentation parity against the REAL torchvision library.

The transcribed color math in ``ops/augment.py`` mirrors
``torchvision.transforms.functional`` (reference
/root/reference/src/foundation_stereo_depth/dataset.py:214-270 applies
adjust_brightness/contrast/saturation/hue, adjust_gamma, and
gaussian_blur per view). Until this file, that parity rested on
hand-transcribed golden values (tests/test_augment_golden.py) because no
torchvision wheel exists in the dev image — a transcription drift would
have passed every committed test. Here the comparison is against the
installed library itself, pointwise, at fixed factors.

Skips cleanly when torchvision is absent (the bare dev image); CI's
``torchvision-equivalence`` job (.github/workflows/quality.yml) installs
torch+torchvision and runs exactly this file.

Input domain note: images are uint8-quantised (k/255), matching
production decode. Hue's which-channel-is-max selection is
eps-tolerant (ops/augment.py:_rgb_to_hsv, eps=1e-6) where torchvision
branches on exact comparisons — on the 1/255 grid the two can only
disagree when channels tie EXACTLY, where all sector formulas agree, so
quantised inputs make the comparison well-posed rather than easier.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tvf = pytest.importorskip("torchvision.transforms.functional")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stereo_depth_estimation_tpu.ops import augment as aug  # noqa: E402

SHAPES = [(5, 7), (16, 16), (9, 13)]
ATOL = 1e-5


def _images(shape: tuple[int, int], n: int = 4, seed: int = 0) -> np.ndarray:
    """(n, H, W, 3) float32 on the uint8/255 grid, plus edge rows."""
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, *shape, 3)).astype(np.float32) / 255.0
    imgs[0, 0, 0] = 0.0  # black pixel
    imgs[0, 0, 1] = 1.0  # white pixel
    imgs[0, 1, 0] = 0.5  # exact gray (all channels tie)
    return imgs


def _tv(per_image_fn, imgs: np.ndarray) -> np.ndarray:
    """Apply a torchvision CHW functional per image of an NHWC batch."""
    outs = []
    for img in imgs:
        chw = torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))
        outs.append(per_image_fn(chw).numpy().transpose(1, 2, 0))
    return np.stack(outs)


def _ours(fn, imgs: np.ndarray, factors: np.ndarray) -> np.ndarray:
    return np.asarray(jax.jit(fn)(jnp.asarray(imgs), jnp.asarray(factors)))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("factor", [0.5, 0.75, 1.0, 1.25, 1.5])
def test_adjust_brightness_matches_torchvision(shape, factor) -> None:
    imgs = _images(shape)
    ours = _ours(aug.adjust_brightness, imgs, np.full(len(imgs), factor, np.float32))
    ref = _tv(lambda t: tvf.adjust_brightness(t, factor), imgs)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("factor", [0.5, 0.75, 1.0, 1.25, 1.5])
def test_adjust_contrast_matches_torchvision(shape, factor) -> None:
    imgs = _images(shape)
    ours = _ours(aug.adjust_contrast, imgs, np.full(len(imgs), factor, np.float32))
    ref = _tv(lambda t: tvf.adjust_contrast(t, factor), imgs)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("factor", [0.5, 0.75, 1.0, 1.25, 1.5])
def test_adjust_saturation_matches_torchvision(shape, factor) -> None:
    imgs = _images(shape)
    ours = _ours(aug.adjust_saturation, imgs, np.full(len(imgs), factor, np.float32))
    ref = _tv(lambda t: tvf.adjust_saturation(t, factor), imgs)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("shift", [-0.5, -0.09, -0.04, 0.0, 0.05, 0.09, 0.5])
def test_adjust_hue_matches_torchvision(shape, shift) -> None:
    imgs = _images(shape)
    ours = _ours(aug.adjust_hue, imgs, np.full(len(imgs), shift, np.float32))
    ref = _tv(lambda t: tvf.adjust_hue(t, shift), imgs)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("gamma", [0.8, 1.0, 1.2])
def test_adjust_gamma_matches_torchvision(shape, gamma) -> None:
    imgs = _images(shape)
    ours = _ours(aug.adjust_gamma, imgs, np.full(len(imgs), gamma, np.float32))
    ref = _tv(lambda t: tvf.adjust_gamma(t, gamma), imgs)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


@pytest.mark.parametrize("shape", [(16, 16), (9, 13)])
@pytest.mark.parametrize("kernel_size", [3, 5])
@pytest.mark.parametrize("sigma", [0.1, 0.5, 1.0])
def test_gaussian_blur_matches_torchvision(shape, kernel_size, sigma) -> None:
    imgs = _images(shape)
    ours = np.asarray(
        jax.jit(aug.gaussian_blur, static_argnums=2)(
            jnp.asarray(imgs),
            jnp.full(len(imgs), sigma, jnp.float32),
            kernel_size,
        )
    )
    ref = _tv(
        lambda t: tvf.gaussian_blur(t, [kernel_size, kernel_size], [sigma, sigma]),
        imgs,
    )
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_full_chain_matches_torchvision_order(shape=(12, 12)) -> None:
    """The composed pre-noise chain (brightness -> contrast -> saturation
    -> hue -> gamma -> blur) matches applying the torchvision functionals
    in the reference's order (dataset.py:214-270) with the SAME per-image
    factors. Noise is excluded (RNG streams differ by construction —
    docs/PARITY.md); the final clamp is applied on both sides."""
    n = 4
    imgs = _images(shape, n=n, seed=3)
    rng = np.random.default_rng(7)
    brightness = rng.uniform(0.75, 1.25, n).astype(np.float32)
    contrast = rng.uniform(0.75, 1.25, n).astype(np.float32)
    saturation = rng.uniform(0.75, 1.25, n).astype(np.float32)
    hue = rng.uniform(-0.09, 0.09, n).astype(np.float32)
    gamma = rng.uniform(0.8, 1.2, n).astype(np.float32)
    sigma = rng.uniform(0.1, 1.0, n).astype(np.float32)
    blur_on = np.array([True, False, True, False])

    config = aug.AugmentConfig(noise_std_max=0.0, impl="xla")
    factors = {
        "brightness": jnp.asarray(brightness),
        "contrast": jnp.asarray(contrast),
        "saturation": jnp.asarray(saturation),
        "hue": jnp.asarray(hue),
        "gamma": jnp.asarray(gamma),
        "blur_on": jnp.asarray(blur_on),
        "blur_sigma": jnp.asarray(sigma),
        "noise_std": jnp.zeros(n),
    }
    ours = np.asarray(
        aug.augment_with_factors(
            jax.random.key(0), jnp.asarray(imgs), factors, config
        )
    )

    refs = []
    for i in range(n):
        t = torch.from_numpy(np.ascontiguousarray(imgs[i].transpose(2, 0, 1)))
        t = tvf.adjust_brightness(t, float(brightness[i]))
        t = tvf.adjust_contrast(t, float(contrast[i]))
        t = tvf.adjust_saturation(t, float(saturation[i]))
        t = tvf.adjust_hue(t, float(hue[i]))
        t = tvf.adjust_gamma(t, float(gamma[i]))
        if blur_on[i]:
            t = tvf.gaussian_blur(
                t,
                [config.blur_kernel_size, config.blur_kernel_size],
                [float(sigma[i]), float(sigma[i])],
            )
        t = torch.clamp(t, 0.0, 1.0)
        refs.append(t.numpy().transpose(1, 2, 0))
    np.testing.assert_allclose(ours, np.stack(refs), atol=5e-5)
