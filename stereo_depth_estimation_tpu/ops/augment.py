"""On-device, batched photometric augmentation (jit/vmap-free vectorised).

Capability parity with the reference's per-view augmentation
(/root/reference/src/foundation_stereo_depth/dataset.py:214-270), which uses
torchvision functional ops in this order: brightness, contrast, saturation,
hue, gamma, (probabilistic) Gaussian blur, additive Gaussian noise, final
clamp to [0, 1]. Factor distributions (reference train.py defaults in
parentheses):

- brightness/contrast/saturation factor ~ U[max(0, 1-j), 1+j]   (j=0.25)
- hue shift ~ U[-j, j]                                          (j=0.09)
- gamma ~ U[max(0.1, 1-j), max(low, 1+j)]                       (j=0.2)
- blur applied with prob p (0.03), sigma ~ U[0.1, sigma_max(1.0)], k=5
- noise std ~ U[0, max] (0.05)

The color math transcribes torchvision's float-tensor semantics (blend +
clamp per stage; torchvision _rgb2hsv/_hsv2rgb) so augmented outputs match
the reference distributionally AND pointwise given identical factors.

TPU-first design: the reference augments one image at a time on CPU worker
processes. Here the whole batch is augmented on-device in one fused XLA
program: per-image scalar factors of shape (N,) broadcast against (N,H,W,3)
tensors, the separable Gaussian blur is k shifted multiply-adds per axis
(static k), and the blur branch is a `where`-select so there is no
data-dependent control flow. Everything fuses into a handful of elementwise
kernels — this is where the >=5k pairs/s/chip budget is won.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

_GRAY_WEIGHTS = (0.2989, 0.587, 0.114)  # torchvision rgb_to_grayscale


@dataclass(frozen=True)
class AugmentConfig:
    brightness_jitter: float = 0.25
    contrast_jitter: float = 0.25
    saturation_jitter: float = 0.25
    hue_jitter: float = 0.09
    gamma_jitter: float = 0.2
    noise_std_max: float = 0.05
    blur_prob: float = 0.03
    blur_sigma_max: float = 1.0
    blur_kernel_size: int = 5
    # Augmentation implementation: "auto" = the fused Pallas pointwise
    # kernel on TPU for uint8 batches (+11% full-step throughput on v5e,
    # docs/PERF.md), the XLA chain elsewhere; "xla"/"pallas" force a path.
    impl: str = "auto"

    def __post_init__(self) -> None:
        # Same validation as reference dataset.py:166-177.
        if self.impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"impl must be auto|xla|pallas, got {self.impl}")
        if not 0.0 <= self.blur_prob <= 1.0:
            raise ValueError(f"blur_prob must be in [0, 1], got {self.blur_prob}")
        if self.blur_kernel_size < 3 or self.blur_kernel_size % 2 == 0:
            raise ValueError(
                f"blur_kernel_size must be odd and >= 3, got {self.blur_kernel_size}"
            )
        if self.saturation_jitter < 0.0:
            raise ValueError(
                f"saturation_jitter must be >= 0, got {self.saturation_jitter}"
            )
        if self.gamma_jitter < 0.0:
            raise ValueError(f"gamma_jitter must be >= 0, got {self.gamma_jitter}")


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H, W, 1), torchvision weights."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    gray = _GRAY_WEIGHTS[0] * r + _GRAY_WEIGHTS[1] * g + _GRAY_WEIGHTS[2] * b
    return gray[..., None]


def _bcast(factor: jnp.ndarray) -> jnp.ndarray:
    """(N,) -> (N, 1, 1, 1) for NHWC broadcasting."""
    return factor[:, None, None, None]


def _blend(img: jnp.ndarray, other: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(ratio * img + (1.0 - ratio) * other, 0.0, 1.0)


def adjust_brightness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return _blend(img, jnp.zeros_like(img), _bcast(factor))


def adjust_contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.mean(rgb_to_grayscale(img), axis=(1, 2, 3), keepdims=True)
    return _blend(img, mean, _bcast(factor))


def adjust_saturation(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return _blend(img, rgb_to_grayscale(img), _bcast(factor))


def _rgb_to_hsv(
    img: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """torchvision _rgb2hsv float semantics, NHWC -> (h, s, v) planes.

    Returns separate planes (no stack): every consumer immediately
    re-splits the channels, and avoiding the materialised stack keeps the
    whole hue adjustment one fused elementwise XLA kernel."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_div = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    # Tolerant which-channel-is-max selection. The three sector formulas
    # agree wherever two channels tie for the max, so admitting channels
    # within eps of the max changes h by at most ~eps — while EXACT
    # equality here is a correctness hazard: XLA may rematerialise the
    # producer chain per consumer with different FMA contraction, and a
    # 1-ulp disagreement between the `maxc` copy and the `g` copy flips
    # the branch, swinging h by whole sectors (observed on XLA:CPU;
    # pinned by tests/test_augment_jit_stability.py).
    eps = 1e-6
    is_r = maxc - r <= eps
    is_g = (maxc - g <= eps) & ~is_r
    is_b = ~is_r & ~is_g
    hr = jnp.where(is_r, bc - gc, 0.0)
    hg = jnp.where(is_g, 2.0 + rc - bc, 0.0)
    hb = jnp.where(is_b, 4.0 + gc - rc, 0.0)
    h = jnp.mod(((hr + hg + hb) / 6.0 + 1.0), 1.0)
    return h, s, maxc


def _hsv_to_rgb(
    h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """torchvision _hsv2rgb float semantics on (h, s, v) planes.

    Branchless formulation: channel(n) = v - v*s*clip(min(k, 4-k), 0, 1)
    with k = (n + 6h) mod 6 — algebraically the same piecewise-linear
    function as the classic p/q/t sector table, evaluated without any
    data-dependent select on a floor()ed sector index. That matters twice:
    (a) it is a single fused elementwise kernel, with no one_hot/stacked
    tables materialising (N,H,W,6) intermediates (the full augment chain
    dropped 70.9 -> ~12 ms at batch 128, 240x320, on one v5e); and (b) it
    is CONTINUOUS in h, so it is immune to the fusion hazard where XLA
    rematerialises the sector index per consumer with slightly different
    float roundings — the discontinuous select-chain version produced
    mixed-sector outputs on a small fraction of pixels under XLA:CPU
    (caught by tests/test_augment_jit_stability.py)."""
    h6 = h * 6.0

    def channel(n: float) -> jnp.ndarray:
        k = jnp.mod(n + h6, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def adjust_hue(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    # The barrier pins ONE evaluation of the input: rgb->hsv branches on
    # exact equalities (maxc == r), and if XLA rematerialises the producer
    # chain per consumer, FMA-rounding differences between copies can flip
    # those equalities and emit garbage hue on a fraction of pixels
    # (observed on XLA:CPU; tests/test_augment_jit_stability.py).
    img = jax.lax.optimization_barrier(jnp.clip(img, 0.0, 1.0))
    h, s, v = _rgb_to_hsv(img)
    h = jnp.mod(h + shift[:, None, None], 1.0)
    return _hsv_to_rgb(h, s, v)


def adjust_gamma(
    img: jnp.ndarray, gamma: jnp.ndarray, gain: float = 1.0
) -> jnp.ndarray:
    return jnp.clip(gain * jnp.clip(img, 0.0, 1.0) ** _bcast(gamma), 0.0, 1.0)


def gaussian_blur(
    img: jnp.ndarray, sigma: jnp.ndarray, kernel_size: int
) -> jnp.ndarray:
    """Separable Gaussian blur, reflect padding, per-image sigma (N,).

    torchvision kernel: x = linspace(-(k-1)/2, (k-1)/2, k),
    pdf = exp(-0.5 (x/sigma)^2), normalised. Implemented as k shifted
    multiply-adds per axis (static k), which XLA fuses — no gather, no
    per-image conv weights.
    """
    k = kernel_size
    half = (k - 1) * 0.5
    x = jnp.linspace(-half, half, k)  # (k,)
    pdf = jnp.exp(-0.5 * (x[None, :] / sigma[:, None]) ** 2)  # (N, k)
    w = pdf / jnp.sum(pdf, axis=1, keepdims=True)

    pad = k // 2

    def blur_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
        pad_widths = [(0, 0)] * v.ndim
        pad_widths[axis] = (pad, pad)
        vp = jnp.pad(v, pad_widths, mode="reflect")
        size = v.shape[axis]
        out = jnp.zeros_like(v)
        for tap in range(k):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(tap, tap + size)
            out = out + vp[tuple(sl)] * w[:, tap][:, None, None, None]
        return out

    out = blur_axis(img, 1)  # H
    out = blur_axis(out, 2)  # W
    return out


def sample_factors(
    key: jax.Array, n: int, config: AugmentConfig
) -> dict[str, jnp.ndarray]:
    """Per-image random factors, one independent draw per image (shape (N,))."""
    ks = jax.random.split(key, 8)

    def jitter(k: jax.Array, j: float) -> jnp.ndarray:
        if j <= 0.0:
            return jnp.ones((n,), jnp.float32)
        return jax.random.uniform(
            k, (n,), minval=max(0.0, 1.0 - j), maxval=1.0 + j
        )

    hue = (
        jax.random.uniform(
            ks[3], (n,), minval=-config.hue_jitter, maxval=config.hue_jitter
        )
        if config.hue_jitter > 0.0
        else jnp.zeros((n,), jnp.float32)
    )
    if config.gamma_jitter > 0.0:
        g_lo = max(0.1, 1.0 - config.gamma_jitter)
        g_hi = max(g_lo, 1.0 + config.gamma_jitter)
        gamma = jax.random.uniform(ks[4], (n,), minval=g_lo, maxval=g_hi)
    else:
        gamma = jnp.ones((n,), jnp.float32)
    blur_on = (
        jax.random.uniform(ks[5], (n,)) < config.blur_prob
        if config.blur_prob > 0.0 and config.blur_sigma_max > 0.0
        else jnp.zeros((n,), bool)
    )
    sigma = jax.random.uniform(
        ks[6], (n,), minval=0.1, maxval=max(config.blur_sigma_max, 0.1)
    )
    noise_std = (
        jax.random.uniform(ks[7], (n,), minval=0.0, maxval=config.noise_std_max)
        if config.noise_std_max > 0.0
        else jnp.zeros((n,), jnp.float32)
    )
    return {
        "brightness": jitter(ks[0], config.brightness_jitter),
        "contrast": jitter(ks[1], config.contrast_jitter),
        "saturation": jitter(ks[2], config.saturation_jitter),
        "hue": hue,
        "gamma": gamma,
        "blur_on": blur_on,
        "blur_sigma": sigma,
        "noise_std": noise_std,
    }


def _chain_pre_noise(
    images: jnp.ndarray, factors: dict[str, jnp.ndarray], config: AugmentConfig
) -> jnp.ndarray:
    """Pointwise stages + probabilistic blur, WITHOUT noise/clamp. (N,H,W,3)."""
    img = images.astype(jnp.float32)
    img = adjust_brightness(img, factors["brightness"])
    img = adjust_contrast(img, factors["contrast"])
    img = adjust_saturation(img, factors["saturation"])
    img = adjust_hue(img, factors["hue"])
    img = adjust_gamma(img, factors["gamma"])
    if config.blur_prob > 0.0 and config.blur_sigma_max > 0.0:
        blurred = gaussian_blur(img, factors["blur_sigma"], config.blur_kernel_size)
        img = jnp.where(_bcast(factors["blur_on"].astype(jnp.float32)) > 0, blurred, img)
    return img


def augment_with_factors(
    key: jax.Array,
    images: jnp.ndarray,
    factors: dict[str, jnp.ndarray],
    config: AugmentConfig,
) -> jnp.ndarray:
    """Apply the augmentation chain with given factors. images: (N,H,W,3)."""
    img = _chain_pre_noise(images, factors, config)
    if config.noise_std_max > 0.0:
        noise = jax.random.normal(key, img.shape, img.dtype)
        img = img + noise * _bcast(factors["noise_std"])
    return jnp.clip(img, 0.0, 1.0)


def noise_and_clip_stereo(
    key: jax.Array,
    stereo: jnp.ndarray,
    noise_std_left: jnp.ndarray,
    noise_std_right: jnp.ndarray,
    enabled: bool,
) -> jnp.ndarray:
    """Joint additive-noise + clamp epilogue over the (N,H,W,6) stereo tensor.

    One (N,H,W,6) normal draw with the per-view std broadcast per channel is
    distributionally identical to two independent (N,H,W,3) per-view draws
    (the reference augments views independently), but runs as ONE fused
    elementwise pass: the round-3 profile showed the per-view split/concat
    epilogue costing ~3 ms/step in bad layouts (docs/PERF.md).

    The normal draw uses the RBG hardware generator keyed from 4 threefry
    words, in bfloat16: the threefry float32 draw was the ``fusion.114``
    suboptimal op in the round-4 profile (2.25 ms/step at batch 128,
    240x320 — RNG-throughput-bound, not bandwidth-bound), and the rbg+bf16
    form measured 1.1 ms/step faster on the full train step
    (docs/fusion114_lab.json). Parity-legal: RNG STREAMS differ from the
    torch reference by construction (docs/PARITY.md); the noise
    distribution is unchanged, and rbg draws are sharding-invariant on the
    mesh (pinned by tests/test_augment.py::test_rbg_noise_is_sharding_
    invariant). Arithmetic runs in the caller's compute dtype for bfloat16
    inputs (noise std ~0.03 against values in [0,1] dwarfs bf16 rounding)
    and float32 otherwise, clamped to [0,1]."""
    dtype = stereo.dtype if stereo.dtype == jnp.bfloat16 else jnp.float32
    img = stereo.astype(dtype)
    if enabled:
        std6 = jnp.concatenate(
            [
                jnp.repeat(noise_std_left[:, None], 3, axis=1),
                jnp.repeat(noise_std_right[:, None], 3, axis=1),
            ],
            axis=1,
        ).astype(dtype)
        rbg_key = jax.random.wrap_key_data(
            jax.random.bits(key, (4,), jnp.uint32), impl="rbg"
        )
        noise = jax.random.normal(rbg_key, img.shape, jnp.bfloat16)
        img = img + noise.astype(dtype) * std6[:, None, None, :]
    return jnp.clip(img, 0.0, 1.0)


def augment_batch(
    key: jax.Array, images: jnp.ndarray, config: AugmentConfig
) -> jnp.ndarray:
    """Augment a batch of RGB views (N,H,W,3) with independent per-image draws."""
    k_factors, k_noise = jax.random.split(key)
    factors = sample_factors(k_factors, images.shape[0], config)
    return augment_with_factors(k_noise, images, factors, config)


def augment_stereo_batch(
    key: jax.Array, stereo: jnp.ndarray, config: AugmentConfig
) -> jnp.ndarray:
    """Augment (N,H,W,6) stereo concat; left/right views augmented INDEPENDENTLY
    (asymmetric augmentation, reference dataset.py:302-304).

    Each view is processed as a channel SLICE of the NHWC batch rather than
    by restacking views along the batch axis: channel slices fuse straight
    into the elementwise chain, while a (N,H,W,6)->(2N,H,W,3) batch-axis
    regroup materialises two full relayout copies each way (measured: the
    whole chain dropped 66 -> 13 ms at batch 128, 240x320, on one v5e).
    Noise + clamp run jointly on the recombined 6-channel tensor
    (``noise_and_clip_stereo``); the 3-way key split is kept so the factor
    stream is unchanged from the per-view-noise formulation."""
    n = stereo.shape[0]
    k_factors, k_noise, _k_unused = jax.random.split(key, 3)
    factors = sample_factors(k_factors, 2 * n, config)
    f_left = {name: v[:n] for name, v in factors.items()}
    f_right = {name: v[n:] for name, v in factors.items()}
    left = _chain_pre_noise(stereo[..., :3], f_left, config)
    right = _chain_pre_noise(stereo[..., 3:], f_right, config)
    return noise_and_clip_stereo(
        k_noise,
        jnp.concatenate([left, right], axis=-1),
        f_left["noise_std"],
        f_right["noise_std"],
        config.noise_std_max > 0.0,
    )
