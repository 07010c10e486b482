"""Pallas TPU kernel for the pointwise augmentation chain.

One VMEM pass fuses uint8 decode, brightness, contrast, saturation, hue,
and gamma for both stereo views — the XLA lowering of the same chain takes
~4x the memory speed-of-light because the HSV trip and per-stage blends
break into several full-image fusions (docs/PERF.md). Blur (rare-path,
needs halos) and Gaussian noise (needs jax.random parity) stay in XLA and
compose after the kernel, preserving the reference stage order
(brightness -> contrast -> saturation -> hue -> gamma -> blur -> noise ->
clamp, /root/reference/src/foundation_stereo_depth/dataset.py:214-270).

Layout: images are processed planar (N, 6, H, W) so the tiled block dims
are (H-tile, W) at full vreg occupancy and channels are plain leading-dim
indices; the NHWC<->planar transposes at the boundary are uint8-in /
float32-out relayouts costing ~1.5 ms at batch 128, far less than the
fusion win. Per-image factors ride SMEM.

The math transcribes ops/augment.py exactly (same formulas, same clamp
points), so outputs match the XLA path to float rounding — pinned by
tests/test_augment_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .augment import _GRAY_WEIGHTS, AugmentConfig, gaussian_blur, sample_factors

# factors packed per view: brightness, contrast, saturation, hue, gamma,
# gray-mean (of the brightness-adjusted view, for the contrast blend)
_F_PER_VIEW = 6


def _augment_kernel(f_ref, x_ref, o_ref):
    """Block: x (1, 6, bh, W) uint8 -> o (1, 6, bh, W) float32.

    Per-view processing on (bh, W) channel planes with plain SMEM scalars —
    Mosaic rejects both tiny vectorised factor shapes ((2,1,1) stacks) and
    SMEM blocks smaller than the array, so factors are row-indexed by
    program_id. Stores are per channel plane at static indices.
    """
    from jax.experimental import pallas as pl

    # Mosaic has no direct uint8->float32 cast; hop through int32.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    image_index = pl.program_id(0)

    for view in (0, 1):
        base = view * _F_PER_VIEW
        fb = f_ref[image_index, base + 0]
        fc = f_ref[image_index, base + 1]
        fs = f_ref[image_index, base + 2]
        fh = f_ref[image_index, base + 3]
        fg = f_ref[image_index, base + 4]
        gray_mean = f_ref[image_index, base + 5]

        def blend(ch, other, ratio):
            return jnp.clip(ratio * ch + (1.0 - ratio) * other, 0.0, 1.0)

        r = x[view * 3 + 0]
        g = x[view * 3 + 1]
        b = x[view * 3 + 2]
        # brightness (blend with zero), contrast (blend with precomputed
        # per-view mean luma), saturation (blend with per-pixel luma)
        r, g, b = (jnp.clip(fb * ch, 0.0, 1.0) for ch in (r, g, b))
        r, g, b = (blend(ch, gray_mean, fc) for ch in (r, g, b))
        gray = _GRAY_WEIGHTS[0] * r + _GRAY_WEIGHTS[1] * g + _GRAY_WEIGHTS[2] * b
        r, g, b = (blend(ch, gray, fs) for ch in (r, g, b))

        # hue: rgb -> hsv, shift h, hsv -> rgb (ops/augment.py semantics)
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
        # Tolerant max-channel selection; see ops/augment.py._rgb_to_hsv
        # for why exact equality is a fusion hazard.
        eps = 1e-6
        is_r = maxc - r <= eps
        is_g = (maxc - g <= eps) & ~is_r
        is_b = ~is_r & ~is_g
        hr = jnp.where(is_r, bc - gc, 0.0)
        hg = jnp.where(is_g, 2.0 + rc - bc, 0.0)
        hb = jnp.where(is_b, 4.0 + gc - rc, 0.0)
        h = jnp.mod((hr + hg + hb) / 6.0 + 1.0, 1.0)
        h = jnp.mod(h + fh, 1.0)

        # Branchless hsv->rgb, identical to ops/augment.py._hsv_to_rgb
        # (see the continuity rationale there).
        v = maxc
        h6 = h * 6.0

        def channel(n: float) -> jnp.ndarray:
            k = jnp.mod(n + h6, 6.0)
            return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

        # gamma (gain 1) then store each channel plane
        for idx, ch in ((0, channel(5.0)), (1, channel(3.0)), (2, channel(1.0))):
            o_ref[0, view * 3 + idx] = jnp.clip(
                jnp.clip(ch, 0.0, 1.0) ** fg, 0.0, 1.0
            )


def _h_block(h: int, preferred: int = 48) -> int:
    for bh in range(min(preferred, h), 0, -1):
        if h % bh == 0:
            return bh
    return h


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pointwise_chain(
    images_u8: jnp.ndarray, factors_packed: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """(N, H, W, 6) uint8 + (N, 12) factors -> (N, H, W, 6) float32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = images_u8.shape
    planar = jnp.transpose(images_u8, (0, 3, 1, 2))  # (N, 6, H, W)
    bh = _h_block(h)
    out = pl.pallas_call(
        _augment_kernel,
        grid=(n, h // bh),
        in_specs=[
            # Whole factors array in SMEM (TPU requires SMEM blocks to match
            # the full array dims); the kernel row-indexes by program_id.
            pl.BlockSpec(
                (n, 2 * _F_PER_VIEW), lambda ni, hi: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 6, bh, w), lambda ni, hi: (ni, 0, hi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 6, bh, w), lambda ni, hi: (ni, 0, hi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 6, h, w), jnp.float32),
        interpret=interpret,
    )(factors_packed, planar)
    return jnp.transpose(out, (0, 2, 3, 1))


def _pack_factors(
    images_u8: jnp.ndarray, factors: dict[str, jnp.ndarray], n: int
) -> jnp.ndarray:
    """(N, 12) per-image factor rows; also computes the contrast gray means
    (mean luma of the brightness-adjusted view) with one fused XLA reduce
    over the uint8 input."""
    w = jnp.asarray(_GRAY_WEIGHTS, jnp.float32)
    rows = []
    for view, sl in ((0, slice(0, 3)), (1, slice(3, 6))):
        fv = {k: v[view * n : (view + 1) * n] for k, v in factors.items()}
        xb = jnp.clip(
            fv["brightness"][:, None, None, None]
            * (images_u8[..., sl].astype(jnp.float32) * (1.0 / 255.0)),
            0.0,
            1.0,
        )
        gray_mean = jnp.einsum("nhwc,c->n", xb, w) / (
            images_u8.shape[1] * images_u8.shape[2]
        )
        rows.append(
            jnp.stack(
                [
                    fv["brightness"], fv["contrast"], fv["saturation"],
                    fv["hue"], fv["gamma"], gray_mean,
                ],
                axis=1,
            )
        )
    return jnp.concatenate(rows, axis=1)  # (N, 12)


def augment_stereo_batch_pallas(
    key: jax.Array,
    stereo_u8: jnp.ndarray,
    config: AugmentConfig,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas-accelerated equivalent of ``augment.augment_stereo_batch``.

    Takes the (N, H, W, 6) batch as uint8 (the packed-cache representation)
    and returns float32 in [0, 1]. Factor sampling, stage order and math
    match the XLA path; blur and noise run in XLA after the kernel.
    """
    n = stereo_u8.shape[0]
    k_factors, k_noise_l, k_noise_r = jax.random.split(key, 3)
    factors = sample_factors(k_factors, 2 * n, config)
    packed = _pack_factors(stereo_u8, factors, n)
    out = _pointwise_chain(stereo_u8, packed, interpret=interpret)

    views = []
    for view, sl, k_noise in ((0, slice(0, 3), k_noise_l), (1, slice(3, 6), k_noise_r)):
        fv = {k: v[view * n : (view + 1) * n] for k, v in factors.items()}
        img = out[..., sl]
        if config.blur_prob > 0.0 and config.blur_sigma_max > 0.0:
            blurred = gaussian_blur(img, fv["blur_sigma"], config.blur_kernel_size)
            img = jnp.where(
                fv["blur_on"].astype(jnp.float32)[:, None, None, None] > 0,
                blurred,
                img,
            )
        if config.noise_std_max > 0.0:
            noise = jax.random.normal(k_noise, img.shape, img.dtype)
            img = img + noise * fv["noise_std"][:, None, None, None]
        views.append(jnp.clip(img, 0.0, 1.0))
    return jnp.concatenate(views, axis=-1)
