"""Pallas TPU kernel for the pointwise augmentation chain.

One VMEM pass fuses uint8 decode, brightness, contrast, saturation, hue,
gamma, and (for images that fit whole in VMEM) the probabilistic Gaussian
blur for both stereo views — the XLA lowering of the same chain pays
materialised intermediates between stages (docs/PERF.md). Gaussian noise
stays in XLA so the draws are bit-identical to the XLA path's
jax.random.normal; the reference stage order is preserved
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

from .augment import (
    _GRAY_WEIGHTS,
    AugmentConfig,
    gaussian_blur,
    noise_and_clip_stereo,
    sample_factors,
)

# factors packed per view: brightness, contrast, saturation, hue, gamma,
# gray-mean (of the brightness-adjusted view, for the contrast blend),
# blur-on flag, blur sigma
_F_PER_VIEW = 8

# Whole-image blocks (required for in-kernel blur, which needs no halo when
# the full image sits in VMEM) up to this many pixels; larger images use
# row-blocked kernels with the blur composed in XLA.
_FULL_IMAGE_MAX_PIXELS = 160_000


def _blur_plane(plane, sigma, k: int):
    """Separable reflect-padded Gaussian over one (H, W) VMEM plane.

    Same kernel definition as ops/augment.py::gaussian_blur; weights are
    built from the SMEM scalar sigma with k static."""
    half = (k - 1) * 0.5
    raw = [jnp.exp(-0.5 * ((i - half) / sigma) ** 2) for i in range(k)]
    norm = sum(raw)
    weights = [r / norm for r in raw]
    pad = k // 2

    def along(p, axis: int):
        size = p.shape[axis]

        def row(i):
            index = [slice(None), slice(None)]
            index[axis] = slice(i, i + 1)
            return p[tuple(index)]

        # reflect: [pad..1], body, [size-2..size-1-pad]
        pieces = [row(i) for i in range(pad, 0, -1)]
        pieces.append(p)
        pieces += [row(size - 2 - i) for i in range(pad)]
        padded = jnp.concatenate(pieces, axis=axis)
        out = None
        for tap in range(k):
            index = [slice(None), slice(None)]
            index[axis] = slice(tap, tap + size)
            term = padded[tuple(index)] * weights[tap]
            out = term if out is None else out + term
        return out

    return along(along(plane, 0), 1)


def _augment_kernel(f_ref, x_ref, o_ref, *, blur_k: int = 0):
    """Block: x (1, 6, bh, W) uint8 -> o (1, 6, bh, W) float32.

    ``blur_k > 0`` additionally applies the probabilistic Gaussian blur
    in-kernel (requires whole-image blocks: the blur is computed entirely
    in VMEM, no halo exchange).

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

        # gamma (gain 1), optional in-kernel blur, then store each plane
        # (cast to the output ref's dtype — bf16 stores halve the kernel's
        # HBM write traffic; all math above stays float32 in VMEM)
        blur_on = f_ref[image_index, base + 6]
        blur_sigma = f_ref[image_index, base + 7]
        for idx, ch in ((0, channel(5.0)), (1, channel(3.0)), (2, channel(1.0))):
            plane = jnp.clip(jnp.clip(ch, 0.0, 1.0) ** fg, 0.0, 1.0)
            if blur_k > 0:
                blurred = _blur_plane(plane, blur_sigma, blur_k)
                plane = jnp.where(blur_on > 0.0, blurred, plane)
            o_ref[0, view * 3 + idx] = plane.astype(o_ref.dtype)


def _h_block(h: int, preferred: int = 48) -> int:
    for bh in range(min(preferred, h), 0, -1):
        if h % bh == 0:
            return bh
    return h


@functools.partial(jax.jit, static_argnames=("blur_k", "interpret", "out_dtype"))
def _pointwise_chain(
    images_u8: jnp.ndarray, factors_packed: jnp.ndarray, *,
    blur_k: int = 0, interpret: bool = False, out_dtype=jnp.float32
) -> jnp.ndarray:
    """(N, H, W, 6) uint8 + (N, 16) factors -> (N, H, W, 6) ``out_dtype``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = images_u8.shape
    planar = jnp.transpose(images_u8, (0, 3, 1, 2))  # (N, 6, H, W)
    bh = h if blur_k > 0 else _h_block(h)  # blur-in-kernel: whole image
    out = pl.pallas_call(
        functools.partial(_augment_kernel, blur_k=blur_k),
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
        out_shape=jax.ShapeDtypeStruct((n, 6, h, w), out_dtype),
        interpret=interpret,
    )(factors_packed, planar)
    return jnp.transpose(out, (0, 2, 3, 1))


def _pack_factors(
    images_u8: jnp.ndarray, factors: dict[str, jnp.ndarray], n: int
) -> jnp.ndarray:
    """(N, 16) per-image factor rows; also computes the contrast gray means
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
                    fv["blur_on"].astype(jnp.float32), fv["blur_sigma"],
                ],
                axis=1,
            )
        )
    return jnp.concatenate(rows, axis=1)  # (N, 16)


def augment_stereo_batch_pallas(
    key: jax.Array,
    stereo_u8: jnp.ndarray,
    config: AugmentConfig,
    *,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Pallas-accelerated equivalent of ``augment.augment_stereo_batch``.

    Takes the (N, H, W, 6) batch as uint8 (the packed-cache representation)
    and returns ``out_dtype`` in [0, 1]. Factor sampling, stage order and
    math match the XLA path; blur and noise run in XLA after the kernel.

    ``out_dtype=bfloat16`` (the train step's choice under bfloat16 compute)
    halves the chain's HBM write traffic; it only moves the network's own
    input cast one op earlier — the pointwise math still runs in float32,
    with one extra bf16 rounding before the noise add, and the noise
    epilogue then runs in the output dtype (bounded by
    tests/test_augment_pallas.py against the f32 chain).
    """
    n, h, w, _ = stereo_u8.shape
    k_factors, k_noise, _k_unused = jax.random.split(key, 3)
    factors = sample_factors(k_factors, 2 * n, config)
    packed = _pack_factors(stereo_u8, factors, n)

    blur_enabled = config.blur_prob > 0.0 and config.blur_sigma_max > 0.0
    # In-kernel blur needs the whole image in VMEM (no halo); fall back to
    # the XLA blur for larger images (which runs f32 for exactness).
    blur_in_kernel = blur_enabled and h * w <= _FULL_IMAGE_MAX_PIXELS
    out = _pointwise_chain(
        stereo_u8, packed,
        blur_k=config.blur_kernel_size if blur_in_kernel else 0,
        interpret=interpret,
        out_dtype=out_dtype if blur_in_kernel or not blur_enabled else jnp.float32,
    )

    if blur_enabled and not blur_in_kernel:
        # Large-image fallback: XLA separable blur per view (f32 exact).
        views = []
        for view, sl in ((0, slice(0, 3)), (1, slice(3, 6))):
            fv = {k: v[view * n : (view + 1) * n] for k, v in factors.items()}
            img = out[..., sl].astype(jnp.float32)
            blurred = gaussian_blur(img, fv["blur_sigma"], config.blur_kernel_size)
            views.append(
                jnp.where(
                    fv["blur_on"].astype(jnp.float32)[:, None, None, None] > 0,
                    blurred,
                    img,
                )
            )
        out = jnp.concatenate(views, axis=-1)
    # Joint 6-channel noise + clamp: one fused pass, no per-view
    # split/concat (the split epilogue measured ~3 ms/step in bad layouts;
    # docs/PERF.md). Same key discipline as the XLA chain.
    return noise_and_clip_stereo(
        k_noise,
        out,
        factors["noise_std"][:n],
        factors["noise_std"][n:],
        config.noise_std_max > 0.0,
    ).astype(out_dtype)
