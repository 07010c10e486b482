"""Bilinear resize with PyTorch ``align_corners=False`` semantics, TPU-first.

The reference resizes RGB and disparity with
``torch.nn.functional.interpolate(mode="bilinear", align_corners=False)``
(/root/reference/src/foundation_stereo_depth/dataset.py:184-212) and the live
path uses ``cv2.resize(INTER_LINEAR)`` (depth_live_dl.py:225-229) — both use
half-pixel source centers and NO anti-aliasing, which differs from
``jax.image.resize`` (anti-aliased on downsample). We therefore implement the
exact semantics ourselves.

TPU design: bilinear resize is separable, and each 1-D resample is a sparse
(two non-zeros per row) linear map. We materialise it as a small dense matrix
and apply it with ``einsum`` so the work lands on the MXU as two batched
matmuls instead of scattered gathers — far friendlier to XLA than per-pixel
``take`` chains, and it fuses with surrounding elementwise work.

Disparity resizing additionally scales *values* by the horizontal resize
factor because disparity is measured in horizontal pixels
(reference dataset.py:207-212).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _resample_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) float32 matrix for 1-D bilinear resampling.

    Source coordinate for output i: ``max(0, (i + 0.5) * in/out - 0.5)``,
    matching PyTorch's area_pixel_compute_source_index (align_corners=False).
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float64)
    w0 = 1.0 - w1
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), i0] += w0
    mat[np.arange(out_size), i1] += w1
    return mat.astype(np.float32)


def resize_bilinear_np(image: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Host-side resize of ``(H, W)`` or ``(H, W, C)`` float arrays."""
    h_out, w_out = out_hw
    h_in, w_in = image.shape[0], image.shape[1]
    a_h = _resample_matrix(h_in, h_out)
    a_w = _resample_matrix(w_in, w_out)
    x = image.astype(np.float32)
    if x.ndim == 2:
        x = x[..., None]
    rows = (a_h @ x.reshape(h_in, -1)).reshape(h_out, w_in, -1)
    out = np.tensordot(rows, a_w, axes=([1], [1]))  # (h_out, c, w_out)
    out = np.moveaxis(out, -1, 1)  # (h_out, w_out, c)
    if image.ndim == 2:
        return out[..., 0]
    return out


def resize_bilinear(image: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Device resize of ``(..., H, W, C)`` arrays (NHWC or HWC), MXU matmuls.

    Shapes are static under jit; the resample matrices are compile-time
    constants, so XLA sees two einsums it can tile onto the MXU.
    """
    h_out, w_out = out_hw
    h_in, w_in = image.shape[-3], image.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return image.astype(jnp.float32)
    a_h = jnp.asarray(_resample_matrix(h_in, h_out))
    a_w = jnp.asarray(_resample_matrix(w_in, w_out))
    x = image.astype(jnp.float32)
    # Resample weights are exact bilinear taps; keep full f32 so results match
    # the host/PyTorch path bit-for-bit (default TPU matmul precision is bf16).
    x = jnp.einsum("oh,...hwc->...owc", a_h, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,...owc->...opc", a_w, x, precision=jax.lax.Precision.HIGHEST)
    return x


def resize_disparity(
    disparity: jnp.ndarray, out_hw: tuple[int, int], src_width: int | None = None
) -> jnp.ndarray:
    """Resize ``(..., H, W)`` disparity and rescale values by the width ratio.

    Mirrors reference dataset.py:195-212: bilinear resize then multiply by
    ``out_width / src_width`` because disparity values are horizontal-pixel
    offsets.
    """
    w_in = src_width if src_width is not None else disparity.shape[-1]
    resized = resize_bilinear(disparity[..., None], out_hw)[..., 0]
    return resized * jnp.float32(out_hw[1] / float(w_in))


def resize_disparity_np(
    disparity: np.ndarray, out_hw: tuple[int, int], src_width: int | None = None
) -> np.ndarray:
    w_in = src_width if src_width is not None else disparity.shape[-1]
    resized = resize_bilinear_np(disparity, out_hw)
    return resized * np.float32(out_hw[1] / float(w_in))


@functools.partial(jax.jit, static_argnums=(1,))
def _resize_jit(image: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    return resize_bilinear(image, out_hw)
