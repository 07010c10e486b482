"""Stereo rectification: undistort/rectify map computation + bilinear remap.

The reference leans on OpenCV (`cv2.initUndistortRectifyMap` + `cv2.remap`,
depth_live_dl.py:302-307, 489-490). Here the map construction is implemented
directly (plumb-bob/Brown-Conrady model, 4/5/8-coefficient distortion) and
the per-frame remap is an XLA gather with bilinear weights, so rectification
can fuse with preprocessing and inference in one device program. Validated
against cv2's CV_32FC1 maps in tests.

Map semantics: for each destination pixel, undo the new (rectified)
projection P, rotate by R^-1 into the original camera frame, apply lens
distortion, and project through the original intrinsics K. Sampling outside
the source image yields 0 (cv2 BORDER_CONSTANT default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def compute_rectify_map(
    camera_matrix: np.ndarray,
    dist_coeffs: np.ndarray,
    R: np.ndarray,
    new_projection: np.ndarray,
    image_size: tuple[int, int],
) -> tuple[np.ndarray, np.ndarray]:
    """float32 (map_x, map_y) of shape (H, W); image_size is (W, H) like cv2."""
    w, h = image_size
    K = np.asarray(camera_matrix, dtype=np.float64)
    d = np.asarray(dist_coeffs, dtype=np.float64).reshape(-1)
    # cv2 accepts 4, 5, 8, 12 or 14 coefficients; support up to 8 (rational).
    coeffs = np.zeros(8)
    coeffs[: d.size] = d[:8]
    k1, k2, p1, p2, k3, k4, k5, k6 = coeffs

    P = np.asarray(new_projection, dtype=np.float64)
    fx_new, fy_new = P[0, 0], P[1, 1]
    cx_new, cy_new = P[0, 2], P[1, 2]

    u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x = (u - cx_new) / fx_new
    y = (v - cy_new) / fy_new
    ones = np.ones_like(x)
    rays = np.stack([x, y, ones], axis=-1) @ np.linalg.inv(np.asarray(R)).T
    xp = rays[..., 0] / rays[..., 2]
    yp = rays[..., 1] / rays[..., 2]

    r2 = xp * xp + yp * yp
    radial = (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))) / (
        1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
    )
    x_dist = xp * radial + 2.0 * p1 * xp * yp + p2 * (r2 + 2.0 * xp * xp)
    y_dist = yp * radial + p1 * (r2 + 2.0 * yp * yp) + 2.0 * p2 * xp * yp

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    map_x = (fx * x_dist + cx).astype(np.float32)
    map_y = (fy * y_dist + cy).astype(np.float32)
    return map_x, map_y


def remap_bilinear_np(
    image: np.ndarray, map_x: np.ndarray, map_y: np.ndarray
) -> np.ndarray:
    """Host-side remap, zero border; image (H, W[, C]) any float/uint8."""
    return np.asarray(
        remap_bilinear(
            jnp.asarray(image.astype(np.float32)), jnp.asarray(map_x),
            jnp.asarray(map_y),
        )
    ).astype(image.dtype if np.issubdtype(image.dtype, np.floating) else np.float32)


@jax.jit
def remap_bilinear(
    image: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray
) -> jnp.ndarray:
    """XLA bilinear gather; image (H, W) or (H, W, C) float; zero outside."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[0], image.shape[1]

    x0f = jnp.floor(map_x)
    y0f = jnp.floor(map_y)
    wx = (map_x - x0f)[..., None]
    wy = (map_y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def sample(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = image[yc, xc]
        return vals * inside[..., None]

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bottom = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bottom * wy
    return out[..., 0] if squeeze else out


class Rectifier:
    """Precomputed left/right rectification maps (device arrays)."""

    def __init__(
        self,
        map_l: tuple[np.ndarray, np.ndarray],
        map_r: tuple[np.ndarray, np.ndarray],
        image_size: tuple[int, int],
        focal_length_px: float,
        baseline_m: float | None,
    ) -> None:
        self.map_l_x = jnp.asarray(map_l[0])
        self.map_l_y = jnp.asarray(map_l[1])
        self.map_r_x = jnp.asarray(map_r[0])
        self.map_r_y = jnp.asarray(map_r[1])
        self.image_size = image_size  # (W, H), cv2 convention
        self.focal_length_px = focal_length_px
        self.baseline_m = baseline_m

    @classmethod
    def from_calibration(cls, calib: dict | np.lib.npyio.NpzFile) -> "Rectifier":
        from .geometry import estimate_baseline_m

        image_size_values = np.asarray(calib["image_size"]).reshape(-1).tolist()
        image_size = (int(image_size_values[0]), int(image_size_values[1]))
        map_l = compute_rectify_map(
            calib["mtx_l"], calib["dist_l"], calib["R1"], calib["P1"], image_size
        )
        map_r = compute_rectify_map(
            calib["mtx_r"], calib["dist_r"], calib["R2"], calib["P2"], image_size
        )
        T = calib["T"] if "T" in calib else None
        return cls(
            map_l,
            map_r,
            image_size,
            focal_length_px=float(np.asarray(calib["P1"])[0, 0]),
            baseline_m=estimate_baseline_m(
                np.asarray(calib["P1"]), np.asarray(calib["P2"]), T
            ),
        )

    def rectify_left(self, image: jnp.ndarray) -> jnp.ndarray:
        return remap_bilinear(image, self.map_l_x, self.map_l_y)

    def rectify_right(self, image: jnp.ndarray) -> jnp.ndarray:
        return remap_bilinear(image, self.map_r_x, self.map_r_y)
