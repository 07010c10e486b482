"""FoundationStereo RGB24 disparity codec.

The dataset stores float disparity (horizontal pixels) packed into an RGB PNG:
``value = (R*255*255 + G*255 + B) / scale`` with ``scale=1000``.

Capability parity with the reference decoder
(/root/reference/src/foundation_stereo_depth/dataset.py:23-30) and the inverse
encoder used by its tests (tests/test_dataset.py:17-23). Both NumPy (host
decode path) and JAX (device decode path) variants are provided; the JAX
variant is jit-safe and fuses into downstream elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEFAULT_SCALE = 1000.0


def disparity_decode_np(rgb_u8: np.ndarray, scale: float = DEFAULT_SCALE) -> np.ndarray:
    """Decode HWC (or ...HW3) uint8 RGB into float32 disparity."""
    x = rgb_u8.astype(np.float32)
    out = x[..., 0] * (255.0 * 255.0) + x[..., 1] * 255.0 + x[..., 2]
    return out / np.float32(scale)


def disparity_encode_np(disparity: np.ndarray, scale: float = DEFAULT_SCALE) -> np.ndarray:
    """Inverse of :func:`disparity_decode_np`; returns uint8 ...HW3."""
    values = np.round(disparity.astype(np.float64) * scale).astype(np.int64)
    r = values // (255 * 255)
    rem = values - r * (255 * 255)
    g = rem // 255
    b = rem - g * 255
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def disparity_decode(rgb_u8: jnp.ndarray, scale: float = DEFAULT_SCALE) -> jnp.ndarray:
    """JAX decode: ...HW3 uint8 -> ...HW float32 disparity (jit/vmap friendly)."""
    x = rgb_u8.astype(jnp.float32)
    out = x[..., 0] * (255.0 * 255.0) + x[..., 1] * 255.0 + x[..., 2]
    return out * jnp.float32(1.0 / scale)


def disparity_encode(disparity: jnp.ndarray, scale: float = DEFAULT_SCALE) -> jnp.ndarray:
    """JAX encode: ...HW float -> ...HW3 uint8."""
    values = jnp.round(disparity.astype(jnp.float32) * scale).astype(jnp.int32)
    r = values // (255 * 255)
    rem = values - r * (255 * 255)
    g = rem // 255
    b = rem - g * 255
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
