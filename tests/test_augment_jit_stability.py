"""Regression: augmentation must be bit-stable across jit boundaries.

A previous hue implementation selected p/q/t sector values by a floor()ed
sector index; XLA's fusion rematerialised that index per consumer with
slightly different float roundings, and the three channel selects could
disagree on the sector — ~0.5% of pixels came out as mixed-sector garbage
under jit on XLA:CPU while eager values were correct. The branchless
hsv->rgb is continuous in h and cannot exhibit this; these tests pin it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.ops.augment import (
    AugmentConfig,
    augment_stereo_batch,
)


def test_full_chain_eager_equals_jit() -> None:
    """Deterministic stages pinned exactly; the noise epilogue separately.

    Noise runs at atol 1e-3, not 1e-5: the bf16 rbg draw's f32->bf16->f32
    convert round-trip is elided by XLA's excess-precision pass under
    fusion, so eager and jit legitimately differ at bf16-rounding x std
    scale (~2e-4). The sector-select bug this file pins produced O(0.1)
    garbage on ~0.5% of pixels — still far outside 1e-3."""
    x = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (4, 16, 16, 6), dtype=np.uint8)
    )
    _, state_rng = jax.random.split(jax.random.key(0))
    rng = jax.random.fold_in(state_rng, jnp.zeros((), jnp.int32))

    def aug(raw, cfg):
        return augment_stereo_batch(rng, raw.astype(jnp.float32) / 255.0, cfg)

    exact_cfg = AugmentConfig(noise_std_max=0.0)
    eager = np.asarray(aug(x, exact_cfg))
    jitted = np.asarray(jax.jit(lambda r: aug(r, exact_cfg))(x))
    np.testing.assert_allclose(eager, jitted, atol=1e-5)

    noisy_cfg = AugmentConfig()
    eager = np.asarray(aug(x, noisy_cfg))
    jitted = np.asarray(jax.jit(lambda r: aug(r, noisy_cfg))(x))
    np.testing.assert_allclose(eager, jitted, atol=1e-3)


def test_saturation_plus_hue_eager_equals_jit() -> None:
    # The exact configuration that exposed the sector-select instability.
    x = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (4, 16, 16, 6), dtype=np.uint8)
    )
    _, state_rng = jax.random.split(jax.random.key(0))
    rng = jax.random.fold_in(state_rng, jnp.zeros((), jnp.int32))
    cfg = AugmentConfig(
        brightness_jitter=0, contrast_jitter=0, saturation_jitter=0.25,
        hue_jitter=0, gamma_jitter=0, noise_std_max=0, blur_prob=0,
    )

    def aug(raw):
        return augment_stereo_batch(rng, raw.astype(jnp.float32) / 255.0, cfg)

    np.testing.assert_allclose(
        np.asarray(aug(x)), np.asarray(jax.jit(aug)(x)), atol=1e-5
    )
