"""Pallas augmentation kernel == XLA chain, bit-for-rounding.

Both paths share factor sampling and noise keys, so given the same PRNG key
and uint8 batch they must produce the same values up to float rounding of
the fused arithmetic. Runs the kernel in interpreter mode on the CPU farm;
the same code path compiles natively on TPU (exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.ops.augment import (
    AugmentConfig,
    augment_stereo_batch,
)
from stereo_depth_estimation_tpu.ops.augment_pallas import (
    augment_stereo_batch_pallas,
)


import pytest

pytestmark = pytest.mark.slow  # Pallas interpret-mode kernel parity (135s on 1 CPU)


def _u8_batch(n=3, h=12, w=16, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (n, h, w, 6), dtype=np.uint8
    )


def test_pallas_matches_xla_chain_including_blur_and_noise() -> None:
    cfg = AugmentConfig(blur_prob=0.5)  # force the blur branch to matter
    x = _u8_batch()
    key = jax.random.key(7)
    ref = np.asarray(
        augment_stereo_batch(key, jnp.asarray(x).astype(jnp.float32) / 255.0, cfg)
    )
    out = np.asarray(
        augment_stereo_batch_pallas(key, jnp.asarray(x), cfg, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_matches_xla_chain_pointwise_only() -> None:
    cfg = AugmentConfig(blur_prob=0.0, noise_std_max=0.0)
    x = _u8_batch(seed=1)
    key = jax.random.key(9)
    ref = np.asarray(
        augment_stereo_batch(key, jnp.asarray(x).astype(jnp.float32) / 255.0, cfg)
    )
    out = np.asarray(
        augment_stereo_batch_pallas(key, jnp.asarray(x), cfg, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_bf16_output_matches_f32_chain_to_bf16_rounding() -> None:
    """out_dtype=bfloat16 (the bf16 train step's request) only moves the
    network's input cast earlier: values must match the f32 chain within
    bf16 resolution (one extra rounding before the noise add)."""
    cfg = AugmentConfig(blur_prob=0.5)
    x = _u8_batch(seed=3)
    key = jax.random.key(11)
    ref = np.asarray(
        augment_stereo_batch_pallas(key, jnp.asarray(x), cfg, interpret=True)
    )
    out = np.asarray(
        augment_stereo_batch_pallas(
            key, jnp.asarray(x), cfg, interpret=True, out_dtype=jnp.bfloat16
        ).astype(jnp.float32)
    )
    assert out.dtype == np.float32  # upcast view of a bf16 result
    # bf16 has ~3 decimal digits in [0,1]; two roundings bound the error.
    np.testing.assert_allclose(out, ref, atol=2 / 256)


def test_train_step_uses_pallas_when_forced() -> None:
    import optax

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(2)
    hw = (16, 16)
    model = StereoUNet(base_channels=4)
    tx = optax.adamw(1e-3)
    batch = {
        "input": jnp.asarray(
            rng.integers(0, 256, (4, *hw, 6), dtype=np.uint8)
        ),
        "target": jnp.asarray(rng.uniform(0.5, 8.0, (4, *hw)).astype(np.float32)),
    }

    outs = {}
    for impl in ("xla", "pallas"):
        state = create_train_state(model, jax.random.key(0), hw, tx)
        step = make_train_step(model, tx, AugmentConfig(impl=impl))
        state, stats = step(state, dict(batch))
        outs[impl] = (
            float(stats.nll_sum),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )
    np.testing.assert_allclose(outs["xla"][0], outs["pallas"][0], rtol=1e-5)
    np.testing.assert_allclose(outs["xla"][1], outs["pallas"][1], atol=1e-5)


def test_pallas_matches_xla_across_configs_and_shapes() -> None:
    """Config/shape fuzz: extremes of every jitter, odd heights (block
    picking), blur always-on, noise off — both impls must agree."""
    cases = [
        (AugmentConfig(), (2, 10, 12)),                      # defaults, odd h
        (AugmentConfig(blur_prob=1.0, blur_kernel_size=3), (1, 7, 9)),
        (AugmentConfig(brightness_jitter=0.9, contrast_jitter=0.9,
                       saturation_jitter=0.9, hue_jitter=0.5,
                       gamma_jitter=0.9, noise_std_max=0.2), (2, 16, 8)),
        (AugmentConfig(brightness_jitter=0, contrast_jitter=0,
                       saturation_jitter=0, hue_jitter=0, gamma_jitter=0,
                       noise_std_max=0, blur_prob=0), (3, 5, 6)),  # identity
        (AugmentConfig(blur_prob=0.0, blur_kernel_size=9,
                       blur_sigma_max=2.5), (1, 24, 16)),
    ]
    for seed, (cfg, (n, h, w)) in enumerate(cases):
        x = np.random.default_rng(seed).integers(
            0, 256, (n, h, w, 6), dtype=np.uint8
        )
        key = jax.random.key(seed)
        ref = np.asarray(augment_stereo_batch(
            key, jnp.asarray(x).astype(jnp.float32) / 255.0, cfg
        ))
        out = np.asarray(augment_stereo_batch_pallas(
            key, jnp.asarray(x), cfg, interpret=True
        ))
        np.testing.assert_allclose(
            out, ref, atol=2e-5, err_msg=f"case {seed}: {cfg}"
        )


def test_large_image_falls_back_to_xla_blur() -> None:
    """Images beyond the whole-image VMEM budget use the row-blocked kernel
    with the blur composed in XLA — outputs still match the XLA chain."""
    from stereo_depth_estimation_tpu.ops import augment_pallas as ap

    h, w = 450, 400
    assert h * w > ap._FULL_IMAGE_MAX_PIXELS  # exercises the fallback
    x = np.random.default_rng(3).integers(0, 256, (1, h, w, 6), dtype=np.uint8)
    cfg = AugmentConfig(blur_prob=1.0)
    key = jax.random.key(11)
    ref = np.asarray(
        augment_stereo_batch(key, jnp.asarray(x).astype(jnp.float32) / 255.0, cfg)
    )
    out = np.asarray(
        augment_stereo_batch_pallas(key, jnp.asarray(x), cfg, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)
