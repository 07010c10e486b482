"""Augmentation parity vs a direct numpy transcription of torchvision float ops.

torchvision itself is not installed in CI, so the golden model here is a
slow, obviously-correct numpy implementation of the documented float-tensor
semantics (blend+clamp stages, _rgb2hsv/_hsv2rgb, reflect-padded separable
gaussian). The jax pipeline must match it pointwise given identical factors.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.ops import augment as A


# ---- numpy golden (torchvision float semantics) ----

def np_gray(img):
    return (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def np_blend(img, other, ratio):
    return np.clip(ratio * img + (1 - ratio) * other, 0, 1)


def np_hue(img, shift):
    img = np.clip(img, 0, 1)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc, minc = img.max(-1), img.min(-1)
    eqc = maxc == minc
    cr = maxc - minc
    s = cr / np.where(eqc, 1.0, maxc)
    crd = np.where(eqc, 1.0, cr)
    rc, gc, bc = (maxc - r) / crd, (maxc - g) / crd, (maxc - b) / crd
    h = np.where(maxc == r, bc - gc, 0.0)
    h += np.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
    h += np.where((maxc != r) & (maxc != g), 4.0 + gc - rc, 0.0)
    h = np.mod(h / 6.0 + 1.0, 1.0)
    h = np.mod(h + shift, 1.0)
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(np.int32) % 6
    v = maxc
    p = np.clip(v * (1 - s), 0, 1)
    q = np.clip(v * (1 - s * f), 0, 1)
    t = np.clip(v * (1 - s * (1 - f)), 0, 1)
    tabs = [
        np.stack([v, q, p, p, t, v], -1),
        np.stack([t, v, v, q, p, p], -1),
        np.stack([p, p, t, v, v, q], -1),
    ]
    onehot = np.eye(6)[i]
    return np.stack([np.sum(tab * onehot, -1) for tab in tabs], -1)


def np_blur(img, sigma, k):
    half = (k - 1) * 0.5
    x = np.linspace(-half, half, k)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    w = pdf / pdf.sum()
    pad = k // 2

    def ax(v, axis):
        vp = np.pad(v, [(pad, pad) if a == axis else (0, 0) for a in range(v.ndim)],
                    mode="reflect")
        out = np.zeros_like(v)
        for tap in range(k):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(tap, tap + v.shape[axis])
            out += vp[tuple(sl)] * w[tap]
        return out

    return ax(ax(img, 0), 1)


def np_augment(img, f):
    img = np_blend(img, np.zeros_like(img), f["brightness"])
    img = np_blend(img, np_gray(img).mean(), f["contrast"])
    img = np_blend(img, np_gray(img), f["saturation"])
    img = np_hue(img, f["hue"])
    img = np.clip(np.clip(img, 0, 1) ** f["gamma"], 0, 1)
    if f["blur_on"]:
        img = np_blur(img, f["blur_sigma"], 5)
    return np.clip(img, 0, 1)  # noise added separately in tests


def _factors(n, **kw):
    base = {
        "brightness": np.ones(n), "contrast": np.ones(n), "saturation": np.ones(n),
        "hue": np.zeros(n), "gamma": np.ones(n),
        "blur_on": np.zeros(n, bool), "blur_sigma": np.full(n, 0.5),
        "noise_std": np.zeros(n),
    }
    base.update(kw)
    return {k: jnp.asarray(v) for k, v in base.items()}


CFG = A.AugmentConfig()
NOISELESS = A.AugmentConfig(noise_std_max=0.0)


def test_identity_factors_are_noop() -> None:
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 8, 10, 3)).astype(np.float32)
    out = A.augment_with_factors(jax.random.key(0), jnp.asarray(img), _factors(3), NOISELESS)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_full_chain_matches_numpy_golden() -> None:
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (4, 12, 14, 3)).astype(np.float32)
    fv = {
        "brightness": rng.uniform(0.75, 1.25, 4),
        "contrast": rng.uniform(0.75, 1.25, 4),
        "saturation": rng.uniform(0.75, 1.25, 4),
        "hue": rng.uniform(-0.09, 0.09, 4),
        "gamma": rng.uniform(0.8, 1.2, 4),
        "blur_on": np.array([True, False, True, False]),
        "blur_sigma": rng.uniform(0.1, 1.0, 4),
        "noise_std": np.zeros(4),
    }
    out = np.asarray(
        A.augment_with_factors(jax.random.key(0), jnp.asarray(img), _factors(4, **fv), NOISELESS)
    )
    for i in range(4):
        fi = {k: (v[i] if hasattr(v, "__len__") else v) for k, v in fv.items()}
        expected = np_augment(img[i].astype(np.float64), fi)
        np.testing.assert_allclose(out[i], expected, atol=1e-4, err_msg=f"img {i}")


def test_hue_shift_third_turns_red_to_green() -> None:
    img = np.zeros((1, 2, 2, 3), np.float32)
    img[..., 0] = 1.0
    out = np.asarray(A.adjust_hue(jnp.asarray(img), jnp.asarray([1.0 / 3.0])))
    np.testing.assert_allclose(out[0, 0, 0], [0.0, 1.0, 0.0], atol=1e-5)


def test_blur_preserves_constant_image() -> None:
    img = jnp.full((2, 9, 9, 3), 0.37)
    out = A.gaussian_blur(img, jnp.asarray([0.3, 1.0]), 5)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)


def test_noise_has_requested_scale_and_clamps() -> None:
    img = jnp.full((1, 64, 64, 3), 0.5)
    f = _factors(1, noise_std=np.array([0.05]))
    cfg = A.AugmentConfig(noise_std_max=0.05)
    out = np.asarray(A.augment_with_factors(jax.random.key(3), img, f, cfg))
    assert 0.03 < (out - 0.5).std() < 0.07
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_sampled_factor_ranges() -> None:
    f = A.sample_factors(jax.random.key(0), 512, CFG)
    b = np.asarray(f["brightness"])
    assert b.min() >= 0.75 and b.max() <= 1.25
    g = np.asarray(f["gamma"])
    assert g.min() >= 0.8 and g.max() <= 1.2
    h = np.asarray(f["hue"])
    assert abs(h).max() <= 0.09
    assert 0.0 < np.asarray(f["blur_on"]).mean() < 0.12  # ~3%
    s = np.asarray(f["blur_sigma"])
    assert s.min() >= 0.1 and s.max() <= 1.0


def test_stereo_views_augmented_independently() -> None:
    rng = np.random.default_rng(5)
    view = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    stereo = jnp.asarray(np.concatenate([view, view], axis=-1))  # identical L/R
    out = np.asarray(A.augment_stereo_batch(jax.random.key(1), stereo, CFG))
    assert not np.allclose(out[..., :3], out[..., 3:], atol=1e-3)


def test_augment_is_jittable_and_deterministic() -> None:
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 6)).astype(np.float32))
    fn = jax.jit(lambda k, x: A.augment_stereo_batch(k, x, CFG))
    a = np.asarray(fn(jax.random.key(2), img))
    b = np.asarray(fn(jax.random.key(2), img))
    np.testing.assert_array_equal(a, b)


def test_config_validation_matches_reference() -> None:
    import pytest

    with pytest.raises(ValueError):
        A.AugmentConfig(blur_prob=1.5)
    with pytest.raises(ValueError):
        A.AugmentConfig(blur_kernel_size=4)
    with pytest.raises(ValueError):
        A.AugmentConfig(saturation_jitter=-1.0)
    with pytest.raises(ValueError):
        A.AugmentConfig(gamma_jitter=-0.1)


def test_noise_and_clip_stereo_per_view_std() -> None:
    """The joint 6-channel noise pass must apply the LEFT std to channels
    0-2 and the RIGHT std to channels 3-5 (asymmetric augmentation): zero
    std on one view leaves that view exactly clamped-unchanged."""
    import jax

    from stereo_depth_estimation_tpu.ops.augment import noise_and_clip_stereo

    rng = np.random.default_rng(0)
    stereo = jnp.asarray(rng.uniform(0.2, 0.8, (2, 8, 10, 6)).astype(np.float32))
    zeros = jnp.zeros((2,), jnp.float32)
    big = jnp.full((2,), 0.3, jnp.float32)

    out = noise_and_clip_stereo(jax.random.key(0), stereo, zeros, big, True)
    np.testing.assert_array_equal(
        np.asarray(out[..., :3]), np.asarray(stereo[..., :3])
    )
    assert float(jnp.abs(out[..., 3:] - stereo[..., 3:]).max()) > 0.01

    # disabled -> pure clamp
    out2 = noise_and_clip_stereo(jax.random.key(0), stereo * 2.0, big, big, False)
    assert float(out2.max()) <= 1.0
    np.testing.assert_array_equal(
        np.asarray(out2), np.asarray(jnp.clip(stereo * 2.0, 0.0, 1.0))
    )


def test_rbg_noise_is_sharding_invariant() -> None:
    """The noise epilogue's RBG draw must produce the SAME values whether the
    batch lives on one device or is sharded over the 8-device mesh: DP
    training and single-device training see identical noise for a given key
    (the property threefry guarantees by design and rbg must be pinned for;
    jax docs only promise it per backend+program, so this is load-bearing)."""
    import jax

    from stereo_depth_estimation_tpu.ops.augment import noise_and_clip_stereo
    from stereo_depth_estimation_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    from jax.sharding import NamedSharding, PartitionSpec

    rng = np.random.default_rng(4)
    stereo = jnp.asarray(rng.uniform(0, 1, (16, 8, 8, 6)).astype(np.float32))
    std = jnp.full((16,), 0.05, jnp.float32)

    single = np.asarray(
        jax.jit(lambda k, x: noise_and_clip_stereo(k, x, std, std, True))(
            jax.random.key(3), stereo
        )
    )
    mesh = make_mesh()
    sharding = NamedSharding(mesh, PartitionSpec("data"))

    @jax.jit
    def sharded(k, x):
        out = noise_and_clip_stereo(k, x, std, std, True)
        return jax.lax.with_sharding_constraint(out, sharding)

    multi = np.asarray(
        jax.device_get(sharded(jax.random.key(3), jax.device_put(stereo, sharding)))
    )
    np.testing.assert_array_equal(single, multi)
