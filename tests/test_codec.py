"""Disparity RGB24 codec invariants (round-trip property, cross-impl parity)."""

import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.ops import codec


def test_decode_round_trip_np() -> None:
    disparity = np.array([[0.0, 0.125, 1.25], [2.0, 3.5, 10.0]], dtype=np.float32)
    encoded = codec.disparity_encode_np(disparity)
    decoded = codec.disparity_decode_np(encoded)
    np.testing.assert_allclose(decoded, disparity, atol=1e-3)


def test_decode_round_trip_jax_matches_np() -> None:
    rng = np.random.default_rng(0)
    disparity = rng.uniform(0.0, 300.0, size=(16, 24)).astype(np.float32)
    encoded = codec.disparity_encode_np(disparity)
    dec_np = codec.disparity_decode_np(encoded)
    dec_jax = np.asarray(codec.disparity_decode(jnp.asarray(encoded)))
    np.testing.assert_allclose(dec_jax, dec_np, atol=1e-4)
    np.testing.assert_allclose(dec_jax, disparity, atol=1e-3)


def test_encode_jax_matches_np() -> None:
    rng = np.random.default_rng(1)
    disparity = rng.uniform(0.0, 60.0, size=(8, 8)).astype(np.float32)
    enc_np = codec.disparity_encode_np(disparity)
    enc_jax = np.asarray(codec.disparity_encode(jnp.asarray(disparity)))
    np.testing.assert_array_equal(enc_np, enc_jax)


def test_decode_known_values() -> None:
    # (R*65025 + G*255 + B)/1000 exactly as reference dataset.py:23-30
    rgb = np.array([[[1, 2, 3]]], dtype=np.uint8)
    expected = (1 * 255.0 * 255.0 + 2 * 255.0 + 3) / 1000.0
    assert abs(codec.disparity_decode_np(rgb)[0, 0] - expected) < 1e-6
