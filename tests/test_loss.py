"""Loss math vs hand-computed NLL and the reference's masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.ops.loss import (
    LossStats,
    accumulate_stats,
    heteroscedastic_laplace_nll,
    metrics_from_stats,
)


def _reference_nll(pred, logvar, target, mask):
    # Direct transcription of the math in reference train.py:334-340.
    diff = pred[mask] - target[mask]
    lv = logvar[mask]
    nll = np.abs(diff) * np.exp(-lv) + lv
    return nll


def test_loss_matches_hand_computed() -> None:
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 5, size=(2, 4, 6)).astype(np.float32)
    logvar = rng.uniform(-2, 2, size=(2, 4, 6)).astype(np.float32)
    target = rng.uniform(0, 5, size=(2, 4, 6)).astype(np.float32)
    mask = rng.uniform(size=(2, 4, 6)) > 0.3

    loss, stats = heteroscedastic_laplace_nll(
        jnp.asarray(pred), jnp.asarray(logvar), jnp.asarray(target), jnp.asarray(mask)
    )
    nll_ref = _reference_nll(pred, logvar, target, mask)
    np.testing.assert_allclose(float(loss), nll_ref.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(stats.nll_sum), nll_ref.sum(), rtol=1e-5)
    np.testing.assert_allclose(
        float(stats.abs_err_sum), np.abs(pred[mask] - target[mask]).sum(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(stats.sq_err_sum), ((pred[mask] - target[mask]) ** 2).sum(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(stats.sigma_sum), np.exp(0.5 * logvar[mask]).sum(), rtol=1e-5
    )
    assert int(stats.valid_count) == int(mask.sum())


def test_nonfinite_targets_are_masked() -> None:
    pred = jnp.ones((1, 2, 2))
    logvar = jnp.zeros((1, 2, 2))
    target = jnp.asarray([[[1.0, jnp.nan], [jnp.inf, 2.0]]])
    mask = jnp.ones((1, 2, 2), dtype=bool)
    loss, stats = heteroscedastic_laplace_nll(pred, logvar, target, mask)
    assert int(stats.valid_count) == 2
    assert np.isfinite(float(loss))


def test_zero_valid_pixels_gives_zero_loss_and_grads() -> None:
    def loss_fn(pred):
        loss, _ = heteroscedastic_laplace_nll(
            pred, jnp.zeros((1, 2, 2)), jnp.ones((1, 2, 2)), jnp.zeros((1, 2, 2), bool)
        )
        return loss

    pred = jnp.full((1, 2, 2), 3.0)
    loss, grads = jax.value_and_grad(loss_fn)(pred)
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(grads), 0.0)


def test_pixel_weighted_epoch_metrics() -> None:
    a = LossStats(*(jnp.asarray(v, jnp.float32) for v in (10.0, 4.0, 8.0, 2.0, 4.0)))
    b = LossStats(*(jnp.asarray(v, jnp.float32) for v in (2.0, 2.0, 4.0, 1.0, 2.0)))
    total = accumulate_stats(accumulate_stats(None, a), b)
    m = metrics_from_stats(total)
    assert m["loss"] == m["nll"] == (12.0 / 6.0)
    assert m["mae"] == 1.0
    np.testing.assert_allclose(m["rmse"], (12.0 / 6.0) ** 0.5)
    assert m["sigma"] == 0.5
