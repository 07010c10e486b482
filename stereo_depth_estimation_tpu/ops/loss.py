"""Masked heteroscedastic Laplace NLL and pixel-weighted metrics.

Loss parity with the reference training loop
(/root/reference/src/foundation_stereo_depth/train.py:327-357):

- mask = valid_mask & isfinite(target)
- nll  = |pred - target| * exp(-logvar) + logvar       (per valid pixel)
- loss = mean(nll over valid pixels)
- metric sums (nll, |e|, e^2, sigma=exp(logvar/2)) accumulated per valid
  pixel so epoch means are pixel-weighted, not batch-weighted
  (reference train.py:405-408).

TPU design: the reference boolean-indexes (``predictions[mask]``), which is a
dynamic shape — illegal under jit. We use ``where``-masked reductions with
static shapes; XLA fuses the whole thing into the backward pass of the model.
A batch with zero valid pixels yields loss 0 and zero gradients; the train
step additionally gates the optimizer/BN update on ``valid_count > 0``
(parallel/train_step.py) so such a batch is a true no-op, matching the
reference's batch skip (train.py:330-332).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LossStats(NamedTuple):
    """Per-batch sums for pixel-weighted epoch aggregation (all scalars)."""

    nll_sum: jnp.ndarray
    abs_err_sum: jnp.ndarray
    sq_err_sum: jnp.ndarray
    sigma_sum: jnp.ndarray
    valid_count: jnp.ndarray


def heteroscedastic_laplace_nll(
    pred: jnp.ndarray,
    logvar: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: jnp.ndarray,
) -> tuple[jnp.ndarray, LossStats]:
    """Return (scalar loss, LossStats). All inputs broadcastable to NHW(1)."""
    mask = valid_mask & jnp.isfinite(target)
    maskf = mask.astype(jnp.float32)
    safe_target = jnp.where(mask, target, 0.0)

    diff = pred.astype(jnp.float32) - safe_target.astype(jnp.float32)
    abs_diff = jnp.abs(diff) * maskf
    lv = logvar.astype(jnp.float32)
    nll = (abs_diff * jnp.exp(-lv) + lv) * maskf

    valid_count = jnp.sum(maskf)
    denom = jnp.maximum(valid_count, 1.0)
    loss = jnp.sum(nll) / denom

    sigma = jnp.exp(0.5 * lv) * maskf
    stats = LossStats(
        nll_sum=jnp.sum(nll),
        abs_err_sum=jnp.sum(abs_diff),
        sq_err_sum=jnp.sum((diff * maskf) ** 2),
        sigma_sum=jnp.sum(sigma),
        valid_count=valid_count,
    )
    return loss, stats


def metrics_from_stats(stats: LossStats) -> dict[str, float]:
    """Host-side epoch means from accumulated sums (reference train.py:405-418)."""
    count = float(stats.valid_count)
    if count <= 0:
        raise RuntimeError("No valid target pixels found for this epoch.")
    nll_mean = float(stats.nll_sum) / count
    return {
        "loss": nll_mean,
        "nll": nll_mean,
        "mae": float(stats.abs_err_sum) / count,
        "rmse": float(stats.sq_err_sum / count) ** 0.5,
        "sigma": float(stats.sigma_sum) / count,
    }


def accumulate_stats(total: LossStats | None, batch: LossStats) -> LossStats:
    if total is None:
        return batch
    return LossStats(*(t + b for t, b in zip(total, batch)))
