"""AdamW over one flat parameter buffer (an `optax.GradientTransformation`).

`optax.adamw` runs its update math leaf-by-leaf: on this model that is ~100
small tensors, which XLA lowers to ~100 separate elementwise fusions inside
the step program. Each fusion moves tiny (C,)- or (3,3,C,C)-shaped buffers,
so the optimizer segment's cost is kernel-launch/fusion overhead, not
bytes (AdamW on the 7.76 M-param model is only ~220 MB of HBM traffic,
~0.3 ms at v5e bandwidth).

This transformation ravels gradients and params into ONE f32 vector
(`jax.flatten_util.ravel_pytree`), runs the exact `optax.adamw` update
chain on it as a single fused elementwise pass, and unravels the updates
back to the parameter pytree. The math is element-for-element identical to
``optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)`` — same
ops in the same order, only the leaf boundaries disappear — pinned by
tests/test_train_step.py::test_flat_adamw_matches_optax.

Measured effect on the bench config (one v5e, batch 128, 240x320):
see docs/PERF.md round-4 knob table (scripts/opt_lab.py).

Reference wiring being reproduced: torch AdamW with decay on ALL params
(reference train.py:578) — like `make_train_step`'s default `make_adamw`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatAdamWState(NamedTuple):
    count: jax.Array  # int32 scalar, like optax.ScaleByAdamState.count
    mu: jax.Array  # (n_params,) f32
    nu: jax.Array  # (n_params,) f32


def flat_adamw(
    learning_rate: float,
    weight_decay: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Drop-in replacement for `make_adamw` (torch-default hyperparams,
    decay on all params) computing the update over one flat buffer."""

    def init_fn(params) -> FlatAdamWState:
        flat, _ = ravel_pytree(params)
        # mu and nu must be DISTINCT buffers: the train step donates its
        # state, and aliased leaves would be donated twice.
        return FlatAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jnp.zeros_like(flat, dtype=jnp.float32),
            nu=jnp.zeros_like(flat, dtype=jnp.float32),
        )

    def update_fn(updates, state: FlatAdamWState, params=None):
        if params is None:
            raise ValueError("flat_adamw requires params (weight decay)")
        g, _ = ravel_pytree(updates)
        p, unravel = ravel_pytree(params)
        g = g.astype(jnp.float32)
        # scale_by_adam, verbatim on the flat vector:
        mu = (1.0 - b1) * g + b1 * state.mu
        nu = (1.0 - b2) * jnp.square(g) + b2 * state.nu
        count = optax.safe_increment(state.count)
        mu_hat = mu / (1.0 - jnp.power(b1, count.astype(jnp.float32)))
        nu_hat = nu / (1.0 - jnp.power(b2, count.astype(jnp.float32)))
        upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
        # add_decayed_weights + scale_by_learning_rate:
        upd = -learning_rate * (upd + weight_decay * p)
        return unravel(upd), FlatAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
