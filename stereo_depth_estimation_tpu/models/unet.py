"""StereoUNet: 4-level encoder-decoder with dual disparity/log-variance heads.

Capability parity with the reference architecture
(/root/reference/src/foundation_stereo_depth/model.py:32-104): ConvBlock =
(Conv3x3 no-bias -> BatchNorm -> ReLU) x2; 6->32->64->128->256->512 channels;
MaxPool(2) downsampling; ConvTranspose(k2,s2) upsampling with skip concat;
``softplus`` disparity head; logvar head clamped to [-6, 3]. 7,763,938
params at the default base=32 (verified against the torch-spec twin in
tests/test_model.py; the reference README's "~8.6M" rounds a different
config).

TPU-first design choices (not a port):
- NHWC layout end-to-end: channels-last is XLA's native TPU conv layout, so
  no transposes are inserted around every conv.
- Functional Flax linen module: params/batch_stats are explicit pytrees, so
  the train step jits/pjits cleanly and state donation works.
- ``compute_dtype`` lets the whole network run in bfloat16 on the MXU while
  parameters and BatchNorm statistics stay float32.
- Under pjit data-parallelism, batch statistics are computed over the global
  (mesh-wide) batch automatically because reductions inside jit are global —
  no explicit cross-replica sync op is needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm(nn.Module):
    """BatchNorm2d with exact torch semantics, NHWC.

    Differences from flax.linen.BatchNorm that matter for checkpoint parity:
    torch normalises with the biased batch variance but stores the UNBIASED
    variance (n/(n-1)) in running stats. Statistics are computed in float32
    even under bfloat16 compute. torch defaults: eps=1e-5, momentum=0.1
    (i.e. new = 0.9*old + 0.1*batch).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        # Statistics above are always float32; the per-pixel normalisation
        # runs in compute_dtype. Under bfloat16 this keeps activations in
        # bf16 end-to-end (f32 normalisation would materialise full-res f32
        # intermediates around every conv); the (C,)-shaped mean/inv casts
        # are free.
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        cd = self.compute_dtype
        y = (x.astype(cd) - mean.astype(cd)) * inv.astype(cd) + bias.astype(cd)
        return y


class ConvBlock(nn.Module):
    """(Conv3x3 no-bias -> BatchNorm -> ReLU) x2, NHWC."""

    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = BatchNorm(compute_dtype=self.compute_dtype, name=f"bn{i}")(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        return x


class StereoUNet(nn.Module):
    in_channels: int = 6
    out_channels: int = 1
    base_channels: int = 32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_uncertainty: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, H, W, in_channels), H and W divisible by 16.

        Returns disparity (N, H, W, out_channels), plus clamped logvar
        (N, H, W, 1) when ``return_uncertainty``.
        """
        c1 = self.base_channels
        c2, c3, c4, c5 = c1 * 2, c1 * 4, c1 * 8, c1 * 16
        dt = self.compute_dtype

        def pool(v: jnp.ndarray) -> jnp.ndarray:
            return nn.max_pool(v, window_shape=(2, 2), strides=(2, 2))

        def up(v: jnp.ndarray, features: int, name: str) -> jnp.ndarray:
            return nn.ConvTranspose(
                features,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=dt,
                param_dtype=jnp.float32,
                name=name,
            )(v)

        x = x.astype(dt)
        s1 = ConvBlock(c1, dt, name="enc1")(x, train)
        s2 = ConvBlock(c2, dt, name="enc2")(pool(s1), train)
        s3 = ConvBlock(c3, dt, name="enc3")(pool(s2), train)
        s4 = ConvBlock(c4, dt, name="enc4")(pool(s3), train)
        b = ConvBlock(c5, dt, name="bottleneck")(pool(s4), train)

        d4 = ConvBlock(c4, dt, name="dec4")(
            jnp.concatenate([up(b, c4, "up4"), s4], axis=-1), train
        )
        d3 = ConvBlock(c3, dt, name="dec3")(
            jnp.concatenate([up(d4, c3, "up3"), s3], axis=-1), train
        )
        d2 = ConvBlock(c2, dt, name="dec2")(
            jnp.concatenate([up(d3, c2, "up2"), s2], axis=-1), train
        )
        d1 = ConvBlock(c1, dt, name="dec1")(
            jnp.concatenate([up(d2, c1, "up1"), s1], axis=-1), train
        )

        disparity = nn.Conv(
            self.out_channels, (1, 1), dtype=dt, param_dtype=jnp.float32,
            name="disparity_head",
        )(d1)
        # Disparity is non-negative (reference model.py:97-98). Compute the
        # head nonlinearity in f32 for numerical parity.
        disparity = jax.nn.softplus(disparity.astype(jnp.float32))
        if not return_uncertainty:
            return disparity

        logvar = nn.Conv(
            1, (1, 1), dtype=dt, param_dtype=jnp.float32, name="logvar_head"
        )(d1)
        # Bound log-variance to a stable range (reference model.py:102-103).
        logvar = jnp.clip(logvar.astype(jnp.float32), -6.0, 3.0)
        return disparity, logvar


def count_params(params: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
