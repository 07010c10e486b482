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

import functools
from typing import Any, NamedTuple

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
    # dtype the batch mean/E[x^2] reductions run in. float32 matches torch
    # exactly; bfloat16 is a measured-perf experiment knob (see docs/PERF.md)
    # — running stats and the normalisation scale stay float32 either way.
    stats_dtype: Any = jnp.float32

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
            xf = x.astype(self.stats_dtype)
            mean = jnp.mean(xf, axis=(0, 1, 2)).astype(jnp.float32)
            mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2)).astype(jnp.float32)
            var = mean_sq - jnp.square(mean)
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


def max_pool_2x2(v: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool (reduce_window, like nn.max_pool).

    A strided-slice maximum-tree rewrite (``maximum(v[:, ::2], v[:, 1::2])``
    twice) was built and measured on the v5e in round 3 to attack the
    select-and-scatter backward (~4 ms/step at 0.1 TFLOP/s): XLA lowered
    the stride-2 slices to GATHERS with s32 index vectors and their
    transposes to scatter-adds, costing ~40 ms/step — a 6x regression over
    reduce_window's select-and-scatter (docs/PERF.md). reduce_window it is.
    """
    return nn.max_pool(v, window_shape=(2, 2), strides=(2, 2))


class _FusedBNConfig(NamedTuple):
    eps: float
    compute_dtype: Any
    stats_dtype: Any


def _conv_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fcbr_fwd_math(
    cfg: _FusedBNConfig,
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
):
    """Conv3x3 -> batch-stat BN -> ReLU, numerically identical to the
    nn.Conv + BatchNorm(+relu) composition above (same cast points)."""
    cd = cfg.compute_dtype
    z = _conv_same(x.astype(cd), kernel.astype(cd))
    zf = z.astype(cfg.stats_dtype)
    mean = jnp.mean(zf, axis=(0, 1, 2)).astype(jnp.float32)
    mean_sq = jnp.mean(jnp.square(zf), axis=(0, 1, 2)).astype(jnp.float32)
    var = mean_sq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + cfg.eps) * scale
    a = (z - mean.astype(cd)) * inv.astype(cd) + bias.astype(cd)
    return jnp.maximum(a, 0), z, mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_conv_bn_relu(
    cfg: _FusedBNConfig,
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
):
    """Training-mode Conv3x3+BN+ReLU with a hand-scheduled backward.

    Built for the round-3 MFU push: the TPU profile (docs/PERF.md) showed
    the step 69.5% HBM-bound, dominated by the full/half-resolution
    ConvBlock backwards. This VJP stores ONLY the pre-BN conv output ``z``
    (plus the chain input and the (C,)-stats), recomputes the ReLU mask
    and x-hat from ``z`` elementwise, and feeds the conv data/filter
    gradients one clean cotangent tensor. Gradient math is the textbook
    batch-stat BN backward — identical to autodiff up to float
    reassociation (tests/test_model.py pins it).

    MEASURED RESULT (v5e, batch 128): a per-layer tie with XLA's autodiff
    — identical device self-time in every layer group (bwd:dec1 15.5 vs
    15.6 ms/step) — i.e. XLA's own backward already emits this minimal
    schedule post-fusion. Kept off by default (StereoUNet.fused_block) as
    a pinned-correct experiment harness for future emitter regressions.
    """
    y, _z, mean, var = _fcbr_fwd_math(cfg, x, kernel, scale, bias)
    return y, mean, var


def _fcbr_fwd(cfg, x, kernel, scale, bias):
    y, z, mean, var = _fcbr_fwd_math(cfg, x, kernel, scale, bias)
    return (y, mean, var), (x, kernel, z, mean, var, scale, bias)


def _fcbr_bwd(cfg, res, cts):
    # mean/var outputs only feed the (non-differentiated) running-stat
    # update, so their cotangents are structurally zero and ignored.
    dy, _dmean, _dvar = cts
    x, kernel, z, mean, var, scale, bias = res
    cd = cfg.compute_dtype
    n = z.shape[0] * z.shape[1] * z.shape[2]

    inv = jax.lax.rsqrt(var + cfg.eps)  # (C,) f32
    g = scale * inv
    zc = z - mean.astype(cd)
    # ReLU mask recomputed from z (elementwise; cheaper than storing the
    # post-activation tensor for backward).
    pre_relu = zc * g.astype(cd) + bias.astype(cd)
    dyp = jnp.where(pre_relu > 0, dy, jnp.zeros((), dy.dtype))

    # Per-channel BN reductions, f32 accumulation.
    dbeta = jnp.sum(dyp, axis=(0, 1, 2), dtype=jnp.float32)
    dzc_sum = jnp.sum(dyp * zc, axis=(0, 1, 2), dtype=jnp.float32)
    dgamma = dzc_sum * inv

    # dz = g*(dyp - dbeta/n - xhat*dgamma/n), xhat = zc*inv, folded into
    # three (C,)-vector coefficients so the tensor pass is one fused FMA.
    t1 = (g * (dbeta / n)).astype(cd)
    t2 = (g * inv * (dgamma / n)).astype(cd)
    dz = dyp * g.astype(cd) - t1 - zc * t2

    # Clean conv backward: vjp through the bare conv gives XLA the
    # data-gradient and filter-gradient convolutions with dz as their only
    # large operand (the f32 cast transpose returns dkernel in f32).
    _, conv_vjp = jax.vjp(
        lambda xx, kk: _conv_same(xx.astype(cd), kk.astype(cd)), x, kernel
    )
    dx, dkernel = conv_vjp(dz)
    return dx, dkernel, dgamma, dbeta


_fused_conv_bn_relu.defvjp(_fcbr_fwd, _fcbr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _concat_conv(
    xc: int, up: jnp.ndarray, skip: jnp.ndarray, kernel: jnp.ndarray
) -> jnp.ndarray:
    """conv(concat([up, skip]), kernel), backward WITHOUT the concat split.

    Forward is exactly the concatenate-then-conv XLA fuses best. The
    custom backward produces the two input cotangents directly with
    half-kernel data-gradient convolutions (and the kernel gradient as two
    half filter-gradients concatenated on the input-channel axis) — the
    mathematically identical slices of the full-kernel gradients — so the
    (N,H,W,2C) cotangent is never materialised and then sliced into two
    copies (the 'bwd:split' loop fusions worth 10.4 ms/step in the round-3
    profile, docs/PERF.md). ``kernel`` stays float32; convs run in the
    activations' dtype like nn.Conv(dtype=...).
    """
    cd = up.dtype
    return _conv_same(
        jnp.concatenate([up, skip], axis=-1), kernel.astype(cd)
    )


def _concat_conv_fwd(xc, up, skip, kernel):
    return _concat_conv(xc, up, skip, kernel), (up, skip, kernel)


def _concat_conv_bwd(xc, res, dz):
    up, skip, kernel = res
    cd = up.dtype

    def half(v, kk):
        return _conv_same(v, kk.astype(cd))

    _, vjp_u = jax.vjp(half, up, kernel[:, :, :xc])
    d_up, dk_up = vjp_u(dz)
    _, vjp_s = jax.vjp(half, skip, kernel[:, :, xc:])
    d_skip, dk_skip = vjp_s(dz)
    return d_up, d_skip, jnp.concatenate([dk_up, dk_skip], axis=2)


_concat_conv.defvjp(_concat_conv_fwd, _concat_conv_bwd)


class ConvKernelParams(nn.Module):
    """Parameter holder for a bias-free conv: declares the exact ``kernel``
    param ``nn.Conv`` would (same name, shape, initializer, and therefore
    the same per-scope init RNG draw), so the fused-backward block keeps a
    checkpoint layout identical to the nn.Conv path."""

    shape: tuple[int, int, int, int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class BNVars(nn.Module):
    """Setup-style holder for BatchNorm params + running stats (same names
    as the compact BatchNorm above) so the fused block can read scale/bias
    before the batch statistics exist and fold the running-stat update in
    afterwards."""

    features: int
    momentum: float = 0.1

    def setup(self) -> None:
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

    def update(self, mean: jnp.ndarray, var: jnp.ndarray, n: int) -> None:
        """Torch-exact running update: biased batch var -> unbiased store."""
        if self.is_initializing():
            return
        m = self.momentum
        unbiased = var * (n / max(n - 1, 1))
        self.ra_mean.value = (1.0 - m) * self.ra_mean.value + m * mean
        self.ra_var.value = (1.0 - m) * self.ra_var.value + m * unbiased


class ConvBlock(nn.Module):
    """(Conv3x3 no-bias -> BatchNorm -> ReLU) x2, NHWC.

    Decoder blocks can take the up-path and skip tensors separately
    (``skip=`` argument / StereoUNet.skip_impl) instead of one conv over
    their concat — measured trade-offs in docs/PERF.md."""

    features: int
    compute_dtype: Any = jnp.float32
    bn_stats_dtype: Any = jnp.float32
    # Hand-scheduled backward (see _fused_conv_bn_relu). Same math, same
    # param/batch_stats tree; OFF here and selected per-model via
    # StereoUNet.fused_block.
    fused: bool = False
    # How a skip-connected conv0 executes when ``skip`` is passed:
    # "split" (two half convs, no concat) or "hybrid" (concat forward,
    # split-free custom backward). Selected via StereoUNet.skip_impl.
    skip_impl: str = "split"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, skip: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """When ``skip`` is given, the block computes
        ConvBlock(concat([x, skip])) with conv0 executed per
        ``skip_impl`` (the same single full-width conv0 parameter either
        way — docs/PERF.md for the measured trade-offs):

        - "split": two half-kernel convolutions summed, no concat at all
          (measured: kills the concat-backward 'split' pass but regresses
          the decoder conv fusions).
        - "hybrid": forward keeps the concatenate (XLA's best-fusing
          form); a custom VJP produces the two input cotangents DIRECTLY
          via half-kernel data-gradient convolutions, so the 1.26 GB
          cotangent is never materialised and sliced (the 10.4 ms/step
          'bwd:split' pass in the round-3 profile).
        """
        if self.fused:
            assert skip is None, "skip modes are implemented on the XLA-AD path"
            return self._call_fused(x, train)
        start = 0
        if skip is not None:
            cd = self.compute_dtype
            xc, sc = x.shape[-1], skip.shape[-1]
            kernel = ConvKernelParams(
                (3, 3, xc + sc, self.features), name="conv0"
            )()
            if self.skip_impl == "hybrid":
                z = _concat_conv(xc, x.astype(cd), skip.astype(cd), kernel)
            else:
                z = _conv_same(
                    x.astype(cd), kernel[:, :, :xc].astype(cd)
                ) + _conv_same(skip.astype(cd), kernel[:, :, xc:].astype(cd))
            z = BatchNorm(
                compute_dtype=cd, stats_dtype=self.bn_stats_dtype, name="bn0"
            )(z, use_running_average=not train)
            x = nn.relu(z)
            start = 1
        for i in range(start, 2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = BatchNorm(
                compute_dtype=self.compute_dtype,
                stats_dtype=self.bn_stats_dtype,
                name=f"bn{i}",
            )(x, use_running_average=not train)
            x = nn.relu(x)
        return x

    def _call_fused(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        cd = self.compute_dtype
        cfg = _FusedBNConfig(1e-5, cd, self.bn_stats_dtype)
        for i in range(2):
            kernel = ConvKernelParams(
                (3, 3, x.shape[-1], self.features), name=f"conv{i}"
            )()
            bn = BNVars(self.features, name=f"bn{i}")
            if train:
                y, mean, var = _fused_conv_bn_relu(cfg, x, kernel, bn.scale, bn.bias)
                bn.update(mean, var, x.shape[0] * x.shape[1] * x.shape[2])
                x = y
            else:
                z = _conv_same(x.astype(cd), kernel.astype(cd))
                inv = jax.lax.rsqrt(bn.ra_var.value + cfg.eps) * bn.scale
                x = jnp.maximum(
                    (z - bn.ra_mean.value.astype(cd)) * inv.astype(cd)
                    + bn.bias.astype(cd),
                    0,
                )
        return x


class Conv1x1Params(nn.Module):
    """Parameter holder for a 1x1 conv head: declares the exact params
    ``nn.Conv(features, (1, 1))`` would (same names, shapes, initializers)
    without applying them, so the two output heads can be evaluated as ONE
    fused conv over the shared full-resolution input (halving its reads in
    forward and backward; the step is HBM-bound, docs/PERF.md) while the
    checkpoint layout stays head-per-module."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class StereoUNet(nn.Module):
    in_channels: int = 6
    out_channels: int = 1
    base_channels: int = 32
    compute_dtype: Any = jnp.float32
    # Perf knobs, all measured on a v5e in round 3 (docs/PERF.md):
    # bn_stats_dtype=bfloat16 runs the BN batch-stat reductions in bf16
    # (no measurable win; kept for experiments). remat rematerialises each
    # ConvBlock in backward (measured REGRESSION at this model size —
    # 943 -> 747 pairs/s — it exists as a memory lever for much larger
    # inputs, not a speed knob). An input-channel pad-to-8 knob was also
    # built and measured (no effect, 940.6 vs 943-968 base noise) and
    # removed.
    bn_stats_dtype: Any = jnp.float32
    remat: bool = False
    # Hand-scheduled ConvBlock backward (_fused_conv_bn_relu): same math and
    # checkpoint layout, minimal-operand backward convs. Measured on-TPU in
    # round 3 (docs/PERF.md) before being defaulted.
    fused_block: bool = False
    # Decoder skip-conv execution strategy (same single conv0 parameter
    # in every mode; measured trade-offs in docs/PERF.md):
    #   "concat": materialise concat([up, skip]) and conv it (XLA AD).
    #   "split":  two half-kernel convs, no concat anywhere (measured
    #             regression: decoder conv fusions degrade).
    #   "hybrid": concat forward + custom VJP backward that emits the two
    #             input cotangents directly (no 'bwd:split' pass).
    skip_impl: str = "concat"

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
            return max_pool_2x2(v)

        def up(v: jnp.ndarray, features: int, name: str) -> jnp.ndarray:
            # nn.ConvTranspose, deliberately: an exact matmul+depth-to-space
            # rewrite was measured in round 3 and LOST (~2.8 ms/step — the
            # bias add and the (h,a)(w,b)->spatial relayout don't fuse, while
            # XLA's transposed-conv forward is a single fused op; docs/PERF.md).
            return nn.ConvTranspose(
                features,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=dt,
                param_dtype=jnp.float32,
                name=name,
            )(v)

        h, w = x.shape[-3], x.shape[-2]
        if h % 16 or w % 16:
            # Same structural constraint as the reference model (4 pool/up
            # levels); surfaced here instead of as a cryptic decoder concat
            # shape error.
            raise ValueError(
                f"StereoUNet input height/width must be divisible by 16 "
                f"(4 pool levels); got {h}x{w}."
            )
        x = x.astype(dt)

        block_cls = ConvBlock
        if self.remat:
            block_cls = nn.remat(ConvBlock, static_argnums=(2,))

        def block(features: int, name: str):
            return block_cls(
                features,
                dt,
                bn_stats_dtype=self.bn_stats_dtype,
                fused=self.fused_block,
                skip_impl=self.skip_impl if self.skip_impl != "concat" else "split",
                name=name,
            )

        s1 = block(c1, "enc1")(x, train)
        s2 = block(c2, "enc2")(pool(s1), train)
        s3 = block(c3, "enc3")(pool(s2), train)
        s4 = block(c4, "enc4")(pool(s3), train)
        b = block(c5, "bottleneck")(pool(s4), train)

        if self.skip_impl != "concat":
            d4 = block(c4, "dec4")(up(b, c4, "up4"), train, skip=s4)
            d3 = block(c3, "dec3")(up(d4, c3, "up3"), train, skip=s3)
            d2 = block(c2, "dec2")(up(d3, c2, "up2"), train, skip=s2)
            d1 = block(c1, "dec1")(up(d2, c1, "up1"), train, skip=s1)
        else:
            d4 = block(c4, "dec4")(
                jnp.concatenate([up(b, c4, "up4"), s4], axis=-1), train
            )
            d3 = block(c3, "dec3")(
                jnp.concatenate([up(d4, c3, "up3"), s3], axis=-1), train
            )
            d2 = block(c2, "dec2")(
                jnp.concatenate([up(d3, c2, "up2"), s2], axis=-1), train
            )
            d1 = block(c1, "dec1")(
                jnp.concatenate([up(d2, c1, "up1"), s1], axis=-1), train
            )

        # Both 1x1 heads always exist (reference model.py defines both
        # unconditionally) and are applied as ONE fused conv so the shared
        # full-resolution d1 tensor is read once, not twice. Expressed as a
        # 1x1 conv (not an einsum/dot): the (9.8M, 32) x (32, 2) matmul is
        # degenerate for XLA's dot tiling search and measured ~15 min
        # compiles under the 64 MiB scoped-VMEM budget; the conv emitter
        # handles the same contraction without the pathology (docs/PERF.md).
        kd, bd = Conv1x1Params(self.out_channels, c1, name="disparity_head")()
        kl, bl = Conv1x1Params(1, c1, name="logvar_head")()
        n_disp = self.out_channels
        if return_uncertainty:
            k = jnp.concatenate([kd, kl], axis=-1)
            bias = jnp.concatenate([bd, bl])
        else:
            k, bias = kd, bd
        heads = (
            _conv_same(d1.astype(dt), k.astype(dt)) + bias.astype(dt)
        )
        # Disparity is non-negative (reference model.py:97-98). Compute the
        # head nonlinearity in f32 for numerical parity.
        disparity = jax.nn.softplus(heads[..., :n_disp].astype(jnp.float32))
        if not return_uncertainty:
            return disparity
        # Bound log-variance to a stable range (reference model.py:102-103).
        logvar = jnp.clip(
            heads[..., n_disp : n_disp + 1].astype(jnp.float32), -6.0, 3.0
        )
        return disparity, logvar


def count_params(params: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
