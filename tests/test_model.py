"""Golden parity: flax StereoUNet vs a torch model built to the reference spec.

The torch twin below is constructed from the architecture *specification*
(reference model.py:32-104): (Conv3x3 no-bias, BN, ReLU)x2 blocks, maxpool
encoder, convT(k2,s2) decoder with skip concat, softplus disparity head,
clamped logvar head. Weights are transferred torch->flax via models.compat,
then outputs must agree to float tolerance — this is the EPE<1e-3 parity
gate from BASELINE.md, checked at model level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_depth_estimation_tpu.models import StereoUNet, count_params
from stereo_depth_estimation_tpu.models.compat import (
    apply_legacy_renames,
    export_torch_state_dict,
    load_torch_state_dict,
)

pytestmark = pytest.mark.slow  # full golden forward/backward parity (117s on 1 CPU)


torch = pytest.importorskip("torch")
nn_t = torch.nn


def _make_torch_model(base: int = 32):
    class ConvBlock(nn_t.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.block = nn_t.Sequential(
                nn_t.Conv2d(cin, cout, 3, padding=1, bias=False),
                nn_t.BatchNorm2d(cout),
                nn_t.ReLU(inplace=True),
                nn_t.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn_t.BatchNorm2d(cout),
                nn_t.ReLU(inplace=True),
            )

        def forward(self, x):
            return self.block(x)

    class TorchUNet(nn_t.Module):
        def __init__(self):
            super().__init__()
            c1, c2, c3, c4, c5 = base, base * 2, base * 4, base * 8, base * 16
            self.pool = nn_t.MaxPool2d(2)
            self.enc1 = ConvBlock(6, c1)
            self.enc2 = ConvBlock(c1, c2)
            self.enc3 = ConvBlock(c2, c3)
            self.enc4 = ConvBlock(c3, c4)
            self.bottleneck = ConvBlock(c4, c5)
            self.up4 = nn_t.ConvTranspose2d(c5, c4, 2, stride=2)
            self.dec4 = ConvBlock(c4 + c4, c4)
            self.up3 = nn_t.ConvTranspose2d(c4, c3, 2, stride=2)
            self.dec3 = ConvBlock(c3 + c3, c3)
            self.up2 = nn_t.ConvTranspose2d(c3, c2, 2, stride=2)
            self.dec2 = ConvBlock(c2 + c2, c2)
            self.up1 = nn_t.ConvTranspose2d(c2, c1, 2, stride=2)
            self.dec1 = ConvBlock(c1 + c1, c1)
            self.disparity_head = nn_t.Conv2d(c1, 1, 1)
            self.logvar_head = nn_t.Conv2d(c1, 1, 1)

        def forward(self, x):
            s1 = self.enc1(x)
            s2 = self.enc2(self.pool(s1))
            s3 = self.enc3(self.pool(s2))
            s4 = self.enc4(self.pool(s3))
            b = self.bottleneck(self.pool(s4))
            d4 = self.dec4(torch.cat([self.up4(b), s4], 1))
            d3 = self.dec3(torch.cat([self.up3(d4), s3], 1))
            d2 = self.dec2(torch.cat([self.up2(d3), s2], 1))
            d1 = self.dec1(torch.cat([self.up1(d2), s1], 1))
            disparity = torch.nn.functional.softplus(self.disparity_head(d1))
            logvar = self.logvar_head(d1).clamp(min=-6.0, max=3.0)
            return disparity, logvar

    return TorchUNet()


@pytest.fixture(scope="module")
def models_and_input():
    torch.manual_seed(0)
    tmodel = _make_torch_model(base=8)  # small for test speed; same topology
    tmodel.eval()
    fmodel = StereoUNet(base_channels=8)
    x_np = np.random.default_rng(0).uniform(0, 1, (2, 6, 32, 48)).astype(np.float32)
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, 32, 48, 6)), train=False, return_uncertainty=True)
    variables, missing, unexpected = load_torch_state_dict(
        variables, tmodel.state_dict()
    )
    assert missing == [] and unexpected == []
    return tmodel, fmodel, variables, x_np


def test_param_count_matches(models_and_input) -> None:
    tmodel, _, variables, _ = models_and_input
    n_torch = sum(p.numel() for p in tmodel.parameters())
    assert count_params(variables["params"]) == n_torch


def test_full_size_param_count() -> None:
    fmodel = StereoUNet()
    variables = jax.eval_shape(
        lambda: fmodel.init(jax.random.key(0), jnp.zeros((1, 16, 16, 6)), train=False, return_uncertainty=True)
    )
    n = count_params(variables["params"])
    # Exact torch parameter count of the reference-spec model at base=32
    # (verified against torch: sum(p.numel()) == 7,763,938).
    assert n == 7_763_938


def test_eval_forward_parity(models_and_input) -> None:
    tmodel, fmodel, variables, x_np = models_and_input
    with torch.inference_mode():
        t_disp, t_lv = tmodel(torch.from_numpy(x_np))
    with jax.default_matmul_precision("highest"):
        f_disp, f_lv = fmodel.apply(
            variables,
            jnp.asarray(x_np.transpose(0, 2, 3, 1)),
            train=False,
            return_uncertainty=True,
        )
    np.testing.assert_allclose(
        np.asarray(f_disp)[..., 0], t_disp.numpy()[:, 0], atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(f_lv)[..., 0], t_lv.numpy()[:, 0], atol=2e-4)


def test_train_mode_forward_and_batchstats_parity(models_and_input) -> None:
    import copy

    tmodel_shared, fmodel, variables, x_np = models_and_input
    # Deep-copy: train-mode forward mutates torch BN running stats in place.
    tmodel = copy.deepcopy(tmodel_shared)
    tmodel.train()
    t_disp, _ = tmodel(torch.from_numpy(x_np))
    t_disp = t_disp.detach().numpy()
    tmodel.eval()
    with jax.default_matmul_precision("highest"):
        (f_disp, _), mutated = fmodel.apply(
            variables,
            jnp.asarray(x_np.transpose(0, 2, 3, 1)),
            train=True,
            return_uncertainty=True,
            mutable=["batch_stats"],
        )
    np.testing.assert_allclose(np.asarray(f_disp)[..., 0], t_disp[:, 0], atol=5e-4)
    # Updated running stats must match torch's momentum-0.1 EMA.
    t_mean = tmodel.enc1.block[1].running_mean.numpy()
    f_mean = np.asarray(mutated["batch_stats"]["enc1"]["bn0"]["mean"])
    np.testing.assert_allclose(f_mean, t_mean, atol=1e-5)


def test_disparity_nonnegative_and_logvar_clamped(models_and_input) -> None:
    _, fmodel, variables, x_np = models_and_input
    disp, lv = fmodel.apply(
        variables,
        jnp.asarray(x_np.transpose(0, 2, 3, 1)) * 10.0,
        train=False,
        return_uncertainty=True,
    )
    assert float(disp.min()) >= 0.0
    assert float(lv.min()) >= -6.0 and float(lv.max()) <= 3.0


def test_single_output_without_uncertainty(models_and_input) -> None:
    _, fmodel, variables, x_np = models_and_input
    out = fmodel.apply(
        variables, jnp.asarray(x_np.transpose(0, 2, 3, 1)), train=False
    )
    assert out.shape == (2, 32, 48, 1)


def test_legacy_output_head_rename() -> None:
    sd = {"output_head.weight": 1, "output_head.bias": 2, "enc1.block.0.weight": 3}
    mapped = apply_legacy_renames(sd)
    assert "disparity_head.weight" in mapped and "output_head.weight" not in mapped
    assert mapped["disparity_head.bias"] == 2


def test_missing_logvar_head_keeps_fresh_init(models_and_input) -> None:
    tmodel, fmodel, _, _ = models_and_input
    sd = {k: v for k, v in tmodel.state_dict().items() if "logvar_head" not in k}
    fresh = fmodel.init(jax.random.key(1), jnp.zeros((1, 32, 48, 6)), train=False, return_uncertainty=True)
    loaded, missing, unexpected = load_torch_state_dict(fresh, sd)
    assert sorted(missing) == ["logvar_head.bias", "logvar_head.weight"]
    assert unexpected == []
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["logvar_head"]["kernel"]),
        np.asarray(fresh["params"]["logvar_head"]["kernel"]),
    )


def test_export_round_trips(models_and_input) -> None:
    tmodel, fmodel, variables, _ = models_and_input
    exported = export_torch_state_dict(variables)
    for key, value in tmodel.state_dict().items():
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            exported[key], value.numpy(), atol=1e-6, err_msg=key
        )


def test_max_pool_2x2_matches_reduce_window() -> None:
    """Pin max_pool_2x2 to reduce_window semantics: any future
    implementation swap (a strided-slice rewrite was tried and reverted in
    round 3, docs/PERF.md) must stay value-identical to nn.max_pool."""
    import flax.linen as fnn

    from stereo_depth_estimation_tpu.models.unet import max_pool_2x2

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 16, 24, 5)).astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2(x)),
        np.asarray(fnn.max_pool(x, window_shape=(2, 2), strides=(2, 2))),
    )


class TestFusedBlock:
    """fused_block=True must be a pure execution-strategy change: identical
    param/batch_stats trees, bit-identical training forward, and gradients
    equal to autodiff of the unfused path up to float reassociation."""

    def _models(self):
        return StereoUNet(base_channels=4), StereoUNet(
            base_channels=4, fused_block=True
        )

    def _input(self):
        return jnp.asarray(
            np.random.default_rng(3)
            .uniform(0, 1, (2, 32, 48, 6))
            .astype(np.float32)
        )

    def test_init_trees_identical(self) -> None:
        m0, m1 = self._models()
        x = self._input()
        v0 = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        v1 = m1.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            v0,
            v1,
        )

    def test_train_forward_and_stats_match(self) -> None:
        m0, m1 = self._models()
        x = self._input()
        v = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        (d0, l0), u0 = m0.apply(
            v, x, train=True, return_uncertainty=True, mutable=["batch_stats"]
        )
        (d1, l1), u1 = m1.apply(
            v, x, train=True, return_uncertainty=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            u0,
            u1,
        )

    def test_eval_forward_matches(self) -> None:
        m0, m1 = self._models()
        x = self._input()
        v = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        np.testing.assert_allclose(
            np.asarray(m0.apply(v, x, train=False)),
            np.asarray(m1.apply(v, x, train=False)),
            atol=1e-6,
        )

    def test_gradients_match_autodiff(self) -> None:
        m0, m1 = self._models()
        x = self._input()
        v = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        tgt = jnp.asarray(
            np.random.default_rng(4)
            .uniform(0, 10, (2, 32, 48, 1))
            .astype(np.float32)
        )

        def make_loss(m):
            def f(p):
                (d, lv), _ = m.apply(
                    {**v, "params": p},
                    x,
                    train=True,
                    return_uncertainty=True,
                    mutable=["batch_stats"],
                )
                return jnp.mean(jnp.abs(d - tgt) * jnp.exp(-lv) + lv)

            return f

        g0 = jax.grad(make_loss(m0))(v["params"])
        g1 = jax.grad(make_loss(m1))(v["params"])

        def check(a, b):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)

        jax.tree.map(check, g0, g1)


@pytest.mark.parametrize("impl", ["split", "hybrid"])
class TestSkipImpl:
    """skip_impl="split" removes the decoder's skip-concat entirely;
    "hybrid" keeps the concat forward but replaces the concat backward
    with direct half-kernel cotangent convs (custom VJP). Both must keep
    parameters and semantics unchanged (one conv0 kernel, sliced on
    read), differing only by float reassociation."""

    def _models(self, impl):
        return StereoUNet(base_channels=4), StereoUNet(
            base_channels=4, skip_impl=impl
        )

    def _input(self):
        return jnp.asarray(
            np.random.default_rng(5)
            .uniform(0, 1, (2, 32, 48, 6))
            .astype(np.float32)
        )

    def test_init_trees_identical(self, impl) -> None:
        m0, m1 = self._models(impl)
        x = self._input()
        v0 = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        v1 = m1.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            v0,
            v1,
        )

    def test_train_forward_and_stats_match(self, impl) -> None:
        m0, m1 = self._models(impl)
        x = self._input()
        v = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        (d0, l0), u0 = m0.apply(
            v, x, train=True, return_uncertainty=True, mutable=["batch_stats"]
        )
        (d1, l1), u1 = m1.apply(
            v, x, train=True, return_uncertainty=True, mutable=["batch_stats"]
        )
        # reassociated channel sum: slightly looser than bit-equality
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            ),
            u0,
            u1,
        )

    def test_gradients_match_autodiff(self, impl) -> None:
        m0, m1 = self._models(impl)
        x = self._input()
        v = m0.init(jax.random.key(0), x, train=False, return_uncertainty=True)
        tgt = jnp.asarray(
            np.random.default_rng(6)
            .uniform(0, 10, (2, 32, 48, 1))
            .astype(np.float32)
        )

        def make_loss(m):
            def f(p):
                (d, lv), _ = m.apply(
                    {**v, "params": p},
                    x,
                    train=True,
                    return_uncertainty=True,
                    mutable=["batch_stats"],
                )
                return jnp.mean(jnp.abs(d - tgt) * jnp.exp(-lv) + lv)

            return f

        g0 = jax.grad(make_loss(m0))(v["params"])
        g1 = jax.grad(make_loss(m1))(v["params"])

        def check(a, b):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(a)) + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-5)

        jax.tree.map(check, g0, g1)
