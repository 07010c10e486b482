"""Train-step correctness: loss descent, torch golden one-step parity, and
data-parallel (8 virtual devices) equivalence with single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_depth_estimation_tpu.models import StereoUNet
from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
from stereo_depth_estimation_tpu.ops.loss import metrics_from_stats
from stereo_depth_estimation_tpu.parallel import (
    create_train_state,
    make_adamw,
    make_eval_step,
    make_train_step,
)
from stereo_depth_estimation_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch_to_mesh,
)

HW = (16, 16)


def _synthetic_batch(rng: np.random.Generator, n: int):
    left = rng.uniform(0, 1, (n, *HW, 3)).astype(np.float32)
    shift = rng.uniform(0, 1, (n, 1, 1, 1)).astype(np.float32)
    right = np.clip(left * 0.8 + shift * 0.2, 0, 1)
    inputs = np.concatenate([left, right], axis=-1)
    target = (left.mean(-1) * 4.0 + 1.0).astype(np.float32)
    target[:, :2, :] = 0.0  # some invalid pixels
    return {"input": inputs, "target": target}


def _tiny_setup(augment=None, seed=0):
    model = StereoUNet(base_channels=4)
    tx = make_adamw(1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(seed), HW, tx)
    return model, tx, state


def test_train_step_decreases_loss() -> None:
    rng = np.random.default_rng(0)
    model, tx, state = _tiny_setup()
    step = make_train_step(model, tx)
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(rng, 8).items()}
    losses = []
    for _ in range(30):
        state, stats = step(state, batch)
        losses.append(metrics_from_stats(stats)["loss"])
    assert losses[-1] < losses[0] - 0.3, losses[::10]


def test_train_step_accepts_uint8_input() -> None:
    rng = np.random.default_rng(1)
    model, tx, state = _tiny_setup()
    step = make_train_step(model, tx, AugmentConfig())
    b = _synthetic_batch(rng, 4)
    batch = {
        "input": jnp.asarray((b["input"] * 255).astype(np.uint8)),
        "target": jnp.asarray(b["target"]),
    }
    state, stats = step(state, batch)
    m = metrics_from_stats(stats)
    assert np.isfinite(m["loss"])
    assert int(stats.valid_count) == int((b["target"] > 0).sum())


def test_data_parallel_matches_single_device() -> None:
    # SGD, not AdamW: AdamW's first step is ~lr*sign(grad), which amplifies
    # reduction-order FP noise (~1e-7) into +-2*lr parameter flips and makes
    # bitwise single-vs-multi-device comparison meaningless. SGD updates are
    # linear in the gradient, so the collective math is what's being tested.
    import optax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(2)
    b = _synthetic_batch(rng, 16)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)
    state1 = create_train_state(model, jax.random.key(3), HW, tx)
    step1 = make_train_step(model, tx)
    for _ in range(3):
        state1, stats1 = step1(state1, batch)

    mesh = make_mesh()
    state8 = create_train_state(model, jax.random.key(3), HW, tx)
    state8 = replicate_to_mesh(state8, mesh)
    step8 = make_train_step(model, tx)
    sharded = shard_batch_to_mesh(batch, mesh)
    for _ in range(3):
        state8, stats8 = step8(state8, sharded)

    # atol 1e-4: BN batch-mean reduction order differs between one device
    # and an 8-way psum, so activations diverge at float32 epsilon and the
    # divergence compounds over 3 steps. A broken collective would be off at
    # the 1e-2 (lr) scale.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        state1.params,
        jax.device_get(state8.params),
    )
    np.testing.assert_allclose(
        float(stats1.nll_sum), float(stats8.nll_sum), rtol=1e-4
    )
    # BN stats must be global (mesh-wide) means, equal to single-device stats.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        state1.batch_stats,
        jax.device_get(state8.batch_stats),
    )


def test_one_step_matches_torch_adamw() -> None:
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from test_model import _make_torch_model

    from stereo_depth_estimation_tpu.models.compat import load_torch_state_dict

    torch.manual_seed(0)
    tmodel = _make_torch_model(base=4)
    model = StereoUNet(base_channels=4)
    tx = make_adamw(1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0), HW, tx)
    variables, missing, unexpected = load_torch_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats},
        tmodel.state_dict(),
    )
    assert not missing and not unexpected
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )

    rng = np.random.default_rng(4)
    b = _synthetic_batch(rng, 4)

    # torch side: one step of the reference loop's math (train.py:327-343, 578)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)
    tmodel.train()
    x = torch.from_numpy(b["input"].transpose(0, 3, 1, 2))
    t = torch.from_numpy(b["target"]).unsqueeze(1)
    pred, logvar = tmodel(x)
    mask = (t > 0) & torch.isfinite(t)
    diff = pred[mask] - t[mask]
    nll = diff.abs() * torch.exp(-logvar[mask]) + logvar[mask]
    loss_t = nll.mean()
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    # jax side
    step = make_train_step(model, tx)
    with jax.default_matmul_precision("highest"):
        state, stats = step(state, {k: jnp.asarray(v) for k, v in b.items()})
    m = metrics_from_stats(stats)
    np.testing.assert_allclose(m["loss"], float(loss_t), atol=1e-4)

    # updated params must match torch's post-step weights
    from stereo_depth_estimation_tpu.models.compat import export_torch_state_dict

    exported = export_torch_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    t_sd = tmodel.state_dict()
    worst = 0.0
    for key, value in exported.items():
        err = float(np.abs(value - t_sd[key].detach().numpy()).max())
        worst = max(worst, err)
        np.testing.assert_allclose(
            value, t_sd[key].detach().numpy(), atol=5e-4, err_msg=key
        )
    assert worst < 5e-4


def test_eval_step_is_deterministic_and_uses_running_stats() -> None:
    rng = np.random.default_rng(5)
    model, tx, state = _tiny_setup()
    eval_step = make_eval_step(model)
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(rng, 4).items()}
    s1 = eval_step(state, batch)
    s2 = eval_step(state, batch)
    assert float(s1.nll_sum) == float(s2.nll_sum)
