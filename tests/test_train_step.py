"""Train-step correctness: loss descent, torch golden one-step parity, and
data-parallel (8 virtual devices) equivalence with single-device training."""

from pathlib import Path

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

pytestmark = pytest.mark.slow  # compiles many step variants (259s on 1 CPU)


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

    sys.path.insert(0, str(Path(__file__).parent))
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


def test_zero_valid_batch_is_noop() -> None:
    """A batch whose every target pixel is invalid must leave params,
    optimizer state and BN stats untouched (reference skips such batches,
    train.py:330-332; AdamW weight decay would otherwise shrink params)."""
    rng = np.random.default_rng(6)
    model, tx, state = _tiny_setup()
    step = make_train_step(model, tx)
    b = _synthetic_batch(rng, 4)
    b["target"] = np.zeros_like(b["target"])  # all invalid (target > 0 mask)
    before = jax.tree.map(np.asarray, (state.params, state.opt_state, state.batch_stats))
    state, stats = step(state, {k: jnp.asarray(v) for k, v in b.items()})
    assert int(stats.valid_count) == 0
    after = jax.tree.map(np.asarray, (state.params, state.opt_state, state.batch_stats))
    jax.tree.map(np.testing.assert_array_equal, before, after)
    assert int(state.step) == 1  # the step counter still advances


def test_indivisible_batch_pads_and_masks_on_mesh() -> None:
    """Reference-default-style indivisible batches (e.g. 30 on 8 devices)
    must shard via pad-and-mask with exact masked metrics."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from stereo_depth_estimation_tpu.parallel.mesh import pad_batch_for_mesh

    rng = np.random.default_rng(7)
    b = _synthetic_batch(rng, 30)

    padded = pad_batch_for_mesh(dict(b), 8)
    assert padded["input"].shape[0] == 32
    assert padded["valid_mask"][30:].sum() == 0  # pad rows contribute nothing
    np.testing.assert_array_equal(padded["input"][:30], b["input"])
    np.testing.assert_array_equal(padded["input"][30], b["input"][0])  # wraps

    model, tx, state = _tiny_setup()
    mesh = make_mesh()
    eval_step = make_eval_step(model)

    # Eval on the padded mesh batch == eval on the raw batch, exactly:
    # eval-mode BN uses running stats, and all metric sums are masked.
    stats_single = eval_step(state, {k: jnp.asarray(v) for k, v in b.items()})
    state8 = replicate_to_mesh(state, mesh)
    stats_mesh = eval_step(state8, shard_batch_to_mesh(dict(b), mesh))
    assert int(stats_mesh.valid_count) == int(stats_single.valid_count)
    np.testing.assert_allclose(
        float(stats_mesh.nll_sum), float(stats_single.nll_sum), rtol=1e-5
    )

    # And the train step runs (BN batch stats see the wrapped pad images,
    # documented deviation) with the same masked pixel count.
    step = make_train_step(model, tx)
    state8, tstats = step(state8, shard_batch_to_mesh(dict(b), mesh))
    assert int(tstats.valid_count) == int(stats_single.valid_count)
    assert np.isfinite(float(tstats.nll_sum))


def test_pad_batch_to_keeps_tail_batch_static_and_exact() -> None:
    """The streamed epoch tail pads to the full static batch size (one step
    program for the whole run — a distinct tail shape costs a full XLA
    compile + a second AOT blob, measured 220 s at 480x640 on the v5e) with
    masked metrics EXACTLY equal to the unpadded tail."""
    from stereo_depth_estimation_tpu.parallel.mesh import pad_batch_to

    rng = np.random.default_rng(11)
    tail = _synthetic_batch(rng, 15)  # 87 % 24 = 15: config-3's real tail

    padded = pad_batch_to(dict(tail), 24)
    assert padded["input"].shape[0] == 24
    assert padded["valid_mask"][15:].sum() == 0
    np.testing.assert_array_equal(padded["input"][:15], tail["input"])
    np.testing.assert_array_equal(padded["input"][15], tail["input"][0])
    # Already-full batches keep their rows but STILL gain an explicit
    # valid_mask (rank-1 all-True row flags; the step ANDs them with its
    # on-device target > 0, so the math equals having no key at all): a
    # tail-only key would be a second pytree signature, i.e. a second
    # compiled program — the exact cost pad_batch_to removes.
    full = _synthetic_batch(rng, 24)
    full_out = pad_batch_to(dict(full), 24)
    np.testing.assert_array_equal(full_out["input"], full["input"])
    assert full_out["valid_mask"].shape == (24,) and full_out["valid_mask"].all()
    # Oversize batches fail loudly instead of silently recompiling.
    with pytest.raises(ValueError, match="exceeds"):
        pad_batch_to(_synthetic_batch(rng, 25), 24)

    model, _tx, state = _tiny_setup()
    eval_step = make_eval_step(model)
    stats_raw = eval_step(state, {k: jnp.asarray(v) for k, v in tail.items()})
    stats_pad = eval_step(state, {k: jnp.asarray(v) for k, v in padded.items()})
    assert int(stats_pad.valid_count) == int(stats_raw.valid_count)
    np.testing.assert_allclose(
        float(stats_pad.nll_sum), float(stats_raw.nll_sum), rtol=1e-6
    )


def test_device_data_loop_matches_two_dispatch_variant() -> None:
    """The scanned K-step device-resident loop and the two-dispatch variant
    share the permutation/fold_in scheme, so K steps of each from the same
    state must produce the same parameters and per-step stats (up to jit
    fusion-boundary rounding)."""
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_loop,
        make_device_data_train_step,
    )

    import optax

    rng = np.random.default_rng(8)
    n, batch_size, k = 12, 4, 6  # 3 steps/epoch -> the scan crosses an epoch
    b = _synthetic_batch(rng, n)
    images = jnp.asarray((b["input"] * 255).astype(np.uint8))
    targets = jnp.asarray(b["target"].astype(np.float16))

    model = StereoUNet(base_channels=4)
    # SGD, not AdamW, for the same reason as the data-parallel test above:
    # the scanned and two-dispatch programs fuse differently, and AdamW
    # turns ~1e-7 reduction noise into +-lr param flips. SGD keeps the
    # comparison linear in the gradient.
    tx = optax.sgd(1e-2)
    aug = AugmentConfig()

    state_a = create_train_state(model, jax.random.key(9), HW, tx)
    loop = make_device_data_train_loop(
        model, tx, images, targets, batch_size, aug, steps_per_call=k
    )
    state_a, stats_seq = loop(state_a)
    assert stats_seq.nll_sum.shape == (k,)

    state_b = create_train_state(model, jax.random.key(9), HW, tx)
    step = make_device_data_train_step(
        model, tx, images, targets, batch_size, aug
    )
    per_step_nll = []
    for _ in range(k):
        state_b, stats = step(state_b)
        per_step_nll.append(float(stats.nll_sum))

    np.testing.assert_allclose(
        np.asarray(stats_seq.nll_sum), per_step_nll, rtol=1e-5
    )
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5
        ),
        state_a.params,
        state_b.params,
    )


def test_loader_fetch_thread_pool_matches_serial() -> None:
    from stereo_depth_estimation_tpu.data.pipeline import loader_fetch

    class FakeLoader:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            x = np.full((4, 4, 6), i, np.float32)
            return {"input": x, "target": x[..., 0]}

    idx = np.array([3, 1, 7, 0])
    serial = loader_fetch(FakeLoader())(idx)
    pooled = loader_fetch(FakeLoader(), num_workers=3)(idx)
    np.testing.assert_array_equal(serial["input"], pooled["input"])
    np.testing.assert_array_equal(serial["target"], pooled["target"])


def test_fused_dispatch_matches_two_dispatch() -> None:
    """fuse_dispatch=True runs gather+step as ONE jitted program; same
    permutation scheme and math, so K steps must match the two-dispatch
    variant (also pins the dataset-as-jit-argument regression: closure
    capture ships the payload inside the compile request)."""
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
    )

    import optax

    rng = np.random.default_rng(12)
    n, batch_size, k = 8, 4, 4
    b = _synthetic_batch(rng, n)
    images = jnp.asarray((b["input"] * 255).astype(np.uint8))
    targets = jnp.asarray(b["target"].astype(np.float16))

    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)  # SGD: keeps the comparison linear in the gradient
    aug = AugmentConfig()

    states = []
    for fuse in (False, True):
        state = create_train_state(model, jax.random.key(3), HW, tx)
        step = make_device_data_train_step(
            model, tx, images, targets, batch_size, aug, fuse_dispatch=fuse
        )
        for _ in range(k):
            state, stats = step(state)
        states.append((state, float(stats.nll_sum)))

    (s0, nll0), (s1, nll1) = states
    np.testing.assert_allclose(nll0, nll1, rtol=1e-5)
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5
        ),
        s0.params,
        s1.params,
    )


def test_flat_adamw_matches_optax() -> None:
    """parallel/flat_adamw.py is element-for-element optax.adamw: after
    several real train steps from identical init on identical batches, the
    parameter trajectories agree to float32 roundoff. (The flat variant
    exists to collapse ~100 leaf-wise optimizer fusions into one pass —
    docs/PERF.md round-4 knob table.)"""
    from stereo_depth_estimation_tpu.parallel.flat_adamw import flat_adamw

    rng = np.random.default_rng(11)
    batch = {k: jnp.asarray(v) for k, v in _synthetic_batch(rng, 8).items()}
    model = StereoUNet(base_channels=4)
    results = []
    for tx in (make_adamw(1e-3, 1e-4), flat_adamw(1e-3, 1e-4)):
        state = create_train_state(model, jax.random.key(5), HW, tx)
        step = make_train_step(model, tx)
        for _ in range(5):
            state, stats = step(state, batch)
        results.append((state.params, metrics_from_stats(stats)["loss"]))

    (p_ref, loss_ref), (p_flat, loss_flat) = results
    np.testing.assert_allclose(loss_flat, loss_ref, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7
        ),
        p_ref,
        p_flat,
    )


def test_flat_adamw_zero_valid_batch_is_noop() -> None:
    """The zero-valid-pixel batch guard (reference train.py:330-332) must
    hold under the flat optimizer state too: params, moments, and count all
    stay put when the batch has no valid pixels."""
    from stereo_depth_estimation_tpu.parallel.flat_adamw import flat_adamw

    rng = np.random.default_rng(12)
    batch = _synthetic_batch(rng, 4)
    batch["target"] = np.zeros_like(batch["target"])  # all invalid
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = StereoUNet(base_channels=4)
    tx = flat_adamw(1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(6), HW, tx)
    # Snapshot before stepping: the step donates its input state's buffers.
    params_before = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, tx)
    new_state, stats = step(state, batch)
    assert float(stats.valid_count) == 0.0
    assert int(new_state.opt_state.count) == 0
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        params_before,
        new_state.params,
    )


def test_make_adamw_lr_schedules() -> None:
    """Cosine schedule (superset of the reference's constant lr): update
    magnitude decays to near zero across total_steps, warmup ramps from
    zero, and misconfiguration raises."""
    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 0.5, jnp.float32)}

    def norms(tx, n):
        st = tx.init(params)
        out = []
        for _ in range(n):
            up, st = tx.update(grads, st, params)
            out.append(float(jnp.abs(up["w"]).max()))
        return out

    cos = norms(make_adamw(1e-3, 0.0, schedule="cosine", total_steps=10), 10)
    assert cos[0] == pytest.approx(1e-3, rel=1e-3)  # starts at peak lr
    assert cos[-1] < cos[0] / 10  # decayed to a few percent of peak

    # Constant lr: steady magnitude (tiny drift from Adam bias correction).
    const = norms(make_adamw(1e-3, 0.0), 3)
    assert const[0] == pytest.approx(const[-1], rel=1e-4)

    warm = norms(
        make_adamw(
            1e-3, 0.0, schedule="cosine", total_steps=10, warmup_steps=5
        ),
        10,
    )
    assert warm[0] < warm[4]  # ramping up
    assert max(warm) == pytest.approx(1e-3, rel=0.3)  # reaches ~peak

    with pytest.raises(ValueError, match="total_steps"):
        make_adamw(1e-3, 0.0, schedule="cosine")
    with pytest.raises(ValueError, match="Unknown lr schedule"):
        make_adamw(1e-3, 0.0, schedule="linear")
