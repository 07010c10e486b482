"""Checkpointing: orbax save/restore round trip, resolution rules, torch .pt
interop, and preview montage rendering."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_depth_estimation_tpu.models import StereoUNet
from stereo_depth_estimation_tpu.parallel import create_train_state, make_adamw
from stereo_depth_estimation_tpu.training.checkpoint import (
    load_checkpoint_meta,
    load_model_variables,
    load_train_state,
    resolve_checkpoint_path,
    save_checkpoint,
)

pytestmark = pytest.mark.slow  # orbax/torch round-trip e2e (119s on 1 CPU)


HW = (16, 16)


@pytest.fixture(scope="module")
def state_and_model():
    model = StereoUNet(base_channels=4)
    tx = make_adamw(1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0), HW, tx)
    return model, tx, state


def test_save_restore_round_trip(state_and_model, tmp_path: Path) -> None:
    model, tx, state = state_and_model
    ckpt = save_checkpoint(
        tmp_path, "last", state, epoch=3,
        config={"batch_size": 4}, metrics={"train_mae": 1.5},
    )
    assert ckpt == tmp_path / "last"
    restored, meta = load_train_state(ckpt, state)
    assert meta["epoch"] == 3
    assert meta["config"]["batch_size"] == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state.replace(rng=jax.random.key_data(state.rng))),
        restored.replace(rng=jax.random.key_data(restored.rng)),
    )


def test_save_overwrites_atomically(state_and_model, tmp_path: Path) -> None:
    model, tx, state = state_and_model
    save_checkpoint(tmp_path, "last", state, epoch=1, config={}, metrics={})
    save_checkpoint(tmp_path, "last", state, epoch=2, config={}, metrics={})
    assert load_checkpoint_meta(tmp_path / "last")["epoch"] == 2


def test_load_model_variables_from_orbax(state_and_model, tmp_path: Path) -> None:
    model, tx, state = state_and_model
    save_checkpoint(tmp_path, "best", state, epoch=1, config={}, metrics={})
    template = {"params": state.params, "batch_stats": state.batch_stats}
    variables, meta = load_model_variables(tmp_path / "best", template)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["enc1"]["conv0"]["kernel"]),
        np.asarray(state.params["enc1"]["conv0"]["kernel"]),
    )
    assert meta["epoch"] == 1


def test_load_model_variables_from_torch_pt(state_and_model, tmp_path: Path) -> None:
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_model import _make_torch_model

    torch.manual_seed(1)
    tmodel = _make_torch_model(base=4)
    pt_path = tmp_path / "reference.pt"
    torch.save(
        {"model_state_dict": tmodel.state_dict(), "epoch": 7}, pt_path
    )
    model, tx, state = state_and_model
    template = {"params": state.params, "batch_stats": state.batch_stats}
    variables, meta = load_model_variables(pt_path, template)
    assert meta["epoch"] == 7
    assert meta["has_uncertainty_head"] is True
    # spot-check a converted conv kernel (OIHW -> HWIO); .copy() snapshots the
    # value — .numpy() is a live view of torch storage.
    expected = (
        tmodel.enc1.block[0].weight.detach().numpy().transpose(2, 3, 1, 0).copy()
    )
    np.testing.assert_allclose(
        np.asarray(variables["params"]["enc1"]["conv0"]["kernel"]), expected,
        atol=1e-6,
    )
    # torch mutation after load must not affect loaded params (no aliasing)
    with torch.no_grad():
        tmodel.enc1.block[0].weight.add_(100.0)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["enc1"]["conv0"]["kernel"]), expected,
        atol=1e-6,
    )


def test_resolve_checkpoint_rules(tmp_path: Path) -> None:
    out = tmp_path / "outputs"
    for run, mtime in (("run_a", 1000), ("run_b", 2000)):
        d = out / run / "checkpoints" / "last"
        d.mkdir(parents=True)
        meta = d / "meta.json"
        meta.write_text("{}")
        import os

        os.utime(meta, ns=(mtime * 10**9, mtime * 10**9))

    # newest-mtime scan
    assert resolve_checkpoint_path(out) == out / "run_b" / "checkpoints" / "last"
    # run-id
    assert (
        resolve_checkpoint_path(out, run_id="run_a")
        == out / "run_a" / "checkpoints" / "last"
    )
    # explicit path wins
    explicit = out / "run_a" / "checkpoints" / "last"
    assert resolve_checkpoint_path(out, checkpoint=explicit) == explicit
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_path(out, run_id="nope")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_path(tmp_path / "empty")


def test_preview_montage(tmp_path: Path) -> None:
    from PIL import Image

    from stereo_depth_estimation_tpu.eval.preview import (
        normalize_map,
        save_preview_montage,
    )

    rng = np.random.default_rng(0)
    stereo = rng.uniform(0, 1, (8, 10, 6)).astype(np.float32)
    target = rng.uniform(0, 5, (8, 10)).astype(np.float32)
    pred = rng.uniform(0, 5, (8, 10)).astype(np.float32)
    out = tmp_path / "m.png"
    save_preview_montage(out, stereo, target, pred)
    img = np.asarray(Image.open(out))
    assert img.shape == (8, 40, 3)  # 4 panels side by side

    # all-NaN map -> black
    assert normalize_map(np.full((4, 4), np.nan)).sum() == 0
    # constant map stays in range
    n = normalize_map(np.full((4, 4), 2.0))
    assert n.shape == (4, 4, 3)


def test_trained_export_fullres_epe_parity(tmp_path: Path) -> None:
    """Post-TRAINING export parity at full resolution: run real train steps
    (so BatchNorm running stats and every kernel hold trained values, not
    init), export to reference-format .pt, load it into the torch-spec
    model, and hold the same EPE <= 1e-3 full-res gate as
    test_parity_fullres.py — covering the convT spatial flip and BN stats
    under trained weights (round-4 extension of the init-weights gate)."""
    torch = pytest.importorskip("torch")
    import sys

    from stereo_depth_estimation_tpu.parallel.train_step import make_train_step
    from stereo_depth_estimation_tpu.training.export import (
        build_parser,
        export_checkpoint,
    )

    sys.path.insert(0, str(Path(__file__).parent))
    from test_model import _make_torch_model

    full_hw = (240, 320)
    train_hw = (96, 128)  # fully-convolutional: train cheap, gate full-res
    fmodel = StereoUNet()  # base_channels=32: the reference-spec size
    tx = make_adamw(1e-3, 1e-4)
    state = create_train_state(fmodel, jax.random.key(3), train_hw, tx)
    step = make_train_step(fmodel, tx)
    rng = np.random.default_rng(5)
    for _ in range(3):
        batch = {
            "input": rng.integers(
                0, 256, (2, *train_hw, 6), dtype=np.uint8
            ),
            "target": rng.uniform(0.5, 40.0, (2, *train_hw)).astype(
                np.float32
            ),
        }
        state, stats = step(state, batch)
    assert np.isfinite(float(stats.nll_sum))
    # BN running stats must actually have moved off their init.
    bn_means = jax.tree.leaves(
        jax.tree.map(lambda x: float(np.abs(np.asarray(x)).max()),
                     state.batch_stats)
    )
    assert max(bn_means) > 0.0

    ckpt = save_checkpoint(
        tmp_path, "last", state, epoch=1, config={}, metrics={}
    )
    out_pt = tmp_path / "trained.pt"
    export_checkpoint(build_parser().parse_args([
        "--checkpoint", str(ckpt), "--base-channels", "32",
        "--out", str(out_pt),
    ]))

    tmodel = _make_torch_model(base=32)
    payload = torch.load(out_pt, weights_only=False)
    missing, unexpected = tmodel.load_state_dict(
        payload["model_state_dict"], strict=False
    )
    assert [k for k in missing if "num_batches_tracked" not in k] == []
    assert unexpected == []
    tmodel.eval()

    x = rng.uniform(0.0, 1.0, (1, *full_hw, 6)).astype(np.float32)
    with torch.inference_mode():
        t_disp, t_lv = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    import jax.numpy as jnp

    with jax.default_matmul_precision("highest"):
        f_disp, f_lv = fmodel.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False, return_uncertainty=True,
        )
    disp_err = np.abs(np.asarray(f_disp)[..., 0] - t_disp.numpy()[:, 0])
    lv_err = np.abs(np.asarray(f_lv)[..., 0] - t_lv.numpy()[:, 0])
    assert disp_err.mean() < 1e-3, f"disparity EPE {disp_err.mean():.2e}"
    assert lv_err.mean() < 1e-3, f"logvar EPE {lv_err.mean():.2e}"


def test_export_cli_round_trips_through_reference_format(
    state_and_model, tmp_path: Path
) -> None:
    """foundation-stereo-export writes a .pt our own torch loader (and the
    reference's spec model) can consume, with params surviving the
    flax -> torch -> flax round trip exactly."""
    torch = pytest.importorskip("torch")
    from stereo_depth_estimation_tpu.training.export import (
        build_parser,
        export_checkpoint,
    )

    model, tx, state = state_and_model
    ckpt = save_checkpoint(
        tmp_path, "last", state, epoch=7,
        config={"base_channels": 4}, metrics={"val_mae": 2.0},
    )
    out_pt = tmp_path / "exported.pt"
    export_checkpoint(build_parser().parse_args([
        "--checkpoint", str(ckpt), "--base-channels", "4",
        "--out", str(out_pt),
    ]))

    payload = torch.load(out_pt, weights_only=False)
    assert payload["epoch"] == 7
    assert payload["metrics"]["val_mae"] == 2.0

    # The reference-spec torch model accepts the state dict strictly.
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_model import _make_torch_model

    tmodel = _make_torch_model(base=4)
    missing, unexpected = tmodel.load_state_dict(
        payload["model_state_dict"], strict=False
    )
    assert [k for k in missing if "num_batches_tracked" not in k] == []
    assert unexpected == []

    # And our own .pt loader round-trips the params bit-exactly.
    template = {"params": state.params, "batch_stats": state.batch_stats}
    variables, _meta = load_model_variables(out_pt, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"],
        state.params,
    )


def test_rescale_resolution_transfer(tmp_path: Path) -> None:
    """Width-rescaled transfer (models/compat.py): the disparity head's
    pre-softplus output scales by the width ratio (so predicted disparity
    scales with it wherever softplus is in its linear region), the logvar
    bias shifts by log(ratio), and every other leaf is untouched."""
    import math

    from stereo_depth_estimation_tpu.models.compat import (
        rescale_resolution_transfer,
    )

    r = 2.5
    model = StereoUNet(base_channels=8)
    state = create_train_state(
        model, jax.random.key(7), (32, 32), make_adamw(1e-3, 1e-4)
    )
    params = jax.device_get(state.params)
    scaled = rescale_resolution_transfer(params, r)

    np.testing.assert_allclose(
        scaled["disparity_head"]["kernel"],
        np.asarray(params["disparity_head"]["kernel"]) * r, rtol=1e-7,
    )
    np.testing.assert_allclose(
        scaled["logvar_head"]["bias"],
        np.asarray(params["logvar_head"]["bias"]) + math.log(r), rtol=1e-7,
    )
    for key in params:
        if key in ("disparity_head", "logvar_head"):
            continue
        orig = jax.tree.leaves(params[key])
        new = jax.tree.leaves(scaled[key])
        for a, b in zip(orig, new):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Semantic check through the real forward: wherever the original
    # disparity is comfortably in softplus's linear region, the rescaled
    # params predict ~r times the disparity on the SAME input.
    x = jax.random.uniform(jax.random.key(8), (1, 32, 32, 6))
    var0 = {"params": params, "batch_stats": state.batch_stats}
    var1 = {"params": scaled, "batch_stats": state.batch_stats}
    d0, lv0 = model.apply(var0, x, train=False, return_uncertainty=True)
    d1, lv1 = model.apply(var1, x, train=False, return_uncertainty=True)
    d0, d1 = np.asarray(d0), np.asarray(d1)
    linear = d0 > 2.0
    if linear.any():
        np.testing.assert_allclose(d1[linear], d0[linear] * r, rtol=0.06)
    lv0, lv1 = np.asarray(lv0), np.asarray(lv1)
    interior = (lv0 > -5.0) & (lv0 < 3.0 - math.log(r) - 0.1)
    if interior.any():
        np.testing.assert_allclose(
            lv1[interior], lv0[interior] + math.log(r), atol=1e-5
        )

    with pytest.raises(ValueError, match="width_ratio"):
        rescale_resolution_transfer(params, 0.0)
