"""Trainer smoke tests on synthetic data: end-to-end epochs, tracking output,
checkpoints (last/best), resume, previews, config parity."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np
from stereo_depth_estimation_tpu.training.config import TrainConfig, parse_args
from stereo_depth_estimation_tpu.training.tracking import TrackingRun
from stereo_depth_estimation_tpu.training.trainer import train


pytestmark = pytest.mark.slow  # end-to-end trainer runs; fast tier runs with -m 'not slow'


def _make_dataset(root: Path, n: int = 12, shape=(32, 32)) -> None:
    rng = np.random.default_rng(0)
    base = root / "scene_01" / "dataset" / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (base / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        stem = f"{i:06d}"
        left = rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
        right = rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
        disparity = rng.uniform(0.5, 20.0, shape).astype(np.float32)
        Image.fromarray(left).save(base / "left/rgb" / f"{stem}.png")
        Image.fromarray(right).save(base / "right/rgb" / f"{stem}.png")
        Image.fromarray(disparity_encode_np(disparity)).save(
            base / "left/disparity" / f"{stem}.png"
        )


def _config(tmp_path: Path, **kw) -> TrainConfig:
    base = dict(
        dataset_root=str(tmp_path / "data"),
        height=32,
        width=32,
        epochs=2,
        batch_size=4,
        val_fraction=0.25,
        seed=42,
        device="cpu",
        mesh_devices=1,
        compute_dtype="float32",
        mlflow_tracking_uri=str(tmp_path / "mlruns"),
        output_dir=str(tmp_path / "outputs"),
        preview_samples=2,
        log_every_batches=2,
        base_channels=8,  # small model: e2e logic, not capacity, is under test
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer")
    _make_dataset(root / "data")
    return root


def test_train_end_to_end(dataset_root: Path) -> None:
    cfg = _config(dataset_root)
    summary = train(cfg)
    run_dir = Path(cfg.output_dir) / summary["run_id"]
    assert (run_dir / "config.json").exists()
    assert (run_dir / "checkpoints" / "last" / "meta.json").exists()
    assert (run_dir / "checkpoints" / "best" / "meta.json").exists()
    assert summary["best_epoch"] in (1, 2)
    assert np.isfinite(summary["best_val_mae"])
    previews = list((run_dir / "mlflow_previews").rglob("*.png"))
    assert len(previews) == 2 * 2  # 2 samples x 2 epochs
    # tracking wrote MLflow FileStore-format metrics (one file per key,
    # lines of "<ts_ms> <value> <step>") under <uri>/<exp_id>/<run_id>/metrics
    metric_files = list(Path(cfg.mlflow_tracking_uri).glob("*/*/metrics/*"))
    keys = {p.name for p in metric_files}
    assert {"train_loss_step", "train_mae_step", "train_loss", "val_mae",
            "epoch_seconds"} <= keys
    for line in (
        next(p for p in metric_files if p.name == "val_mae").read_text().splitlines()
    ):
        ts, value, step = line.split()
        assert int(ts) > 0 and np.isfinite(float(value)) and int(step) >= 1
    meta = json.loads(
        (run_dir / "checkpoints" / "last" / "meta.json").read_text()
    )
    assert meta["epoch"] == 2
    assert meta["config"]["batch_size"] == 4
    assert "train_mae" in meta["metrics"]


def test_init_checkpoint_starts_from_torch_weights(
    dataset_root: Path, tmp_path: Path
) -> None:
    """--init-checkpoint <ref .pt> starts training from the reference
    model's exact weights (fresh optimizer): with lr=0 the trained 'last'
    checkpoint's params equal the transferred torch weights bit-for-bit."""
    import sys

    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, str(Path(__file__).parent))
    from test_model import _make_torch_model

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.models.compat import load_torch_state_dict
    from stereo_depth_estimation_tpu.training.checkpoint import (
        load_model_variables,
    )

    torch.manual_seed(7)
    tmodel = _make_torch_model(base=8)
    pt_path = tmp_path / "ref_init.pt"
    torch.save({"model_state_dict": tmodel.state_dict(), "epoch": 0}, pt_path)

    cfg = _config(
        dataset_root,
        epochs=1,
        lr=0.0,
        init_checkpoint=str(pt_path),
        output_dir=str(tmp_path / "out"),
        mlflow_tracking_uri=str(tmp_path / "trk"),
        preview_samples=0,
    )
    summary = train(cfg)

    model = StereoUNet(base_channels=8)
    template = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 6)), train=False,
        return_uncertainty=True,
    )
    expected, missing, unexpected = load_torch_state_dict(
        template, tmodel.state_dict()
    )
    assert missing == [] and unexpected == []
    last = (
        Path(cfg.output_dir) / summary["run_id"] / "checkpoints" / "last"
    )
    restored, _meta = load_model_variables(last, template)
    for path, got in jax.tree_util.tree_leaves_with_path(restored["params"]):
        want = expected["params"]
        for key in path:
            want = want[key.key]
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=str(path)
        )

    with pytest.raises(ValueError, match="mutually exclusive"):
        train(_config(
            dataset_root,
            init_checkpoint=str(pt_path),
            resume=str(last),
        ))


def test_resume_continues_from_checkpoint(dataset_root: Path, tmp_path: Path) -> None:
    cfg = _config(
        dataset_root,
        epochs=1,
        output_dir=str(tmp_path / "out1"),
        mlflow_tracking_uri=str(tmp_path / "t1"),
        preview_samples=0,
    )
    summary1 = train(cfg)
    last = Path(cfg.output_dir) / summary1["run_id"] / "checkpoints" / "last"

    cfg2 = _config(
        dataset_root,
        epochs=2,
        resume=str(last),
        output_dir=str(tmp_path / "out2"),
        mlflow_tracking_uri=str(tmp_path / "t2"),
        preview_samples=0,
    )
    summary2 = train(cfg2)
    # resumed run trains only epoch 2
    run_dir = Path(cfg2.output_dir) / summary2["run_id"]
    meta = json.loads((run_dir / "checkpoints" / "last" / "meta.json").read_text())
    assert meta["epoch"] == 2

    # Resume continuity (carried in the checkpoint meta): the step counter
    # keeps counting instead of restarting, and best-so-far is GLOBAL over
    # both segments — epoch 1's result competes, it is not forgotten.
    assert summary2["global_step"] == 2 * summary1["global_step"] > 0
    assert meta["metrics"]["resume_carry"]["global_step"] == summary2["global_step"]
    assert summary2["best_epoch"] in (1, 2)
    assert summary2["best_val_mae"] <= summary1["best_val_mae"] * (1 + 1e-9)
    if summary2["best_epoch"] == 1:
        np.testing.assert_allclose(
            summary2["best_val_mae"], summary1["best_val_mae"], rtol=1e-6
        )


def test_train_with_packed_cache(dataset_root: Path, tmp_path: Path) -> None:
    cfg = _config(
        dataset_root,
        epochs=1,
        packed_cache_root=str(tmp_path / "packed"),
        output_dir=str(tmp_path / "out"),
        mlflow_tracking_uri=str(tmp_path / "t"),
        preview_samples=0,
    )
    summary = train(cfg)
    assert (tmp_path / "packed" / "train" / "meta.json").exists()
    assert (tmp_path / "packed" / "val" / "meta.json").exists()
    assert np.isfinite(summary["best_val_mae"])


def test_float32_input_precision_trains(dataset_root: Path, tmp_path: Path) -> None:
    """--input-precision float32 reproduces the reference's uncached float
    path (its dataset.py:184-193): the loader feeds float32 resized images
    with no uint8 quantisation round-trip, end to end."""
    from stereo_depth_estimation_tpu.data.dataset import StereoSampleLoader
    from stereo_depth_estimation_tpu.data.samples import discover_samples

    samples = discover_samples(dataset_root / "data")
    # Load at a non-native size: the fixture PNGs are 32x32, and an identity
    # resize would reproduce exact uint8/255 grid values, making the
    # sub-quantisation assertion below vacuous.
    f32 = StereoSampleLoader(samples, image_size=(24, 24), float_inputs=True)[0]
    u8 = StereoSampleLoader(samples, image_size=(24, 24))[0]
    assert f32["input"].dtype == np.float32
    assert u8["input"].dtype == np.uint8
    # The float path carries sub-quantisation precision.
    assert not np.array_equal(
        np.clip(f32["input"] * 255, 0, 255).astype(np.uint8) / np.float32(255),
        f32["input"],
    )

    cfg = _config(
        dataset_root,
        epochs=1,
        input_precision="float32",
        output_dir=str(tmp_path / "out"),
        mlflow_tracking_uri=str(tmp_path / "t"),
        preview_samples=0,
    )
    summary = train(cfg)
    assert np.isfinite(summary["best_val_mae"])

    with pytest.raises(ValueError, match="float32 cannot be combined"):
        train(_config(
            dataset_root,
            input_precision="float32",
            packed_cache_root=str(tmp_path / "packed"),
        ))

    # The npz read-through cache stores uint8, so float32 inputs would see
    # true floats on a miss but dequantised values on every hit.
    with pytest.raises(ValueError, match="float32 cannot be combined"):
        train(_config(
            dataset_root,
            input_precision="float32",
            cache_root=str(tmp_path / "npz_cache"),
        ))


def test_parse_args_defaults_match_reference() -> None:
    cfg = parse_args([])
    assert (cfg.height, cfg.width) == (240, 320)
    assert cfg.epochs == 100
    assert cfg.batch_size == 30
    assert cfg.lr == 1e-3
    assert cfg.weight_decay == 1e-4
    assert cfg.val_fraction == 0.1
    assert cfg.seed == 42
    assert cfg.augment is True
    assert cfg.brightness_jitter == 0.25
    assert cfg.hue_jitter == 0.09
    assert cfg.gamma_jitter == 0.2
    assert cfg.noise_std_max == 0.05
    assert cfg.blur_prob == 0.03
    assert cfg.blur_sigma_max == 1.0
    assert cfg.blur_kernel_size == 5
    assert cfg.mlflow_experiment == "foundation-stereo-depth"


def test_parse_args_boolean_options() -> None:
    cfg = parse_args(["--no-augment", "--require-cache"])
    assert cfg.augment is False
    assert cfg.require_cache is True
    assert cfg.aot_cache_multihost is False  # multihost AOT cache is opt-in
    cfg = parse_args(["--aot-cache-multihost"])
    assert cfg.aot_cache_multihost is True


def test_tracking_run_jsonl_backend(tmp_path: Path) -> None:
    run = TrackingRun(str(tmp_path / "uri"), "exp", "name", force_local=True)
    with run:
        run.log_params({"a": 1})
        run.log_metrics({"m": 2.0}, step=1)
        run.set_tag("t", "v")
        art = tmp_path / "artifact.txt"
        art.write_text("x")
        run.log_artifact(art, artifact_path="cfg")
    base = tmp_path / "uri" / "tracking" / "exp" / run.run_id
    assert json.loads((base / "params.json").read_text()) == {"a": 1}
    assert json.loads((base / "tags.json").read_text()) == {"t": "v"}
    assert (base / "artifacts" / "cfg" / "artifact.txt").exists()


def test_run_train_epoch_raises_on_non_finite_loss() -> None:
    """Failure detection: a diverged (NaN) interval aborts with a clear
    error instead of silently poisoning every later step."""
    import jax.numpy as jnp
    import pytest

    from stereo_depth_estimation_tpu.ops.loss import LossStats
    from stereo_depth_estimation_tpu.training.trainer import run_train_epoch

    def nan_step(state, batch):
        s = jnp.float32
        return state, LossStats(
            nll_sum=jnp.asarray(float("nan"), s),
            abs_err_sum=jnp.asarray(1.0, s),
            sq_err_sum=jnp.asarray(1.0, s),
            sigma_sum=jnp.asarray(1.0, s),
            valid_count=jnp.asarray(10.0, s),
        )

    with pytest.raises(FloatingPointError, match="non-finite"):
        run_train_epoch(
            nan_step, object(), iter([{}, {}]), run=None, global_step=0,
            log_every_batches=2,
        )


def test_offline_evaluate_matches_training_val_metrics(
    dataset_root: Path, tmp_path: Path
) -> None:
    """foundation-stereo-eval on the saved 'last' checkpoint must reproduce
    the val metrics the trainer reported for that epoch (same split seed,
    same eval-mode math)."""
    from stereo_depth_estimation_tpu.eval.evaluate import build_parser, evaluate

    cfg = _config(
        tmp_path, dataset_root=str(dataset_root / "data"),
        epochs=1, preview_samples=0,
    )
    summary = train(cfg)
    ckpt = Path(summary["checkpoints_dir"]) / "last"
    meta = json.loads((ckpt / "meta.json").read_text())

    common = [
        "--dataset-root", str(dataset_root / "data"),
        "--checkpoint", str(ckpt),
        "--height", "32", "--width", "32",
        "--val-fraction", "0.25", "--seed", "42",
        "--batch-size", "4", "--num-workers", "0",
        "--base-channels", "8",
        "--output-dir", str(tmp_path / "eval_out"),
    ]
    # Default --mesh-devices 0 scores over ALL visible devices (the 8-CPU
    # farm here), pad-and-masking the 3-sample tail batch; it must agree
    # with the single-device score AND the trainer's own val metrics.
    result = evaluate(build_parser().parse_args(common))
    assert result["checkpoint_epoch"] == 1
    assert result["split"] == "val"
    np.testing.assert_allclose(
        result["mae"], meta["metrics"]["val_mae"], rtol=1e-5
    )
    np.testing.assert_allclose(
        result["rmse"], meta["metrics"]["val_rmse"], rtol=1e-5
    )
    single = evaluate(build_parser().parse_args(common + ["--mesh-devices", "1"]))
    assert single["valid_pixels"] == result["valid_pixels"]
    # float32 sums reduce in a different order on 8 shards than on 1
    # device; the wobble is ~1e-6 relative (measured 1.16e-6 on this
    # farm), so the gate sits just above it.
    np.testing.assert_allclose(single["mae"], result["mae"], rtol=5e-6)
    np.testing.assert_allclose(single["nll"], result["nll"], rtol=5e-6)


def test_streamed_run_compiles_one_train_and_one_eval_program(
    dataset_root: Path, tmp_path: Path
) -> None:
    """A streamed run whose epoch does NOT divide by the batch size (9
    train samples, batch 4 -> 4,4,1-tail; 3-sample val) must compile
    exactly ONE train and ONE eval executable: pad_batch_to keeps every
    batch at one static shape AND one pytree signature. Regression pin
    for the 220 s-per-tail-shape recompile found driving BASELINE
    config 3 on the v5e (docs/PERF.md 'epoch-tail batches')."""
    cfg = _config(
        tmp_path, dataset_root=str(dataset_root / "data"),
        epochs=2, preview_samples=0,
        aot_cache=str(tmp_path / "aot"),
    )
    summary = train(cfg)
    assert np.isfinite(summary["best_val_mae"])
    blobs = sorted(p.name for p in (tmp_path / "aot").glob("aot_*.bin"))
    assert len(blobs) == 2, (
        f"expected exactly one train + one eval executable, got {blobs}"
    )


def test_device_resident_training(dataset_root: Path, tmp_path: Path) -> None:
    """--device-resident stages the packed cache into device memory and
    trains fully on-device; checkpoints/metrics flow as usual."""
    cfg = _config(
        tmp_path, dataset_root=str(dataset_root / "data"),
        epochs=2, preview_samples=0,
        packed_cache_root=str(tmp_path / "packed"),
        device_resident="on",
    )
    summary = train(cfg)
    assert summary["global_step"] == 2 * (9 // 4)  # 9 train samples, batch 4
    ckpt = Path(summary["checkpoints_dir"]) / "last"
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] == 2
    assert np.isfinite(meta["metrics"]["train_mae"])
    assert np.isfinite(meta["metrics"]["val_mae"])


def test_device_resident_resume(dataset_root: Path, tmp_path: Path) -> None:
    """Resume continues the device-resident schedule: global step keeps
    counting and later epochs see fresh on-device permutations."""
    kw = dict(
        dataset_root=str(dataset_root / "data"), preview_samples=0,
        packed_cache_root=str(tmp_path / "packed"), device_resident="on",
    )
    first = train(_config(tmp_path, epochs=1, **kw))
    resumed = train(_config(
        tmp_path, epochs=2,
        resume=str(Path(first["checkpoints_dir"]) / "last"), **kw,
    ))
    steps_per_epoch = 9 // 4
    assert first["global_step"] == steps_per_epoch
    # Resumed run executes only epoch 2, but the step counter CONTINUES
    # from the carried value (so tracking step ids never repeat).
    assert resumed["global_step"] == 2 * steps_per_epoch
    meta = json.loads(
        (Path(resumed["checkpoints_dir"]) / "last" / "meta.json").read_text()
    )
    assert meta["epoch"] == 2


def test_train_with_cosine_lr_schedule(dataset_root: Path, tmp_path: Path) -> None:
    """--lr-schedule cosine trains end to end (superset of the reference's
    constant lr) and the schedule choice lands in the tracked params."""
    cfg = _config(
        dataset_root,
        epochs=2,
        lr_schedule="cosine",
        lr_warmup_steps=2,
        output_dir=str(tmp_path / "out"),
        mlflow_tracking_uri=str(tmp_path / "t"),
        preview_samples=0,
    )
    summary = train(cfg)
    assert np.isfinite(summary["best_val_mae"])
    # Plain-path URI -> native MLflow FileStore backend: one file per param.
    sched = list(Path(cfg.mlflow_tracking_uri).rglob("params/lr_schedule"))
    assert sched, "lr_schedule param not tracked"
    assert sched[0].read_text().strip() == "cosine"
    warm = list(Path(cfg.mlflow_tracking_uri).rglob("params/lr_warmup_steps"))
    assert warm and warm[0].read_text().strip() == "2"


def test_resume_warns_on_schedule_horizon_drift(
    dataset_root: Path, tmp_path: Path, capsys
) -> None:
    """Resuming a cosine run with the SAME epochs but a different
    batch size moves total_steps = steps_per_epoch x epochs; the warning
    must fire from the carried schedule_total_steps (ADVICE r4: the old
    epochs-only check was silent on exactly this drift)."""
    cfg = _config(
        dataset_root,
        epochs=2,
        lr_schedule="cosine",
        output_dir=str(tmp_path / "out1"),
        mlflow_tracking_uri=str(tmp_path / "t1"),
        preview_samples=0,
    )
    summary1 = train(cfg)
    last = Path(cfg.output_dir) / summary1["run_id"] / "checkpoints" / "last"
    meta = json.loads((last / "meta.json").read_text())
    assert "schedule_total_steps" in meta["metrics"]["resume_carry"]

    capsys.readouterr()
    cfg2 = _config(
        dataset_root,
        epochs=2,  # unchanged — the epochs-only check would stay silent
        batch_size=8,  # 9 train samples: 3 steps/epoch -> 2
        lr_schedule="cosine",
        resume=str(last),
        output_dir=str(tmp_path / "out2"),
        mlflow_tracking_uri=str(tmp_path / "t2"),
        preview_samples=0,
    )
    train(cfg2)
    out = capsys.readouterr().out
    assert "decay horizon" in out

    # Same geometry -> no warning.
    capsys.readouterr()
    cfg3 = _config(
        dataset_root,
        epochs=2,
        lr_schedule="cosine",
        resume=str(last),
        output_dir=str(tmp_path / "out3"),
        mlflow_tracking_uri=str(tmp_path / "t3"),
        preview_samples=0,
    )
    train(cfg3)
    assert "decay horizon" not in capsys.readouterr().out
