"""Multihost trainer END-TO-END: 2 processes x 4 virtual CPU devices run
``trainer.train()`` to completion on a shared filesystem.

This covers the orchestration layer that test_multihost.py (step/batcher
equivalence) does not: coordinated orbax checkpoint saves, process-0-only
tracking (_NullRun on followers), the packed-cache build-and-wait handshake
(process 0 builds, the follower polls for a fingerprint-matching manifest),
and per-epoch preview montages from replicated state."""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np

pytestmark = pytest.mark.slow  # multi-process gloo farm e2e; fast tier runs with -m 'not slow'


REPO = Path(__file__).resolve().parent.parent
PORT = 19000 + (os.getpid() % 2000)

_CHILD = textwrap.dedent(
    """
    import os, sys, json
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    root = sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    cfg = TrainConfig(
        dataset_root=os.path.join(root, "data"),
        height=32, width=32, epochs=2, batch_size=4,
        val_fraction=0.25, seed=42, device="cpu", mesh_devices=0,
        compute_dtype="float32", base_channels=4,
        packed_cache_root=os.path.join(root, "packed"),
        mlflow_tracking_uri=os.path.join(root, "mlruns"),
        output_dir=os.path.join(root, "outputs"),
        preview_samples=2, log_every_batches=2,
        multihost=True, coordinator_address=f"127.0.0.1:{{port}}",
        num_processes=nproc, process_id=pid,
    )
    summary = train(cfg)
    print("SUMMARY " + json.dumps({{"pid": pid, **summary}}), flush=True)
    """
).format(repo=str(REPO))


def _make_dataset(root: Path, n: int = 12, shape=(32, 32)) -> None:
    rng = np.random.default_rng(0)
    base = root / "scene_01" / "dataset" / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (base / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        stem = f"{i:06d}"
        Image.fromarray(
            rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
        ).save(base / "left/rgb" / f"{stem}.png")
        Image.fromarray(
            rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
        ).save(base / "right/rgb" / f"{stem}.png")
        disparity = rng.uniform(0.5, 20.0, shape).astype(np.float32)
        Image.fromarray(disparity_encode_np(disparity)).save(
            base / "left/disparity" / f"{stem}.png"
        )


def test_two_process_trainer_end_to_end(tmp_path: Path) -> None:
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _make_dataset(tmp_path / "data")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(i), "2", str(PORT), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    summaries = {}
    outputs = {}
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, out[-4000:]
        line = [ln for ln in out.splitlines() if ln.startswith("SUMMARY ")][0]
        summary = json.loads(line[len("SUMMARY "):])
        summaries[summary.pop("pid")] = summary
        outputs[len(outputs)] = out

    # Both processes agree on the outcome (replicated state, global metrics).
    assert summaries[0]["best_epoch"] == summaries[1]["best_epoch"]
    np.testing.assert_allclose(
        summaries[0]["best_val_mae"], summaries[1]["best_val_mae"], rtol=1e-6
    )
    assert summaries[0]["global_step"] == summaries[1]["global_step"] > 0

    # Only process 0 tracked the run; the follower used the null sink.
    assert summaries[1]["run_id"] == "multihost-follower"
    run_id = summaries[0]["run_id"]
    assert run_id != "multihost-follower"

    # Coordinated orbax checkpoints exist and carry epoch-2 metadata.
    run_dir = tmp_path / "outputs" / run_id
    for name in ("last", "best"):
        meta = json.loads(
            (run_dir / "checkpoints" / name / "meta.json").read_text()
        )
        assert meta["epoch"] in (1, 2)
        assert np.isfinite(meta["metrics"]["val_mae"])

    # Preview montages were logged EVERY epoch (reference train.py:640-651),
    # multihost included.
    for epoch in (1, 2):
        previews = list(
            (run_dir / "mlflow_previews" / f"epoch_{epoch:04d}").glob("*.png")
        )
        assert len(previews) == 2, (epoch, previews)

    # The packed cache was built exactly once (by process 0) and the
    # follower waited for the fingerprint-matching manifest rather than
    # racing the build.
    meta = json.loads((tmp_path / "packed" / "train" / "meta.json").read_text())
    assert meta["num_samples"] == 9  # 12 samples, val_fraction 0.25
    assert "split_fingerprint" in meta
    assert outputs[0].count("Building packed cache") + outputs[1].count(
        "Building packed cache"
    ) == 2  # train + val, one builder total across both processes

    # FileStore-format tracking landed once, with step and epoch metrics.
    metric_files = list((tmp_path / "mlruns").glob("*/*/metrics/*"))
    keys = {p.name for p in metric_files}
    assert {"train_loss_step", "train_loss", "val_mae", "epoch_seconds"} <= keys
    run_dirs = {p.parent.parent for p in metric_files}
    assert len(run_dirs) == 1


_AOT_CHILD = textwrap.dedent(
    """
    import os, sys, json
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    root = sys.argv[4]; tag = sys.argv[5]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    cfg = TrainConfig(
        dataset_root=os.path.join(root, "data"),
        height=32, width=32, epochs=1, batch_size=4,
        val_fraction=0.25, seed=42, device="cpu", mesh_devices=0,
        compute_dtype="float32", base_channels=4,
        packed_cache_root=os.path.join(root, "packed"),
        mlflow_tracking_uri=os.path.join(root, "mlruns_" + tag),
        output_dir=os.path.join(root, "outputs_" + tag),
        preview_samples=0, log_every_batches=2,
        aot_cache=os.path.join(root, "aot"), aot_cache_multihost=True,
        multihost=True, coordinator_address=f"127.0.0.1:{{port}}",
        num_processes=nproc, process_id=pid,
    )
    summary = train(cfg)
    print("SUMMARY " + json.dumps({{"pid": pid, **summary}}), flush=True)
    """
).format(repo=str(REPO))


def _run_aot_farm(tmp_path: Path, tag: str, port: int) -> tuple[dict, dict]:
    from stereo_depth_estimation_tpu.parallel.distributed import run_process_farm

    farm = run_process_farm(
        _AOT_CHILD,
        lambda i: [str(i), "2", str(port), str(tmp_path), tag],
        result_prefix="SUMMARY ",
        cwd=str(REPO),
    )
    summaries, outputs = {}, {}
    for line, out in farm:
        summary = json.loads(line)
        summaries[summary.pop("pid")] = summary
        outputs[len(outputs)] = out
    return summaries, outputs


def test_two_process_trainer_aot_cache_reuse(tmp_path: Path) -> None:
    """--aot-cache-multihost: the first 2-process run compiles and saves
    per-(topology, process_id) executables; a second identical run LOADS
    them (pid-0 stderr says 'aot-cache') and reproduces the fresh-compile
    metrics exactly. Keying is visible in the blob count: train+eval per
    process -> at least 4 distinct digests (2 without process keying)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _make_dataset(tmp_path / "data")

    first, _ = _run_aot_farm(tmp_path, "a", PORT + 7)
    blobs = list((tmp_path / "aot").glob("aot_*.bin"))
    assert len(blobs) >= 4, [b.name for b in blobs]

    second, outputs = _run_aot_farm(tmp_path, "b", PORT + 8)
    assert "aot-cache" in outputs[0] + outputs[1]
    np.testing.assert_allclose(
        first[0]["best_val_mae"], second[0]["best_val_mae"], rtol=1e-6
    )
    assert first[0]["global_step"] == second[0]["global_step"] > 0
