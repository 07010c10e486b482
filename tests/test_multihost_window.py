"""Multihost HBM-windowed device-resident training: the window staging
path (parallel/distributed.py::stage_rows_multihost) must produce the
SAME training run across process topologies.

Both children train on an 8-device global mesh with the packed cache
device-resident in ROTATING window mode (budget forced below the set
size, so windows stage repeatedly through the double-buffered producer):
one child as a single process owning all 8 virtual devices, the other as
2 coordinated processes x 4 devices. The window permutations derive from
the shared seed and the in-window gather is shard-local, so the runs are
step-for-step identical — final metrics must agree to float
reproducibility."""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-process gloo farm e2e; fast tier runs with -m 'not slow'


REPO = Path(__file__).resolve().parent.parent
PORT = 21100 + (os.getpid() % 2000)

# The 40-sample dataset splits to 32 train samples of 8192 packed bytes
# (262144 B total); a 196608 B aggregate budget is below that, and its
# staging half (98304 B) holds exactly one 8-sample batch window ->
# "rotating 4 windows" (see trainer log).
WINDOW_GB = 196608 / 8 / (1 << 30)

_CHILD = textwrap.dedent(
    """
    import os, sys, json
    mode = sys.argv[1]          # "single" | "multi"
    pid = int(sys.argv[2]); port = sys.argv[3]; root = sys.argv[4]
    ndev = 8 if mode == "single" else 4
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={{ndev}}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    cfg = TrainConfig(
        dataset_root=os.path.join(root, "data"),
        height=32, width=32, epochs=2, batch_size=8,
        val_fraction=0.2, seed=42, device="cpu", mesh_devices=0,
        compute_dtype="float32", base_channels=4,
        packed_cache_root=os.path.join(root, "packed-" + mode),
        device_resident="on", hbm_window_gb={window_gb!r},
        mlflow_tracking_uri=os.path.join(root, "mlruns-" + mode),
        output_dir=os.path.join(root, "outputs-" + mode),
        preview_samples=0, log_every_batches=10,
        multihost=mode == "multi",
        coordinator_address=f"127.0.0.1:{{port}}",
        num_processes=2 if mode == "multi" else 1, process_id=pid,
    )
    summary = train(cfg)
    print("SUMMARY " + json.dumps({{"pid": pid, **summary}}), flush=True)
    """
).format(repo=str(REPO), window_gb=WINDOW_GB)


def _run(args: list[str], tmp_path: Path) -> list[tuple[dict, str]]:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, *argv, str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for argv in args
    ]
    results = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, out[-4000:]
        line = [ln for ln in out.splitlines() if ln.startswith("SUMMARY ")][0]
        results.append((json.loads(line[len("SUMMARY "):]), out))
    return results


def test_multihost_windowed_matches_single_process(tmp_path: Path) -> None:
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).parent))
    from test_multihost_trainer import _make_dataset

    _make_dataset(tmp_path / "data", n=40)

    [(single, single_out)] = _run([["single", "0", "0"]], tmp_path)
    (multi0, multi_out0), (multi1, _) = _run(
        [["multi", "0", str(PORT)], ["multi", "1", str(PORT)]], tmp_path
    )

    # Both topologies actually took the windowed device-resident path in
    # ROTATING mode (the claim under test — a silent fallback to streaming
    # would also "match").
    for out in (single_out, multi_out0):
        assert "Device-resident training" in out, out[-2000:]
        assert "rotating 4 windows" in out, out[-2000:]

    # 32 train samples / batch 8 = 4 steps/epoch x 2 epochs.
    assert single["global_step"] == multi0["global_step"] == 8

    # Same mesh, same seed, same windows -> the runs are the same program;
    # metrics agree across process topologies and across the multihost
    # pair's replicated state.
    np.testing.assert_allclose(
        single["best_val_mae"], multi0["best_val_mae"], rtol=1e-6
    )
    np.testing.assert_allclose(
        multi0["best_val_mae"], multi1["best_val_mae"], rtol=1e-6
    )
    assert single["best_epoch"] == multi0["best_epoch"]
