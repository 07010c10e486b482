"""MLflow tracking-backend conformance.

The native FileStore writer (training/mlflow_filestore.py) must produce the
exact on-disk layout MLflow's FileStore backend reads (mlflow
``store/tracking/file_store.py``): per-experiment and per-run ``meta.yaml``
with the documented field names/types, one append-only file per metric key
with ``"<timestamp_ms> <value> <step>"`` lines, one file per param/tag, and
an ``artifacts/`` dir. Where the real mlflow package is importable, an
equivalence test replays the same logging through it and compares trees
(skipped on images without mlflow, like this CI)."""

import json
from pathlib import Path

import pytest
import yaml

from stereo_depth_estimation_tpu.training.mlflow_filestore import (
    MlflowFileStore,
    filestore_root_for_uri,
)
from stereo_depth_estimation_tpu.training.tracking import TrackingRun


def _do_reference_logging(run: TrackingRun, tmp_path: Path) -> None:
    """The logging sequence the reference trainer performs (train.py:596-681)."""
    run.log_params({"epochs": 2, "lr": 0.001, "loss": "heteroscedastic_l1_nll"})
    for step in (10, 20):
        run.log_metrics({"train_loss_step": 1.5 / step, "train_mae_step": 0.5}, step)
    run.log_metrics({"train_loss": 0.9, "val_mae": 0.4, "epoch_seconds": 3.2}, 1)
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"epochs": 2}))
    run.log_artifact(cfg)
    run.set_tag("best_epoch", 1)
    run.set_tag("best_val_mae", 0.4)


def test_filestore_layout_matches_mlflow_format(tmp_path: Path) -> None:
    root = tmp_path / "mlruns"
    run = TrackingRun(str(root), "exp-a", "my-run")
    assert run.backend == "filestore"
    with run:
        _do_reference_logging(run, tmp_path)

    # Experiment meta.yaml: the fields FileStore.get_experiment reads.
    exp_dirs = [d for d in root.iterdir() if d.is_dir() and d.name != ".trash"]
    assert len(exp_dirs) == 1
    exp_meta = yaml.safe_load((exp_dirs[0] / "meta.yaml").read_text())
    assert exp_meta["name"] == "exp-a"
    assert exp_meta["experiment_id"] == exp_dirs[0].name
    assert isinstance(exp_meta["experiment_id"], str)  # quoting survives yaml
    assert exp_meta["lifecycle_stage"] == "active"
    assert exp_meta["artifact_location"].startswith("file://")
    assert isinstance(exp_meta["creation_time"], int)
    assert isinstance(exp_meta["last_update_time"], int)

    # Run meta.yaml: the fields FileStore._get_run_info reads.
    run_dir = exp_dirs[0] / run.run_id
    run_meta = yaml.safe_load((run_dir / "meta.yaml").read_text())
    assert run_meta["run_id"] == run_meta["run_uuid"] == run.run_id
    assert len(run.run_id) == 32  # hex uuid like mlflow's
    assert run_meta["run_name"] == "my-run"
    assert run_meta["experiment_id"] == exp_dirs[0].name
    assert run_meta["lifecycle_stage"] == "active"
    assert run_meta["status"] == 3  # RunStatus.FINISHED after end()
    assert isinstance(run_meta["start_time"], int)
    assert isinstance(run_meta["end_time"], int)
    assert run_meta["end_time"] >= run_meta["start_time"]
    assert run_meta["artifact_uri"].startswith("file://")

    # Metrics: one file per key, "<ts_ms> <value> <step>" per line.
    lines = (run_dir / "metrics" / "train_loss_step").read_text().splitlines()
    assert len(lines) == 2
    for line, expected_step in zip(lines, (10, 20)):
        ts, value, step = line.split(" ")
        assert int(ts) > 1_000_000_000_000  # epoch millis, not seconds
        float(value)
        assert int(step) == expected_step
    assert (run_dir / "metrics" / "val_mae").exists()
    assert (run_dir / "metrics" / "epoch_seconds").exists()

    # Params and tags: one file per key, value as the single line.
    assert (run_dir / "params" / "lr").read_text() == "0.001\n"
    assert (run_dir / "params" / "loss").read_text() == "heteroscedastic_l1_nll\n"
    assert (run_dir / "tags" / "best_epoch").read_text() == "1\n"
    # mlflow writes the run name as a reserved tag too.
    assert (run_dir / "tags" / "mlflow.runName").read_text() == "my-run\n"

    # Artifacts land under artifacts/.
    assert (run_dir / "artifacts" / "config.json").exists()


def test_filestore_experiment_reuse_and_determinism(tmp_path: Path) -> None:
    """Two runs in the same experiment share one experiment dir, and two
    store instances (e.g. multihost processes) agree on the id without
    coordination."""
    store_a = MlflowFileStore(tmp_path / "mlruns")
    store_b = MlflowFileStore(tmp_path / "mlruns")
    id_a = store_a.get_or_create_experiment("shared-exp")
    id_b = store_b.get_or_create_experiment("shared-exp")
    assert id_a == id_b
    run1 = store_a.start_run("shared-exp", "r1")
    run2 = store_b.start_run("shared-exp", "r2")
    assert run1.run_id != run2.run_id
    exp_dirs = [
        d for d in (tmp_path / "mlruns").iterdir()
        if d.is_dir() and d.name != ".trash"
    ]
    assert len(exp_dirs) == 1
    assert {run1.run_id, run2.run_id} <= {p.name for p in exp_dirs[0].iterdir()}


def test_uri_mapping() -> None:
    assert filestore_root_for_uri("file:///tmp/x/mlruns") == Path("/tmp/x/mlruns")
    assert filestore_root_for_uri("/tmp/plain") == Path("/tmp/plain")
    # sqlite needs the mlflow package; degrade to a sibling mlruns dir.
    assert filestore_root_for_uri("sqlite:////srv/db/mlflow.db") == Path(
        "/srv/db/mlruns"
    )
    assert filestore_root_for_uri("http://tracking.example") is None


def test_jsonl_is_explicit_opt_in(tmp_path: Path) -> None:
    run = TrackingRun(f"jsonl://{tmp_path / 'logs'}", "exp", "n")
    assert run.backend == "jsonl"
    with run:
        run.log_metrics({"m": 1.0}, step=1)
    assert list((tmp_path / "logs").rglob("metrics.jsonl"))


def test_yaml_quoting_of_tricky_names(tmp_path: Path) -> None:
    """Digit-only and specially-charactered names must survive a
    yaml.safe_load round trip as strings (mlflow quotes them too)."""
    store = MlflowFileStore(tmp_path / "mlruns")
    exp_id = store.get_or_create_experiment("12345")
    meta = yaml.safe_load((tmp_path / "mlruns" / exp_id / "meta.yaml").read_text())
    assert meta["name"] == "12345"
    assert isinstance(meta["name"], str)

    run = store.start_run("exp: with colon 'quotes'", None)
    run_meta = yaml.safe_load((run.run_dir / "meta.yaml").read_text())
    assert isinstance(run_meta["run_name"], str)


def test_filestore_tree_matches_real_mlflow(tmp_path: Path) -> None:
    """Replay one logging sequence through the real mlflow package and this
    writer; the resulting FileStore trees must agree on structure and
    content. Runs only where mlflow is installed."""
    mlflow = pytest.importorskip("mlflow")

    theirs_root = tmp_path / "theirs"
    mlflow.set_tracking_uri(theirs_root.as_uri())
    mlflow.set_experiment("conformance")
    with mlflow.start_run(run_name="r"):
        mlflow.log_params({"lr": 0.001})
        mlflow.log_metrics({"m": 1.5}, step=10)
        mlflow.set_tag("k", "v")

    ours_root = tmp_path / "ours"
    run = TrackingRun(str(ours_root), "conformance", "r", force_local=False)
    # force the filestore branch even though mlflow is importable
    run._backend = "filestore"
    run._store = MlflowFileStore(ours_root)
    run._run = run._store.start_run("conformance", "r")
    with run:
        run.log_params({"lr": 0.001})
        run.log_metrics({"m": 1.5}, step=10)
        run.set_tag("k", "v")

    def normalize(root: Path) -> dict:
        exp = next(
            d for d in root.iterdir()
            if d.is_dir() and not d.name.startswith(".") and d.name != "models"
        )
        run_dir = next(d for d in exp.iterdir() if d.is_dir())
        meta = yaml.safe_load((run_dir / "meta.yaml").read_text())
        metric = (run_dir / "metrics" / "m").read_text().split()
        return {
            "param_lr": (run_dir / "params" / "lr").read_text().strip(),
            "tag_k": (run_dir / "tags" / "k").read_text().strip(),
            "metric_value": float(metric[1]),
            "metric_step": int(metric[2]),
            "status": meta["status"],
            "lifecycle_stage": meta["lifecycle_stage"],
        }

    assert normalize(theirs_root) == normalize(ours_root)
