"""Experiment tracking: MLflow when available, JSONL fallback otherwise.

The reference treats MLflow as its observability backbone (train.py:580-681:
params, step metrics every 10 batches, epoch metrics, artifacts, tags). This
module keeps that exact logging surface behind one small API; when mlflow is
not importable (as in this CI image) runs land in a local directory as JSONL
+ copied artifacts, preserving every capability (params/metrics/artifacts/
tags, run ids) without the dependency.
"""

from __future__ import annotations

import json
import shutil
import time
import uuid
from pathlib import Path
from typing import Any, Mapping

try:  # pragma: no cover - exercised only where mlflow is installed
    import mlflow as _mlflow
except ImportError:
    _mlflow = None


class TrackingRun:
    """One active run. All methods mirror the mlflow calls the reference makes."""

    def __init__(
        self,
        tracking_uri: str,
        experiment: str,
        run_name: str | None,
        *,
        force_local: bool = False,
    ) -> None:
        self._use_mlflow = _mlflow is not None and not force_local
        self.run_id: str
        if self._use_mlflow:
            _mlflow.set_tracking_uri(tracking_uri)
            _mlflow.set_experiment(experiment)
            self._active = _mlflow.start_run(run_name=run_name)
            self.run_id = self._active.info.run_id
        else:
            self.run_id = uuid.uuid4().hex
            base = tracking_uri
            for prefix in ("sqlite:///", "file://", "jsonl://"):
                if base.startswith(prefix):
                    base = base[len(prefix):]
            root = Path(base).parent if base.endswith(".db") else Path(base)
            self._dir = root / "tracking" / experiment / self.run_id
            self._dir.mkdir(parents=True, exist_ok=True)
            self._metrics_file = (self._dir / "metrics.jsonl").open("a")
            (self._dir / "run.json").write_text(
                json.dumps(
                    {"run_name": run_name, "experiment": experiment,
                     "started_at_unix": time.time()},
                    indent=2,
                )
            )
            self._params: dict[str, Any] = {}
            self._tags: dict[str, Any] = {}

    # --- mlflow-parity surface -------------------------------------------
    def log_params(self, params: Mapping[str, Any]) -> None:
        if self._use_mlflow:
            _mlflow.log_params(dict(params))
        else:
            self._params.update(params)
            (self._dir / "params.json").write_text(
                json.dumps(self._params, indent=2, default=str)
            )

    def log_metrics(self, metrics: Mapping[str, float], step: int) -> None:
        if self._use_mlflow:
            _mlflow.log_metrics(dict(metrics), step=step)
        else:
            self._metrics_file.write(
                json.dumps(
                    {"step": step, "time": time.time(),
                     **{k: float(v) for k, v in metrics.items()}}
                )
                + "\n"
            )
            self._metrics_file.flush()

    def log_artifact(self, path: str | Path, artifact_path: str | None = None) -> None:
        if self._use_mlflow:
            _mlflow.log_artifact(str(path), artifact_path=artifact_path)
        else:
            dest = self._dir / "artifacts" / (artifact_path or "")
            dest.mkdir(parents=True, exist_ok=True)
            shutil.copy2(path, dest / Path(path).name)

    def log_artifacts(self, directory: str | Path, artifact_path: str | None = None) -> None:
        if self._use_mlflow:
            _mlflow.log_artifacts(str(directory), artifact_path=artifact_path)
        else:
            dest = self._dir / "artifacts" / (artifact_path or "")
            shutil.copytree(directory, dest, dirs_exist_ok=True)

    def set_tag(self, key: str, value: Any) -> None:
        if self._use_mlflow:
            _mlflow.set_tag(key, value)
        else:
            self._tags[key] = value
            (self._dir / "tags.json").write_text(
                json.dumps(self._tags, indent=2, default=str)
            )

    def end(self) -> None:
        if self._use_mlflow:
            _mlflow.end_run()
        else:
            self._metrics_file.close()

    def __enter__(self) -> "TrackingRun":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.end()

    @property
    def backend(self) -> str:
        return "mlflow" if self._use_mlflow else "jsonl"
