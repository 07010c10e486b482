"""Minimal mlflow API stub for driving the UNMODIFIED reference trainer in
environments where the real mlflow package is not installed (this image).

Implements exactly the surface the reference trainer touches
(reference train.py:580-681): set_tracking_uri / set_experiment /
start_run / active_run / log_params / log_metrics / log_artifact(s) /
set_tag. Every call is appended as one JSON line to the file named by
``$REF_MLFLOW_JSONL`` (default ``ref_mlflow_events.jsonl``) so the
convergence harness (scripts/convergence_run.py) can extract the
reference's per-epoch metric trajectory.

This is test harness code, NOT the framework's tracking backend — that is
``stereo_depth_estimation_tpu/training/tracking.py``.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any

_EVENTS_PATH = os.environ.get("REF_MLFLOW_JSONL", "ref_mlflow_events.jsonl")
_RUN_ID = "refstub-" + hex(int(time.time() * 1e6))[2:]


class _RunInfo:
    def __init__(self, run_id: str) -> None:
        self.run_id = run_id


class _Run:
    def __init__(self, run_id: str) -> None:
        self.info = _RunInfo(run_id)


_ACTIVE: _Run | None = None


def _emit(event: str, **payload: Any) -> None:
    record = {"event": event, "time": time.time(), **payload}
    with open(_EVENTS_PATH, "a", encoding="utf-8") as fh:
        fh.write(json.dumps(record, default=str) + "\n")


def set_tracking_uri(uri: str) -> None:
    _emit("set_tracking_uri", uri=uri)


def set_experiment(name: str) -> None:
    _emit("set_experiment", name=name)


@contextmanager
def start_run(run_name: str | None = None):
    global _ACTIVE
    _ACTIVE = _Run(_RUN_ID)
    _emit("start_run", run_name=run_name, run_id=_RUN_ID)
    try:
        yield _ACTIVE
    finally:
        _emit("end_run", run_id=_RUN_ID)
        _ACTIVE = None


def active_run() -> _Run | None:
    return _ACTIVE


def log_params(params: dict) -> None:
    _emit("log_params", params=params)


def log_metrics(metrics: dict, step: int | None = None) -> None:
    _emit("log_metrics", metrics=metrics, step=step)


def log_artifact(path: str, artifact_path: str | None = None) -> None:
    _emit("log_artifact", path=path, artifact_path=artifact_path)


def log_artifacts(path: str, artifact_path: str | None = None) -> None:
    _emit("log_artifacts", path=path, artifact_path=artifact_path)


def set_tag(key: str, value: Any) -> None:
    _emit("set_tag", key=key, value=value)
