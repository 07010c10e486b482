"""Checkpointing: Orbax save/restore with last/best policy, true resume, and
PyTorch .pt interop.

Reference behaviour being matched (train.py:421-436, 601-662): ``last`` every
epoch, ``best`` on new best val MAE, payload = epoch + model + optimizer +
config + metrics. Strict capability superset: the reference cannot resume
training (SURVEY.md §5); here ``load_train_state`` restores the full
TrainState (params, batch_stats, optimizer state, step, rng).

Also provides the live-viewer checkpoint resolution rules
(depth_live_dl.py:170-195): explicit path > run-id > newest-mtime scan.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.compat import apply_legacy_renames, load_torch_state_dict
from ..parallel.train_step import TrainState

_STATE_SUBDIR = "state"


def _to_serializable(state: TrainState) -> TrainState:
    """Typed PRNG keys don't serialize; store raw key data."""
    return state.replace(rng=jax.random.key_data(state.rng))


def _from_serializable(state: TrainState) -> TrainState:
    return state.replace(rng=jax.random.wrap_key_data(state.rng))


def save_checkpoint(
    checkpoint_dir: Path,
    name: str,
    state: TrainState,
    *,
    epoch: int,
    config: dict[str, Any],
    metrics: dict[str, float],
) -> Path:
    """Write ``<checkpoint_dir>/<name>/`` (orbax state + meta.json), atomically
    replacing any previous checkpoint of that name.

    Multihost: every process must call this (orbax's save coordinates across
    processes internally); filesystem bookkeeping — tmp dir, meta.json, the
    atomic rename — happens on process 0 only, which assumes the checkpoint
    directory is on a filesystem process 0 can reach (shared FS on pods)."""
    main = jax.process_index() == 0
    target = Path(checkpoint_dir) / name
    tmp = target.with_name(target.name + ".tmp")
    if main:
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)

    state = jax.device_get(_to_serializable(state))
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save((tmp / _STATE_SUBDIR).resolve(), state, force=True)
    if main:
        (tmp / "meta.json").write_text(
            json.dumps(
                {"epoch": epoch, "config": config, "metrics": metrics,
                 "format": "sde-tpu-orbax-v1"},
                indent=2,
                default=str,
            )
        )
        if target.exists():
            shutil.rmtree(target)
        tmp.rename(target)
    return target


def load_checkpoint_meta(checkpoint_path: Path) -> dict[str, Any]:
    return json.loads((Path(checkpoint_path) / "meta.json").read_text())


def load_train_state(
    checkpoint_path: Path, state_template: TrainState
) -> tuple[TrainState, dict[str, Any]]:
    """Full-fidelity resume: restores every TrainState leaf."""
    path = Path(checkpoint_path)
    with ocp.StandardCheckpointer() as checkpointer:
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, _to_serializable(state_template)
        )
        state = checkpointer.restore((path / _STATE_SUBDIR).resolve(), abstract)
    return _from_serializable(state), load_checkpoint_meta(path)


def load_model_variables(
    checkpoint_path: Path, variables_template: dict[str, Any]
) -> tuple[dict[str, Any], dict[str, Any]]:
    """Load params+batch_stats for inference from either an orbax checkpoint
    directory or a PyTorch ``.pt``/``.pth`` file (reference checkpoints)."""
    path = Path(checkpoint_path)
    if path.is_file() and path.suffix in (".pt", ".pth"):
        return _load_torch_checkpoint(path, variables_template)
    if not (path / _STATE_SUBDIR).exists():
        raise FileNotFoundError(f"Not a checkpoint: {path}")
    with ocp.StandardCheckpointer() as checkpointer:
        template = {
            "params": variables_template["params"],
            "batch_stats": variables_template["batch_stats"],
        }
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            restored = checkpointer.restore(
                (path / _STATE_SUBDIR).resolve(), abstract
            )
        except BaseException:
            # Full TrainState checkpoint: restore everything, take the model.
            full = checkpointer.restore((path / _STATE_SUBDIR).resolve())
            restored = {
                "params": full["params"], "batch_stats": full["batch_stats"]
            }
    meta = (
        load_checkpoint_meta(path) if (path / "meta.json").exists() else {}
    )
    return restored, meta


def _load_torch_checkpoint(
    path: Path, variables_template: dict[str, Any]
) -> tuple[dict[str, Any], dict[str, Any]]:
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(checkpoint, dict):
        raise ValueError(f"Unexpected checkpoint format in {path}.")
    if "model_state_dict" in checkpoint:
        state_dict = checkpoint["model_state_dict"]
        epoch = int(checkpoint.get("epoch", -1))
    else:
        state_dict = checkpoint
        epoch = -1
    state_dict = apply_legacy_renames(state_dict)
    variables, missing, unexpected = load_torch_state_dict(
        variables_template, state_dict
    )
    meta = {
        "epoch": epoch,
        "source": "torch",
        "missing_keys": missing,
        "unexpected_keys": unexpected,
        "has_uncertainty_head": "logvar_head.weight" in state_dict,
    }
    return variables, meta


def resolve_checkpoint_path(
    output_dir: Path,
    *,
    checkpoint: Path | None = None,
    run_id: str | None = None,
    checkpoint_name: str = "last",
) -> Path:
    """Explicit path > run-id > newest-mtime scan over outputs/*/checkpoints."""
    if checkpoint is not None:
        resolved = Path(checkpoint).expanduser().resolve()
        if not resolved.exists():
            raise FileNotFoundError(f"Checkpoint not found: {resolved}")
        return resolved

    output_dir = Path(output_dir).expanduser().resolve()
    if run_id:
        candidate = output_dir / run_id / "checkpoints" / checkpoint_name
        if not candidate.exists():
            raise FileNotFoundError(f"Checkpoint not found: {candidate}")
        return candidate

    candidates: list[Path] = []
    if output_dir.exists():
        for run_dir in output_dir.iterdir():
            candidate = run_dir / "checkpoints" / checkpoint_name
            if candidate.exists():
                candidates.append(candidate)
    if not candidates:
        raise FileNotFoundError(
            f"No checkpoint {checkpoint_name} found under {output_dir}. "
            "Pass --checkpoint or --run-id."
        )
    return max(candidates, key=_checkpoint_mtime_ns)


def _checkpoint_mtime_ns(path: Path) -> int:
    """mtime of a checkpoint (dir-based checkpoints use their meta file)."""
    meta = path / "meta.json"
    probe = meta if meta.exists() else path
    return probe.stat().st_mtime_ns


def checkpoint_mtime_ns(path: Path) -> int:
    return _checkpoint_mtime_ns(Path(path))
