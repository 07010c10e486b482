"""Convergence evidence harness (VERDICT r3 task #1).

Two modes, each writing committed artifacts under ``docs/convergence/``:

``tpu``
    The real thing: train the full-size reference-spec model (base=32,
    240x320, batch 128, augmentation on, bf16 compute, packed cache +
    device-resident pipeline) for many epochs on a substantial synthetic
    stereo dataset (scripts/make_synth_dataset.py — layered fronto-parallel
    scenes with exact ground truth) on the attached TPU. Artifacts: the
    per-epoch train/val metric trajectory (tpu_metrics.json) and preview
    montages from the first and last epochs.

``compare``
    Cross-framework trajectory check: run the UNMODIFIED reference trainer
    (torch CPU; mlflow/torchvision satisfied by scripts/ref_shims) and this
    framework's trainer on IDENTICAL data from IDENTICAL initial weights
    (the torch init exported to .pt and loaded via --init-checkpoint),
    augmentation off, float32 both sides, same optimizer/schedule. Writes
    compare.json with both per-epoch trajectories and their deltas.
    Reference wiring being reproduced: train.py:607-662 (epoch loop,
    best-val-MAE checkpointing).

Usage:
    python scripts/convergence_run.py tpu --epochs 30 --samples 2048
    python scripts/convergence_run.py compare --epochs 5 --samples 128
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DOCS = REPO / "docs" / "convergence"


def _log(msg: str) -> None:
    print(f"[convergence] {msg}", flush=True)


def _read_jsonl_metrics(tracking_dir: Path) -> list[dict]:
    """Merge every metrics.jsonl under the jsonl tracking dir -> epoch
    records (step-metric records, which carry train_* keys only, are
    filtered out by requiring epoch_seconds). Merging handles resumed
    runs, where epochs 1..k live in the interrupted run's file and
    k+1..N in the resumed run's; for a duplicated epoch the newest
    file's record wins."""
    candidates = sorted(
        tracking_dir.rglob("metrics.jsonl"), key=lambda p: p.stat().st_mtime
    )
    if not candidates:
        raise FileNotFoundError(f"No metrics.jsonl under {tracking_dir}")
    by_epoch: dict[int, dict] = {}
    for path in candidates:  # oldest first; newer files overwrite
        for line in path.read_text().splitlines():
            if not line.strip():
                continue
            r = json.loads(line)
            if "epoch_seconds" in r:
                by_epoch[int(r["step"])] = r
    return list(by_epoch.values())


def _epoch_series(records: list[dict], keys: tuple[str, ...]) -> dict:
    series: dict[str, list] = {"epoch": []}
    for key in keys:
        series[key] = []
    for r in sorted(records, key=lambda r: r["step"]):
        series["epoch"].append(int(r["step"]))
        for key in keys:
            series[key].append(round(float(r[key]), 5) if key in r else None)
    return series


METRIC_KEYS = ("train_loss", "train_mae", "val_loss", "val_mae", "val_rmse")


# --------------------------------------------------------------------------
# tpu mode
# --------------------------------------------------------------------------

def run_tpu(args: argparse.Namespace) -> None:
    from scripts.make_synth_dataset import generate

    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    work = Path(args.workdir)
    data = work / "data"
    hw = (args.height, args.width)
    meta_path = data / "synth_meta.json"
    if meta_path.exists():
        existing = json.loads(meta_path.read_text())["samples"]
        if existing != args.samples:
            raise SystemExit(
                f"{data} holds {existing} samples but --samples="
                f"{args.samples}; pick a fresh --workdir (reusing a "
                "differently-sized dataset would silently change the run)."
            )
    else:
        _log(f"generating {args.samples} samples at 240x320 ...")
        # Data is ALWAYS generated at the reference resolution; fast-mode
        # runs resize on load with exact width-scaled disparity
        # (ops/resize.py), like the reference's --height/--width.
        meta = generate(data, args.samples, 8, (240, 320), 48.0, seed=0)
        _log(f"dataset ready in {meta['elapsed_seconds']}s")

    trk = work / "tracking"
    if trk.exists() and not args.resume_from:
        shutil.rmtree(trk)
    cfg = TrainConfig(
        dataset_root=str(data),
        height=hw[0], width=hw[1],
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=1e-3, weight_decay=1e-4,
        val_fraction=0.1, seed=42,
        augment=True,
        compute_dtype="bfloat16",
        packed_cache_root=str(work / "packed"),
        device_resident="auto",
        output_dir=str(work / "outputs"),
        mlflow_tracking_uri=f"jsonl://{trk}",
        preview_samples=args.preview_samples,
        num_workers=0,
        init_checkpoint=args.init_checkpoint,
        lr_schedule=args.lr_schedule,
        lr_warmup_steps=args.lr_warmup_steps,
        resume=args.resume_from or "",
    )
    _log(f"training base=32 {hw} batch={args.batch_size} "
         f"for {args.epochs} epochs ...")
    t0 = time.perf_counter()
    summary = train(cfg)
    train_seconds = time.perf_counter() - t0
    _log(f"train() done in {train_seconds:.0f}s: {summary}")

    records = _read_jsonl_metrics(trk)
    series = _epoch_series(records, METRIC_KEYS)
    DOCS.mkdir(parents=True, exist_ok=True)
    artifact = {
        "config": {
            "model": "StereoUNet base=32 (7,763,938 params)",
            "resolution": list(hw),
            "batch_size": args.batch_size,
            "epochs": args.epochs,
            "samples": args.samples,
            "augment": True,
            "compute_dtype": "bfloat16",
            "optimizer": "AdamW lr=1e-3 wd=1e-4",
            "lr_schedule": args.lr_schedule,
            "lr_warmup_steps": args.lr_warmup_steps,
            "dataset": "scripts/make_synth_dataset.py (seed 0)",
            "pipeline": "packed cache + device-resident",
            "init_checkpoint": args.init_checkpoint,
            "resumed_from": args.resume_from,
        },
        "wall_seconds": round(train_seconds, 1),
        # Best over the MERGED series, so a --resume-from artifact reports
        # the run's global best even against pre-resume-carry checkpoints
        # (the trainer summary also carries the global best for new ones).
        "best_epoch": min(
            zip(series["val_mae"], series["epoch"]),
            default=(summary["best_val_mae"], summary["best_epoch"]),
            key=lambda t: float("inf") if t[0] is None else t[0],
        )[1],
        "best_val_mae": round(
            min(
                (m for m in series["val_mae"] if m is not None),
                default=float(summary["best_val_mae"]),
            ),
            5,
        ),
        "series": series,
    }
    out_name = f"tpu_metrics{args.tag}.json"
    (DOCS / out_name).write_text(json.dumps(artifact, indent=2))
    _log(f"wrote {DOCS / out_name}")

    # First/last epoch preview montages (sample 0) as visual evidence. A
    # resumed run's outputs start at the resume epoch, so it must not
    # overwrite the interrupted run's REAL first-epoch montage.
    previews = work / "outputs" / summary["run_id"] / "mlflow_previews"
    if previews.exists():
        epochs_dirs = sorted(previews.iterdir())
        for tag, src_dir in (("first", epochs_dirs[0]), ("last", epochs_dirs[-1])):
            dest = f"tpu_preview{args.tag}_{tag}_epoch.png"
            if tag == "first" and args.resume_from and (DOCS / dest).exists():
                _log(f"kept pre-resume {dest}")
                continue
            pngs = sorted(src_dir.glob("*.png"))
            if pngs:
                shutil.copy2(pngs[0], DOCS / dest)
                _log(f"copied {pngs[0].name} -> {dest}")
    print(json.dumps({"best_val_mae": artifact["best_val_mae"],
                      "best_epoch": artifact["best_epoch"],
                      "first_val_mae": series["val_mae"][0],
                      "last_val_mae": series["val_mae"][-1]}))


# --------------------------------------------------------------------------
# compare mode
# --------------------------------------------------------------------------

def _reference_env() -> dict:
    env = os.environ.copy()
    env["PYTHONPATH"] = (
        f"{REPO / 'scripts' / 'ref_shims'}:/root/reference/src"
    )
    return env


def _export_reference_init(work: Path, seed: int) -> Path:
    """Replicate the reference main()'s RNG order (set_seed -> StereoUNet(),
    train.py:214-219,576 — nothing between them consumes torch RNG) in a
    clean subprocess and save the init weights."""
    init_pt = work / "ref_init.pt"
    code = (
        "import torch\n"
        "from foundation_stereo_depth.train import set_seed\n"
        "from foundation_stereo_depth.model import StereoUNet\n"
        f"set_seed({seed})\n"
        "model = StereoUNet()\n"
        "torch.save({'model_state_dict': model.state_dict(), 'epoch': 0}, "
        f"{str(init_pt)!r})\n"
        "print('init saved')\n"
    )
    subprocess.run(
        [sys.executable, "-c", code], env=_reference_env(), check=True,
        cwd=work,
    )
    return init_pt


def _run_reference_trainer(work: Path, data: Path, args) -> list[dict]:
    events = work / "ref_mlflow_events.jsonl"
    if events.exists():
        events.unlink()
    env = _reference_env()
    env["REF_MLFLOW_JSONL"] = str(events)
    cmd = [
        sys.executable, "-m", "foundation_stereo_depth.train",
        "--dataset-root", str(data),
        "--height", str(args.height), "--width", str(args.width),
        "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
        "--lr", "1e-3", "--weight-decay", "1e-4",
        "--val-fraction", "0.25", "--seed", str(args.seed),
        "--no-augment", "--device", "cpu", "--num-workers", "0",
        "--output-dir", str(work / "ref_outputs"),
        "--mlflow-tracking-uri", "stub://unused",
    ]
    _log("reference trainer: " + " ".join(cmd[1:]))
    t0 = time.perf_counter()
    subprocess.run(cmd, env=env, check=True, cwd=work)
    _log(f"reference trainer done in {time.perf_counter() - t0:.0f}s")
    epochs = []
    for line in events.read_text().splitlines():
        rec = json.loads(line)
        if rec["event"] == "log_metrics" and rec.get("step") is not None \
                and "epoch_seconds" in rec["metrics"]:
            epochs.append({"step": rec["step"], **rec["metrics"]})
    return epochs


def run_compare(args: argparse.Namespace) -> None:
    from scripts.make_synth_dataset import generate

    if args.force_cpu:
        # The environment's sitecustomize pins jax_platforms=axon,cpu via
        # jax.config, so JAX_PLATFORMS=cpu in the env is NOT enough (same
        # note as tests/conftest.py). Both sides of the comparison are
        # float32 CPU math anyway; this keeps the compare runnable when
        # the TPU transport is down.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    data = work / "data"
    hw = (args.height, args.width)
    if not (data / "synth_meta.json").exists():
        max_disp = 48.0 * args.width / 320.0
        _log(f"generating {args.samples} samples at {hw} ...")
        generate(data, args.samples, 2, hw, max_disp, seed=0)

    init_pt = _export_reference_init(work, args.seed)
    _log(f"identical torch init exported: {init_pt}")

    ref_epochs = _run_reference_trainer(work, data, args)

    trk = work / "tracking"
    if trk.exists():
        shutil.rmtree(trk)
    cfg = TrainConfig(
        dataset_root=str(data),
        height=args.height, width=args.width,
        epochs=args.epochs, batch_size=args.batch_size,
        lr=1e-3, weight_decay=1e-4,
        val_fraction=0.25, seed=args.seed,
        augment=False,
        compute_dtype="float32",       # remove the bf16 confound: this run
        input_precision="float32",     # mirrors the reference's exact math
        output_dir=str(work / "outputs"),
        mlflow_tracking_uri=f"jsonl://{trk}",
        preview_samples=0,
        num_workers=0,
        init_checkpoint=str(init_pt),
    )
    _log("this framework's trainer (identical init/data, float32) ...")
    t0 = time.perf_counter()
    train(cfg)
    _log(f"tpu trainer done in {time.perf_counter() - t0:.0f}s")
    our_records = _read_jsonl_metrics(trk)

    ours = _epoch_series(our_records, METRIC_KEYS)
    ref = _epoch_series(ref_epochs, METRIC_KEYS)
    deltas = {
        key: [
            None if (a is None or b is None) else round(a - b, 5)
            for a, b in zip(ours[key], ref[key])
        ]
        for key in METRIC_KEYS
    }
    rel = {
        key: [
            None if (a is None or b in (None, 0)) else round(abs(a - b) / abs(b), 4)
            for a, b in zip(ours[key], ref[key])
        ]
        for key in ("train_loss", "val_mae")
    }
    artifact = {
        "protocol": {
            "data": f"{args.samples} synthetic samples @ {hw}, seed 0",
            "init": "reference torch init (set_seed(seed) -> StereoUNet()) "
                    "exported to .pt, loaded via --init-checkpoint",
            "optimizer": "AdamW lr=1e-3 wd=1e-4 (one-step parity: "
                         "tests/test_train_step.py)",
            "augment": False,
            "precision": "float32 both frameworks",
            "note": "batch ORDER differs (torch DataLoader shuffle vs our "
                    "seeded permutation); epoch-level metrics are the "
                    "comparable quantity",
            "reference_cmd": "foundation_stereo_depth.train via "
                             "scripts/ref_shims (unmodified reference code)",
        },
        "reference": ref,
        "this_framework": ours,
        "delta_ours_minus_ref": deltas,
        "relative_abs_delta": rel,
    }
    DOCS.mkdir(parents=True, exist_ok=True)
    (DOCS / "compare.json").write_text(json.dumps(artifact, indent=2))
    _log(f"wrote {DOCS / 'compare.json'}")
    print(json.dumps({
        "ref_val_mae": ref["val_mae"],
        "our_val_mae": ours["val_mae"],
        "rel_abs_delta_val_mae": rel["val_mae"],
    }))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = parser.add_subparsers(dest="mode", required=True)

    tpu = sub.add_parser("tpu")
    tpu.add_argument("--epochs", type=int, default=30)
    tpu.add_argument("--samples", type=int, default=2048)
    tpu.add_argument("--height", type=int, default=240)
    tpu.add_argument("--width", type=int, default=320)
    tpu.add_argument("--batch-size", type=int, default=128)
    tpu.add_argument("--tag", type=str, default="",
                     help="artifact filename suffix, e.g. _fast")
    tpu.add_argument("--preview-samples", type=int, default=4)
    tpu.add_argument("--workdir", type=str, default="/tmp/convergence_tpu")
    tpu.add_argument(
        "--resume-from", type=str, default=None, dest="resume_from",
        help="Resume an interrupted run from this checkpoint (the trainer's "
             "full-state resume). The workdir's tracking dir is kept and "
             "the artifact merges epoch records across the interrupted and "
             "resumed runs — built for recovering long runs from this "
             "platform's intermittent request hangs (docs/PERF.md).",
    )
    tpu.add_argument("--lr-schedule", type=str, default="constant",
                     choices=("constant", "cosine"), dest="lr_schedule")
    tpu.add_argument("--lr-warmup-steps", type=int, default=0,
                     dest="lr_warmup_steps")
    tpu.add_argument(
        "--init-checkpoint", type=str, default=None,
        help="Initialise model weights from this checkpoint (orbax dir or "
             ".pt). Enables progressive-resolution schedules: pretrain at "
             "fast-mode resolution, then finetune at full resolution "
             "(the model is fully convolutional, so weights transfer "
             "across resolutions unchanged).",
    )

    cmp_ = sub.add_parser("compare")
    cmp_.add_argument("--epochs", type=int, default=5)
    cmp_.add_argument("--samples", type=int, default=128)
    cmp_.add_argument("--height", type=int, default=96)
    cmp_.add_argument("--width", type=int, default=128)
    cmp_.add_argument("--batch-size", type=int, default=16)
    cmp_.add_argument("--seed", type=int, default=42)
    cmp_.add_argument("--workdir", type=str, default="/tmp/convergence_cmp")
    cmp_.add_argument(
        "--force-cpu", action="store_true", dest="force_cpu",
        help="Run this framework's side on CPU (jax.config override; the "
             "env var alone cannot beat sitecustomize's platform pin).",
    )

    args = parser.parse_args()
    if args.mode == "tpu":
        run_tpu(args)
    else:
        run_compare(args)


if __name__ == "__main__":
    main()
