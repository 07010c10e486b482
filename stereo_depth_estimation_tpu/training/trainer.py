"""Training orchestrator: the ``foundation-stereo-depth`` CLI.

Wiring parity with reference train.py:483-689 — discovery, seeded split,
config.json, tracking params, epoch loop with step metrics every
``log_every_batches`` training batches, val epoch, preview montages,
last/best checkpoints (best on val MAE), final tags and artifacts — redesigned
around a jitted sharded train step:

- host pipeline yields uint8 batches (packed cache fast path when available),
- a background prefetcher overlaps H2D with compute,
- augmentation runs on-device inside the step,
- metric sums accumulate on-device and are fetched at logging boundaries,
- resume (--resume) restores the full TrainState (reference has no resume).
"""

from __future__ import annotations

import json
import random
import time
from dataclasses import asdict
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..data.packed_cache import (
    PackedCache,
    build_packed_cache,
    samples_fingerprint,
)
from ..data.pipeline import batch_iterator, loader_fetch, prefetch_to_device
from ..data.dataset import StereoSampleLoader
from ..data.samples import discover_samples, split_samples
from ..eval.preview import save_preview_montage
from ..models.unet import StereoUNet, count_params
from ..ops.augment import AugmentConfig
from ..ops.loss import LossStats, accumulate_stats, metrics_from_stats
from ..parallel.distributed import (
    MultihostBatcher,
    initialize_multihost,
    is_main_process,
)
from ..parallel.mesh import (
    make_mesh,
    pad_batch_to,
    replicate_to_mesh,
    shard_batch_to_mesh,
)
from ..parallel.window import HBMWindowLoader, default_hbm_budget_bytes
from ..parallel.train_step import (
    TrainState,
    create_train_state,
    make_adamw,
    make_eval_step,
    make_predict_fn,
    make_train_step,
)
from .checkpoint import load_model_variables, load_train_state, save_checkpoint
from .config import TrainConfig, parse_args
from .profiling import StepProfiler
from .tracking import TrackingRun


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def resolve_devices(device_arg: str, mesh_devices: int) -> list[Any]:
    if device_arg == "auto":
        devices = jax.devices()
    else:
        devices = jax.devices(device_arg)
    if mesh_devices > 0:
        devices = devices[:mesh_devices]
    return devices


def augment_config_from(cfg: TrainConfig) -> AugmentConfig | None:
    if not cfg.augment:
        return None
    return AugmentConfig(
        brightness_jitter=cfg.brightness_jitter,
        contrast_jitter=cfg.contrast_jitter,
        saturation_jitter=cfg.saturation_jitter,
        hue_jitter=cfg.hue_jitter,
        gamma_jitter=cfg.gamma_jitter,
        noise_std_max=cfg.noise_std_max,
        blur_prob=cfg.blur_prob,
        blur_sigma_max=cfg.blur_sigma_max,
        blur_kernel_size=cfg.blur_kernel_size,
        impl=cfg.augment_impl,
    )


def tracking_params(
    cfg: TrainConfig, train_samples: int, val_samples: int, num_parameters: int
) -> dict[str, Any]:
    """Same key set as reference to_mlflow_params (train.py:439-480)."""
    params: dict[str, Any] = {
        "dataset_root": str(Path(cfg.dataset_root).expanduser()),
        "height": cfg.height,
        "width": cfg.width,
        "epochs": cfg.epochs,
        "batch_size": cfg.batch_size,
        "lr": cfg.lr,
        "weight_decay": cfg.weight_decay,
        "val_fraction": cfg.val_fraction,
        "seed": cfg.seed,
        "device": cfg.device,
        "train_samples": train_samples,
        "val_samples": val_samples,
        "num_parameters": num_parameters,
        "augment": cfg.augment,
        "uncertainty_head": True,
        "loss": "heteroscedastic_l1_nll",
        "mlflow_train_log_every_batches": cfg.log_every_batches,
        "compile": True,  # the step is always jit-compiled on XLA
        "compute_dtype": cfg.compute_dtype,
        "mesh_devices": cfg.mesh_devices,
        "spatial_devices": cfg.spatial_devices,
        "base_channels": cfg.base_channels,
        "device_resident": cfg.device_resident,
        "hbm_window_gb": cfg.hbm_window_gb,
        "augment_impl": cfg.augment_impl,
        "input_precision": cfg.input_precision,
        "lr_schedule": cfg.lr_schedule,
    }
    if cfg.lr_warmup_steps:
        params["lr_warmup_steps"] = cfg.lr_warmup_steps
    if cfg.augment:
        params.update(
            brightness_jitter=cfg.brightness_jitter,
            contrast_jitter=cfg.contrast_jitter,
            saturation_jitter=cfg.saturation_jitter,
            hue_jitter=cfg.hue_jitter,
            gamma_jitter=cfg.gamma_jitter,
            noise_std_max=cfg.noise_std_max,
            blur_prob=cfg.blur_prob,
            blur_sigma_max=cfg.blur_sigma_max,
            blur_kernel_size=cfg.blur_kernel_size,
        )
    if cfg.cache_root:
        params["cache_root"] = str(Path(cfg.cache_root).expanduser())
    if cfg.init_checkpoint:
        params["init_checkpoint"] = str(Path(cfg.init_checkpoint).expanduser())
    params["require_cache"] = cfg.require_cache
    if cfg.max_samples > 0:
        params["max_samples"] = cfg.max_samples
    return params


def _step_metric_dict(stats: LossStats, prefix: str) -> dict[str, float]:
    m = metrics_from_stats(stats)
    return {
        f"{prefix}_loss_step": m["loss"],
        f"{prefix}_nll_step": m["nll"],
        f"{prefix}_mae_step": m["mae"],
        f"{prefix}_rmse_step": m["rmse"],
        f"{prefix}_sigma_step": m["sigma"],
    }


def run_train_epoch(
    step_fn,
    state: TrainState,
    batches: Iterator[Any],
    *,
    run: TrackingRun | None,
    global_step: int,
    log_every_batches: int,
    progress_desc: str | None = None,
    profiler: "StepProfiler | None" = None,
) -> tuple[TrainState, dict[str, float], int]:
    total: LossStats | None = None
    interval: LossStats | None = None
    iterator = batches
    bar = None
    if progress_desc is not None:
        try:
            from tqdm import tqdm

            bar = tqdm(batches, leave=False, desc=progress_desc)
            iterator = bar
        except ImportError:
            pass

    for batch in iterator:
        global_step += 1
        if profiler is not None:
            profiler.step()
        state, stats = step_fn(state, batch)
        total = accumulate_stats(total, stats)
        interval = accumulate_stats(interval, stats)
        if (
            log_every_batches > 0
            and global_step % log_every_batches == 0
            and float(interval.valid_count) > 0
        ):
            metrics = _step_metric_dict(interval, "train")
            # Failure detection: divergence/bad-batch NaNs would otherwise
            # poison every later parameter silently (metric fetches happen
            # at this cadence anyway, so the check costs nothing extra).
            if not np.isfinite(metrics["train_nll_step"]):
                raise FloatingPointError(
                    f"Training loss is non-finite at step {global_step} "
                    "(divergence or corrupt input). The 'last' checkpoint "
                    "holds the most recent finite state; resume from it "
                    "with a lower --lr or inspect the data."
                )
            if run is not None:
                run.log_metrics(metrics, step=global_step)
            if bar is not None:
                bar.set_postfix(
                    mae=f"{metrics['train_mae_step']:.4f}",
                    nll=f"{metrics['train_nll_step']:.4f}",
                )
            interval = None
    # Flush a trailing partial interval (reference train.py:393-403).
    if (
        run is not None
        and log_every_batches > 0
        and interval is not None
        and float(interval.valid_count) > 0
    ):
        run.log_metrics(_step_metric_dict(interval, "train"), step=global_step)

    if total is None:
        raise RuntimeError("No batches in training epoch.")
    return state, metrics_from_stats(total), global_step


def run_eval_epoch(eval_fn, state: TrainState, batches: Iterator[Any]) -> dict[str, float]:
    total: LossStats | None = None
    for batch in batches:
        total = accumulate_stats(total, eval_fn(state, batch))
    if total is None:
        raise RuntimeError("No batches in eval epoch.")
    return metrics_from_stats(total)


def _make_fetch(
    cfg: TrainConfig, samples, packed_root: Path | None,
    main_process: bool = True,
) -> tuple[Callable[[np.ndarray], dict[str, np.ndarray]], int, "PackedCache | None"]:
    """Pick the packed fast path when requested, else the npz/PIL loader.
    Returns (fetch, n, packed_cache_or_None).

    In multihost runs only process 0 (re)builds a packed cache; followers
    wait for its manifest, so hosts sharing a filesystem don't race."""
    if cfg.input_precision == "float32" and cfg.cache_root:
        # The npz cache stores uint8 images (same quantisation as the
        # reference's cache writer), so with a cache configured a sample
        # would return true float32 values on a miss but dequantised
        # uint8/255 values on every later hit — silently breaking the
        # "float32 reproduces the reference's uncached float path" contract.
        raise ValueError(
            "--input-precision float32 cannot be combined with "
            "--cache-root: the npz cache stores uint8 images, so cached "
            "epochs would silently see quantised values. Drop one of the "
            "two flags."
        )
    loader = StereoSampleLoader(
        samples,
        image_size=(cfg.height, cfg.width),
        cache_root=cfg.cache_root,
        require_cache=cfg.require_cache,
        float_inputs=cfg.input_precision == "float32",
    )
    if packed_root is not None:
        if cfg.input_precision == "float32":
            raise ValueError(
                "--input-precision float32 cannot be combined with "
                "--packed-cache-root: the packed cache stores uint8 images. "
                "Drop one of the two flags."
            )
        fingerprint = samples_fingerprint(samples)
        meta_path = packed_root / "meta.json"

        def meta_is_current() -> bool:
            """True iff meta.json exists and describes THIS split/geometry.

            meta.json is written atomically LAST by the builder
            (PackedCacheWriter.finalize), so a current meta also guarantees
            complete .bin payloads — this is what makes the follower wait
            race-free: a follower can never accept a cache that process 0 is
            mid-rebuild on, because the stale meta it might briefly observe
            fails this fingerprint/geometry check and the fresh meta only
            appears after the bins are fully rewritten.
            """
            try:
                meta = json.loads(meta_path.read_text())
            except (FileNotFoundError, json.JSONDecodeError):
                return False
            return (
                meta.get("split_fingerprint") == fingerprint
                and (meta.get("height"), meta.get("width"))
                == (cfg.height, cfg.width)
            )

        if not main_process:
            deadline = time.time() + 3600.0
            while not meta_is_current():
                if time.time() > deadline:
                    raise TimeoutError(
                        f"Timed out waiting for process 0 to build {packed_root}"
                    )
                time.sleep(1.0)
            cache = PackedCache(packed_root)
            return cache.gather, len(cache), cache
        if meta_path.exists() and not meta_is_current():
            # Same counts can hide a different split membership (other
            # seed/val-fraction/max-samples): serving it would leak train
            # samples into val. A size change would feed wrong-shape
            # batches. Rebuild instead — meta first, so followers stop
            # trusting the cache before the bins churn.
            print(
                f"Packed cache at {packed_root} was built for a different "
                "sample split or image size; rebuilding."
            )
            for name in ("meta.json", "images.bin", "disparity.bin"):
                (packed_root / name).unlink(missing_ok=True)
        if not meta_path.exists():
            print(f"Building packed cache at {packed_root} ...")
            build_packed_cache(
                loader, packed_root, progress=True,
                extra_meta={"split_fingerprint": fingerprint},
            )
        cache = PackedCache(packed_root)
        if len(cache) != len(samples):
            raise ValueError(
                f"Packed cache size {len(cache)} != sample count {len(samples)}; "
                "rebuild with a fresh --packed-cache-root."
            )
        return cache.gather, len(cache), cache
    return loader_fetch(loader, num_workers=cfg.num_workers), len(loader), None


class _NullRun:
    """Tracking sink for non-main processes in multihost runs: every host
    executes the same program, but only process 0 records anything."""

    run_id = "multihost-follower"
    backend = "null"

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def log_params(self, *a, **k):
        pass

    def log_metrics(self, *a, **k):
        pass

    def log_artifact(self, *a, **k):
        pass

    def log_artifacts(self, *a, **k):
        pass

    def set_tag(self, *a, **k):
        pass


def train(cfg: TrainConfig) -> dict[str, Any]:
    set_seed(cfg.seed)
    if cfg.multihost:
        initialize_multihost(
            cfg.coordinator_address, cfg.num_processes, cfg.process_id
        )
    main_process = is_main_process()
    devices = resolve_devices(cfg.device, cfg.mesh_devices)
    mesh = make_mesh(devices, spatial=cfg.spatial_devices)
    if main_process:
        print(
            f"Using {len(devices)} device(s): {devices[0].platform} "
            f"mesh={mesh.shape} processes={jax.process_count()}"
        )

    all_samples = discover_samples(cfg.dataset_root)
    if cfg.max_samples > 0:
        all_samples = all_samples[: cfg.max_samples]
    if len(all_samples) < 2:
        raise ValueError(
            "Need at least two samples to create train/validation splits."
        )
    train_samples, val_samples = split_samples(
        all_samples, cfg.val_fraction, cfg.seed
    )
    if main_process:
        print(
            f"Discovered {len(all_samples)} samples: "
            f"train={len(train_samples)}, val={len(val_samples)}"
        )

    packed_base = Path(cfg.packed_cache_root) if cfg.packed_cache_root else None
    train_fetch, n_train, train_cache = _make_fetch(
        cfg, train_samples, packed_base / "train" if packed_base else None,
        main_process,
    )
    val_fetch, n_val, _val_cache = (
        _make_fetch(
            cfg, val_samples, packed_base / "val" if packed_base else None,
            main_process,
        )
        if val_samples
        else (None, 0, None)
    )

    preview_source = val_samples if val_samples else train_samples
    preview_split = "val" if val_samples else "train"
    preview_count = min(cfg.preview_samples, len(preview_source))

    # Device-resident fast path, HBM-windowed (parallel/window.py): the
    # packed training set is staged into device memory sharded over the
    # mesh — pinned once when it fits the budget (zero steady-state host
    # traffic), rotating at epoch granularity with the next window's H2D
    # overlapped behind training when it doesn't. Works on any mesh,
    # including multihost (each host stages only the window blocks its
    # devices hold — parallel/distributed.py::stage_rows_multihost).
    # Built BEFORE the optimizer: the windowed path's steps/epoch differs
    # from the streaming ceil(n/batch) (data-axis padding; rotating
    # wrap-fill), and the cosine schedule's total_steps must match the
    # steps the run will actually take.
    windowed: HBMWindowLoader | None = None
    device_val_batches: list | None = None
    if cfg.device_resident == "on" and train_cache is None:
        if main_process:
            print(
                "--device-resident on requested but unavailable "
                "(needs --packed-cache-root); "
                "falling back to streamed batches."
            )
    if cfg.device_resident != "off" and train_cache is not None:
        payload_bytes = (
            train_cache._images.nbytes + train_cache._disparity.nbytes
        )
        budget = default_hbm_budget_bytes(mesh, cfg.hbm_window_gb)
        try:
            windowed = HBMWindowLoader(
                train_cache.gather,
                n_train,
                cfg.batch_size,
                mesh,
                bytes_per_sample=payload_bytes // max(n_train, 1),
                budget_bytes=budget,
                seed=cfg.seed,
            )
        except ValueError as exc:
            if cfg.device_resident == "on":
                raise ValueError(f"--device-resident: {exc}") from exc
            if main_process:
                print(f"Device-resident unavailable ({exc}); streaming.")
        if windowed is not None and main_process:
            plan = windowed.plan
            mode = (
                "pinned (staged once, reused every epoch)"
                if plan.pinned
                else f"rotating {plan.num_windows} windows of "
                     f"{plan.window_samples} samples (next window's H2D "
                     "overlapped behind training)"
            )
            print(
                f"Device-resident training: {payload_bytes / 1e6:.0f} MB "
                f"over {len(devices)} device(s), {mode}, "
                f"{plan.steps_per_epoch} steps/epoch (shard-local on-device "
                "shuffle; epoch tails rotate in via per-epoch permutations)."
            )
        if windowed is not None and _val_cache is not None and len(devices) == 1:
            # Stage validation too (single device): epochs then run with
            # zero host traffic. Batches are device-array slices built once.
            val_data = _val_cache.load_all()
            val_imgs = jax.device_put(jnp.asarray(val_data["input"]))
            val_tgts = jax.device_put(jnp.asarray(val_data["target"]))
            # Tail batch padded to the static batch size (wrap rows, mask
            # False) so eval compiles ONE program (see pad_batch_to). The
            # mask is rank-1 row flags; the eval step ANDs it with its own
            # on-device target > 0 (train_step._targets_and_mask).
            device_val_batches = []
            for i in range(0, n_val, cfg.batch_size):
                idx = np.arange(i, min(i + cfg.batch_size, n_val))
                real = np.ones(cfg.batch_size, bool)
                pad = cfg.batch_size - len(idx)
                if pad > 0:
                    idx = np.concatenate([idx, np.arange(pad) % n_val])
                    real[cfg.batch_size - pad:] = False
                device_val_batches.append({
                    "input": val_imgs[idx],
                    "target": val_tgts[idx],
                    "valid_mask": jnp.asarray(real),
                })

    model = StereoUNet(
        in_channels=6,
        out_channels=1,
        base_channels=cfg.base_channels,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )
    # Cosine total_steps matches the path taken: the windowed plan's
    # steps/epoch when device-resident, else the streaming pad-and-mask
    # ceil(n/batch). A resumed run restores the schedule position with the
    # optimizer's step count.
    steps_per_epoch = (
        windowed.plan.steps_per_epoch
        if windowed is not None
        else -(-len(train_samples) // cfg.batch_size)
    )
    tx = make_adamw(
        cfg.lr, cfg.weight_decay,
        schedule=cfg.lr_schedule,
        total_steps=steps_per_epoch * cfg.epochs,
        warmup_steps=cfg.lr_warmup_steps,
    )
    state = create_train_state(
        model, jax.random.key(cfg.seed), (cfg.height, cfg.width), tx
    )
    num_parameters = count_params(state.params)
    start_epoch = 1
    if cfg.init_checkpoint:
        if cfg.resume:
            raise ValueError(
                "--init-checkpoint and --resume are mutually exclusive: "
                "resume restores the full TrainState including these weights."
            )
        variables, _meta = load_model_variables(
            Path(cfg.init_checkpoint),
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        if main_process:
            print(f"Initialised model weights from {cfg.init_checkpoint}.")
    resume_carry: dict[str, Any] = {}
    if cfg.resume:
        state, meta = load_train_state(Path(cfg.resume), state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        # Continuity beyond the TrainState: the global step counter (so
        # step metrics don't reuse ids the interrupted run already logged)
        # and the best-so-far (so `best` banking and the final summary are
        # global, not best-since-resume). Absent in pre-carry checkpoints,
        # in which case behavior matches the old resume.
        resume_carry = dict(meta.get("metrics", {}).get("resume_carry", {}))
        if cfg.lr_schedule != "constant" and main_process:
            # The decay horizon is steps_per_epoch * epochs, and BOTH
            # factors can move across a resume (epochs flag; steps/epoch
            # via batch size, device count, HBM window plan, or a
            # packed<->streamed flip). Compare the horizon the original
            # run computed (carried in the checkpoint) against this
            # run's recomputation; fall back to the epochs-only check
            # for pre-carry checkpoints.
            saved_total = resume_carry.get("schedule_total_steps")
            recomputed_total = steps_per_epoch * cfg.epochs
            saved_epochs = meta.get("config", {}).get("epochs")
            if saved_total is not None and int(saved_total) != recomputed_total:
                print(
                    f"Warning: resuming a {cfg.lr_schedule} lr-schedule run "
                    f"whose decay horizon was {saved_total} steps, but this "
                    f"run computes {recomputed_total} "
                    f"(steps/epoch {steps_per_epoch} x epochs {cfg.epochs}): "
                    "the schedule's decay endpoint moves relative to the "
                    "original plan."
                )
            elif (
                saved_total is None
                and saved_epochs is not None
                and int(saved_epochs) != cfg.epochs
            ):
                print(
                    f"Warning: resuming a {cfg.lr_schedule} lr-schedule run "
                    f"with --epochs {cfg.epochs} (checkpoint was trained for "
                    f"{saved_epochs}): total_steps changes, so the schedule's "
                    "decay endpoint moves relative to the original plan."
                )
        if main_process:
            print(f"Resumed from {cfg.resume} at epoch {start_epoch - 1}.")
    state = replicate_to_mesh(state, mesh)

    train_step = make_train_step(model, tx, augment_config_from(cfg))
    eval_step = make_eval_step(model)
    if cfg.aot_cache != "off" and (
        jax.process_count() == 1 or cfg.aot_cache_multihost
    ):
        # Executable disk cache (parallel/aot_cache.py): repeat runs of the
        # same config skip the ~90-215 s per-process XLA recompile. Lazily
        # lowered against the first real (state, batch), and every batch is
        # padded to that one shape/signature (pad_batch_to), so a single
        # executable serves the run; a genuinely off-aval call would fall
        # through to the normal jit.
        # Multihost is OPT-IN (--aot-cache-multihost): blobs are keyed per
        # (topology, process_id) inside aot_cache._digest, so a process can
        # only load the slice compiled for its own position — measured safe
        # on the 2-process gloo farm (18.0 s compile -> 0.41 s load,
        # byte-identical metrics; scripts/multihost_aot_probe.py,
        # docs/multihost_aot_probe.json) — but PJRT serialize semantics on
        # real TPU pods are backend-specific and unverifiable on this
        # 1-chip rig, so the default multihost path still jit-compiles.
        from ..parallel.aot_cache import lazy_aot_wrap, resolve_aot_dir

        aot_dir = resolve_aot_dir(cfg.aot_cache, cfg.output_dir)
        train_step = lazy_aot_wrap(
            train_step, aot_dir, label="train step", verbose=main_process
        )
        eval_step = lazy_aot_wrap(
            eval_step, aot_dir, label="eval step", verbose=main_process
        )
    predict = make_predict_fn(model)

    if cfg.multihost and jax.process_count() > 1:
        # Each host decodes only its stripe of every global batch and the
        # global array is assembled device-side — batches leave
        # MultihostBatcher already sharded, so device placement is identity.
        train_fetch = MultihostBatcher(train_fetch, mesh, pad_to=cfg.batch_size)
        if val_fetch is not None:
            val_fetch = MultihostBatcher(val_fetch, mesh, pad_to=cfg.batch_size)

        def put(batch: Any) -> Any:
            return batch
    else:
        def put(batch: dict[str, np.ndarray]) -> Any:
            # pad_batch_to keeps the epoch-tail batch at the one static
            # shape (one step program for the whole run — a distinct tail
            # shape costs a full XLA compile and a second AOT blob;
            # measured 220 s at 480x640 on the v5e, docs/PERF.md);
            # shard_batch_to_mesh then rounds up to the device count.
            return shard_batch_to_mesh(pad_batch_to(batch, cfg.batch_size), mesh)

    run: Any = (
        TrackingRun(cfg.mlflow_tracking_uri, cfg.mlflow_experiment, cfg.run_name)
        if main_process
        else _NullRun()
    )
    summary: dict[str, Any] = {}
    with run:
        run_id = run.run_id
        output_dir = Path(cfg.output_dir).expanduser().resolve() / run_id
        checkpoints_dir = output_dir / "checkpoints"
        preview_root = output_dir / "mlflow_previews"
        if main_process:
            checkpoints_dir.mkdir(parents=True, exist_ok=True)
            preview_root.mkdir(parents=True, exist_ok=True)
            config_path = output_dir / "config.json"
            config_path.write_text(
                json.dumps(asdict(cfg), indent=2), encoding="utf-8"
            )
            run.log_params(
                tracking_params(
                    cfg, len(train_samples), len(val_samples), num_parameters
                )
            )
            run.log_artifact(config_path, artifact_path="config")
            if preview_count > 0:
                print(
                    f"Previews: logging {preview_count} fixed {preview_split} "
                    "samples each epoch."
                )

        best_val_mae = float(resume_carry.get("best_val_mae", float("inf")))
        best_epoch = int(resume_carry.get("best_epoch", -1))
        global_step = int(resume_carry.get("global_step", 0))
        profiler = StepProfiler(
            cfg.profile_dir if main_process else None, cfg.profile_steps
        )

        for epoch in range(start_epoch, cfg.epochs + 1):
            start_time = time.time()
            if windowed is not None:
                step_fn = windowed.step_adapter(train_step)
                train_batches: Any = windowed.epoch_batches(epoch)
            else:
                step_fn = train_step
                # No drop_last even on a mesh: indivisible batches (including
                # the epoch tail) shard via pad-and-mask, so every sample
                # trains, matching the reference's DataLoader semantics.
                train_batches = prefetch_to_device(
                    batch_iterator(
                        train_fetch, n_train, cfg.batch_size,
                        shuffle=True, seed=cfg.seed, epoch=epoch,
                    ),
                    put=put,
                )
            state, train_metrics, global_step = run_train_epoch(
                step_fn,
                state,
                train_batches,
                run=run,
                global_step=global_step,
                log_every_batches=cfg.log_every_batches,
                progress_desc=f"epoch {epoch}" if main_process else None,
                profiler=profiler,
            )
            profiler.stop()  # flush even if the epoch was shorter than asked
            if device_val_batches is not None:
                val_metrics = run_eval_epoch(
                    eval_step, state, iter(device_val_batches)
                )
            elif val_fetch is not None:
                val_batches = prefetch_to_device(
                    batch_iterator(val_fetch, n_val, cfg.batch_size), put=put
                )
                val_metrics = run_eval_epoch(eval_step, state, val_batches)
            else:
                val_metrics = train_metrics

            epoch_metrics = {
                "train_loss": train_metrics["loss"],
                "train_nll": train_metrics["nll"],
                "train_mae": train_metrics["mae"],
                "train_rmse": train_metrics["rmse"],
                "train_sigma": train_metrics["sigma"],
                "epoch_seconds": time.time() - start_time,
            }
            if val_fetch is not None:
                epoch_metrics.update(
                    val_loss=val_metrics["loss"],
                    val_nll=val_metrics["nll"],
                    val_mae=val_metrics["mae"],
                    val_rmse=val_metrics["rmse"],
                    val_sigma=val_metrics["sigma"],
                )
            run.log_metrics(epoch_metrics, step=epoch)

            if main_process and preview_count > 0:
                previews_dir = preview_root / f"epoch_{epoch:04d}"
                log_epoch_previews(
                    predict, state, cfg, preview_source[:preview_count], previews_dir
                )
                run.log_artifacts(
                    previews_dir, artifact_path=f"previews/epoch_{epoch:04d}"
                )

            if val_metrics["mae"] < best_val_mae:
                best_val_mae = val_metrics["mae"]
                best_epoch = epoch
                save_checkpoint(
                    checkpoints_dir, "best", state,
                    epoch=epoch, config=asdict(cfg), metrics=epoch_metrics,
                )
            # Every process calls save (orbax coordinates multihost saves
            # internally); only process 0 touches the filesystem. `last`
            # carries resume continuity (global step counter + global
            # best-so-far) so an interrupted run resumes without resetting
            # either; saved after the best check so the carry reflects
            # this epoch.
            save_checkpoint(
                checkpoints_dir, "last", state,
                epoch=epoch, config=asdict(cfg),
                metrics={
                    **epoch_metrics,
                    "resume_carry": {
                        "global_step": global_step,
                        "best_val_mae": best_val_mae,
                        "best_epoch": best_epoch,
                        # The lr schedule's decay horizon as COMPUTED by
                        # this run — epochs alone can't reconstruct it
                        # (steps/epoch moves with batch size, device
                        # count, HBM window plan, packed-vs-streamed);
                        # resume compares against its own recomputation.
                        "schedule_total_steps": steps_per_epoch * cfg.epochs,
                    },
                },
            )

            if not main_process:
                pass
            elif val_fetch is not None:
                print(
                    f"Epoch {epoch}/{cfg.epochs}: "
                    f"train_mae={train_metrics['mae']:.4f}, "
                    f"val_mae={val_metrics['mae']:.4f}, "
                    f"train_rmse={train_metrics['rmse']:.4f}, "
                    f"val_rmse={val_metrics['rmse']:.4f}"
                )
            else:
                print(
                    f"Epoch {epoch}/{cfg.epochs}: "
                    f"train_mae={train_metrics['mae']:.4f}, "
                    f"train_rmse={train_metrics['rmse']:.4f}"
                )

        run.set_tag("best_epoch", best_epoch)
        run.set_tag("best_val_mae", best_val_mae)
        if main_process and checkpoints_dir.exists():
            # Final checkpoints ride along as tracking artifacts, like the
            # reference's end-of-run upload (train.py:680-681).
            run.log_artifacts(checkpoints_dir, artifact_path="checkpoints")

        if main_process:
            print(f"Run: {run_id} (tracking backend: {run.backend})")
            print(f"Best validation MAE: {best_val_mae:.4f} at epoch {best_epoch}")
            print(f"Checkpoints saved to: {checkpoints_dir}")
        summary = {
            "run_id": run_id,
            "best_epoch": best_epoch,
            "best_val_mae": best_val_mae,
            "checkpoints_dir": str(checkpoints_dir),
            "global_step": global_step,
        }
    return summary


def log_epoch_previews(
    predict,
    state: TrainState,
    cfg: TrainConfig,
    samples,
    previews_dir: Path,
) -> int:
    loader = StereoSampleLoader(
        samples,
        image_size=(cfg.height, cfg.width),
        cache_root=cfg.cache_root,
        require_cache=cfg.require_cache,
    )
    previews_dir.mkdir(parents=True, exist_ok=True)
    items = [loader[i] for i in range(len(loader))]
    inputs = np.stack([it["input"] for it in items])
    targets = np.stack([it["target"] for it in items])
    params, batch_stats = state.params, state.batch_stats
    if jax.process_count() > 1:
        # Multihost (reference logs montages every epoch too, train.py:
        # 640-651): the state is fully replicated over the global mesh, so
        # its values are readable from any single process's local shard.
        # Pull them to host and run the predict as a purely process-local
        # program — no collectives, no SPMD hazard, only process 0 executes
        # this function.
        params, batch_stats = jax.tree.map(
            lambda a: np.asarray(a), (params, batch_stats)
        )
    disp, _ = predict(params, batch_stats, jnp.asarray(inputs))
    disp = np.asarray(jax.device_get(disp))
    written = 0
    for i in range(inputs.shape[0]):
        save_preview_montage(
            previews_dir / f"sample_000_{i:02d}.png", inputs[i], targets[i], disp[i]
        )
        written += 1
    return written


def main() -> None:
    train(parse_args())


if __name__ == "__main__":
    main()
