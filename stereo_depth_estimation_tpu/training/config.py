"""Training configuration with full CLI parity plus TPU-native additions.

Flag-for-flag parity with the reference parser (train.py:62-211): same
names, defaults, and semantics. TPU-native additions are grouped at the
bottom (mesh/precision/packed-cache/resume flags) — each defaults to the
behaviour a reference user expects.
"""

from __future__ import annotations

import argparse
from dataclasses import asdict, dataclass, fields


@dataclass
class TrainConfig:
    dataset_root: str = "/mnt/bulk2/NVidia Foundation Stereo"
    height: int = 240
    width: int = 320
    epochs: int = 100
    batch_size: int = 30
    lr: float = 1e-3
    weight_decay: float = 1e-4
    # Superset of the reference (constant-lr only, ref train.py:578):
    # "cosine" decays to 0 over the full run with an optional warmup ramp.
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    num_workers: int = 4
    val_fraction: float = 0.1
    max_samples: int = 0
    seed: int = 42
    device: str = "auto"
    mlflow_tracking_uri: str = "sqlite:///mlflow.db"
    mlflow_experiment: str = "foundation-stereo-depth"
    run_name: str | None = None
    output_dir: str = "./outputs"
    cache_root: str | None = None
    require_cache: bool = False
    compile: bool = False
    compile_mode: str = "default"
    compile_backend: str = "xla"
    augment: bool = True
    brightness_jitter: float = 0.25
    contrast_jitter: float = 0.25
    saturation_jitter: float = 0.25
    hue_jitter: float = 0.09
    gamma_jitter: float = 0.2
    noise_std_max: float = 0.05
    blur_prob: float = 0.03
    blur_sigma_max: float = 1.0
    blur_kernel_size: int = 5
    augment_impl: str = "auto"  # auto|xla|pallas (ops/augment.py)
    # uint8 matches the reference's CACHED path (its cache quantises, ref
    # dataset.py:118-123) and is the throughput default (4x smaller H2D).
    # float32 reproduces the reference's UNCACHED float semantics exactly
    # (ref dataset.py:184-193). Incompatible with the packed cache (uint8
    # storage format).
    input_precision: str = "uint8"  # uint8|float32
    # --- TPU-native additions (no reference counterpart) ---
    base_channels: int = 32  # UNet width; 32 = reference spec (7.76M params)
    mesh_devices: int = 0  # 0 = all visible devices (data-parallel axis)
    spatial_devices: int = 1  # >1: shard image height over a 2nd mesh axis
    compute_dtype: str = "bfloat16"  # MXU-friendly; "float32" for parity runs
    packed_cache_root: str | None = None  # fast-path packed array cache
    device_resident: str = "auto"  # auto|on|off: train from HBM-staged data
    # Per-device HBM byte budget for device-resident windows (aggregate =
    # value x mesh devices): the packed set pins when it fits, else rotates
    # double-buffered epoch windows through HBM (parallel/window.py).
    hbm_window_gb: float = 4.0
    # AOT executable disk cache (parallel/aot_cache.py): repeat runs of the
    # same config skip the ~90-215 s per-process XLA recompile (this
    # platform's persistent-cache keys don't transfer across processes —
    # docs/PERF.md). "auto" = <output-dir>/.aot_cache; "off" disables;
    # anything else is an explicit cache directory. Multi-process runs use
    # it only under the opt-in flag below.
    aot_cache: str = "auto"
    # Extend the AOT executable cache to MULTIHOST runs (opt-in): blobs are
    # keyed per (topology, process_id) so each process loads only the slice
    # compiled for its own position. Proven safe on the 2-process gloo/CPU
    # farm — byte-identical training metrics after reload, 18.0 s compile
    # -> 0.41 s load (scripts/multihost_aot_probe.py) — but PJRT
    # serialize semantics on real TPU pods are backend-specific and this
    # rig has one chip, hence opt-in rather than default.
    aot_cache_multihost: bool = False
    resume: str | None = None  # checkpoint dir to resume from (superset of ref)
    # Start from an existing model's weights (orbax dir or reference-format
    # .pt): params+batch_stats only, fresh optimizer/epoch counter. Distinct
    # from --resume, which restores the FULL TrainState mid-run. Enables
    # fine-tuning and identical-init cross-framework comparisons
    # (scripts/convergence_run.py).
    init_checkpoint: str | None = None
    log_every_batches: int = 10  # MLFLOW_TRAIN_LOG_EVERY_BATCHES (train.py:23)
    preview_samples: int = 8  # MLFLOW_PREVIEW_SAMPLES (train.py:24)
    profile_dir: str | None = None  # arm a jax.profiler trace of early steps
    profile_steps: int = 10  # batches to capture when --profile-dir is set
    multihost: bool = False  # join a multi-process (multi-host) runtime
    coordinator_address: str | None = None  # host:port (auto on TPU pods)
    num_processes: int | None = None  # process count (auto on TPU pods)
    process_id: int | None = None  # this process's id (auto on TPU pods)

    def to_dict(self) -> dict:
        return asdict(self)


def parse_args(argv: list[str] | None = None) -> TrainConfig:
    defaults = TrainConfig()
    parser = argparse.ArgumentParser(
        description="Train stereo disparity model on FoundationStereo (TPU-native)."
    )
    add = parser.add_argument
    add("--dataset-root", type=str, default=defaults.dataset_root,
        help="Path to FoundationStereo dataset root.")
    add("--height", type=int, default=defaults.height, help="Training image height.")
    add("--width", type=int, default=defaults.width, help="Training image width.")
    add("--epochs", type=int, default=defaults.epochs, help="Number of epochs.")
    add("--batch-size", type=int, default=defaults.batch_size, help="Batch size.")
    add("--lr", type=float, default=defaults.lr, help="Learning rate.")
    add("--weight-decay", type=float, default=defaults.weight_decay, help="Weight decay.")
    add("--lr-schedule", type=str, default=defaults.lr_schedule,
        choices=("constant", "cosine"), dest="lr_schedule",
        help="LR schedule (superset; the reference is constant-only). "
             "cosine decays to 0 over the configured epochs.")
    add("--lr-warmup-steps", type=int, default=defaults.lr_warmup_steps,
        dest="lr_warmup_steps",
        help="Linear warmup steps before the cosine decay (0 = none).")
    add("--num-workers", type=int, default=defaults.num_workers,
        help="Host batch-assembly worker threads.")
    add("--val-fraction", type=float, default=defaults.val_fraction,
        help="Validation fraction in [0, 1).")
    add("--max-samples", type=int, default=defaults.max_samples,
        help="Optional cap on number of samples.")
    add("--seed", type=int, default=defaults.seed, help="Random seed.")
    add("--device", type=str, default=defaults.device,
        help='Device: "auto", "tpu", "cpu", or explicit JAX platform name.')
    add("--mlflow-tracking-uri", type=str, default=defaults.mlflow_tracking_uri,
        help="MLflow tracking URI (JSONL fallback if mlflow is unavailable).")
    add("--mlflow-experiment", type=str, default=defaults.mlflow_experiment,
        help="MLflow experiment name.")
    add("--run-name", type=str, default=None, help="Optional run name.")
    add("--output-dir", type=str, default=defaults.output_dir,
        help="Directory for checkpoints/config.")
    add("--cache-root", type=str, default=None,
        help="Optional npz cache root built by foundation-stereo-cache.")
    add("--require-cache", action="store_true",
        help="Fail if any requested sample is missing from --cache-root.")
    add("--compile", action=argparse.BooleanOptionalAction, default=defaults.compile,
        help="Kept for CLI parity; the train step is always jit-compiled.")
    add("--compile-mode", type=str, default=defaults.compile_mode,
        choices=("default", "reduce-overhead", "max-autotune"),
        help="Kept for CLI parity; XLA has one compilation mode.")
    add("--compile-backend", type=str, default=defaults.compile_backend,
        help="Kept for CLI parity; the backend is always XLA.")
    add("--augment", action=argparse.BooleanOptionalAction, default=defaults.augment,
        help="Enable asymmetric RGB augmentations independently on left/right.")
    add("--brightness-jitter", type=float, default=defaults.brightness_jitter,
        help="Brightness jitter; factor sampled from [1-x, 1+x].")
    add("--contrast-jitter", type=float, default=defaults.contrast_jitter,
        help="Contrast jitter; factor sampled from [1-x, 1+x].")
    add("--saturation-jitter", type=float, default=defaults.saturation_jitter,
        help="Saturation jitter; factor sampled from [1-x, 1+x].")
    add("--hue-jitter", type=float, default=defaults.hue_jitter,
        help="Hue jitter; shift sampled from [-x, x].")
    add("--gamma-jitter", type=float, default=defaults.gamma_jitter,
        help="Gamma jitter; factor sampled from [max(0.1, 1-x), 1+x].")
    add("--noise-std-max", type=float, default=defaults.noise_std_max,
        help="Max stddev for additive Gaussian noise sampled in [0, x].")
    add("--blur-prob", type=float, default=defaults.blur_prob,
        help="Probability of applying Gaussian blur per image.")
    add("--blur-sigma-max", type=float, default=defaults.blur_sigma_max,
        help="Max sigma for Gaussian blur (<= 0 disables blur).")
    add("--blur-kernel-size", type=int, default=defaults.blur_kernel_size,
        help="Gaussian blur kernel size (odd integer >= 3).")
    add("--augment-impl", type=str, default=defaults.augment_impl,
        choices=("auto", "xla", "pallas"), dest="augment_impl",
        help="Augmentation implementation (pallas = fused TPU kernel for "
             "the pointwise stages; see docs/PERF.md).")
    add("--input-precision", type=str, default=defaults.input_precision,
        choices=("uint8", "float32"), dest="input_precision",
        help="Host batch image precision. uint8 (default) matches the "
             "reference's cached-path quantisation; float32 reproduces its "
             "uncached float path exactly (not usable with the packed cache).")
    # TPU-native flags
    add("--base-channels", type=int, default=defaults.base_channels,
        help="UNet width multiplier (32 = reference architecture).")
    add("--mesh-devices", type=int, default=defaults.mesh_devices,
        help="Data-parallel mesh size (0 = all visible devices).")
    add("--spatial-devices", type=int, default=defaults.spatial_devices,
        help="Shard image height over this many devices (2-D data x spatial "
             "mesh; XLA inserts conv halo exchanges). For resolutions whose "
             "activations exceed one chip's HBM.")
    add("--compute-dtype", type=str, default=defaults.compute_dtype,
        choices=("bfloat16", "float32"), help="Network compute dtype.")
    add("--packed-cache-root", type=str, default=None,
        help="Packed array cache (fast path); built automatically if missing.")
    add("--device-resident", type=str, default=defaults.device_resident,
        choices=("auto", "on", "off"), dest="device_resident",
        help="Stage the packed training set into device memory once and run "
             "the fully on-device step (zero per-step host traffic). "
             "'auto' enables it when the packed cache fits comfortably.")
    add("--hbm-window-gb", type=float, default=defaults.hbm_window_gb,
        dest="hbm_window_gb",
        help="Per-device HBM budget (GB) for device-resident windows; the "
             "packed set pins when it fits, else rotates double-buffered "
             "epoch windows through device memory.")
    add("--aot-cache", type=str, default=defaults.aot_cache, dest="aot_cache",
        help="AOT executable disk cache: 'auto' (default, under --output-dir)"
             " caches compiled train/eval executables so repeat runs of the "
             "same config skip the per-process XLA recompile; 'off' disables;"
             " or an explicit directory.")
    add("--aot-cache-multihost", action="store_true",
        dest="aot_cache_multihost",
        help="Opt-in: extend the AOT executable cache to multihost runs, "
             "keyed per (topology, process_id). Measured safe on the gloo "
             "CPU farm (scripts/multihost_aot_probe.py); TPU-pod serialize "
             "semantics are backend-specific, hence opt-in.")
    add("--resume", type=str, default=None,
        help="Checkpoint directory to resume training from.")
    add("--init-checkpoint", type=str, default=None, dest="init_checkpoint",
        help="Initialise model weights (params+batch_stats) from an orbax "
             "checkpoint dir or a reference-format .pt file; optimizer and "
             "epoch counter start fresh (fine-tuning / identical-init "
             "comparisons).")
    add("--log-every-batches", type=int, default=defaults.log_every_batches,
        help="Step-metric logging cadence in training batches.")
    add("--preview-samples", type=int, default=defaults.preview_samples,
        help="Fixed preview sample count logged each epoch.")
    add("--profile-dir", type=str, default=None,
        help="Capture a jax.profiler trace of early training batches here "
             "(view with TensorBoard's profile plugin).")
    add("--profile-steps", type=int, default=defaults.profile_steps,
        help="Training batches to capture when --profile-dir is set.")
    add("--multihost", action="store_true",
        help="Join a multi-process runtime (jax.distributed.initialize); "
             "every host runs this same command.")
    add("--coordinator-address", type=str, default=None,
        help="host:port of process 0 (multihost; auto-detected on TPU pods).")
    add("--num-processes", type=int, default=None,
        help="Total process count (multihost; auto-detected on TPU pods).")
    add("--process-id", type=int, default=None,
        help="This process's id (multihost; auto-detected on TPU pods).")
    namespace = parser.parse_args(argv)
    values = vars(namespace)
    known = {f.name for f in fields(TrainConfig)}
    return TrainConfig(**{k: v for k, v in values.items() if k in known})
