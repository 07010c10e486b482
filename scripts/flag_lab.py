"""XLA:TPU compiler-flag lab: sweep untried backend flags on the full step.

PERF.md's knob history covers exactly three XLA:TPU options:
``xla_tpu_scoped_vmem_limit_kib`` (adopted at 64 MiB, +2.5%),
``xla_tpu_enable_multi_level_nested_loop_fusion`` (noise) and
``xla_tpu_rwb_fusion=false`` (noise). The backend exposes many more
fusion/scheduling knobs that could matter for an HBM-bound program
(docs/step_profile_tpu.json: 85.7 of 127.3 ms is HBM-bound). This lab
closes that gap the same way the other labs did — measure, then adopt or
refute.

Two phases:

1. PROBE — each candidate option is passed as ``compiler_options`` to a
   trivial jit; unknown/ill-typed options raise at compile time, so this
   cheaply filters the candidate list down to what this libtpu build
   actually accepts (seconds per probe, in-session).
2. MEASURE — each surviving option (alone, layered on the production
   baseline options) compiles the FULL production train step
   (``make_train_step(extra_compiler_options=...)``) and times synced
   32-step windows over the device-resident path, identical harness to
   scripts/fusion114_lab.py. The AOT disk cache keys on compiler options
   (parallel/aot_cache.py), so repeat runs skip recompiles.

Flags are semantics-preserving scheduler/fusion hints: the step's loss is
checked finite, and any adopted flag must also pass the repo's parity
gates before shipping (they run the same program shapes).

Usage (TPU): python scripts/flag_lab.py --json docs/flag_lab.json
CPU probe-only smoke: python scripts/flag_lab.py --force-cpu --probe-only
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[flags +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


# Candidate (name, value) pairs. Values flip non-default behavior where the
# default is known; booleans are tried in the direction that plausibly helps
# an HBM-bound conv program. Unknown names are filtered by the probe.
CANDIDATES: list[tuple[str, str]] = [
    # fusion cost modelling / grouping
    ("xla_tpu_use_bundle_aware_cost_model_for_fusions", "true"),
    ("xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("xla_tpu_enable_aggressive_loop_fusion_layout_opt", "true"),
    ("xla_tpu_nested_dot_fusion", "true"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_dot_dot_fusion_duplicated", "true"),
    ("xla_tpu_copy_fusion_pad_unpad_ratio", "10"),
    # vector-memory fusion windows (bytes of adjacent loads/stores the
    # fuser may coalesce)
    ("xla_tpu_vector_load_fusion_window", "2048"),
    ("xla_tpu_vector_store_fusion_window", "512"),
    # scoped-vmem interplay (64 MiB is the adopted production value)
    ("xla_tpu_scavenge_vmem_for_fusions", "true"),
    ("xla_tpu_allocate_scoped_vmem_at_same_offset", "false"),
    # scheduling
    ("xla_latency_hiding_scheduler_rerun", "2"),
    ("xla_tpu_enable_dot_strength_reduction", "false"),
    ("xla_tpu_order_dot_after_layout", "true"),
    # memory-space assignment / prefetch aggressiveness
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "0.5"),
    ("xla_tpu_prefetch_interval_picker_size_override", "268435456"),
    ("xla_tpu_alternate_memory_benefit_scaling_factor", "2.0"),
    ("xla_tpu_enable_vmem_to_vmem_dmas", "true"),
    # loop optimizer
    ("xla_tpu_enable_memory_bound_loop_optimizer", "true"),
    ("xla_tpu_licm_size_inflation_ratio", "2.0"),
]


def probe(candidates: list[tuple[str, str]]) -> tuple[list, list]:
    """Compile a trivial program per candidate; split valid/invalid."""
    import jax
    import jax.numpy as jnp

    valid, invalid = [], []
    x = jnp.arange(256, dtype=jnp.float32).reshape(16, 16)
    for i, (name, value) in enumerate(candidates):
        def tiny(a, _i=i):  # _i makes each program unique (no jit reuse)
            return (a @ a.T).sum() + _i

        try:
            jax.jit(tiny, compiler_options={name: value}).lower(x).compile()
            valid.append((name, value))
            _log(f"probe OK      {name}={value}")
        except Exception as e:  # noqa: BLE001 — classification is the point
            msg = str(e).splitlines()[0][:120]
            invalid.append({"flag": name, "value": value, "error": msg})
            _log(f"probe reject  {name}={value}: {msg}")
    return valid, invalid


def measure(label: str, extra: dict[str, str] | None, hw, batch_size,
            steps, windows, cache_dir) -> dict:
    import jax
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_adamw,
    )
    from stereo_depth_estimation_tpu.parallel.aot_cache import (
        compile_with_disk_cache,
    )
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
        make_train_step,
    )

    n_samples = max(4 * batch_size, 256)

    @jax.jit
    def gen_payload(key):
        k_img, k_tgt = jax.random.split(key)
        images = jax.random.randint(
            k_img, (n_samples, *hw, 6), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        targets = jax.random.uniform(
            k_tgt, (n_samples, *hw), jnp.float32, 0.5, 64.0
        ).astype(jnp.float16)
        return images, targets

    images, targets = gen_payload(jax.random.key(0))
    model = StereoUNet(compute_dtype=jnp.bfloat16)
    tx = make_adamw(1e-3, 1e-4)
    config = AugmentConfig()
    state = jax.jit(
        lambda key: create_train_state(model, key, hw, tx)
    )(jax.random.key(0))
    jitted = make_train_step(model, tx, config, extra_compiler_options=extra)
    example_batch = {
        "input": jnp.zeros((batch_size, *hw, 6), jnp.uint8),
        "target": jnp.zeros((batch_size, *hw), jnp.float16),
    }
    t0 = time.perf_counter()
    inner, src = compile_with_disk_cache(jitted, cache_dir, state, example_batch)
    compile_s = time.perf_counter() - t0
    _log(f"{label}: step program ready in {compile_s:.1f}s ({src})")
    step = make_device_data_train_step(
        model, tx, images, targets, batch_size, config,
        step_fn=inner, aot_cache_dir=str(cache_dir),
    )
    state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))
    for _ in range(4):
        state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))

    rates = []
    for w in range(windows + 1):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, stats = step(state)
        _ = float(np.asarray(stats.nll_sum))
        rate = steps * batch_size / (time.perf_counter() - t0)
        _log(f"{label}: window {w}: {rate:.1f} pairs/s"
             + (" (warmup, discarded)" if w == 0 else ""))
        if w > 0:
            rates.append(round(rate, 1))
    return {
        "label": label,
        "extra_options": extra or {},
        "pairs_per_sec_median": float(np.median(rates)),
        "ms_per_step_median": round(
            batch_size / float(np.median(rates)) * 1e3, 2
        ),
        "windows": rates,
        "compile_seconds": round(compile_s, 1),
        "nll_finite": bool(np.isfinite(float(np.asarray(stats.nll_sum)))),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--windows", type=int, default=3)
    parser.add_argument("--probe-only", action="store_true")
    parser.add_argument("--measure", type=str, default=None,
                        help="comma-separated flag names to measure "
                             "(default: all probe survivors)")
    parser.add_argument("--max-measure", type=int, default=6,
                        help="cap on measured variants beyond base")
    parser.add_argument("--force-cpu", action="store_true")
    parser.add_argument("--json", type=Path, default=None)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    _log(f"devices: {jax.devices()}")
    valid, invalid = probe(CANDIDATES)
    summary: dict = {
        "metric": "flag_lab",
        "hw": [args.height, args.width],
        "batch_size": args.batch_size,
        "device": str(jax.devices()[0]),
        "probe_valid": [f"{n}={v}" for n, v in valid],
        "probe_invalid": invalid,
        "results": [],
    }
    print(json.dumps({k: summary[k] for k in
                      ("probe_valid", "probe_invalid")}), flush=True)
    if not args.probe_only:
        wanted = (set(args.measure.split(",")) if args.measure else None)
        to_measure = [(n, v) for n, v in valid
                      if wanted is None or n in wanted][: args.max_measure]
        results = [measure("base", None, (args.height, args.width),
                           args.batch_size, args.steps, args.windows,
                           REPO / ".jax_cache")]
        print(json.dumps(results[-1]), flush=True)
        for name, value in to_measure:
            results.append(
                measure(f"{name}={value}", {name: value},
                        (args.height, args.width), args.batch_size,
                        args.steps, args.windows, REPO / ".jax_cache")
            )
            print(json.dumps(results[-1]), flush=True)
        summary["results"] = results
    print(json.dumps(summary))
    if args.json:
        args.json.write_text(json.dumps(summary, indent=2) + "\n")


if __name__ == "__main__":
    main()
