"""fusion.114 lab: fix-or-refute the one op PERF.md calls suboptimal.

The round-4 profile attributes 2.25 ms/step (batch 128, 240x320) to
``fusion.114``, "a loop fusion around a convert" running at 98 GiB/s
(~1/6 HBM peak). Static analysis points at the augment NOISE EPILOGUE
(ops/augment.py::noise_and_clip_stereo as called from the Pallas wrapper,
ops/augment_pallas.py:299): bf16 kernel output -> astype(float32) ->
``jax.random.normal`` (threefry) + scaled add + clip -> astype(bfloat16).
Its bytes match the profile row (118 MB read + 118 MB write ~= 2.25 ms at
~105 GiB/s), and the fusion contains the threefry draw — so the "1/6
peak" may be RNG-THROUGHPUT-bound, not a bandwidth bug.

Variants measured (each is the FULL train step on the device-resident
path; only the noise epilogue changes):

- ``base``     — production: threefry float32 noise (the suspect).
- ``nonoise``  — noise_std_max=0: removes the epilogue entirely; the
                 delta to base bounds everything this lab can win.
- ``rbg``      — same math, but the big normal draw uses the RBG
                 generator (hardware RNG path) keyed from 4 threefry
                 words. Parity-legal: RNG STREAMS differ from the torch
                 reference by construction (docs/PARITY.md); the noise
                 distribution is unchanged.
- ``bf16``     — normal drawn in bfloat16 and the add/clip kept in bf16:
                 halves the epilogue's arithmetic width (noise std ~0.03
                 against values in [0,1] — bf16's ~3 decimal digits
                 dwarf the noise itself).
- ``rbg_bf16`` — both.

Usage (TPU): python scripts/fusion114_lab.py --json docs/fusion114_lab.json
CPU smoke:   python scripts/fusion114_lab.py --force-cpu --height 48 --width 64 \
                 --batch-size 8 --steps 8 --variants base,rbg
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


def _log(msg: str) -> None:
    print(f"[f114 +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def make_noise_variant(kind: str):
    """A noise_and_clip_stereo replacement implementing one variant."""
    import jax
    import jax.numpy as jnp

    def noise_fn(key, stereo, noise_std_left, noise_std_right, enabled):
        dtype = jnp.bfloat16 if kind in ("bf16", "rbg_bf16") else jnp.float32
        img = stereo.astype(dtype)
        if enabled:
            std6 = jnp.concatenate(
                [
                    jnp.repeat(noise_std_left[:, None], 3, axis=1),
                    jnp.repeat(noise_std_right[:, None], 3, axis=1),
                ],
                axis=1,
            ).astype(dtype)
            if kind in ("rbg", "rbg_bf16"):
                # Hardware-RNG generator keyed from 4 threefry words: the
                # per-step stream stays a pure function of the train key.
                data = jax.random.bits(key, (4,), jnp.uint32)
                key = jax.random.wrap_key_data(data, impl="rbg")
            noise = jax.random.normal(key, img.shape, dtype)
            img = img + noise * std6[:, None, None, :]
        return jnp.clip(img, 0.0, 1.0)

    return noise_fn


def measure(variant: str, hw, batch_size, steps, windows, cache_dir) -> dict:
    import jax
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops import augment, augment_pallas
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import create_train_state, make_adamw
    from stereo_depth_estimation_tpu.parallel.aot_cache import (
        compile_with_disk_cache,
    )
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
        make_train_step,
    )

    original = augment.noise_and_clip_stereo
    config = AugmentConfig()
    if variant == "nonoise":
        config = AugmentConfig(noise_std_max=0.0)
    elif variant != "base":
        replacement = make_noise_variant(variant)
        augment.noise_and_clip_stereo = replacement
        augment_pallas.noise_and_clip_stereo = replacement
    try:
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
        state = jax.jit(
            lambda key: create_train_state(model, key, hw, tx)
        )(jax.random.key(0))
        # AOT-cache each variant's step program (repeat lab runs skip the
        # O(100 s) per-process recompile; the digests differ per variant).
        jitted = make_train_step(model, tx, config)
        example_batch = {
            "input": jnp.zeros((batch_size, *hw, 6), jnp.uint8),
            "target": jnp.zeros((batch_size, *hw), jnp.float16),
        }
        inner, src = compile_with_disk_cache(
            jitted, cache_dir, state, example_batch,
        )
        _log(f"{variant}: step program ready ({src})")
        step = make_device_data_train_step(
            model, tx, images, targets, batch_size, config,
            step_fn=inner, aot_cache_dir=str(cache_dir),
        )
        t0 = time.perf_counter()
        state, stats = step(state)
        _ = float(np.asarray(stats.nll_sum))
        compile_s = time.perf_counter() - t0
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
            _log(f"{variant}: window {w}: {rate:.1f} pairs/s"
                 + (" (warmup, discarded)" if w == 0 else ""))
            if w > 0:
                rates.append(round(rate, 1))
        return {
            "variant": variant,
            "pairs_per_sec_median": float(np.median(rates)),
            "ms_per_step_median": round(
                batch_size / float(np.median(rates)) * 1e3, 2
            ),
            "windows": rates,
            "compile_seconds": round(compile_s, 1),
            "nll_finite": bool(np.isfinite(float(np.asarray(stats.nll_sum)))),
        }
    finally:
        augment.noise_and_clip_stereo = original
        augment_pallas.noise_and_clip_stereo = original


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--windows", type=int, default=3)
    parser.add_argument("--variants", type=str,
                        default="base,nonoise,rbg,bf16,rbg_bf16")
    parser.add_argument("--force-cpu", action="store_true")
    parser.add_argument("--json", type=Path, default=None)
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    results = []
    for variant in args.variants.split(","):
        results.append(
            measure(
                variant.strip(), (args.height, args.width), args.batch_size,
                args.steps, args.windows, REPO / ".jax_cache",
            )
        )
        print(json.dumps(results[-1]), flush=True)
    summary = {
        "metric": "fusion114_lab",
        "hw": [args.height, args.width],
        "batch_size": args.batch_size,
        "device": str(jax.devices()[0]),
        "results": results,
    }
    print(json.dumps(summary))
    if args.json:
        args.json.write_text(json.dumps(summary, indent=2) + "\n")


if __name__ == "__main__":
    main()
