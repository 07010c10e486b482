"""Benchmark: end-to-end training throughput (stereo pairs/sec/chip).

Measures steady-state training throughput at 320x240 on the flagship
StereoUNet with the device-resident fast path: the packed cache (uint8
images + f16 disparity — the decoded/cached representation, exactly what the
reference trains from on its cached path) is staged into HBM once, then
every step runs fully on-device: per-epoch permutation, batch gather,
normalise, asymmetric augmentation, forward/backward, AdamW — K steps per
dispatch via lax.scan. Staging is a one-time cost per training run (reported
as ``staging_seconds``; ~1% of a real 100-epoch run) and excluded from the
steady-state rate, mirroring the reference's per-epoch timing
(train.py:630).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N/5000}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 5000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_adamw,
    )
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_loop,
    )

    hw = (240, 320)
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_samples = 2048
    steps_per_call = 10
    bench_calls = 5

    # Synthetic packed-cache payload (uint8 stereo + f16 disparity).
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n_samples, *hw, 6), dtype=np.uint8)
    targets = rng.uniform(0.5, 64.0, (n_samples, *hw)).astype(np.float16)

    t_stage0 = time.perf_counter()
    images_dev = jax.device_put(jnp.asarray(images))
    targets_dev = jax.device_put(jnp.asarray(targets))
    jax.block_until_ready(images_dev)
    staging_seconds = time.perf_counter() - t_stage0

    model = StereoUNet(compute_dtype=jnp.bfloat16)
    tx = make_adamw(1e-3, 1e-4)
    state = create_train_state(model, jax.random.key(0), hw, tx)
    loop = make_device_data_train_loop(
        model, tx, images_dev, targets_dev, batch_size,
        AugmentConfig(), steps_per_call=steps_per_call,
    )

    # Warmup: compile + settle.
    state, stats = loop(state)
    _ = float(np.asarray(stats.nll_sum)[-1])  # full sync

    start = time.perf_counter()
    for _ in range(bench_calls):
        state, stats = loop(state)
    _ = float(np.asarray(stats.nll_sum)[-1])  # sync on final call
    elapsed = time.perf_counter() - start

    pairs = bench_calls * steps_per_call * batch_size
    pairs_per_sec = pairs / elapsed
    print(
        json.dumps(
            {
                "metric": "stereo_pairs_per_sec_per_chip_320x240_e2e",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                "batch_size": batch_size,
                "staging_seconds": round(staging_seconds, 2),
                "steps_measured": bench_calls * steps_per_call,
            }
        )
    )


if __name__ == "__main__":
    main()
