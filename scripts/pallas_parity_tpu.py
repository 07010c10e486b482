"""Record on-TPU Pallas-vs-XLA augmentation parity as a committed artifact.

The interpret-mode parity fuzz (tests/test_augment_pallas.py) runs in CI on
CPU; this script compiles the kernel natively on the real chip and records
max |pallas - xla| per fuzz config into ``docs/pallas_parity_tpu.json`` so
the on-hardware parity claim in docs/PERF.md is a durable, refreshable
artifact rather than prose.

Usage (on a machine with the TPU attached):
    python scripts/pallas_parity_tpu.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from datetime import datetime, timezone


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from stereo_depth_estimation_tpu.ops.augment import (
        AugmentConfig,
        augment_stereo_batch,
    )
    from stereo_depth_estimation_tpu.ops.augment_pallas import (
        augment_stereo_batch_pallas,
    )

    device = jax.devices()[0]
    assert device.platform == "tpu", f"needs a TPU, got {device.platform}"

    configs = [
        ("defaults", AugmentConfig(), (4, 240, 320)),
        ("blur_always", AugmentConfig(blur_prob=1.0), (4, 240, 320)),
        ("no_blur_no_noise",
         AugmentConfig(blur_prob=0.0, noise_std_max=0.0), (4, 240, 320)),
        ("strong_jitter",
         AugmentConfig(brightness_jitter=0.5, contrast_jitter=0.5,
                       saturation_jitter=0.5, hue_jitter=0.25,
                       gamma_jitter=0.5, blur_prob=0.5), (4, 240, 320)),
        ("large_image_xla_blur_fallback",
         AugmentConfig(blur_prob=1.0), (2, 480, 640)),
        ("small_odd_shape", AugmentConfig(blur_prob=0.7), (3, 36, 52)),
    ]

    results = []
    rng = np.random.default_rng(0)
    for name, cfg, (n, h, w) in configs:
        x = jnp.asarray(rng.integers(0, 256, (n, h, w, 6), dtype=np.uint8))
        # Deterministic per-config seed: Python's str hash is
        # PYTHONHASHSEED-randomised per process, which would regenerate the
        # committed parity artifact from different inputs every run.
        key = jax.random.key(
            int.from_bytes(
                hashlib.blake2s(name.encode(), digest_size=2).digest(), "little"
            )
        )
        ref = augment_stereo_batch(
            key, x.astype(jnp.float32) / 255.0, cfg
        )
        out = augment_stereo_batch_pallas(key, x, cfg)  # compiled, NOT interpret
        max_err = float(jnp.max(jnp.abs(out - ref)))
        out_bf16 = augment_stereo_batch_pallas(
            key, x, cfg, out_dtype=jnp.bfloat16
        ).astype(jnp.float32)
        max_err_bf16 = float(jnp.max(jnp.abs(out_bf16 - ref)))
        results.append(
            {"config": name, "shape": [n, h, w],
             "max_abs_err_f32": max_err, "max_abs_err_bf16_out": max_err_bf16}
        )
        print(f"{name:<34} f32 {max_err:.2e}   bf16-out {max_err_bf16:.2e}",
              file=sys.stderr)
        assert max_err < 1e-4, (name, max_err)
        assert max_err_bf16 < 1.5 / 128.0, (name, max_err_bf16)  # bf16 ulp scale

    artifact = {
        "generated_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "device": str(device),
        "jax_version": jax.__version__,
        "note": "max |pallas - xla_chain| per config, kernel compiled on TPU "
                "(interpret=False); bf16-out column additionally rounds the "
                "kernel output to bfloat16 (the bf16 train step's request)",
        "results": results,
    }
    out_path = os.path.join(repo, "docs", "pallas_parity_tpu.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
