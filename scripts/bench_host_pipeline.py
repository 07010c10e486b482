"""Host input-pipeline micro-benchmark: decode paths, workers, cache tiers.

The end-to-end target includes decode, and the host must source at least
what the chip consumes (see docs/PERF.md / the latest BENCH_r*.json for the
current chip rate; override with --chip-rate). This measures what
each tier of the input pipeline actually delivers on this machine:

1. raw source (PIL decode + resize per sample), num_workers in {0, 4, 8};
2. the per-sample .npz read-through cache;
3. the packed memmap cache (one fancy-index gather per batch).

Usage: python scripts/bench_host_pipeline.py [n_samples] [batch_size]
Prints one line per tier: samples/s and whether it keeps up with the chip.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stereo_depth_estimation_tpu.data.cache import (
    sample_cache_relpath,
    save_cached_sample,
)
from stereo_depth_estimation_tpu.data.dataset import StereoSampleLoader
from stereo_depth_estimation_tpu.data.packed_cache import (
    PackedCache,
    build_packed_cache,
)
from stereo_depth_estimation_tpu.data.pipeline import batch_iterator, loader_fetch
from stereo_depth_estimation_tpu.data.samples import discover_samples
from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np

# Default comparison rate; pass --chip-rate to pin to the latest measured
# number (BENCH_r*.json) since this drifts with every perf round.
CHIP_PAIRS_PER_SEC = 1500.0
SOURCE_HW = (480, 640)
TARGET_HW = (240, 320)


def build_synthetic_tree(root: Path, n: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    base = root / "scene" / "dataset" / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (base / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        for side in ("left", "right"):
            img = rng.integers(0, 256, (*SOURCE_HW, 3), dtype=np.uint8)
            Image.fromarray(img).save(base / side / "rgb" / f"{i:06d}.jpg", quality=90)
        disp = rng.uniform(0.5, 90.0, SOURCE_HW).astype(np.float32)
        Image.fromarray(disparity_encode_np(disp)).save(
            base / "left" / "disparity" / f"{i:06d}.png"
        )


def rate(fetch, n: int, batch_size: int, epochs: int = 2) -> float:
    # First epoch warms the page cache; time the second.
    for batch in batch_iterator(fetch, n, batch_size):
        pass
    start = time.perf_counter()
    seen = 0
    for batch in batch_iterator(fetch, n, batch_size):
        seen += batch["input"].shape[0]
    return seen / (time.perf_counter() - start)


def report(name: str, samples_per_sec: float) -> None:
    verdict = (
        "keeps up" if samples_per_sec >= CHIP_PAIRS_PER_SEC
        else f"BOTTLENECK (chip wants {CHIP_PAIRS_PER_SEC:.0f}/s)"
    )
    print(f"{name:<42} {samples_per_sec:9.1f} samples/s   {verdict}")


def main() -> None:
    global CHIP_PAIRS_PER_SEC
    argv = list(sys.argv[1:])
    if "--chip-rate" in argv:
        i = argv.index("--chip-rate")
        CHIP_PAIRS_PER_SEC = float(argv[i + 1])
        del argv[i : i + 2]
    n = int(argv[0]) if len(argv) > 0 else 64
    batch_size = int(argv[1]) if len(argv) > 1 else 32

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp) / "src"
        build_synthetic_tree(root, n)
        samples = discover_samples(root)
        print(f"{len(samples)} synthetic samples, {SOURCE_HW} -> {TARGET_HW}\n")

        raw = StereoSampleLoader(samples, image_size=TARGET_HW)
        for workers in (0, 4, 8):
            report(
                f"raw source (PIL decode+resize, workers={workers})",
                rate(loader_fetch(raw, num_workers=workers), n, batch_size),
            )

        cache_root = Path(tmp) / "npz"
        for i in range(n):
            left, right, disp = raw.load(i)
            save_cached_sample(
                cache_root / sample_cache_relpath(samples[i]), left, right, disp
            )
        cached = StereoSampleLoader(
            samples, image_size=TARGET_HW, cache_root=cache_root
        )
        for workers in (0, 4):
            report(
                f"npz cache (workers={workers})",
                rate(loader_fetch(cached, num_workers=workers), n, batch_size),
            )

        packed_root = Path(tmp) / "packed"
        build_packed_cache(cached, packed_root)
        packed = PackedCache(packed_root)
        report("packed memmap cache (batch gather)",
               rate(packed.gather, n, batch_size))


if __name__ == "__main__":
    main()
