"""``foundation-stereo-cache`` CLI: pre-resize samples into caches.

CLI parity with reference cache.py:18-112 (same flags, skip-if-exists,
--overwrite, --compress, cache_meta.json manifest) plus ``--packed`` to also
emit the packed memmap cache (the TPU training fast path).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from .cache import sample_cache_relpath, save_cached_sample
from .dataset import StereoSampleLoader
from .packed_cache import build_packed_cache
from .samples import discover_samples


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Build a resized FoundationStereo cache for faster training I/O."
    )
    parser.add_argument(
        "--dataset-root", type=str, required=True,
        help="Path to raw FoundationStereo dataset root.",
    )
    parser.add_argument(
        "--cache-root", type=str, required=True,
        help="Path to write cache files (prefer SSD).",
    )
    parser.add_argument("--height", type=int, default=240, help="Cached image height.")
    parser.add_argument("--width", type=int, default=320, help="Cached image width.")
    parser.add_argument(
        "--max-samples", type=int, default=0, help="Optional cap on number of samples."
    )
    parser.add_argument(
        "--overwrite", action="store_true", help="Overwrite existing cache entries."
    )
    parser.add_argument(
        "--compress", action="store_true",
        help="Use np.savez_compressed (smaller files, slower build/read).",
    )
    parser.add_argument(
        "--packed", action="store_true",
        help="Also build the packed memmap cache at <cache-root>/packed "
             "(fast path for TPU training).",
    )
    return parser.parse_args(argv)


def build_cache(args: argparse.Namespace) -> dict:
    dataset_root = Path(args.dataset_root).expanduser().resolve()
    cache_root = Path(args.cache_root).expanduser().resolve()
    cache_root.mkdir(parents=True, exist_ok=True)

    samples = discover_samples(dataset_root)
    if args.max_samples > 0:
        samples = samples[: args.max_samples]
    if not samples:
        raise ValueError(f"No samples discovered under: {dataset_root}")

    loader = StereoSampleLoader(samples, image_size=(args.height, args.width))
    written = 0
    skipped = 0
    started_at = time.time()
    iterator = enumerate(samples)
    try:
        from tqdm import tqdm

        iterator = enumerate(tqdm(samples, desc="Building cache", unit="sample"))
    except ImportError:
        pass
    for index, sample in iterator:
        cache_file = cache_root / sample_cache_relpath(sample)
        if cache_file.exists() and not args.overwrite:
            skipped += 1
            continue
        left, right, disparity = loader.load(index)
        save_cached_sample(
            cache_file, left, right, disparity, compress=args.compress
        )
        written += 1

    if args.packed:
        cached_loader = StereoSampleLoader(
            samples, image_size=(args.height, args.width), cache_root=cache_root
        )
        build_packed_cache(cached_loader, cache_root / "packed", progress=True)

    elapsed_sec = time.time() - started_at
    metadata = {
        "format_version": 1,
        "dataset_root": str(dataset_root),
        "cache_root": str(cache_root),
        "height": args.height,
        "width": args.width,
        "num_samples_total": len(samples),
        "num_written": written,
        "num_skipped": skipped,
        "compressed": bool(args.compress),
        "packed": bool(args.packed),
        "elapsed_seconds": elapsed_sec,
        "created_at_unix": time.time(),
    }
    (cache_root / "cache_meta.json").write_text(
        json.dumps(metadata, indent=2), encoding="utf-8"
    )
    print(
        "Cache build complete: "
        f"total={len(samples)} written={written} skipped={skipped} "
        f"elapsed={elapsed_sec:.1f}s"
    )
    print(f"Metadata: {cache_root / 'cache_meta.json'}")
    return metadata


def main() -> None:
    build_cache(parse_args())


if __name__ == "__main__":
    main()
