"""Data layer: discovery, split, cache key scheme, read-through cache,
packed cache, and batch pipeline. Mirrors reference tests/test_dataset.py
plus coverage the reference lacks."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from stereo_depth_estimation_tpu.data import (
    StereoSample,
    StereoSampleLoader,
    discover_samples,
    load_cached_sample,
    sample_cache_relpath,
    split_samples,
)
from stereo_depth_estimation_tpu.data.packed_cache import (
    PackedCache,
    build_packed_cache,
)
from stereo_depth_estimation_tpu.data.pipeline import (
    batch_iterator,
    epoch_indices,
    loader_fetch,
    prefetch_to_device,
)
from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np


def _write_rgb(path: Path, shape: tuple[int, int], value: int = 0) -> None:
    h, w = shape
    Image.fromarray(np.full((h, w, 3), value, dtype=np.uint8), mode="RGB").save(path)


def _write_disparity(path: Path, disparity: np.ndarray) -> None:
    Image.fromarray(disparity_encode_np(disparity), mode="RGB").save(path)


def _make_scene(
    root: Path, scene: str, stems: list[str], shape=(2, 4), disparity_value=1.5
) -> None:
    base = root / scene / "dataset" / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (base / sub).mkdir(parents=True, exist_ok=True)
    for stem in stems:
        _write_rgb(base / "left" / "rgb" / f"{stem}.png", shape)
        _write_rgb(base / "right" / "rgb" / f"{stem}.png", shape)
        _write_disparity(
            base / "left" / "disparity" / f"{stem}.png",
            np.full(shape, disparity_value, dtype=np.float32),
        )


def test_discover_samples_walks_canonical_layout(tmp_path: Path) -> None:
    _make_scene(tmp_path, "scene_01", ["000001", "000002"])
    _make_scene(tmp_path, "scene_02", ["000001"])
    # incomplete scene is skipped
    (tmp_path / "scene_bad" / "dataset" / "data" / "left" / "rgb").mkdir(parents=True)
    samples = discover_samples(tmp_path)
    assert len(samples) == 3
    assert samples[0].left_rgb_path.name == "000001.png"


def test_discover_jpg_fallback(tmp_path: Path) -> None:
    base = tmp_path / "s" / "dataset" / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (base / sub).mkdir(parents=True)
    Image.fromarray(np.zeros((2, 4, 3), np.uint8)).save(base / "left/rgb/f.jpg")
    Image.fromarray(np.zeros((2, 4, 3), np.uint8)).save(base / "right/rgb/f.jpeg")
    _write_disparity(base / "left/disparity/f.png", np.ones((2, 4), np.float32))
    samples = discover_samples(tmp_path)
    assert len(samples) == 1
    assert samples[0].left_rgb_path.suffix == ".jpg"
    assert samples[0].right_rgb_path.suffix == ".jpeg"


def test_split_samples_seeded_and_guarded() -> None:
    items = list(range(100))
    train, val = split_samples(items, 0.1, seed=42)
    train2, val2 = split_samples(items, 0.1, seed=42)
    assert train == train2 and val == val2
    assert len(val) == 10 and len(train) == 90
    assert sorted(train + val) == items
    assert split_samples(items, 0.0, seed=0)[1] == []
    with pytest.raises(ValueError):
        split_samples([1], 0.5, seed=0)  # val would consume all data
    with pytest.raises(ValueError):
        split_samples(items, 1.0, seed=0)  # fraction out of range


def test_cache_relpath_canonical_and_misc() -> None:
    sample = StereoSample(
        Path("/data/scene_01/dataset/data/left/rgb/000123.png"),
        Path("/data/scene_01/dataset/data/right/rgb/000123.png"),
        Path("/data/scene_01/dataset/data/left/disparity/000123.png"),
    )
    assert sample_cache_relpath(sample) == Path("scene_01/000123.npz")

    odd = StereoSample(
        Path("/tmp/left_view.png"), Path("/tmp/right_view.png"), Path("/tmp/disp_42.png")
    )
    relpath = sample_cache_relpath(odd)
    assert relpath.parent == Path("misc")
    assert relpath.name.startswith("disp_42_")
    assert relpath.suffix == ".npz"
    assert relpath == sample_cache_relpath(odd)


def test_loader_read_through_cache(tmp_path: Path) -> None:
    _make_scene(tmp_path / "data", "scene_01", ["000001"], disparity_value=1.25)
    cache_root = tmp_path / "cache"
    samples = discover_samples(tmp_path / "data")
    loader = StereoSampleLoader(samples, image_size=(2, 4), cache_root=cache_root)
    cache_file = cache_root / sample_cache_relpath(samples[0])
    assert not cache_file.exists()
    first = loader[0]
    assert cache_file.exists()
    second = loader[0]
    np.testing.assert_allclose(first["target"], second["target"], atol=1e-3)
    assert load_cached_sample(cache_file, (2, 4)) is not None
    # invalid size -> None
    assert load_cached_sample(cache_file, (4, 8)) is None


def test_loader_require_cache_fail_fast(tmp_path: Path) -> None:
    _make_scene(tmp_path / "data", "scene_01", ["000001"])
    samples = discover_samples(tmp_path / "data")
    loader = StereoSampleLoader(
        samples, image_size=(2, 4), cache_root=tmp_path / "cache", require_cache=True
    )
    with pytest.raises(FileNotFoundError):
        loader[0]


def test_loader_disparity_width_scaling(tmp_path: Path) -> None:
    # The reference's key invariant (tests/test_dataset.py:38-61).
    _make_scene(tmp_path, "s", ["a"], shape=(2, 4), disparity_value=1.5)
    loader = StereoSampleLoader(discover_samples(tmp_path), image_size=(2, 8))
    item = loader[0]
    np.testing.assert_allclose(item["target"], np.full((2, 8), 3.0), atol=1e-3)
    assert item["input"].shape == (2, 8, 6)
    assert item["input"].dtype == np.uint8
    assert item["valid_mask"].all()


def test_empty_samples_rejected() -> None:
    with pytest.raises(ValueError):
        StereoSampleLoader([], image_size=(2, 4))


def test_packed_cache_round_trip(tmp_path: Path) -> None:
    _make_scene(tmp_path / "d", "s1", ["a", "b", "c"], shape=(4, 8))
    loader = StereoSampleLoader(discover_samples(tmp_path / "d"), image_size=(4, 8))
    meta = build_packed_cache(loader, tmp_path / "packed")
    assert meta["num_samples"] == 3
    cache = PackedCache(tmp_path / "packed")
    assert len(cache) == 3
    batch = cache.gather(np.array([2, 0]))
    assert batch["input"].shape == (2, 4, 8, 6)
    assert batch["input"].dtype == np.uint8
    assert batch["target"].dtype == np.float16
    ref = loader[2]
    np.testing.assert_array_equal(batch["input"][0], ref["input"])
    np.testing.assert_allclose(
        batch["target"][0].astype(np.float32), ref["target"], atol=1e-2
    )


def test_epoch_indices_deterministic_and_complete() -> None:
    a = epoch_indices(10, 3, shuffle=True, seed=1, epoch=5)
    b = epoch_indices(10, 3, shuffle=True, seed=1, epoch=5)
    c = epoch_indices(10, 3, shuffle=True, seed=1, epoch=6)
    assert [x.tolist() for x in a] == [x.tolist() for x in b]
    assert [x.tolist() for x in a] != [x.tolist() for x in c]
    assert sorted(np.concatenate(a).tolist()) == list(range(10))
    assert len(epoch_indices(10, 3, shuffle=False, seed=0, epoch=0, drop_last=True)) == 3


def test_batch_iterator_and_prefetch(tmp_path: Path) -> None:
    _make_scene(tmp_path, "s1", ["a", "b", "c", "d", "e"], shape=(4, 8))
    loader = StereoSampleLoader(discover_samples(tmp_path), image_size=(4, 8))
    it = batch_iterator(loader_fetch(loader), len(loader), 2, shuffle=False)
    batches = list(prefetch_to_device(it))
    assert len(batches) == 3
    assert batches[0]["input"].shape == (2, 4, 8, 6)
    assert batches[-1]["input"].shape == (1, 4, 8, 6)


def test_prefetch_propagates_errors() -> None:
    def bad_iter():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")

    gen = prefetch_to_device(bad_iter())
    next(gen)
    with pytest.raises(RuntimeError, match="boom"):
        list(gen)


def test_samples_fingerprint_is_order_and_membership_sensitive(tmp_path: Path) -> None:
    from stereo_depth_estimation_tpu.data.packed_cache import samples_fingerprint

    _make_scene(tmp_path, "s1", ["a", "b", "c"], shape=(4, 8))
    samples = discover_samples(tmp_path)
    fp = samples_fingerprint(samples)
    assert fp == samples_fingerprint(list(samples))  # deterministic
    assert fp != samples_fingerprint(samples[::-1])  # order-sensitive
    assert fp != samples_fingerprint(samples[:-1])  # membership-sensitive
