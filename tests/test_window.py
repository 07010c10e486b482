"""HBM-windowed device-resident data (parallel/window.py): plan geometry,
per-epoch sample coverage in pinned and rotating modes, shard-locality of
the gather, mesh sharding of staged windows, and trainer integration on a
multi-device mesh — the restrictions this lifts are round 3's
single-device/whole-set-fits-HBM device-resident mode."""

from pathlib import Path

import jax
import numpy as np
import pytest

from stereo_depth_estimation_tpu.parallel.mesh import make_mesh
from stereo_depth_estimation_tpu.parallel.window import (
    HBMWindowLoader,
    default_hbm_budget_bytes,
    plan_windows,
)

pytestmark = pytest.mark.slow  # multi-window trainer integration (117s on 1 CPU)


HW = (8, 8)
BYTES_PER_SAMPLE = HW[0] * HW[1] * 6 + HW[0] * HW[1] * 2  # u8 images + f16 disp


def _make_payload(n: int):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n, *HW, 6), dtype=np.uint8)
    # Target encodes the sample index so gathered batches are identifiable.
    targets = np.broadcast_to(
        np.arange(n, dtype=np.float16)[:, None, None], (n, *HW)
    ).copy()

    def fetch(indices: np.ndarray) -> dict[str, np.ndarray]:
        idx = np.asarray(indices)
        return {"input": images[idx], "target": targets[idx]}

    return images, targets, fetch


def _collect_epoch_sample_ids(loader: HBMWindowLoader, epoch: int) -> list[int]:
    ids: list[int] = []
    for images, targets, seed, pos in loader.epoch_batches(epoch):
        batch = loader.gather(images, targets, seed, pos)
        got = np.asarray(batch["target"])[:, 0, 0].astype(np.int64)
        assert batch["input"].shape[0] == loader.plan.batch_size
        ids.extend(got.tolist())
    return ids


def test_plan_pinned_when_fits() -> None:
    plan = plan_windows(64, 8, BYTES_PER_SAMPLE, budget_bytes=1 << 30)
    assert plan.pinned and plan.num_windows == 1
    assert plan.window_samples == 64 and plan.steps_per_epoch == 8


def test_plan_rotating_geometry() -> None:
    # Budget for ~3 windows of the 64-sample set: windows double-buffer, so
    # each window gets budget/2.
    budget = 2 * 24 * BYTES_PER_SAMPLE
    plan = plan_windows(64, 8, BYTES_PER_SAMPLE, budget_bytes=budget)
    assert not plan.pinned
    assert plan.window_samples == 24
    assert plan.num_windows == 3  # 24+24+16(wrap-filled to 24)
    assert plan.steps_per_window == 3


def test_plan_rejects_impossible_budget() -> None:
    with pytest.raises(ValueError, match="cannot hold"):
        plan_windows(64, 8, BYTES_PER_SAMPLE, budget_bytes=BYTES_PER_SAMPLE)


def test_pinned_epoch_covers_every_sample_once() -> None:
    n = 32
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:4])
    loader = HBMWindowLoader(
        fetch, n, batch_size=8, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE, budget_bytes=1 << 30, seed=3,
    )
    assert loader.plan.pinned
    ids_e1 = _collect_epoch_sample_ids(loader, epoch=1)
    assert sorted(ids_e1) == list(range(n))  # exactly once each
    ids_e2 = _collect_epoch_sample_ids(loader, epoch=2)
    assert sorted(ids_e2) == list(range(n))
    assert ids_e1 != ids_e2  # fresh permutation per epoch


def test_rotating_epoch_covers_every_sample() -> None:
    n = 40  # windows of 16 -> third wrap-fills 8 duplicates
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:2])
    loader = HBMWindowLoader(
        fetch, n, batch_size=8, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE,
        budget_bytes=2 * 16 * BYTES_PER_SAMPLE, seed=3,
    )
    assert not loader.plan.pinned
    assert loader.plan.window_samples == 16
    assert loader.plan.num_windows == 3
    ids = _collect_epoch_sample_ids(loader, epoch=1)
    assert len(ids) == loader.plan.num_windows * loader.plan.window_samples
    assert set(ids) == set(range(n))  # every sample appears
    counts = np.bincount(ids, minlength=n)
    assert counts.max() <= 2  # wrap-fill duplicates at most once

    # Prefetch (threaded) and non-prefetch rotation agree batch-for-batch.
    loader_sync = HBMWindowLoader(
        fetch, n, batch_size=8, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE,
        budget_bytes=2 * 16 * BYTES_PER_SAMPLE, seed=3, prefetch=False,
    )
    assert ids == _collect_epoch_sample_ids(loader_sync, epoch=1)


def test_gather_contains_no_cross_device_collectives() -> None:
    """The in-window gather must stay shard-local: its compiled HLO has no
    collective ops (the whole point of the per-shard permutation)."""
    n = 32
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:4])
    loader = HBMWindowLoader(
        fetch, n, batch_size=8, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE, budget_bytes=1 << 30,
    )
    images, targets = loader._pinned_window
    lowered = loader.gather.lower(images, targets, np.int32(1), np.int32(0))
    hlo = lowered.compile().as_text()
    for op in ("all-gather", "all-reduce", "all-to-all", "collective-permute"):
        assert op not in hlo, f"unexpected collective {op} in window gather"


def test_window_sharded_over_mesh() -> None:
    n = 32
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:8])
    loader = HBMWindowLoader(
        fetch, n, batch_size=8, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE, budget_bytes=1 << 30,
    )
    images, _targets = loader._pinned_window
    # 8 shards of 4 samples each: per-device memory is n/8 rows.
    shard_shapes = {s.data.shape for s in images.addressable_shards}
    assert shard_shapes == {(4, *HW, 6)}


def test_window_on_2d_spatial_mesh() -> None:
    n = 16
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:8], spatial=2)  # data=4 x spatial=2
    loader = HBMWindowLoader(
        fetch, n, batch_size=8, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE, budget_bytes=1 << 30,
    )
    images, _ = loader._pinned_window
    shard_shapes = {s.data.shape for s in images.addressable_shards}
    assert shard_shapes == {(4, HW[0] // 2, HW[1], 6)}  # data AND height sharded
    ids = _collect_epoch_sample_ids(loader, epoch=1)
    assert sorted(ids) == list(range(n))


def test_default_budget_scales_with_mesh() -> None:
    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh(jax.devices()[:8])
    assert default_hbm_budget_bytes(mesh8) == 8 * default_hbm_budget_bytes(mesh1)


def test_indivisible_batch_rejected() -> None:
    _, _, fetch = _make_payload(32)
    mesh = make_mesh(jax.devices()[:4])
    with pytest.raises(ValueError, match="divide over the data axis"):
        HBMWindowLoader(
            fetch, 32, batch_size=6, mesh=mesh,
            bytes_per_sample=BYTES_PER_SAMPLE, budget_bytes=1 << 30,
        )


# ---------------------------------------------------------------------------
# Trainer integration: multi-device device-resident training (the round-3
# implementation refused any mesh; the windowed loader powers it now).
# ---------------------------------------------------------------------------

def _make_dataset(root: Path, n: int = 12, shape=(32, 32)) -> None:
    from PIL import Image

    from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np

    rng = np.random.default_rng(0)
    base = root / "scene_01" / "dataset" / "data"
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (base / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        stem = f"{i:06d}"
        Image.fromarray(
            rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
        ).save(base / "left/rgb" / f"{stem}.png")
        Image.fromarray(
            rng.uniform(0, 255, (*shape, 3)).astype(np.uint8)
        ).save(base / "right/rgb" / f"{stem}.png")
        Image.fromarray(
            disparity_encode_np(rng.uniform(0.5, 20.0, shape).astype(np.float32))
        ).save(base / "left/disparity" / f"{stem}.png")


def test_trainer_device_resident_on_mesh(tmp_path: Path) -> None:
    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    _make_dataset(tmp_path / "data", n=12)
    cfg = TrainConfig(
        dataset_root=str(tmp_path / "data"),
        height=32, width=32, epochs=2, batch_size=4, val_fraction=0.25,
        seed=42, device="cpu", mesh_devices=4, compute_dtype="float32",
        mlflow_tracking_uri=str(tmp_path / "mlruns"),
        output_dir=str(tmp_path / "outputs"),
        preview_samples=0, base_channels=8,
        packed_cache_root=str(tmp_path / "packed"),
        device_resident="on",
    )
    summary = train(cfg)
    # 9 train samples pad (wrapped rows) to 12 for 4-way sharding -> 3
    # steps/epoch of global batch 4.
    assert summary["global_step"] == 2 * 3
    assert np.isfinite(summary["best_val_mae"])


def test_trainer_rotating_windows(tmp_path: Path) -> None:
    """Tiny --hbm-window-gb forces multi-window rotation through the full
    trainer; metrics stay finite and steps/epoch match the plan."""
    from stereo_depth_estimation_tpu.training.config import TrainConfig
    from stereo_depth_estimation_tpu.training.trainer import train

    _make_dataset(tmp_path / "data", n=16, shape=(32, 32))
    bytes_per_sample = 32 * 32 * 6 + 32 * 32 * 2
    cfg = TrainConfig(
        dataset_root=str(tmp_path / "data"),
        height=32, width=32, epochs=2, batch_size=4, val_fraction=0.25,
        seed=42, device="cpu", mesh_devices=2, compute_dtype="float32",
        mlflow_tracking_uri=str(tmp_path / "mlruns"),
        output_dir=str(tmp_path / "outputs"),
        preview_samples=0, base_channels=8,
        packed_cache_root=str(tmp_path / "packed"),
        device_resident="on",
        # Total budget 10 samples < the 12-sample train split -> rotating
        # mode with double-buffered windows of floor(5/4)*4 = 4 samples.
        hbm_window_gb=10 * bytes_per_sample / (1 << 30) / 2,
    )
    summary = train(cfg)
    # 12 train samples -> 3 windows x 1 step per epoch.
    assert summary["global_step"] == 2 * 3
    assert np.isfinite(summary["best_val_mae"])


def test_rotating_with_indivisible_sample_count() -> None:
    """n not divisible by the data axis: the padded permutation must wrap
    onto REAL sample indices before hitting the packed-cache fetch
    (regression: the wrap used the padded count, letting index n reach the
    memmap and raise IndexError)."""
    n = 41  # padded to 42 on a 2-wide data axis
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:2])
    loader = HBMWindowLoader(
        fetch, n, batch_size=6, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE,
        budget_bytes=2 * 18 * BYTES_PER_SAMPLE, seed=5,
    )
    assert not loader.plan.pinned
    ids = _collect_epoch_sample_ids(loader, epoch=0)
    assert max(ids) < n and min(ids) >= 0
    assert set(ids) == set(range(n))  # every real sample still appears


def test_stage_rows_multihost_single_process_equals_device_put() -> None:
    """stage_rows_multihost on a single process (where every device is
    local) must assemble exactly device_put(fetch(indices), sharding) —
    the multihost path's correctness reduces to per-device block math,
    which is topology-independent."""
    import jax
    import numpy as np

    from stereo_depth_estimation_tpu.parallel.distributed import (
        stage_rows_multihost,
    )
    from stereo_depth_estimation_tpu.parallel.mesh import make_mesh
    from stereo_depth_estimation_tpu.parallel.window import window_sharding

    mesh = make_mesh(devices=jax.devices()[:4], spatial=2)  # 2 data x 2 spatial
    sharding = window_sharding(mesh)
    rng = np.random.default_rng(3)
    store_images = rng.integers(0, 256, (10, 8, 6, 6), dtype=np.uint8)
    store_targets = rng.uniform(0, 20, (10, 8, 6)).astype(np.float16)

    def fetch(rows: np.ndarray) -> dict[str, np.ndarray]:
        return {"input": store_images[rows], "target": store_targets[rows]}

    indices = np.array([7, 1, 4, 9, 0, 2])  # window of 6 rows
    staged = stage_rows_multihost(fetch, indices, sharding)
    direct = {
        key: jax.device_put(value, sharding)
        for key, value in fetch(indices).items()
    }
    for key in direct:
        assert staged[key].sharding.is_equivalent_to(
            direct[key].sharding, staged[key].ndim
        )
        np.testing.assert_array_equal(
            np.asarray(staged[key]), np.asarray(direct[key])
        )


def test_rotating_producer_bounds_hbm_to_two_windows() -> None:
    """The producer must not START staging window k+2 until the consumer
    releases window k (ADVICE r4: q.put evaluated its staged argument
    before blocking, so three windows could be device-resident while
    plan_windows budgeted for two)."""
    import time

    n, batch = 16, 4
    _, _, fetch = _make_payload(n)
    stage_starts: dict[int, float] = {}
    calls = {"n": 0}

    def logging_fetch(indices: np.ndarray) -> dict[str, np.ndarray]:
        stage_starts[calls["n"]] = time.monotonic()
        calls["n"] += 1
        return fetch(indices)

    mesh = make_mesh(jax.devices()[:1])
    loader = HBMWindowLoader(
        logging_fetch, n, batch_size=batch, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE,
        # Budget of 8 samples double-buffered -> windows of 4 = 1 step each.
        budget_bytes=8 * BYTES_PER_SAMPLE, seed=0,
    )
    assert loader.plan.num_windows == 4 and loader.plan.steps_per_window == 1

    last_w0_batch_consumed = None
    for i, wb in enumerate(loader.epoch_batches(epoch=0)):
        _ = loader.gather(*wb)
        if i == 0:
            # Slow consumer: without slot gating the producer would have
            # staged window 2 long before this sleep ends.
            time.sleep(0.5)
            last_w0_batch_consumed = time.monotonic()
    # Window 2's staging may begin only after window 0 was released, which
    # happens strictly after its last batch was consumed.
    assert stage_starts[2] > last_w0_batch_consumed


def test_rotating_early_break_tears_down_promptly() -> None:
    """Closing the epoch generator mid-window must stop the producer and
    return quickly (ADVICE r4: a producer blocked in q.put never saw the
    stop event, stalling teardown for the full 60 s join timeout and
    leaking a staged window)."""
    import time

    n, batch = 16, 4
    _, _, fetch = _make_payload(n)
    mesh = make_mesh(jax.devices()[:1])
    loader = HBMWindowLoader(
        fetch, n, batch_size=batch, mesh=mesh,
        bytes_per_sample=BYTES_PER_SAMPLE,
        budget_bytes=8 * BYTES_PER_SAMPLE, seed=0,
    )
    gen = loader.epoch_batches(epoch=0)
    next(gen)  # producer is now staged ahead and blocked on the full queue
    time.sleep(0.2)
    t0 = time.monotonic()
    gen.close()  # raises GeneratorExit at the yield -> finally -> join
    assert time.monotonic() - t0 < 10.0
