"""Multihost + spatial sharding: per-device block feeding.

The round-3 capability guard (MultihostBatcher raised NotImplementedError on
a ``(data, spatial)`` mesh) is replaced by general per-device assembly:
each process decodes only the batch rows its devices own and contributes
explicit (batch-stripe x height-stripe) blocks via
``jax.make_array_from_single_device_arrays``.

Two checks:

- single-process: MultihostBatcher on a spatial mesh must hand the train
  step exactly the batch ``shard_batch_to_mesh`` would (same step outputs);
- 2-process x 4-virtual-CPU-device farm with an INTERLEAVED mesh layout so
  every data row's spatial shards span both processes (each process owns
  only half the image height of every sample) — the case contiguous
  per-process stripes cannot express. Both processes must agree with a
  plain single-process 8-device run on identical data.

The fetch pattern varies with batch index, image row, AND column, so a
mis-sliced height stripe or a misassigned batch row changes the loss.
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-process gloo farm e2e; fast tier runs with -m 'not slow'


REPO = Path(__file__).resolve().parent.parent
PORT = 19100 + (os.getpid() % 2000)


def _fetch(indices):
    idx = np.asarray(indices)
    row = np.arange(16, dtype=np.float32)[None, :, None]
    col = np.arange(16, dtype=np.float32)[None, None, :]
    base = (idx[:, None, None] % 7 + 1).astype(np.float32)
    plane = (base + row / 16.0 + col / 32.0) / 10.0
    inputs = np.repeat(plane[..., None], 6, axis=-1).copy()
    target = (plane * 4.0).copy()
    return {"input": inputs, "target": target}


def test_spatial_batcher_matches_direct_sharding_single_process() -> None:
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_train_step,
    )
    from stereo_depth_estimation_tpu.parallel.distributed import (
        MultihostBatcher,
    )
    from stereo_depth_estimation_tpu.parallel.mesh import (
        make_mesh,
        replicate_to_mesh,
        shard_batch_to_mesh,
    )

    mesh = make_mesh(jax.devices()[:8], spatial=2)
    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)
    step = make_train_step(model, tx)
    batcher = MultihostBatcher(_fetch, mesh)

    results = []
    # 10 rows on a data=4 axis: exercises pad-and-mask in the general path.
    for make_batch in (
        lambda idx: batcher(idx),
        lambda idx: shard_batch_to_mesh(_fetch(idx), mesh),
    ):
        state = create_train_state(model, jax.random.key(3), (16, 16), tx)
        state = replicate_to_mesh(state, mesh)
        for batch_idx in (np.arange(10), np.arange(10, 20)):
            state, stats = step(state, make_batch(batch_idx))
        checksum = float(
            sum(
                abs(np.asarray(jax.device_get(x))).sum()
                for x in jax.tree.leaves(state.params)
            )
        )
        results.append((float(stats.nll_sum), int(stats.valid_count), checksum))

    assert results[0][1] == results[1][1]
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][2], results[1][2], rtol=1e-6)


_CHILD = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {testdir!r})
    from stereo_depth_estimation_tpu.parallel.distributed import (
        MultihostBatcher, initialize_multihost,
    )
    initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)

    import numpy as np
    import optax
    from test_multihost_spatial import _fetch
    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state, make_train_step,
    )
    from stereo_depth_estimation_tpu.parallel.mesh import (
        make_mesh, replicate_to_mesh,
    )

    # Interleave the two processes' devices so EVERY data row's spatial
    # pair spans both processes: each process owns only half the height
    # of every sample in the batch.
    devs = jax.devices()
    assert len(devs) == 8
    by_proc = [[d for d in devs if d.process_index == p] for p in (0, 1)]
    interleaved = [d for pair in zip(by_proc[0], by_proc[1]) for d in pair]
    mesh = make_mesh(interleaved, spatial=2)
    for row in np.asarray(mesh.devices):
        assert {{d.process_index for d in row}} == {{0, 1}}

    batcher = MultihostBatcher(_fetch, mesh)
    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(3), (16, 16), tx)
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, tx)
    for batch_idx in (np.arange(10), np.arange(10, 20)):
        state, stats = step(state, batcher(np.asarray(batch_idx)))
    checksum = float(
        sum(abs(np.asarray(jax.device_get(x))).sum()
            for x in jax.tree.leaves(state.params))
    )
    print(f"RESULT pid={{pid}} nll={{float(stats.nll_sum):.6f}} "
          f"valid={{int(stats.valid_count)}} checksum={{checksum:.6f}}",
          flush=True)
    """
).format(repo=str(REPO), testdir=str(REPO / "tests"))


def test_two_process_spatial_training_matches_single_controller() -> None:
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(i), "2", str(PORT)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    results = {}
    for proc in procs:
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results[int(parts["pid"])] = (
            float(parts["nll"]),
            int(parts["valid"]),
            float(parts["checksum"]),
        )

    assert results[0] == results[1], results

    import optax

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_train_step,
    )
    from stereo_depth_estimation_tpu.parallel.mesh import (
        make_mesh,
        replicate_to_mesh,
        shard_batch_to_mesh,
    )

    mesh = make_mesh(jax.devices()[:8], spatial=2)
    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(3), (16, 16), tx)
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, tx)
    for batch_idx in (np.arange(10), np.arange(10, 20)):
        state, stats = step(state, shard_batch_to_mesh(_fetch(batch_idx), mesh))
    ref_checksum = float(
        sum(
            abs(np.asarray(jax.device_get(x))).sum()
            for x in jax.tree.leaves(state.params)
        )
    )
    nll, valid, checksum = results[0]
    assert valid == int(stats.valid_count)
    np.testing.assert_allclose(nll, float(stats.nll_sum), rtol=1e-5)
    np.testing.assert_allclose(checksum, ref_checksum, rtol=1e-5)
