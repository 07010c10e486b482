"""Multi-host path: 2 processes x 4 virtual CPU devices == one 8-device run.

Each subprocess joins a gloo-backed jax.distributed runtime, feeds its
stripe of every global batch through MultihostBatcher, and runs SGD steps
on a global 8-device mesh. Both processes must agree with each other AND
with a plain single-process 8-device run on identical data — proving the
per-host feeding assembles exactly the batch a single controller would see.
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
# Avoid TIME_WAIT collisions across quick successive runs.
PORT = 17000 + (os.getpid() % 2000)

_CHILD = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from stereo_depth_estimation_tpu.parallel.distributed import (
        MultihostBatcher, initialize_multihost,
    )
    initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)

    import numpy as np
    import optax
    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state, make_train_step,
    )
    from stereo_depth_estimation_tpu.parallel.mesh import (
        make_mesh, replicate_to_mesh,
    )

    def fetch(indices):
        # Pure function of the sample index: both hosts independently agree.
        idx = np.asarray(indices)
        base = (idx[:, None, None, None] % 7 + 1).astype(np.float32) / 8.0
        inputs = np.broadcast_to(base, (len(idx), 16, 16, 6)).copy()
        target = np.broadcast_to(base[..., 0] * 4.0, (len(idx), 16, 16)).copy()
        return {{"input": inputs, "target": target}}

    mesh = make_mesh()
    assert mesh.size == 8, mesh.size
    batcher = MultihostBatcher(fetch, mesh)
    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(3), (16, 16), tx)
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, tx)
    for batch_idx in ([0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15],
                      [16,17,18,19,20,21,22,23,24,25,26,27,28,29,30,31]):
        state, stats = step(state, batcher(np.asarray(batch_idx)))
    checksum = float(
        sum(abs(np.asarray(jax.device_get(x))).sum()
            for x in jax.tree.leaves(state.params))
    )
    print(f"RESULT pid={{pid}} nll={{float(stats.nll_sum):.6f}} "
          f"valid={{int(stats.valid_count)}} checksum={{checksum:.6f}}",
          flush=True)
    """
).format(repo=str(REPO))


def _single_process_reference():
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

    def fetch(indices):
        idx = np.asarray(indices)
        base = (idx[:, None, None, None] % 7 + 1).astype(np.float32) / 8.0
        inputs = np.broadcast_to(base, (len(idx), 16, 16, 6)).copy()
        target = np.broadcast_to(base[..., 0] * 4.0, (len(idx), 16, 16)).copy()
        return {"input": inputs, "target": target}

    mesh = make_mesh()
    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(3), (16, 16), tx)
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(model, tx)
    for batch_idx in (np.arange(16), np.arange(16, 32)):
        state, stats = step(state, shard_batch_to_mesh(fetch(batch_idx), mesh))
    checksum = float(
        sum(
            abs(np.asarray(jax.device_get(x))).sum()
            for x in jax.tree.leaves(state.params)
        )
    )
    return float(stats.nll_sum), int(stats.valid_count), checksum


def test_two_process_training_matches_single_controller() -> None:
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

    assert results[0] == results[1], results  # replicated outputs agree
    ref_nll, ref_valid, ref_checksum = _single_process_reference()
    nll, valid, checksum = results[0]
    assert valid == ref_valid
    np.testing.assert_allclose(nll, ref_nll, rtol=1e-5)
    np.testing.assert_allclose(checksum, ref_checksum, rtol=1e-5)
