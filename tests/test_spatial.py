"""Spatial (height) sharding over a 2-D (data, spatial) mesh.

The resolution-scaling analog of sequence parallelism for this workload
(SURVEY.md §2): image height shards over the ``spatial`` mesh axis and
XLA's SPMD partitioner inserts the halo exchanges each 3x3 conv needs at
shard edges — the model code is untouched. These tests pin that a
spatially-sharded forward/train step is numerically the same program as
the single-device one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_depth_estimation_tpu.models import StereoUNet
from stereo_depth_estimation_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from stereo_depth_estimation_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch_to_mesh,
)

pytestmark = pytest.mark.slow  # 2-D mesh halo-exchange runs (106s on 1 CPU)


HW = (64, 48)


def _need_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _batch(n=4):
    rng = np.random.default_rng(0)
    inputs = rng.uniform(0, 1, (n, *HW, 6)).astype(np.float32)
    target = (inputs[..., 0] * 4.0 + 1.0).astype(np.float32)
    target[:, :3, :] = 0.0
    return {"input": inputs, "target": target}


def test_mesh_factoring_and_batch_sharding_spec() -> None:
    _need_8()
    mesh = make_mesh(spatial=4)
    assert dict(mesh.shape) == {"data": 2, "spatial": 4}
    with pytest.raises(ValueError, match="factor"):
        make_mesh(jax.devices()[:6], spatial=4)


def test_spatially_sharded_forward_matches_single_device() -> None:
    _need_8()
    model = StereoUNet(base_channels=8)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, *HW, 6)), train=False,
        return_uncertainty=True,
    )
    b = _batch()
    ref_d, ref_lv = model.apply(
        variables, jnp.asarray(b["input"]), train=False, return_uncertainty=True
    )

    mesh = make_mesh(spatial=4)
    vs = replicate_to_mesh(variables, mesh)
    xs = shard_batch_to_mesh(dict(b), mesh)
    fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=False, return_uncertainty=True)
    )
    out_d, out_lv = fwd(vs, xs["input"])
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_lv), np.asarray(ref_lv), atol=2e-5)


def test_spatially_sharded_train_step_matches_single_device() -> None:
    _need_8()
    import optax

    model = StereoUNet(base_channels=4)
    tx = optax.sgd(1e-2)  # linear in grads; see test_train_step.py rationale
    b = _batch(n=4)

    state1 = create_train_state(model, jax.random.key(1), HW, tx)
    step = make_train_step(model, tx)
    state1, stats1 = step(state1, {k: jnp.asarray(v) for k, v in b.items()})

    mesh = make_mesh(spatial=4)
    state2 = create_train_state(model, jax.random.key(1), HW, tx)
    state2 = replicate_to_mesh(state2, mesh)
    step2 = make_train_step(model, tx)
    state2, stats2 = step2(state2, shard_batch_to_mesh(dict(b), mesh))

    assert int(stats1.valid_count) == int(stats2.valid_count)
    np.testing.assert_allclose(
        float(stats1.nll_sum), float(stats2.nll_sum), rtol=1e-5
    )
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-4
        ),
        state1.params,
        jax.device_get(state2.params),
    )


def test_spatial_mesh_pads_indivisible_batch_and_evals_exactly() -> None:
    _need_8()
    model = StereoUNet(base_channels=4)
    import optax

    state = create_train_state(model, jax.random.key(2), HW, optax.sgd(1e-2))
    eval_step = make_eval_step(model)
    b = _batch(n=5)  # indivisible by the data axis (2)

    stats_ref = eval_step(state, {k: jnp.asarray(v) for k, v in b.items()})
    mesh = make_mesh(spatial=4)
    state8 = replicate_to_mesh(state, mesh)
    sharded = shard_batch_to_mesh(dict(b), mesh)
    assert sharded["input"].shape[0] == 6  # padded to the data axis (2)
    stats = eval_step(state8, sharded)
    assert int(stats.valid_count) == int(stats_ref.valid_count)
    np.testing.assert_allclose(
        float(stats.nll_sum), float(stats_ref.nll_sum), rtol=1e-5
    )
