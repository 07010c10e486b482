"""AOT executable disk cache (parallel/aot_cache.py): save on first
compile, load (skipping compilation) on the second, fall back cleanly on
corrupt blobs, and key on program content."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from stereo_depth_estimation_tpu.parallel.aot_cache import (
    compile_with_disk_cache,
)


def _fn(x):
    return jnp.sin(x) @ x.T + 1.0


def test_save_then_load_round_trip(tmp_path: Path) -> None:
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
    jitted = jax.jit(_fn)
    compiled1, source1 = compile_with_disk_cache(jitted, tmp_path, x)
    assert source1 in ("compiled", "compiled-unsaved")
    want = np.asarray(compiled1(x))

    if source1 == "compiled-unsaved":
        # Backend refuses serialisation; nothing further to assert here.
        return
    blobs = list(tmp_path.glob("aot_*.bin"))
    assert len(blobs) == 1

    compiled2, source2 = compile_with_disk_cache(jax.jit(_fn), tmp_path, x)
    assert source2 == "aot-cache"
    np.testing.assert_allclose(np.asarray(compiled2(x)), want, rtol=1e-6)


def test_corrupt_blob_falls_back_to_compile(tmp_path: Path) -> None:
    x = jnp.ones((8, 8), jnp.float32)
    _, source1 = compile_with_disk_cache(jax.jit(_fn), tmp_path, x)
    if source1 != "compiled":
        return
    blob = next(tmp_path.glob("aot_*.bin"))
    blob.write_bytes(b"not a pickle")
    compiled, source = compile_with_disk_cache(jax.jit(_fn), tmp_path, x)
    assert source == "compiled"  # recompiled AND re-saved
    np.testing.assert_allclose(
        np.asarray(compiled(x)), np.asarray(_fn(x)), rtol=1e-6
    )


def test_mesh_sharded_donated_program_round_trips(tmp_path: Path) -> None:
    """The real consumer is the donated, mesh-sharded train step: a loaded
    executable must accept the same sharded inputs and produce identical
    results."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stereo_depth_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:4])
    sharding = NamedSharding(mesh, P("data"))

    def step(state, batch):
        return state + jnp.sum(batch, axis=0), jnp.mean(batch * state)

    jitted = jax.jit(step, donate_argnums=(0,))
    state = jax.device_put(jnp.zeros((16,), jnp.float32),
                           NamedSharding(mesh, P()))
    batch = jax.device_put(
        jnp.asarray(np.random.default_rng(0).normal(size=(8, 16)), jnp.float32),
        sharding,
    )
    compiled1, source1 = compile_with_disk_cache(jitted, tmp_path, state, batch)
    want_state, want_val = compiled1(state, batch)
    if source1 != "compiled":
        return
    state2 = jax.device_put(jnp.zeros((16,), jnp.float32),
                            NamedSharding(mesh, P()))
    compiled2, source2 = compile_with_disk_cache(
        jax.jit(step, donate_argnums=(0,)), tmp_path, state2, batch
    )
    assert source2 == "aot-cache"
    got_state, got_val = compiled2(state2, batch)
    np.testing.assert_allclose(
        np.asarray(got_state), np.asarray(want_state), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_val), np.asarray(want_val), rtol=1e-6
    )


def test_distinct_programs_get_distinct_keys(tmp_path: Path) -> None:
    x = jnp.ones((8, 8), jnp.float32)
    _, s1 = compile_with_disk_cache(jax.jit(_fn), tmp_path, x)
    _, s2 = compile_with_disk_cache(
        jax.jit(lambda x: jnp.cos(x) * 2.0), tmp_path, x
    )
    if "unsaved" in (s1, s2):
        return
    assert len(list(tmp_path.glob("aot_*.bin"))) == 2
    # Different shape -> different program -> third key.
    _, _ = compile_with_disk_cache(
        jax.jit(_fn), tmp_path, jnp.ones((4, 4), jnp.float32)
    )
    assert len(list(tmp_path.glob("aot_*.bin"))) == 3


def test_lowering_strips_tracebacks_and_restores_flag(tmp_path: Path) -> None:
    """compile_with_disk_cache lowers with tracebacks stripped from MLIR
    locations (Pallas custom-call payloads otherwise embed the CALLER's
    source lines, so editing the calling file changed the cache key —
    measured on TPU, docs/PERF.md) and must restore the global flag
    afterwards, including when lowering raises."""
    assert jax.config.jax_include_full_tracebacks_in_locations
    x = jnp.ones((4, 4), jnp.float32)
    compile_with_disk_cache(jax.jit(_fn), tmp_path, x)
    assert jax.config.jax_include_full_tracebacks_in_locations

    def bad(x):
        raise RuntimeError("trace-time failure")

    try:
        compile_with_disk_cache(jax.jit(bad), tmp_path, x)
    except RuntimeError:
        pass
    assert jax.config.jax_include_full_tracebacks_in_locations


def test_lazy_aot_wrap_matches_jit_and_handles_off_avals(tmp_path: Path) -> None:
    """The trainer's lazy wrapper: first call compiles through the disk
    cache against the real args; same-aval calls reuse the executable;
    off-aval calls (validation tail batches) get their OWN cached
    executable."""
    from stereo_depth_estimation_tpu.parallel.aot_cache import lazy_aot_wrap

    calls = []

    def fn(x):
        calls.append(x.shape)
        return jnp.tanh(x) * 2.0

    wrapped = lazy_aot_wrap(jax.jit(fn), tmp_path, label="t")
    full = jnp.ones((8, 4), jnp.float32)
    tail = jnp.ones((3, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(wrapped(full)), np.asarray(np.tanh(np.ones((8, 4))) * 2.0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(wrapped(full)), np.asarray(wrapped(full)))
    blobs_after_full = len(list(tmp_path.glob("aot_*.bin")))
    np.testing.assert_allclose(
        np.asarray(wrapped(tail)), np.asarray(np.tanh(np.ones((3, 4))) * 2.0),
        rtol=1e-6,
    )
    if blobs_after_full:  # backend serialises -> the tail shape saved too
        assert len(list(tmp_path.glob("aot_*.bin"))) == blobs_after_full + 1


def test_lazy_aot_wrap_cross_instance_reuse(tmp_path: Path) -> None:
    """A second wrapper over a fresh jit of the same program (a 'new
    process' stand-in) must load the saved executable instead of
    recompiling, and agree numerically."""
    from stereo_depth_estimation_tpu.parallel.aot_cache import (
        compile_with_disk_cache,
        lazy_aot_wrap,
    )

    x = jnp.full((6, 6), 0.5, jnp.float32)
    w1 = lazy_aot_wrap(jax.jit(_fn), tmp_path, label="a")
    want = np.asarray(w1(x))
    if not list(tmp_path.glob("aot_*.bin")):
        return  # backend would not serialise; nothing to assert
    _, source = compile_with_disk_cache(jax.jit(_fn), tmp_path, x)
    assert source == "aot-cache"
    w2 = lazy_aot_wrap(jax.jit(_fn), tmp_path, label="b")
    np.testing.assert_allclose(np.asarray(w2(x)), want, rtol=1e-6)


def test_digest_distinguishes_input_pytree_of_pruned_args(tmp_path) -> None:
    """jit prunes unused args from the lowered module, so two call
    signatures can lower to byte-identical StableHLO while expecting
    different input pytrees (the trainer's eval step never reads
    opt_state: constant-lr EmptyState vs cosine ScaleByScheduleState).
    The digest must separate them or the loaded executable rejects the
    call with a pytree mismatch."""
    import jax
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.parallel.aot_cache import (
        compile_with_disk_cache,
    )

    def fn(x, unused):
        return x * 2.0

    jitted = jax.jit(fn)
    x = jnp.arange(4.0)
    leaf = jnp.zeros((2,))
    before = len(list(tmp_path.glob("aot_*.bin")))
    c1, _ = compile_with_disk_cache(jitted, tmp_path, x, {"a": leaf})
    c2, _ = compile_with_disk_cache(jitted, tmp_path, x, (leaf, leaf))
    import numpy as np

    np.testing.assert_array_equal(np.asarray(c1(x, {"a": leaf})), np.arange(4.0) * 2)
    np.testing.assert_array_equal(np.asarray(c2(x, (leaf, leaf))), np.arange(4.0) * 2)
    blobs = len(list(tmp_path.glob("aot_*.bin"))) - before
    if blobs:  # backend serialises: the two signatures must not collide
        assert blobs == 2, "pytree-different signatures shared one cache entry"


def test_lazy_wrap_separates_same_leaves_different_structure(tmp_path) -> None:
    """In-process analog of the digest test above: lazy_aot_wrap's
    per-signature dispatch must key on pytree structure too, or a second
    structure with identical leaf avals is routed to the first
    structure's executable and rejected."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereo_depth_estimation_tpu.parallel.aot_cache import lazy_aot_wrap

    def fn(x, unused):
        return x + 1.0

    wrapped = lazy_aot_wrap(jax.jit(fn), tmp_path)
    x = jnp.zeros((3,))
    leaf = jnp.zeros((2,))
    np.testing.assert_array_equal(
        np.asarray(wrapped(x, {"a": leaf})), np.ones(3)
    )
    np.testing.assert_array_equal(
        np.asarray(wrapped(x, (leaf, leaf))), np.ones(3)
    )


def test_lru_prune_bounds_cache(tmp_path, monkeypatch) -> None:
    """SDE_AOT_CACHE_KEEP bounds the blob count after each save, evicting
    least-recently-used entries (orphans from digest changes)."""
    import jax
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.parallel.aot_cache import (
        compile_with_disk_cache,
    )

    monkeypatch.setenv("SDE_AOT_CACHE_KEEP", "2")
    x = jnp.arange(4.0)
    for k in (1.0, 2.0, 3.0):
        jitted = jax.jit(lambda v, k=k: v * k)
        compiled, source = compile_with_disk_cache(jitted, tmp_path, x)
        if source == "compiled-unsaved":
            return  # backend doesn't serialize here; nothing to prune
    blobs = list(tmp_path.glob("aot_*.bin"))
    assert len(blobs) == 2, f"prune kept {len(blobs)} blobs, wanted 2"
    # The just-saved (newest) program must still be cached.
    _, source = compile_with_disk_cache(jax.jit(lambda v: v * 3.0), tmp_path, x)
    assert source == "aot-cache"
