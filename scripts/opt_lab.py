"""Optimizer-segment lab: optax.adamw (per-leaf) vs flat-buffer AdamW.

Round-3 profile attribution put "heads + loss + optimizer" at ~6 ms/step
of the 128.4 ms bench step; the optimizer's share is fusion-count overhead
(~100 leaf-wise fusions), not bytes. parallel/flat_adamw.py collapses the
update into one fused pass over a single raveled f32 vector.

This lab measures both end-to-end train-step variants at the bench config
on the attached TPU, after asserting numerical equivalence of the updated
parameters on-device. Feeds the docs/PERF.md round-4 knob table.

Usage: python scripts/opt_lab.py [--batch 128] [--steps 64] [--windows 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--windows", type=int, default=3)
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_adamw,
    )
    from stereo_depth_estimation_tpu.parallel.flat_adamw import flat_adamw
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
        make_train_step,
    )

    hw = (240, 320)
    batch = args.batch
    n_samples = 512
    print(f"device: {jax.devices()[0]}", flush=True)

    @jax.jit
    def gen_payload(key):
        k_img, k_tgt = jax.random.split(key)
        images = jax.random.randint(
            k_img, (n_samples, *hw, 6), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        targets = jax.random.uniform(
            k_tgt, (n_samples, *hw), jnp.float32, 0.5, 64.0
        ).astype(jnp.float16)
        return images, targets

    images, targets = gen_payload(jax.random.key(0))
    jax.block_until_ready(images)

    model = StereoUNet(compute_dtype=jnp.bfloat16)
    variants = {
        "optax_adamw": make_adamw(1e-3, 1e-4),
        "flat_adamw": flat_adamw(1e-3, 1e-4),
    }

    # ---- equivalence check (one real augmented step, identical batch) ----
    batch_arrays = {
        "input": np.asarray(images[:batch]),
        "target": np.asarray(targets[:batch]).astype(np.float16),
    }
    # Equivalence is asserted on the optimizer IN ISOLATION: identical
    # grads/params pytrees (full 7.76M-param model) through both
    # transformations for several updates. (Comparing full e2e train steps
    # instead conflates the optimizer with the two programs' different
    # backward-pass fusion groupings: conv-reduction regrouping perturbs
    # near-zero gradient elements by O(1) RELATIVE amounts, and Adam's
    # per-element normalisation turns those into ~1e-5 one-step param
    # diffs — measured here, and inherent to ANY program change, e.g. an
    # XLA version bump. The cheap-shape e2e equivalence lives in
    # tests/test_train_step.py::test_flat_adamw_matches_optax.)
    state0 = jax.jit(
        lambda k: create_train_state(model, k, hw, variants["optax_adamw"])
    )(jax.random.key(7))
    params = jax.tree.map(np.asarray, state0.params)
    leaf_keys = jax.tree.unflatten(
        jax.tree.structure(params),
        list(jax.random.split(jax.random.key(123), len(jax.tree.leaves(params)))),
    )
    grads = jax.tree.map(
        lambda p, k: np.asarray(
            jax.random.normal(k, p.shape, jnp.float32)
            * (1e-6 + np.abs(p).mean())
        ),
        params,
        leaf_keys,
    )
    trajs = {}
    for name, tx in variants.items():
        p = jax.tree.map(jnp.asarray, params)
        opt_state = tx.init(p)
        apply = jax.jit(
            lambda g, s, p, tx=tx: tx.update(g, s, p)
        )
        for _ in range(3):
            updates, opt_state = apply(
                jax.tree.map(jnp.asarray, grads), opt_state, p
            )
            p = jax.tree.map(lambda a, u: a + u, p, updates)
        trajs[name] = np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(p)]
        )
    p_ref, p_flat = trajs["optax_adamw"], trajs["flat_adamw"]
    err = np.abs(p_flat - p_ref) / (np.abs(p_ref) + 1e-4)
    print(
        f"isolated-optimizer equivalence (3 updates, 7.76M params): "
        f"max mixed abs/rel delta = {float(err.max()):.3e}, max abs = "
        f"{float(np.max(np.abs(p_flat - p_ref))):.3e}"
    )
    assert float(err.max()) < 1e-5, "flat_adamw diverged from optax.adamw"

    # ---- throughput ----
    for name, tx in variants.items():
        state = jax.jit(lambda k, tx=tx: create_train_state(model, k, hw, tx))(
            jax.random.key(0)
        )
        step = make_device_data_train_step(
            model, tx, images, targets, batch, AugmentConfig()
        )
        t0 = time.perf_counter()
        state, stats = step(state)
        _ = float(np.asarray(stats.nll_sum))
        print(f"{name}: compile+warmup {time.perf_counter() - t0:.1f}s")
        for _ in range(4):
            state, stats = step(state)
        _ = float(np.asarray(stats.nll_sum))
        rates = []
        for w in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, stats = step(state)
            _ = float(np.asarray(stats.nll_sum))
            dt = time.perf_counter() - t0
            rates.append(args.steps * batch / dt)
            print(
                f"{name}: window {w}: {1e3 * dt / args.steps:.2f} ms/step "
                f"= {rates[-1]:.1f} pairs/s",
                flush=True,
            )
        print(f"{name}: median {np.median(rates):.1f} pairs/s")


if __name__ == "__main__":
    main()
