"""Single-chip throughput experiment harness (docs/PERF.md feeds from this).

Same measurement methodology as bench.py (device-resident synthetic
packed-cache payload, two pipelined dispatches, discard the first timing
window), but parameterised over the perf knobs under investigation:

  python scripts/perf_lab.py VARIANT [--batch N] [--measure-seconds S]

Variants:
  base        current production config (the bench.py configuration)
  fused       hand-scheduled ConvBlock backward (_fused_conv_bn_relu)
  split       decoder conv0 as two half-kernel convs (skip_impl="split")
  hybridskip  concat forward + split-free custom backward (skip_impl="hybrid")
  onedispatch gather + step fused into one jitted program
  scanloop    K=32 steps per dispatch via make_device_data_train_loop
  infer       batched inference throughput (make_predict_fn, no grads)
  bnbf16      BatchNorm batch-statistics reductions in bfloat16
  remat       rematerialise every ConvBlock in the backward pass
  noaug       augmentation off (isolates the augment chain's share)
  fp32        float32 compute (calibrates the bf16 speedup)
  flags:K=V[,K=V...]   extra XLA TPU compiler options on top of base

Prints one JSON line: variant, batch, ms/step, pairs/s.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import create_train_state, make_adamw
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
    )

    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    argv = sys.argv[2:]
    batch_size = 128
    measure_seconds = 12.0
    if "--batch" in argv:
        batch_size = int(argv[argv.index("--batch") + 1])
    if "--measure-seconds" in argv:
        measure_seconds = float(argv[argv.index("--measure-seconds") + 1])

    hw = (240, 320)
    n_samples = 1024

    model_kwargs: dict = {"compute_dtype": jnp.bfloat16}
    aug: AugmentConfig | None = AugmentConfig()
    extra_options: dict[str, str] | None = None
    if variant == "bnbf16":
        model_kwargs["bn_stats_dtype"] = jnp.bfloat16
    elif variant == "remat":
        model_kwargs["remat"] = True
    elif variant == "noaug":
        aug = None
    elif variant == "fp32":
        model_kwargs["compute_dtype"] = jnp.float32
    elif variant == "fused":
        model_kwargs["fused_block"] = True
    elif variant == "split":
        model_kwargs["skip_impl"] = "split"
    elif variant == "hybridskip":
        model_kwargs["skip_impl"] = "hybrid"
    elif variant.startswith("flags:"):
        extra_options = dict(
            kv.split("=", 1) for kv in variant[len("flags:"):].split(",")
        )
    elif variant not in ("base", "onedispatch", "scanloop", "infer"):
        raise SystemExit(f"unknown variant: {variant}")

    def log(msg: str) -> None:
        print(f"[lab {variant} b{batch_size}] {msg}", file=sys.stderr, flush=True)

    log(f"devices: {jax.devices()}")

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

    images_dev, targets_dev = gen_payload(jax.random.key(0))
    jax.block_until_ready(images_dev)

    model = StereoUNet(**model_kwargs)
    tx = make_adamw(1e-3, 1e-4)
    state = jax.jit(lambda k: create_train_state(model, k, hw, tx))(
        jax.random.key(0)
    )
    jax.block_until_ready(state.params)
    log("state ready")

    # "onedispatch" collapses the gather + train-step pair into ONE jitted
    # program; "scanloop" runs K=32 steps per dispatch via lax.scan (both
    # re-benchable now that the dataset ships as jit arguments instead of
    # jaxpr constants — docs/PERF.md).
    steps_per_dispatch = 1
    if variant == "infer":
        # Batched inference (eval-mode forward with uncertainty) over
        # device-resident uint8 batches — the serving-side throughput
        # counterpart of the training number.
        from stereo_depth_estimation_tpu.parallel.train_step import (
            make_predict_fn,
        )

        import flax.struct

        class _InferStats(flax.struct.PyTreeNode):
            disp: jnp.ndarray

            @property
            def nll_sum(self):
                return self.disp.sum()

        predict_fn = make_predict_fn(model)
        n_batches = n_samples // batch_size
        infer_i = [0]

        def step(state):
            i = infer_i[0] % n_batches
            infer_i[0] += 1
            disp, _logvar = predict_fn(
                state.params, state.batch_stats,
                images_dev[i * batch_size : (i + 1) * batch_size],
            )
            return state, _InferStats(disp)
    elif variant == "scanloop":
        from stereo_depth_estimation_tpu.parallel.train_step import (
            make_device_data_train_loop,
        )

        steps_per_dispatch = 32
        loop = make_device_data_train_loop(
            model, tx, images_dev, targets_dev, batch_size, aug,
            steps_per_call=steps_per_dispatch,
        )

        def step(state):
            state2, stats_seq = loop(state)
            return state2, jax.tree.map(lambda x: x[-1], stats_seq)
    else:
        step = make_device_data_train_step(
            model, tx, images_dev, targets_dev, batch_size, aug, extra_options,
            fuse_dispatch=(variant == "onedispatch"),
        )

    t = time.perf_counter()
    state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))
    compile_s = time.perf_counter() - t
    log(f"compile {compile_s:.1f}s")
    for _i in range(4):
        state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))

    steps = 0
    windows = 0
    dispatches_per_window = max(32 // steps_per_dispatch, 1)
    start = time.perf_counter()
    while True:
        state, stats = step(state)
        steps += steps_per_dispatch
        if (steps // steps_per_dispatch) % dispatches_per_window == 0:
            _ = float(np.asarray(stats.nll_sum))
            windows += 1
            elapsed = time.perf_counter() - start
            log(f"{steps} steps in {elapsed:.1f}s")
            if windows == 1:  # discard warmup-contaminated first window
                steps = 0
                start = time.perf_counter()
                continue
            if elapsed > measure_seconds:
                break
    _ = float(np.asarray(stats.nll_sum))
    elapsed = time.perf_counter() - start

    ms_per_step = 1000.0 * elapsed / steps
    print(
        json.dumps(
            {
                "variant": variant,
                "batch": batch_size,
                "ms_per_step": round(ms_per_step, 2),
                "pairs_per_sec": round(steps * batch_size / elapsed, 1),
                "compile_seconds": round(compile_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
