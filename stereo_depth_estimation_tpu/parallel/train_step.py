"""Jitted, sharded train/eval steps with donated state.

The reference's hot loop (train.py:316-363: H2D copy, forward with
uncertainty, masked Laplace NLL, backward, AdamW step, metric sums) becomes a
single XLA program:

- batches arrive as **uint8**; normalisation (/255), asymmetric per-view
  augmentation, forward, loss, backward and the optimizer update all fuse
  into one jit — 4x less host->device traffic than shipping float32;
- the state pytree is **donated**, so parameters/optimizer buffers update
  in place in HBM;
- under a data mesh the same step runs pjit-style: batch sharded on
  ``data``, state replicated, XLA inserting the gradient all-reduce (and
  BatchNorm batch statistics are automatically global means because
  reductions inside jit are mesh-global);
- for datasets that fit HBM, ``make_device_data_train_loop`` runs the whole
  pipeline device-resident: per-epoch permutation, batch gather, augment and
  K training steps inside ONE ``lax.scan`` dispatch — zero per-step host
  traffic and no per-step dispatch latency (critical on tunneled/remote
  device transports).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.unet import StereoUNet
from ..ops.augment import AugmentConfig, augment_stereo_batch
from ..ops.loss import LossStats, heteroscedastic_laplace_nll


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_adamw(
    lr: float,
    weight_decay: float,
    schedule: str = "constant",
    total_steps: int = 0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """AdamW with torch defaults (b1=0.9, b2=0.999, eps=1e-8), decay on all
    params — matching reference train.py:578.

    ``schedule`` is a superset of the reference (which is constant-lr
    only): ``"cosine"`` decays lr to 0 over ``total_steps`` with an
    optional linear ``warmup_steps`` ramp. The schedule reads the
    optimizer's step count inside the compiled program, so every step
    runs the SAME executable (one AOT cache entry, no per-step
    recompiles) and checkpoint resume restores the schedule position
    with the opt state.
    """
    if schedule == "constant":
        learning_rate: float | optax.Schedule = lr
    elif schedule == "cosine":
        if total_steps <= 0:
            raise ValueError(
                "cosine schedule needs total_steps > 0 "
                f"(got {total_steps})"
            )
        if warmup_steps > 0:
            learning_rate = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr,
                warmup_steps=warmup_steps,
                decay_steps=total_steps,
            )
        else:
            learning_rate = optax.cosine_decay_schedule(
                init_value=lr, decay_steps=total_steps
            )
    else:
        raise ValueError(
            f"Unknown lr schedule {schedule!r} (constant|cosine)"
        )
    return optax.adamw(
        learning_rate=learning_rate,
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay,
    )


def create_train_state(
    model: StereoUNet,
    rng: jax.Array,
    input_hw: tuple[int, int],
    tx: optax.GradientTransformation,
) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        init_rng,
        jnp.zeros((1, *input_hw, model.in_channels), jnp.float32),
        train=False,
        return_uncertainty=True,
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        rng=state_rng,
    )


def _prepare_input(inputs: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> float32/255 on device; float inputs pass through."""
    if inputs.dtype == jnp.uint8:
        return inputs.astype(jnp.float32) * (1.0 / 255.0)
    return inputs.astype(jnp.float32)


def _targets_and_mask(
    batch: dict[str, jnp.ndarray]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    target = batch["target"].astype(jnp.float32)
    # valid_mask = target > 0 (reference dataset.py:306); non-finite handled
    # inside the loss like reference train.py:329.
    mask = batch.get("valid_mask")
    if mask is None:
        mask = target > 0.0
    elif mask.ndim == 1:
        # Rank-1 per-ROW flags — the padding scheme's cheap wire format
        # (parallel/mesh.py::_pad_batch_rows ships B bools, not B*H*W):
        # rows flagged False are wrap-around padding; combine with the
        # on-device validity rule so the math matches a full mask exactly.
        mask = (target > 0.0) & mask[:, None, None]
    return target, mask


def _make_step_body(
    model: StereoUNet,
    tx: optax.GradientTransformation,
    augment_config: AugmentConfig | None,
) -> Callable[[TrainState, dict[str, jnp.ndarray]], tuple[TrainState, LossStats]]:
    """Shared single-step body: augment -> forward -> loss -> backward -> update."""

    def body(
        state: TrainState, batch: dict[str, jnp.ndarray]
    ) -> tuple[TrainState, LossStats]:
        rng = jax.random.fold_in(state.rng, state.step)
        raw = batch["input"]
        if augment_config is None:
            inputs = _prepare_input(raw)
        elif (
            augment_config.impl != "xla"
            and raw.dtype == jnp.uint8
            and (
                augment_config.impl == "pallas"
                or (
                    jax.default_backend() == "tpu"
                    # Auto-pallas only where validated: a single chip. On a
                    # multi-chip mesh GSPMD would have to partition the
                    # pallas_call, which is unverified here — the XLA chain
                    # partitions exactly like the rest of the step.
                    and jax.device_count() == 1
                )
            )
        ):
            # Fused Pallas pointwise chain consumes the uint8 batch directly
            # (interpret mode off-TPU so forced-"pallas" still runs in tests).
            # "auto" picks it on TPU: standalone the two chains tie, but
            # inside the full step it avoids the materialised uint8->f32
            # pass and measured 152.2 -> 137.4 ms/step on a v5e (+11%,
            # docs/PERF.md); values match the XLA chain to float rounding.
            from ..ops.augment_pallas import augment_stereo_batch_pallas

            # Emitting the model's compute dtype straight from the kernel
            # halves the augment chain's HBM writes under bf16 — the cast
            # the model would apply anyway just happens one op earlier
            # (docs/PERF.md round-3 profile: the step is HBM-bound).
            inputs = augment_stereo_batch_pallas(
                rng, raw, augment_config,
                interpret=jax.default_backend() != "tpu",
                out_dtype=getattr(model, "compute_dtype", jnp.float32),
            )
        else:
            inputs = augment_stereo_batch(
                rng, _prepare_input(raw), augment_config
            )
        target, mask = _targets_and_mask(batch)

        def loss_fn(params):
            (disp, logvar), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs,
                train=True,
                return_uncertainty=True,
                mutable=["batch_stats"],
            )
            loss, stats = heteroscedastic_laplace_nll(
                disp[..., 0], logvar[..., 0], target, mask
            )
            return loss, (stats, mutated["batch_stats"])

        grads, (stats, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # A batch with zero valid pixels must be a no-op like the reference's
        # batch skip (train.py:330-332): even with zero grads, AdamW's
        # decoupled weight decay would shrink params and the moments/BN stats
        # would advance. Select old vs new per-leaf on the valid count.
        has_valid = stats.valid_count > 0

        def keep_if_valid(new, old):
            return jnp.where(has_valid, new, old)

        new_state = state.replace(
            step=state.step + 1,
            params=jax.tree.map(keep_if_valid, new_params, state.params),
            batch_stats=jax.tree.map(
                keep_if_valid, new_batch_stats, state.batch_stats
            ),
            opt_state=jax.tree.map(keep_if_valid, new_opt_state, state.opt_state),
        )
        return new_state, stats

    return body


def _step_compiler_options() -> dict[str, str] | None:
    """TPU-only compile options for the train step.

    Raising the scoped-VMEM budget to 64 MiB lets the conv fusions tile
    larger: measured 129.4 -> 126.2 ms/step at batch 128, 240x320, on one
    v5e (+2.5%); larger budgets plateau (and 128 MiB costs a 5-minute
    compile). CPU/other backends reject TPU options, hence the gate.
    """
    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    return None


def make_train_step(
    model: StereoUNet,
    tx: optax.GradientTransformation,
    augment_config: AugmentConfig | None = None,
    extra_compiler_options: dict[str, str] | None = None,
) -> Callable[[TrainState, dict[str, jnp.ndarray]], tuple[TrainState, LossStats]]:
    """Streaming train step: batch {input (N,H,W,6) u8/f32, target (N,H,W)}."""
    options = _step_compiler_options()
    if extra_compiler_options:
        options = {**(options or {}), **extra_compiler_options}
    step = jax.jit(
        _make_step_body(model, tx, augment_config),
        donate_argnums=(0,),
        compiler_options=options,
    )
    # Tag for the AOT disk cache: compiler options alter the executable
    # without changing the lowered text, so the digest reads this.
    step._sde_compiler_options = options  # type: ignore[attr-defined]
    return step


def _device_batch_select(
    state: TrainState,
    images_u8: jnp.ndarray,
    targets: jnp.ndarray,
    batch_size: int,
    steps_per_epoch: int,
) -> dict[str, jnp.ndarray]:
    """On-device epoch shuffling: per-epoch permutation sliced by position."""
    n = images_u8.shape[0]
    epoch = state.step // steps_per_epoch
    pos = state.step % steps_per_epoch
    perm_key = jax.random.fold_in(state.rng, epoch + (1 << 20))
    perm = jax.random.permutation(perm_key, n)
    idx = jax.lax.dynamic_slice(perm, (pos * batch_size,), (batch_size,))
    return {
        "input": jnp.take(images_u8, idx, axis=0),
        "target": jnp.take(targets, idx, axis=0),
    }


def make_device_data_train_loop(
    model: StereoUNet,
    tx: optax.GradientTransformation,
    images_u8: jnp.ndarray,
    targets: jnp.ndarray,
    batch_size: int,
    augment_config: AugmentConfig | None = None,
    steps_per_call: int = 10,
) -> Callable[[TrainState], tuple[TrainState, LossStats]]:
    """K train steps over a DEVICE-RESIDENT dataset in one lax.scan dispatch.

    Returns stats stacked over the K steps (each LossStats field has shape
    (K,)), so the caller logs per-step metrics with a single D2H per call.

    The dataset arrays are passed as jit ARGUMENTS, not closure captures:
    a captured device array becomes a jaxpr constant, and on a
    remote-compile platform the whole payload ships inside the compile
    request (the round-2 ">12 min scanned compile" observation traced to
    exactly this — see docs/PERF.md).
    """
    n = images_u8.shape[0]
    steps_per_epoch = n // batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {n} samples is smaller than batch_size={batch_size}"
        )
    body = _make_step_body(model, tx, augment_config)

    def run(state: TrainState, images, tgts) -> tuple[TrainState, LossStats]:
        def scan_body(carry: TrainState, _):
            batch = _device_batch_select(
                carry, images, tgts, batch_size, steps_per_epoch
            )
            new_state, stats = body(carry, batch)
            return new_state, stats

        state2, stats_seq = jax.lax.scan(
            scan_body, state, None, length=steps_per_call
        )
        return state2, stats_seq

    jitted = jax.jit(run, donate_argnums=(0,))

    def wrapper(state: TrainState) -> tuple[TrainState, LossStats]:
        return jitted(state, images_u8, targets)

    return wrapper


def make_device_data_train_step(
    model: StereoUNet,
    tx: optax.GradientTransformation,
    images_u8: jnp.ndarray,
    targets: jnp.ndarray,
    batch_size: int,
    augment_config: AugmentConfig | None = None,
    extra_compiler_options: dict[str, str] | None = None,
    step_fn: Callable[[TrainState, dict[str, jnp.ndarray]], tuple[TrainState, LossStats]]
    | None = None,
    fuse_dispatch: bool = False,
    aot_cache_dir: str | None = None,
) -> Callable[[TrainState], tuple[TrainState, LossStats]]:
    """ONE train step over a DEVICE-RESIDENT dataset per dispatch.

    Same math as ``make_device_data_train_loop`` but built (by default) as
    TWO jitted programs — an on-device batch gather (per-epoch permutation
    + dynamic-slice + take) and the standard augmented train step. Measured
    trade-offs (docs/PERF.md, v5e): all three shapes — split two-dispatch,
    ``fuse_dispatch=True`` (one program), and the scanned K-step loop —
    tie on throughput because the split's dispatches already pipeline with
    no device idle, but the split compiles ~2.4-5x faster, so it stays the
    default; the fused/scanned shapes suit high-dispatch-latency
    environments. The intermediate batch stays in HBM; nothing crosses the
    host boundary per step.
    """
    n = images_u8.shape[0]
    steps_per_epoch = n // batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {n} samples is smaller than batch_size={batch_size}"
        )

    def gather_math(rng, step_idx, images, tgts):
        epoch = step_idx // steps_per_epoch
        pos = step_idx % steps_per_epoch
        perm = jax.random.permutation(
            jax.random.fold_in(rng, epoch + (1 << 20)), n
        )
        idx = jax.lax.dynamic_slice(perm, (pos * batch_size,), (batch_size,))
        return {
            "input": jnp.take(images, idx, axis=0),
            "target": jnp.take(tgts, idx, axis=0),
        }

    if fuse_dispatch:
        # Single-program variant: gather + step in ONE jit (same math; the
        # compiler options move to the top-level jit because they cannot
        # nest). Measured trade-offs in docs/PERF.md.
        body = _make_step_body(model, tx, augment_config)
        options = _step_compiler_options()
        if extra_compiler_options:
            options = {**(options or {}), **extra_compiler_options}

        def run_fused(state: TrainState, images, tgts):
            batch = gather_math(state.rng, state.step, images, tgts)
            return body(state, batch)

        # The dataset arrays MUST be jit arguments, not closure captures: a
        # captured device array becomes a jaxpr constant and the whole
        # 472 MB payload ships inside the (remote) compile request
        # (observed: HTTP 413 from the compile service).
        fused = jax.jit(run_fused, donate_argnums=(0,), compiler_options=options)
        fused._sde_compiler_options = options  # AOT-cache digest tag  # type: ignore[attr-defined]

        def run_wrapper(state: TrainState) -> tuple[TrainState, LossStats]:
            return fused(state, images_u8, targets)

        return run_wrapper

    gather = jax.jit(gather_math)
    if aot_cache_dir is not None:
        # Skip the gather's cross-process recompile too (parallel/aot_cache):
        # on this platform it costs O(100 s) per fresh process even though
        # the program is tiny (docs/PERF.md "Known bounded gaps").
        from .aot_cache import compile_with_disk_cache

        gather, _src = compile_with_disk_cache(
            gather, aot_cache_dir,
            jax.random.key(0), jnp.zeros((), jnp.int32), images_u8, targets,
        )
    # A caller-supplied step (same batch avals) lets e.g. bench.py share ONE
    # compiled program between this device-resident path and the streamed
    # path instead of compiling twice.
    step = step_fn or make_train_step(model, tx, augment_config, extra_compiler_options)

    def run(state: TrainState) -> tuple[TrainState, LossStats]:
        batch = gather(state.rng, state.step, images_u8, targets)
        return step(state, batch)

    return run


def make_eval_step(
    model: StereoUNet,
) -> Callable[[TrainState, dict[str, jnp.ndarray]], LossStats]:
    """Eval: running BN stats, no augmentation, metric sums only."""

    def step_fn(state: TrainState, batch: dict[str, jnp.ndarray]) -> LossStats:
        inputs = _prepare_input(batch["input"])
        target, mask = _targets_and_mask(batch)
        disp, logvar = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs,
            train=False,
            return_uncertainty=True,
        )
        _, stats = heteroscedastic_laplace_nll(
            disp[..., 0], logvar[..., 0], target, mask
        )
        return stats

    return jax.jit(step_fn)


def make_predict_fn(
    model: StereoUNet,
) -> Callable[[Any, Any, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]:
    """Jitted inference: (params, batch_stats, input NHWC) -> (disparity, logvar),
    each (N,H,W). Serves the live viewer and parity benches."""

    @jax.jit
    def predict(params, batch_stats, inputs):
        disp, logvar = model.apply(
            {"params": params, "batch_stats": batch_stats},
            _prepare_input(inputs),
            train=False,
            return_uncertainty=True,
        )
        return disp[..., 0], logvar[..., 0]

    return predict
