"""``foundation-stereo-eval``: offline metric evaluation of a checkpoint.

Capability superset: the reference computes validation metrics only inside
a training run (train.py:617-638); here any checkpoint — Orbax or a
reference PyTorch ``.pt`` — can be scored against any dataset split after
the fact, with the same pixel-weighted metric definitions the trainer logs
(mae/rmse/nll/sigma over valid pixels). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import StereoSampleLoader
from ..data.pipeline import batch_iterator, loader_fetch, prefetch_to_device
from ..data.samples import discover_samples, split_samples
from ..models.unet import StereoUNet
from ..ops.loss import LossStats, accumulate_stats, metrics_from_stats
from ..parallel.mesh import (
    make_mesh,
    pad_batch_to,
    replicate_to_mesh,
    shard_batch_to_mesh,
)
from ..parallel.train_step import TrainState, make_eval_step
from ..training.checkpoint import load_model_variables, resolve_checkpoint_path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Score a trained checkpoint on a dataset split "
                    "(pixel-weighted mae/rmse/nll, same math as training)."
    )
    parser.add_argument("--dataset-root", type=str, required=True)
    parser.add_argument("--split", type=str, default="val",
                        choices=("val", "train", "all"),
                        help="Which side of the seeded split to score.")
    parser.add_argument("--val-fraction", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=42,
                        help="Split seed; match the training run's.")
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--batch-size", type=int, default=30)
    parser.add_argument("--max-samples", type=int, default=0)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--cache-root", type=str, default=None)
    parser.add_argument("--require-cache", action="store_true")
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="Orbax checkpoint dir or reference .pt file.")
    parser.add_argument("--run-id", type=str, default=None)
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    parser.add_argument("--checkpoint-name", type=str, default="last")
    parser.add_argument("--base-channels", type=int, default=32,
                        help="UNet width; must match the checkpoint's.")
    parser.add_argument("--device", type=str, default="auto",
                        help="Device platform (auto/cpu/tpu).")
    parser.add_argument("--mesh-devices", type=int, default=0,
                        help="Devices on the data axis (0 = all visible); "
                             "batches shard over the mesh like training.")
    parser.add_argument("--spatial-devices", type=int, default=1,
                        help=">1: shard image height over a 2nd mesh axis.")
    parser.add_argument("--aot-cache", type=str, default="auto",
                        help="AOT executable disk cache dir (same mechanism "
                             "as the trainer's --aot-cache): repeat "
                             "invocations skip the per-process XLA compile. "
                             "'auto' = <output-dir>/.aot_cache; 'off' "
                             "disables.")
    return parser


def evaluate(args: argparse.Namespace) -> dict:
    samples = discover_samples(args.dataset_root)
    if args.max_samples > 0:
        samples = samples[: args.max_samples]
    if args.split != "all":
        train_s, val_s = split_samples(samples, args.val_fraction, args.seed)
        samples = val_s if args.split == "val" else train_s
    if not samples:
        raise ValueError(f"No samples to evaluate (split={args.split}).")

    checkpoint_path = resolve_checkpoint_path(
        args.output_dir, checkpoint=args.checkpoint, run_id=args.run_id,
        checkpoint_name=args.checkpoint_name,
    )
    model = StereoUNet(base_channels=args.base_channels)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, args.height, args.width, 6)),
            train=False, return_uncertainty=True,
        )
    )
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    variables, ckpt_meta = load_model_variables(checkpoint_path, template)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=(),
        rng=jax.random.key(0),
    )
    # Scale scoring over the mesh exactly like training: params replicated,
    # batches sharded on the data axis with pad-and-mask for indivisible
    # batch/tail sizes (exact — eval-mode BN uses running stats and every
    # metric is a masked sum,
    # tests/test_trainer.py::test_offline_evaluate_matches_training_val_metrics).
    from ..training.trainer import resolve_devices

    mesh = make_mesh(
        resolve_devices(getattr(args, "device", "auto"), args.mesh_devices),
        spatial=args.spatial_devices,
    )
    state = replicate_to_mesh(state, mesh)
    eval_step = make_eval_step(model)
    if args.aot_cache != "off":
        from ..parallel.aot_cache import lazy_aot_wrap, resolve_aot_dir

        aot_dir = resolve_aot_dir(args.aot_cache, args.output_dir)
        # Lowered against the first real sharded (state, batch); tail
        # batches are padded to the same static shape below, so this one
        # executable serves the whole pass.
        eval_step = lazy_aot_wrap(
            eval_step, aot_dir, label="eval step", verbose=True
        )

    loader = StereoSampleLoader(
        samples, image_size=(args.height, args.width),
        cache_root=args.cache_root, require_cache=args.require_cache,
    )
    total: LossStats | None = None
    batches = prefetch_to_device(
        batch_iterator(
            loader_fetch(loader, num_workers=args.num_workers),
            len(loader), args.batch_size,
        ),
        # pad_batch_to keeps the tail batch at the one static shape and
        # pytree signature (a distinct tail shape is a second XLA compile
        # + AOT blob — parallel/mesh.py::pad_batch_to); the masked sums
        # are exact, so metrics are unchanged.
        put=lambda batch: shard_batch_to_mesh(
            pad_batch_to(batch, args.batch_size), mesh
        ),
    )
    for batch in batches:
        total = accumulate_stats(total, eval_step(state, batch))
    assert total is not None
    metrics = metrics_from_stats(jax.device_get(total))
    result = {
        "checkpoint": str(checkpoint_path),
        "checkpoint_epoch": int(ckpt_meta.get("epoch", -1))
        if isinstance(ckpt_meta, dict) else -1,
        "split": args.split,
        "samples": len(samples),
        "valid_pixels": int(total.valid_count),
        **{k: round(v, 6) for k, v in metrics.items()},
    }
    print(json.dumps(result))
    return result


def main() -> None:
    evaluate(build_parser().parse_args())


if __name__ == "__main__":
    main()
