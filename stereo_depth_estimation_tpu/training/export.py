"""``foundation-stereo-export``: convert an Orbax checkpoint to a reference
``.pt`` file.

Completes two-way interop: the live tools already LOAD reference PyTorch
checkpoints (models/compat.py + training/checkpoint.py); this writes one,
so a model trained here drops straight into the reference codebase's
viewer/trainer. The payload mirrors what the reference trainer saves
(train.py:421-436): ``model_state_dict`` in torch layout plus epoch/config/
metrics carried over from the Orbax meta.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from ..models.compat import export_torch_state_dict
from ..models.unet import StereoUNet
from ..training.checkpoint import (
    load_checkpoint_meta,
    load_model_variables,
    resolve_checkpoint_path,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Write a reference-compatible PyTorch .pt file from an "
                    "Orbax checkpoint."
    )
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="Orbax checkpoint dir (outputs/<run>/checkpoints/last).")
    parser.add_argument("--run-id", type=str, default=None)
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    parser.add_argument("--checkpoint-name", type=str, default="last")
    parser.add_argument("--base-channels", type=int, default=32,
                        help="UNet width; must match the checkpoint's.")
    parser.add_argument("--out", type=Path, required=True,
                        help="Destination .pt path.")
    return parser


def export_checkpoint(args: argparse.Namespace) -> Path:
    import torch

    checkpoint_path = resolve_checkpoint_path(
        args.output_dir, checkpoint=args.checkpoint, run_id=args.run_id,
        checkpoint_name=args.checkpoint_name,
    )
    model = StereoUNet(base_channels=args.base_channels)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 6)), train=False,
            return_uncertainty=True,
        )
    )
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    variables, _ = load_model_variables(checkpoint_path, template)
    meta = load_checkpoint_meta(checkpoint_path)

    state_dict = {
        key: torch.from_numpy(value.copy())
        for key, value in export_torch_state_dict(variables).items()
    }
    payload = {
        "epoch": meta.get("epoch", -1),
        "model_state_dict": state_dict,
        "config": meta.get("config", {}),
        "metrics": meta.get("metrics", {}),
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    torch.save(payload, args.out)
    print(f"Wrote reference-format checkpoint: {args.out} "
          f"(epoch {payload['epoch']}, {len(state_dict)} tensors)")
    return args.out


def main() -> None:
    export_checkpoint(build_parser().parse_args())


if __name__ == "__main__":
    main()
