"""Rescale a trained checkpoint for transfer to a different resolution.

Progressive-resolution workflow (docs/CONVERGENCE.md section 4): pretrain
at fast-mode resolution (cheap epochs), then finetune at full resolution
starting from the pretrained weights. The finetune MUST start from a
head-rescaled checkpoint — disparity values scale with image width, and
the naive transfer measurably stalls (the Laplace NLL inflates logvar
instead of re-scaling the mean). This CLI applies
``models.compat.rescale_resolution_transfer`` and writes a new checkpoint
suitable for the trainer's ``--init-checkpoint``.

Usage:
    python scripts/rescale_transfer.py \
        --checkpoint /path/outputs/<run>/checkpoints/best \
        --from-width 128 --to-width 320 --out /path/rescaled_init
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=Path, required=True,
                        help="Source checkpoint (orbax dir or torch .pt).")
    parser.add_argument("--from-width", type=int, required=True,
                        help="Training image width of the source checkpoint.")
    parser.add_argument("--to-width", type=int, required=True,
                        help="Image width the finetune will train at.")
    parser.add_argument("--out", type=Path, required=True,
                        help="Output directory; checkpoint written at "
                             "<out>/rescaled.")
    parser.add_argument("--base-channels", type=int, default=32)
    args = parser.parse_args()

    import jax

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.models.compat import (
        rescale_resolution_transfer,
    )
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state, make_adamw,
    )
    from stereo_depth_estimation_tpu.training.checkpoint import (
        load_model_variables, save_checkpoint,
    )

    ratio = args.to_width / args.from_width
    model = StereoUNet(base_channels=args.base_channels)
    # Fully convolutional: any init resolution yields the same param tree.
    state = create_train_state(
        model, jax.random.key(0), (64, 64), make_adamw(1e-3, 1e-4)
    )
    restored, meta = load_model_variables(
        args.checkpoint,
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    params = rescale_resolution_transfer(restored["params"], ratio)
    state = state.replace(params=params, batch_stats=restored["batch_stats"])
    target = save_checkpoint(
        args.out, "rescaled", state,
        epoch=int(meta.get("epoch", -1)),
        config={
            "rescale_width_ratio": ratio,
            "source_checkpoint": str(args.checkpoint),
        },
        metrics={},
    )
    print(f"Wrote width-rescaled (x{ratio:g}) checkpoint to {target}")


if __name__ == "__main__":
    main()
