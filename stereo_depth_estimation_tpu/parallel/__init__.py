from .mesh import make_mesh, replicate_to_mesh, shard_batch_to_mesh
from .train_step import (
    TrainState,
    create_train_state,
    make_adamw,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "replicate_to_mesh",
    "shard_batch_to_mesh",
    "TrainState",
    "create_train_state",
    "make_adamw",
    "make_eval_step",
    "make_train_step",
]
