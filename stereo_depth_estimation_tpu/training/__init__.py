"""Training shell: config, tracking, checkpointing, trainer loop."""
