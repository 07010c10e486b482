"""Import-only torchvision stub: the reference's dataset.py imports
``torchvision.transforms.functional`` at module level, but its functions
are only CALLED when augmentation is enabled. The convergence comparison
runs the reference with ``--no-augment``, so this stub satisfies the import
and fails loudly if any transform is actually invoked."""
