"""TPU-native stereo depth estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``sdfgeoff/stereo_depth_estimation`` (the PyTorch reference):

- ``ops``       pure functional compute: disparity codec, resize, augmentation,
                loss, geometry, remap, colormaps (+ Pallas kernels for hot paths)
- ``models``    Flax StereoUNet (NHWC, MXU-friendly) + checkpoint compat
- ``data``      sample discovery, npz/packed caches, host pipeline w/ prefetch
- ``parallel``  mesh construction and sharded (pjit) train/eval steps
- ``training``  config, trainer loop, tracking (MLflow-compatible), checkpoints
- ``live``      camera utilities, calibration, SGBM baseline, live DL viewer
"""

__version__ = "0.1.0"
