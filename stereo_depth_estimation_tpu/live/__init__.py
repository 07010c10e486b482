"""Live stereo tooling: device probing, chessboard calibration, the SGBM
classical comparator, and the TPU-inference depth viewer with checkpoint
hot-reload. Every tool also runs headless on stored frame pairs."""
