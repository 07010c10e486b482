"""Live USB-stereo application suite: probing, calibration, SGBM baseline,
and the deep-learning depth viewer (TPU inference, checkpoint hot-reload)."""
