"""See scripts/ref_shims/torchvision/__init__.py. Augmentation must stay
disabled when the reference runs against these shims."""


def _unavailable(name: str):
    def fn(*_args, **_kwargs):
        raise RuntimeError(
            f"torchvision stub: {name} was called — the real torchvision is "
            "not installed in this image. Run the reference trainer with "
            "--no-augment when using scripts/ref_shims."
        )

    fn.__name__ = name
    return fn


adjust_brightness = _unavailable("adjust_brightness")
adjust_contrast = _unavailable("adjust_contrast")
adjust_saturation = _unavailable("adjust_saturation")
adjust_hue = _unavailable("adjust_hue")
adjust_gamma = _unavailable("adjust_gamma")
gaussian_blur = _unavailable("gaussian_blur")
