"""Full-resolution end-to-end EPE parity gate (BASELINE.md north star).

Builds the reference-spec torch model at full size (base=32), transfers its
weights into the flax StereoUNet via models.compat, pushes an identical
240x320 stereo pair through each framework's preprocessing + forward, and
asserts the disparity/logvar end-point error stays within the 1e-3 gate.

The pair is produced by StereoSampleLoader from PNGs on disk, so the decode
-> resize -> normalise path is part of what's being gated, not just the
network. Reference spec: /root/reference/src/foundation_stereo_depth/
model.py:48-104 (architecture), dataset.py:184-212 (preprocess).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_depth_estimation_tpu.data.dataset import StereoSampleLoader
from stereo_depth_estimation_tpu.data.samples import StereoSample
from stereo_depth_estimation_tpu.models import StereoUNet
from stereo_depth_estimation_tpu.models.compat import load_torch_state_dict
from stereo_depth_estimation_tpu.ops.codec import disparity_encode_np

torch = pytest.importorskip("torch")
PIL_Image = pytest.importorskip("PIL.Image")

sys.path.insert(0, str(Path(__file__).parent))
from test_model import _make_torch_model  # noqa: E402

FULL_HW = (240, 320)


def _make_sample_on_disk(root: Path) -> StereoSample:
    """One raw-source sample: 480x640 JPEG-free PNGs + RGB24 disparity."""
    rng = np.random.default_rng(42)
    base = root / "scene" / "dataset" / "data"
    paths = {}
    for side in ("left", "right"):
        d = base / side / "rgb"
        d.mkdir(parents=True, exist_ok=True)
        img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        paths[side] = d / "000000.png"
        PIL_Image.fromarray(img).save(paths[side])
    disp_dir = base / "left" / "disparity"
    disp_dir.mkdir(parents=True, exist_ok=True)
    disparity = rng.uniform(0.5, 90.0, (480, 640)).astype(np.float32)
    disp_path = disp_dir / "000000.png"
    PIL_Image.fromarray(disparity_encode_np(disparity)).save(disp_path)
    return StereoSample(paths["left"], paths["right"], disp_path)


def test_fullres_epe_parity_gate(tmp_path: Path) -> None:
    sample = _make_sample_on_disk(tmp_path)
    loader = StereoSampleLoader([sample], image_size=FULL_HW)
    item = loader[0]
    x_nhwc = item["input"].astype(np.float32)[None]  # (1, 240, 320, 6)
    if x_nhwc.max() > 1.5:  # uint8 fast path -> normalise like the step does
        x_nhwc = x_nhwc / 255.0

    torch.manual_seed(0)
    tmodel = _make_torch_model(base=32)
    tmodel.eval()

    fmodel = StereoUNet()  # full-size defaults: base_channels=32
    variables = jax.eval_shape(
        lambda: fmodel.init(
            jax.random.key(0), jnp.zeros((1, *FULL_HW, 6)), train=False,
            return_uncertainty=True,
        )
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    variables, missing, unexpected = load_torch_state_dict(
        variables, tmodel.state_dict()
    )
    assert missing == [] and unexpected == []

    with torch.inference_mode():
        t_disp, t_lv = tmodel(
            torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2).copy())
        )
    with jax.default_matmul_precision("highest"):
        f_disp, f_lv = fmodel.apply(
            variables, jnp.asarray(x_nhwc), train=False, return_uncertainty=True
        )

    disp_err = np.abs(np.asarray(f_disp)[..., 0] - t_disp.numpy()[:, 0])
    lv_err = np.abs(np.asarray(f_lv)[..., 0] - t_lv.numpy()[:, 0])
    # North-star gate: EPE (mean end-point error) within 1e-3.
    assert disp_err.mean() < 1e-3, f"disparity EPE {disp_err.mean():.2e}"
    assert lv_err.mean() < 1e-3, f"logvar EPE {lv_err.mean():.2e}"
    assert disp_err.max() < 1e-2, f"disparity max err {disp_err.max():.2e}"
    assert lv_err.max() < 1e-2, f"logvar max err {lv_err.max():.2e}"
