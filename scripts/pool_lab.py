"""Experiment: 2x2 maxpool fwd (max + argmax) / bwd (mask multiply)
alternatives vs XLA's reduce_window + select_and_scatter.

Round-3 profiling (docs/step_profile_tpu.json) showed select_and_scatter
maxpool backward running at ~0.1 TFLOP/s for ~6 ms/step; the XLA
strided-slice rewrite regressed (+40 ms: stride-2 slices lowered to
index-vector gathers). Mosaic also refuses strided slices ("Only 2D
gather is supported"), so every variant here reaches the 2x2 window pairs
by RESHAPE-splitting dims instead of striding:

- H split (dim -3) happens OUTSIDE the kernel: it leaves the physical
  (W, C) tiling untouched, so it is layout-free.
- W split (the sublane dim) is the contested operation — tried both
  in-kernel (Mosaic reshape) and as a pure-XLA rewrite.

Tie-breaking is FIRST max in window order (0,0),(0,1),(1,0),(1,1) — the
same rule as torch max_pool2d indices and select_and_scatter-with-GE, so
gradients stay bit-comparable with the reference on tie-rich (post-ReLU)
activations.

Timing uses a device-to-host scalar fetch as the fence:
block_until_ready is not a reliable fence on this platform (docs/PERF.md).

Usage: python scripts/pool_lab.py [--interpret] [--skip-timing]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


# ---------------------------------------------------------------------------
# Shared math: first-max selection over the 4 window candidates
# ---------------------------------------------------------------------------

def _max_and_first_idx(a0, a1, b0, b1, idx_dtype=jnp.uint8):
    y = jnp.maximum(jnp.maximum(a0, a1), jnp.maximum(b0, b1))
    idx = jnp.where(
        a0 >= y, 0, jnp.where(a1 >= y, 1, jnp.where(b0 >= y, 2, 3))
    ).astype(idx_dtype)
    return y, idx


# ---------------------------------------------------------------------------
# Pallas kernels (input pre-reshaped to (N, H/2, 2, W, C) outside)
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, y_ref, idx_ref):
    x = x_ref[0]            # (kh, 2, W, C)
    a, b = x[:, 0], x[:, 1]  # (kh, W, C) top / bottom rows
    kh, w, c = a.shape
    a_r = a.reshape(kh, w // 2, 2, c)
    b_r = b.reshape(kh, w // 2, 2, c)
    y, idx = _max_and_first_idx(
        a_r[:, :, 0], a_r[:, :, 1], b_r[:, :, 0], b_r[:, :, 1],
        idx_ref.dtype,
    )
    y_ref[0] = y
    idx_ref[0] = idx


def _bwd_kernel(dy_ref, idx_ref, dx_ref):
    dy = dy_ref[0]    # (kh, W/2, C)
    idx = idx_ref[0]
    kh, w2, c = dy.shape
    parts = [dy * (idx == k).astype(dy.dtype) for k in range(4)]
    top = jnp.stack([parts[0], parts[1]], axis=2).reshape(kh, 2 * w2, c)
    bot = jnp.stack([parts[2], parts[3]], axis=2).reshape(kh, 2 * w2, c)
    dx_ref[0] = jnp.stack([top, bot], axis=1)  # (kh, 2, W, C)


def _pick_kh(h2: int, target: int = 24) -> int:
    for kh in range(min(target, h2), 0, -1):
        if h2 % kh == 0:
            return kh
    return 1


def maxpool2x2_pallas_fwd(x: jnp.ndarray, *, interpret: bool):
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    kh = _pick_kh(h2)
    x5 = x.reshape(n, h2, 2, w, c)  # layout-free: (W, C) untouched
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n, h2 // kh),
        in_specs=[pl.BlockSpec((1, kh, 2, w, c), lambda i, j: (i, j, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, kh, w2, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, kh, w2, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
            jax.ShapeDtypeStruct((n, h2, w2, c), jnp.uint8),
        ],
        interpret=interpret,
    )(x5)


def maxpool2x2_pallas_bwd(
    dy: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool
):
    n, h2, w2, c = dy.shape
    kh = _pick_kh(h2)
    dx5 = pl.pallas_call(
        _bwd_kernel,
        grid=(n, h2 // kh),
        in_specs=[
            pl.BlockSpec((1, kh, w2, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, kh, w2, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, kh, 2, 2 * w2, c), lambda i, j: (i, j, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h2, 2, 2 * w2, c), dy.dtype),
        interpret=interpret,
    )(dy, idx)
    return dx5.reshape(n, 2 * h2, 2 * w2, c)


# ---------------------------------------------------------------------------
# Pure-XLA reshape rewrite (exact first-max tie-break via saved idx)
# ---------------------------------------------------------------------------

def maxpool2x2_xla_reshape_fwd(x: jnp.ndarray):
    n, h, w, c = x.shape
    x6 = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return _max_and_first_idx(
        x6[:, :, 0, :, 0], x6[:, :, 0, :, 1],
        x6[:, :, 1, :, 0], x6[:, :, 1, :, 1],
    )


def maxpool2x2_xla_reshape_bwd(dy: jnp.ndarray, idx: jnp.ndarray):
    n, h2, w2, c = dy.shape
    parts = jnp.stack(
        [dy * (idx == k).astype(dy.dtype) for k in range(4)], axis=0
    )  # (4, n, h2, w2, c)
    dx6 = parts.reshape(2, 2, n, h2, w2, c).transpose(2, 3, 0, 4, 1, 5)
    return dx6.reshape(n, 2 * h2, 2 * w2, c)


# ---------------------------------------------------------------------------
# XLA production path (reduce_window fwd, select_and_scatter bwd)
# ---------------------------------------------------------------------------

def maxpool2x2_xla(x: jnp.ndarray) -> jnp.ndarray:
    from flax import linen as nn

    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def _fence(out) -> None:
    """Honest device sync: D2H fetch of one scalar derived from the output
    (block_until_ready is unreliable here — docs/PERF.md)."""
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--interpret", action="store_true")
    parser.add_argument("--skip-timing", action="store_true")
    args = parser.parse_args()
    interpret = args.interpret

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    variants_fwd = {
        "pallas": jax.jit(functools.partial(
            maxpool2x2_pallas_fwd, interpret=interpret)),
        "xla_reshape": jax.jit(maxpool2x2_xla_reshape_fwd),
    }
    variants_bwd = {
        "pallas": jax.jit(functools.partial(
            maxpool2x2_pallas_bwd, interpret=interpret)),
        "xla_reshape": jax.jit(maxpool2x2_xla_reshape_bwd),
    }

    # ---- correctness on tie-rich (post-ReLU-like) inputs
    for name in variants_fwd:
        for shape, dtype in (((2, 16, 24, 8), jnp.float32),
                             ((2, 12, 16, 128), jnp.bfloat16)):
            x = jnp.asarray(
                np.maximum(rng.normal(size=shape), 0.0), dtype
            )
            try:
                y, idx = variants_fwd[name](x)
                y, idx = np.asarray(y), np.asarray(idx)
            except Exception as exc:
                print(f"[{name}] fwd {shape}: COMPILE FAIL: "
                      f"{type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:140]}", flush=True)
                continue
            fwd_ok = np.array_equal(y, np.asarray(maxpool2x2_xla(x)))
            dy = jnp.asarray(rng.normal(size=y.shape), dtype)
            dx_ref = np.asarray(jax.grad(
                lambda xf: jnp.sum(
                    maxpool2x2_xla(xf.astype(dtype)).astype(jnp.float32)
                    * dy.astype(jnp.float32)
                )
            )(np.asarray(x, np.float32)))
            try:
                dx = np.asarray(variants_bwd[name](dy, jnp.asarray(idx)))
            except Exception as exc:
                print(f"[{name}] bwd {shape}: COMPILE FAIL: "
                      f"{type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:140]}", flush=True)
                continue
            bwd_ok = np.array_equal(dx.astype(np.float32), dx_ref)
            print(f"[{name}] {shape} {np.dtype(dtype).name}: "
                  f"fwd_exact={fwd_ok} bwd_exact={bwd_ok}", flush=True)

    if args.skip_timing:
        return

    # ---- timing at the enc1 production shape
    shape = (128, 240, 320, 32)
    x = jnp.asarray(
        np.maximum(rng.normal(size=shape), 0).astype(np.float32), jnp.bfloat16
    )
    dy_shape = (shape[0], shape[1] // 2, shape[2] // 2, shape[3])
    dy = jnp.asarray(rng.normal(size=dy_shape).astype(np.float32), jnp.bfloat16)

    def timeit(fn, *a, repeats=20):
        out = fn(*a)
        _fence(out)
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*a)
        _fence(out)
        return (time.perf_counter() - t0) / repeats * 1e3

    xla_fwd = jax.jit(maxpool2x2_xla)
    xla_fwdbwd = jax.jit(jax.grad(
        lambda x: jnp.sum(maxpool2x2_xla(x).astype(jnp.float32)
                          * dy.astype(jnp.float32))
    ))
    print(f"XLA reduce_window fwd: {timeit(xla_fwd, x):.2f} ms", flush=True)
    print(f"XLA fwd+select_and_scatter bwd: {timeit(xla_fwdbwd, x):.2f} ms",
          flush=True)

    for name in variants_fwd:
        try:
            ms_f = timeit(variants_fwd[name], x)
            _, idx = variants_fwd[name](x)
            ms_b = timeit(variants_bwd[name], dy, idx)
            print(f"{name} fwd: {ms_f:.2f} ms, bwd: {ms_b:.2f} ms", flush=True)
        except Exception as exc:
            print(f"{name} timing FAIL: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
