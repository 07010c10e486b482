"""Per-HLO-op TPU profile of the training step (feeds docs/PERF.md).

Captures a jax.profiler trace of a few steady-state training steps of the
bench configuration, converts it with xprof's hlo_stats tool, and prints the
top ops by self time with their FLOP rates — the ground truth for deciding
where the MXU-utilization gap lives.

Usage: python scripts/profile_ops.py [--batch N] [--variant V] [--top K]
                                     [--json PATH]
(variants as in perf_lab.py)

``--json docs/step_profile_tpu.json`` additionally writes the bound-by
split and per-layer table as a committed artifact, so the decomposition
claims in docs/PERF.md stay durable and refreshable.
"""

from __future__ import annotations

import csv
import io
import json
import os
import sys


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import create_train_state, make_adamw
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
    )

    argv = sys.argv[1:]
    batch_size = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 128
    top_k = int(argv[argv.index("--top") + 1]) if "--top" in argv else 40
    variant = argv[argv.index("--variant") + 1] if "--variant" in argv else "base"
    json_path = argv[argv.index("--json") + 1] if "--json" in argv else None
    trace_dir = "/tmp/profile_ops_trace"

    hw = (240, 320)
    n_samples = 512

    model_kwargs: dict = {"compute_dtype": jnp.bfloat16}
    if variant == "remat":
        model_kwargs["remat"] = True
    elif variant == "fused":
        model_kwargs["fused_block"] = True
    elif variant == "split":
        model_kwargs["skip_impl"] = "split"
    elif variant == "hybridskip":
        model_kwargs["skip_impl"] = "hybrid"
    elif variant != "base":
        raise SystemExit(f"unknown variant: {variant}")

    @jax.jit
    def gen_payload(key):
        k_img, k_tgt = jax.random.split(key)
        images = jax.random.randint(
            k_img, (n_samples, *hw, 6), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        targets = jax.random.uniform(
            k_tgt, (n_samples, *hw), jnp.float32, 0.5, 64.0
        ).astype(jnp.float16)
        return images, targets

    images_dev, targets_dev = gen_payload(jax.random.key(0))
    model = StereoUNet(**model_kwargs)
    tx = make_adamw(1e-3, 1e-4)
    state = jax.jit(lambda k: create_train_state(model, k, hw, tx))(
        jax.random.key(0)
    )
    step = make_device_data_train_step(
        model, tx, images_dev, targets_dev, batch_size, AugmentConfig()
    )

    # Compile + settle past the platform's slow first window.
    for _ in range(10):
        state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))
    print("warm; tracing...", file=sys.stderr, flush=True)

    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))
    jax.profiler.stop_trace()

    xplanes = []
    for root, _dirs, files in os.walk(trace_dir):
        xplanes += [os.path.join(root, f) for f in files if f.endswith(".xplane.pb")]
    assert xplanes, f"no xplane.pb under {trace_dir}"
    xplane = max(xplanes, key=os.path.getmtime)

    from xprof.convert import raw_to_tool_data

    data, _ctype = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = _parse_hlo_stats(data)
    rows.sort(key=lambda r: -r["self_us"])
    total_us = sum(r["self_us"] for r in rows)
    print(f"# variant={variant} batch={batch_size}; total device self-time "
          f"{total_us / 5e3:.2f} ms/step over 5 steps")

    # Bottleneck split: what fraction of the step each limiter owns.
    by_bound: dict[str, float] = {}
    for r in rows:
        by_bound[r["bound_by"]] = by_bound.get(r["bound_by"], 0.0) + r["self_us"]
    for k, v in sorted(by_bound.items(), key=lambda kv: -kv[1]):
        print(f"#   bound-by {k:<10} {v / 5e3:7.2f} ms/step ({100 * v / total_us:4.1f}%)")

    # Per-layer aggregation via the framework op path (jvp/transpose scopes
    # give fwd/bwd attribution) — the view that localises the HBM-bound
    # layers (docs/PERF.md round-3 analysis).
    by_layer: dict[str, list[float]] = {}
    for r in rows:
        key = _layer_key(r["fw_name"])
        acc = by_layer.setdefault(key, [0.0, 0.0])
        acc[0] += r["self_us"]
        acc[1] += r["self_us"] * r["gflops_per_sec"]
    print(f"# {'layer':<40} {'ms/step':>8} {'%':>5} {'avg TFLOP/s':>11}")
    for k, (t, gw) in sorted(by_layer.items(), key=lambda kv: -kv[1][0])[:top_k]:
        print(f"# {k:<40} {t / 5e3:8.2f} {100 * t / total_us:5.1f} "
              f"{gw / t / 1e3 if t else 0.0:11.1f}")

    print(f"{'ms/step':>8} {'%':>5} {'TFLOP/s':>8} {'GiB/s':>7} {'bound':<8} "
          f"{'category':<20} name / layer")
    for r in rows[:top_k]:
        print(
            f"{r['self_us'] / 5e3:8.2f} {100 * r['self_us'] / total_us:5.1f} "
            f"{r['gflops_per_sec'] / 1e3:8.1f} {r['hbm_gibps']:7.0f} "
            f"{r['bound_by']:<8} {r['category']:<20} "
            f"{r['name'][:28]:<28} {_layer_key(r['fw_name'])}"
        )

    if json_path:
        artifact = {
            "variant": variant,
            "batch_size": batch_size,
            "device": str(jax.devices()[0]),
            "jax_version": jax.__version__,
            "total_ms_per_step": round(total_us / 5e3, 2),
            "bound_by_ms_per_step": {
                k: round(v / 5e3, 2)
                for k, v in sorted(by_bound.items(), key=lambda kv: -kv[1])
            },
            "layers": [
                {
                    "layer": k,
                    "ms_per_step": round(t / 5e3, 2),
                    "share_pct": round(100 * t / total_us, 1),
                    "avg_tflops": round(gw / t / 1e3, 1) if t else 0.0,
                }
                for k, (t, gw) in sorted(
                    by_layer.items(), key=lambda kv: -kv[1][0]
                )
            ],
        }
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {json_path}")


def _layer_key(fw_name: str) -> str:
    """'jit(body)/transpose(jvp(StereoUNet))/dec1/conv1/...' -> 'bwd:dec1'."""
    import re

    f = (fw_name or "?").replace("jit(body)/", "").rstrip(":")
    m = re.search(
        r"(transpose\(jvp\(StereoUNet\)\)|jvp\(StereoUNet\)|StereoUNet)"
        r"/([A-Za-z0-9_]+)",
        f,
    )
    if m:
        return f"{'bwd' if 'transpose' in m.group(1) else 'fwd'}:{m.group(2)}"
    return f[:44]


def _parse_hlo_stats(data: str) -> list[dict]:
    """hlo_stats returns gviz JSON or CSV depending on version; handle both."""
    rows: list[dict] = []
    try:
        table = json.loads(data)
    except json.JSONDecodeError:
        reader = csv.DictReader(io.StringIO(data))
        for rec in reader:
            rows.append(_row_from_mapping(rec))
        return rows
    cols = [c["label"] for c in table["cols"]]
    for row in table["rows"]:
        rec = {c: (cell or {}).get("v") for c, cell in zip(cols, row["c"])}
        rows.append(_row_from_mapping(rec))
    return rows


def _pick(rec: dict, *cands, default=0.0):
    lower = {str(k).lower().replace(" ", "_"): v for k, v in rec.items()}
    for cand in cands:
        if cand in lower and lower[cand] not in (None, ""):
            return lower[cand]
    return default


def _row_from_mapping(rec: dict) -> dict:
    return {
        "name": str(_pick(rec, "hlo_op_name", "hlo_op", "op_name", default="?")),
        "category": str(
            _pick(rec, "hlo_op_category", "op_category", "category", default="?")
        ),
        "self_us": float(
            _pick(rec, "total_self_time_(us)", "self_time_(us)", "self_time_us",
                  "total_self_time_us", default=0.0)
        ),
        "gflops_per_sec": float(
            _pick(rec, "gflops/s", "gflop/s", "gflops_per_sec", "flop_rate_(gflop/s)",
                  "measured_gflop/s", "model_gflop/s", default=0.0)
        ),
        "bound_by": str(_pick(rec, "bound_by", default="?")),
        "hbm_gibps": float(_pick(rec, "hbm_bw_(gib/s)", default=0.0)),
        "fw_name": str(_pick(rec, "framework_op_name", default="?")),
    }


if __name__ == "__main__":
    main()
