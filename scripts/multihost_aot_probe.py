"""Multihost warmup cost + AOT-executable-cache extension probe.

The trainer's AOT executable disk cache is single-process only BY DESIGN
(training/trainer.py — a multihost executable is bound to the global
topology, and PJRT's per-process serialize/deserialize semantics were
unverified), so every process of a multihost run pays the full XLA
compile. This script turns that documented-but-unmeasured restriction
into numbers, on the same 2-process x 4-virtual-CPU-device gloo farm the
multihost tests use (tests/test_multihost.py):

phase 1 (fresh):  each process times lowering+compile of the global-mesh
                  train step, serializes its loaded executable
                  (jax.experimental.serialize_executable) to its OWN
                  per-process blob, runs 2 steps, and reports metrics.
phase 2 (reload): a brand-new farm on the same topology deserializes each
                  process's blob (per-(topology, process_id) keying — the
                  extension candidate), runs the same 2 steps, and reports
                  metrics. The parent diffs phase-2 metrics against
                  phase 1: byte-equal => the extension is SAFE on this
                  backend; load failure or metric drift => measured
                  refutation.

Usage:  python scripts/multihost_aot_probe.py [--json OUT.json]

Results land in docs/PERF.md ("Multihost warmup"). CPU-farm compile
seconds are not TPU compile seconds, but the serialize semantics — the
thing that decides whether the cache may be extended — are the backend
contract this probe checks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = textwrap.dedent(
    """
    import json, os, sys, time
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    phase = sys.argv[4]; blob_dir = sys.argv[5]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import optax
    from jax.experimental import serialize_executable
    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state, make_train_step,
    )
    from stereo_depth_estimation_tpu.parallel.distributed import (
        MultihostBatcher, initialize_multihost,
    )
    from stereo_depth_estimation_tpu.parallel.mesh import (
        make_mesh, replicate_to_mesh,
    )

    initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)

    def fetch(indices):
        idx = np.asarray(indices)
        base = (idx[:, None, None, None] % 7 + 1).astype(np.float32) / 8.0
        return {{
            "input": np.broadcast_to(base, (len(idx), 32, 32, 6)).copy(),
            "target": np.broadcast_to(base[..., 0] * 4.0, (len(idx), 32, 32)).copy(),
        }}

    mesh = make_mesh()
    batcher = MultihostBatcher(fetch, mesh)
    model = StereoUNet(base_channels=8)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, jax.random.key(3), (32, 32), tx)
    state = replicate_to_mesh(state, mesh)
    jitted = make_train_step(model, tx)
    batch0 = batcher(np.arange(16))

    blob = os.path.join(blob_dir, f"exe_p{{pid}}of{{nproc}}.bin")
    result = {{"pid": pid, "phase": phase}}
    t0 = time.perf_counter()
    if phase == "fresh":
        lowered = jitted.lower(state, batch0)
        result["lower_seconds"] = round(time.perf_counter() - t0, 3)
        t1 = time.perf_counter()
        step = lowered.compile()
        result["compile_seconds"] = round(time.perf_counter() - t1, 3)
        try:
            import pickle
            payload = pickle.dumps(serialize_executable.serialize(step))
            open(blob, "wb").write(payload)
            result["serialized_mb"] = round(len(payload) / 1e6, 2)
        except Exception as exc:
            result["serialize_error"] = repr(exc)
    else:
        import pickle
        payload, in_tree, out_tree = pickle.loads(open(blob, "rb").read())
        try:
            step = serialize_executable.deserialize_and_load(
                payload, in_tree, out_tree
            )
            result["reload_seconds"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            result["reload_error"] = repr(exc)
            print("PROBE " + json.dumps(result), flush=True)
            sys.exit(0)

    state, stats = step(state, batch0)
    state, stats = step(state, batcher(np.arange(16, 32)))
    checksum = float(sum(abs(np.asarray(jax.device_get(x))).sum()
                         for x in jax.tree.leaves(state.params)))
    result["nll"] = f"{{float(stats.nll_sum):.9g}}"
    result["checksum"] = f"{{checksum:.9g}}"
    print("PROBE " + json.dumps(result), flush=True)
    """
).format(repo=str(REPO))


def _run_farm(phase: str, port: int, blob_dir: str) -> list[dict]:
    sys.path.insert(0, str(REPO))
    from stereo_depth_estimation_tpu.parallel.distributed import run_process_farm

    farm = run_process_farm(
        _CHILD,
        lambda i: [str(i), "2", str(port), phase, blob_dir],
        result_prefix="PROBE ",
        timeout=900.0,
        cwd=str(REPO),
    )
    results = [json.loads(line) for line, _out in farm]
    return sorted(results, key=lambda r: r["pid"])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", type=Path, default=None)
    args = parser.parse_args()

    port = 19000 + (os.getpid() % 2000)
    summary: dict = {"topology": "2 procs x 4 virtual CPU devices (gloo)"}
    with tempfile.TemporaryDirectory(prefix="mh_aot_probe_") as blob_dir:
        fresh = _run_farm("fresh", port, blob_dir)
        summary["fresh"] = fresh
        print(f"fresh farm: {json.dumps(fresh)}", flush=True)
        if any("serialize_error" in r for r in fresh):
            summary["verdict"] = (
                "REFUTED: backend would not serialize the multihost "
                "executable; the cache cannot be extended."
            )
        else:
            reload_ = _run_farm("reload", port + 1, blob_dir)
            summary["reload"] = reload_
            print(f"reload farm: {json.dumps(reload_)}", flush=True)
            errs = [r for r in reload_ if "reload_error" in r]
            if errs:
                summary["verdict"] = (
                    "REFUTED: per-process deserialize failed on this "
                    f"backend: {errs[0]['reload_error']}"
                )
            else:
                match = all(
                    f["nll"] == r["nll"] and f["checksum"] == r["checksum"]
                    for f, r in zip(fresh, reload_)
                )
                summary["metrics_match"] = match
                summary["verdict"] = (
                    "SAFE: per-(topology, process_id) reload reproduced the "
                    "fresh-compile training metrics byte-for-byte on this "
                    "backend" if match else
                    "REFUTED: reloaded executable diverged from fresh compile"
                )
    print(json.dumps(summary))
    if args.json:
        args.json.write_text(json.dumps(summary, indent=2) + "\n")


if __name__ == "__main__":
    main()
