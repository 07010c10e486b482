"""Benchmark: end-to-end training throughput (stereo pairs/sec/chip).

Measures steady-state training throughput at 320x240 on the flagship
StereoUNet with the device-resident fast path: a synthetic packed-cache
payload (uint8 stereo images + f16 disparity — exactly the decoded/cached
representation the reference trains from on its cached path) lives in HBM,
and every step runs fully on-device: per-epoch permutation, batch gather,
normalise, asymmetric augmentation, forward/backward, AdamW — K steps per
dispatch via lax.scan.

Engineered to finish on a slow tunneled device transport (round-1 bench
timed out, BENCH_r01.json rc=124):
- the payload is GENERATED ON DEVICE with jax.random (zero H2D staging;
  round 1 pushed 1.26 GB through a single-digit-MB/s transport),
- model/optimizer init is one jitted program (eager init was ~100 s of
  per-op dispatch),
- each step is TWO pipelined dispatches (on-device batch gather + the
  standard augmented train step) instead of one fused or scanned program:
  the fused/scanned variants compile 2.4-5x slower for a measured
  throughput tie (docs/PERF.md), the split dispatches asynchronously, so
  steps pipeline and throughput stays compute-bound (current measured
  numbers live in docs/PERF.md and BENCH_r*.json),
- the persistent compilation cache is enabled, so repeat runs skip the
  one-time XLA compile,
- stage progress goes to stderr so a timeout is diagnosable,
- the device-resident metric is the MEDIAN of several independent synced
  windows (all windows + the best reported): the shared platform shows
  intermittent 2x slowdowns between back-to-back windows of the identical
  program, so a single window measures the weather, not the framework,
  and a best-of headline would overstate sustained rate,
- the streamed metric times the production packed-cache -> prefetch ->
  step path and carries an H2D bandwidth probe, because on a tunneled
  transport it is transport-bound (docs/PERF.md),
- when the session's time budget allows, the default run appends a
  fast-mode sub-measurement (96x128 batch 256 — the documented
  math-changing config, docs/PERF.md "Fast mode") so the JSON carries
  both the exact-parity headline and the past-the-target fast number.

Outage resilience (round 4's BENCH_r04.json was zeroed by a single
transport outage — rc=3, parsed null):
- the default invocation is an ORCHESTRATOR: the measurement runs in a
  child subprocess (``--child``); if the child's device init hangs
  (watchdog, rc=3) the parent retries a fresh child with backoff (the
  hang is a client-side retry loop in the PJRT plugin, so only a fresh
  process gets a clean attempt), up to 3 attempts within the run budget;
- the child emits a CUMULATIVE JSON line as each section completes
  (headline first, then +fast-mode, then +streamed/windowed), so a
  mid-run platform hang still leaves a parsed headline on stdout — the
  LAST JSON line is always the most complete result;
- the parent watches for output stalls (no child line for
  ``SDE_BENCH_STALL_SECONDS``, default 330 — above the worst measured
  cold compile) and kills a wedged child; if any JSON was already
  emitted the run still exits 0 with that partial result.

Stdout carries only the cumulative JSON result lines (final line = most
complete); all progress goes to stderr. Exit 0 = a parsed result exists;
exit 3 = platform outage with no measurable window (attributed on stderr).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 5000.0
MEASURE_SECONDS = 15.0
# Parent-side knobs (seconds). The budget bounds the WHOLE run including
# retries; the stall limit must exceed the worst observed cold compile
# (215 s, BENCH_r03) plus server-side warmup so a slow-but-alive child is
# never killed mid-compile.
DEFAULT_BUDGET = 840.0
DEFAULT_STALL = 330.0
DEFAULT_INIT_WATCHDOG_CHILD = 150.0
MAX_ATTEMPTS = 3


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _deadline_wall() -> float:
    """Absolute wall-clock deadline shared parent->child via env."""
    val = os.environ.get("SDE_BENCH_DEADLINE_WALL")
    if val:
        try:
            return float(val)
        except ValueError:
            pass
    return time.time() + DEFAULT_BUDGET - (time.perf_counter() - _T0)


def _time_left() -> float:
    return _deadline_wall() - time.time()


def main() -> None:
    if "--child" in sys.argv:
        sys.argv.remove("--child")
        child_main()
        return
    sys.exit(parent_main())


def parent_main() -> int:
    """Run the measurement in retried child subprocesses (module docstring,
    'Outage resilience'). Returns the process exit code."""
    import subprocess
    import threading

    budget = float(os.environ.get("SDE_BENCH_BUDGET_SECONDS", DEFAULT_BUDGET))
    stall_limit = float(os.environ.get("SDE_BENCH_STALL_SECONDS", DEFAULT_STALL))
    deadline = time.time() + budget - (time.perf_counter() - _T0)

    record: dict = {"last": time.time(), "json": None}

    def _pump(pipe, sink, is_stdout: bool) -> None:
        for raw in iter(pipe.readline, b""):
            record["last"] = time.time()
            text = raw.decode(errors="replace")
            sink.write(text)
            sink.flush()
            if is_stdout:
                s = text.strip()
                if s.startswith("{") and s.endswith("}"):
                    try:
                        record["json"] = json.loads(s)
                    except ValueError:
                        pass
        pipe.close()

    for attempt in range(1, MAX_ATTEMPTS + 1):
        remaining = deadline - time.time()
        if remaining < 90.0:
            _log(f"attempt {attempt}: only {remaining:.0f}s of budget left; stopping")
            break
        env = dict(os.environ)
        env["SDE_BENCH_DEADLINE_WALL"] = str(deadline)
        # Attempt 1 keeps the old full 300 s watchdog so a slow-but-alive
        # init (observed transport warmups take minutes) still succeeds
        # exactly where the pre-orchestrator bench did; only RETRIES use
        # the short watchdog, where a quick verdict buys a fresh attempt.
        env.setdefault(
            "SDE_BENCH_INIT_WATCHDOG",
            str(300.0 if attempt == 1 else DEFAULT_INIT_WATCHDOG_CHILD),
        )
        _log(f"attempt {attempt}/{MAX_ATTEMPTS}: launching child "
             f"({remaining:.0f}s budget left)")
        child = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), "--child",
             *sys.argv[1:]],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        record["last"] = time.time()
        pumps = [
            threading.Thread(target=_pump, args=(child.stdout, sys.stdout, True), daemon=True),
            threading.Thread(target=_pump, args=(child.stderr, sys.stderr, False), daemon=True),
        ]
        for p in pumps:
            p.start()
        killed_reason = ""
        while child.poll() is None:
            time.sleep(1.0)
            now = time.time()
            if now - record["last"] > stall_limit:
                killed_reason = f"no output for {stall_limit:.0f}s (wedged RPC)"
            elif now > deadline + 15.0:
                killed_reason = "run budget exhausted"
            if killed_reason:
                _log(f"attempt {attempt}: killing child — {killed_reason}")
                child.kill()
                break
        child.wait()
        for p in pumps:
            p.join(timeout=10)
        rc = child.returncode
        if rc == 0:
            return 0
        if record["json"] is not None:
            # Mid-run failure after at least one emitted section: the
            # partial result on stdout is real and already parsed.
            _log(f"attempt {attempt}: child rc={rc} after emitting a result; "
                 "keeping the partial JSON (exit 0)")
            return 0
        _log(f"attempt {attempt}: child rc={rc}"
             + (f" ({killed_reason})" if killed_reason else "")
             + ", no result yet")
        if attempt < MAX_ATTEMPTS:
            backoff = min(20.0 * attempt, max(0.0, deadline - time.time()))
            if backoff > 0:
                _log(f"backing off {backoff:.0f}s before retry")
                time.sleep(backoff)
    _log(
        "NO MEASURABLE WINDOW: all attempts failed before any section "
        "completed (TPU transport/service outage — not a framework "
        "failure; see per-attempt logs above)."
    )
    return 3


def child_main() -> None:
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import argparse

    parser = argparse.ArgumentParser(description="training throughput bench")
    parser.add_argument("batch_size", nargs="?", type=int, default=128)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--fast", action="store_true",
                        help="fast-mode config: 96x128 (0.4x linear scale; "
                             "dims must divide by 16 for the 4 pool levels; "
                             "disparity rescales exactly with width), batch "
                             "256. Changes the MATH — measured 6,167 pairs/s "
                             "= 1.23x the 5,000 target, val-MAE cost "
                             "recorded in docs/PERF.md 'Fast mode'; the "
                             "default config is the exact-parity one.")
    parser.add_argument("--skip-streamed", action="store_true")
    parser.add_argument("--skip-fast", action="store_true",
                        help="skip the fast-mode sub-measurement the default "
                             "run appends when time allows")
    parser.add_argument("--force-cpu", action="store_true",
                        help="run on host CPU (harness testing without a "
                             "TPU; numbers are NOT comparable)")
    args = parser.parse_args()
    if args.force_cpu:
        # The env's sitecustomize pins jax_platforms=axon,cpu; only an
        # in-process config update avoids touching the axon transport.
        jax.config.update("jax_platforms", "cpu")
    if args.fast:
        args.height, args.width = 96, 128
        if args.batch_size == 128:
            args.batch_size = 256
    hw = (args.height, args.width)
    batch_size = args.batch_size
    n_samples = 1024

    # Device-init watchdog: when the tunneled TPU transport is down,
    # jax.devices() hangs indefinitely in native code (observed: a full
    # multi-hour platform outage where even a trivial matmul in a fresh
    # process never returned — docs/PERF.md "Known bounded gaps"). Fail
    # fast with an attributable rc=3 so the PARENT can retry a fresh
    # process with backoff instead of eating the caller's whole timeout
    # as an unexplained rc=124. (The hang is a client-side reconnect
    # loop; the thread cannot be cancelled, hence os._exit.)
    import threading

    watchdog = float(os.environ.get("SDE_BENCH_INIT_WATCHDOG", "300"))
    init: dict = {}

    def _init() -> None:
        init["devices"] = jax.devices()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(watchdog)
    if "devices" not in init:
        _log(
            f"DEVICE INIT HUNG >{watchdog:.0f}s: the TPU transport/service "
            "is down (platform outage — not a framework failure; a trivial "
            "jax.devices() call is what is hanging). Aborting this attempt."
        )
        os._exit(3)
    _log(f"devices: {init['devices']}")

    # Cumulative result emission: one full JSON object per completed
    # section; the last line printed is always the most complete result.
    out: dict[str, object] = {}

    def _emit() -> None:
        print(json.dumps(out), flush=True)

    result = measure_device_resident(hw, batch_size, n_samples, cache_dir)

    # Fast mode (docs/PERF.md): the one documented math-changing config
    # (96x128, batch 256, disparity rescaling exactly with width; val-MAE
    # cost recorded in docs/CONVERGENCE.md §3). Measured in the SAME run so
    # the bench JSON always carries both the exact-parity headline and the
    # past-the-target fast number. Runs BEFORE the streamed phases: those
    # cross the host boundary every step and are where the platform's
    # intermittent multi-minute RPC hangs land (docs/PERF.md), so they go
    # last, where a stall can only cost the least-important numbers. The
    # budget guard protects the driver's timeout; round 1 died rc=124 to
    # exactly that.
    metric = "stereo_pairs_per_sec_per_chip_320x240_e2e"
    if hw != (240, 320):
        metric = f"stereo_pairs_per_sec_per_chip_{hw[1]}x{hw[0]}_fastmode_e2e"
    out.update(
        {
            "metric": metric,
            "value": round(result["median"], 1),
            "unit": "pairs/s",
            "vs_baseline": round(result["median"] / BASELINE_PAIRS_PER_SEC, 3),
            "best_window_pairs_per_sec": result["best"],
            "batch_size": batch_size,
            "compile_seconds": result["compile_seconds"],
            "step_program_source": result["step_source"],
            "steps_per_window": result["steps_per_window"],
            "window_pairs_per_sec": result["windows"],
        }
    )
    _emit()  # headline secured — a later hang can no longer zero the run

    if not args.skip_fast and hw == (240, 320) and _time_left() > 240.0:
        f = measure_device_resident((96, 128), 256, n_samples, cache_dir,
                                    tag="fast ")
        out.update(
            {
                "fast_mode_pairs_per_sec": round(f["median"], 1),
                "fast_mode_batch_size": 256,
                "fast_mode_window_pairs_per_sec": f["windows"],
                "fast_mode_compile_seconds": f["compile_seconds"],
            }
        )
        _emit()
    elif not args.skip_fast and hw == (240, 320):
        _log("fast-mode sub-measurement skipped: time budget exceeded")

    if not args.skip_streamed:
        for section in bench_host_paths(
            result["state"], result["inner_step"], batch_size, hw, n_samples
        ):
            out.update(section)
            _emit()


def measure_device_resident(
    hw, batch_size: int, n_samples: int, cache_dir: str, tag: str = ""
) -> dict:
    """Device-resident throughput of one (hw, batch) config: synthetic
    packed payload generated in HBM, AOT-cached step, median of 4 synced
    windows (first window discarded as server-side warmup)."""
    import jax
    import jax.numpy as jnp

    from stereo_depth_estimation_tpu.models import StereoUNet
    from stereo_depth_estimation_tpu.ops.augment import AugmentConfig
    from stereo_depth_estimation_tpu.parallel import (
        create_train_state,
        make_adamw,
    )
    from stereo_depth_estimation_tpu.parallel.aot_cache import (
        compile_with_disk_cache,
    )
    from stereo_depth_estimation_tpu.parallel.train_step import (
        make_device_data_train_step,
        make_train_step,
    )

    # Synthetic packed-cache payload, generated directly in HBM.
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

    t = time.perf_counter()
    images_dev, targets_dev = gen_payload(jax.random.key(0))
    jax.block_until_ready(images_dev)
    _log(f"{tag}payload generated on device in {time.perf_counter() - t:.1f}s "
         f"({images_dev.nbytes / 1e6:.0f} MB images)")

    model = StereoUNet(compute_dtype=jnp.bfloat16)
    tx = make_adamw(1e-3, 1e-4)

    t = time.perf_counter()
    state = jax.jit(lambda k: create_train_state(model, k, hw, tx))(
        jax.random.key(0)
    )
    jax.block_until_ready(state.params)
    _log(f"{tag}train state initialised (jitted) in "
         f"{time.perf_counter() - t:.1f}s")

    # One compiled step program serves both measurements: the device-resident
    # path wraps it behind an on-device gather, the streamed path feeds it
    # host batches (identical avals -> no second compile). The step is
    # AOT-cached on disk (parallel/aot_cache.py): this platform's
    # persistent-cache keys don't transfer across processes, so a fresh
    # process would otherwise pay the full ~90-215 s XLA compile; loading
    # the serialized executable skips it (only the ~30-40 s per-process
    # server-side execution warmup remains).
    jitted_step = make_train_step(model, tx, AugmentConfig())
    example_batch = {
        "input": jnp.zeros((batch_size, *hw, 6), jnp.uint8),
        "target": jnp.zeros((batch_size, *hw), jnp.float16),
    }
    t = time.perf_counter()
    inner_step, step_source = compile_with_disk_cache(
        jitted_step, cache_dir, state, example_batch, verbose=True,
    )
    step_ready_seconds = time.perf_counter() - t
    _log(f"{tag}train step ready in {step_ready_seconds:.1f}s ({step_source})")
    step = make_device_data_train_step(
        model, tx, images_dev, targets_dev, batch_size, AugmentConfig(),
        step_fn=inner_step, aot_cache_dir=cache_dir,
    )

    t = time.perf_counter()
    state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))  # full sync
    compile_seconds = step_ready_seconds + time.perf_counter() - t
    _log(f"{tag}warmup step done in {compile_seconds:.1f}s total "
         f"(step program: {step_source})")
    # A few post-compile steps to settle the pipeline before timing.
    for _i in range(4):
        state, stats = step(state)
    _ = float(np.asarray(stats.nll_sum))

    # Measure several independent synced windows and report the MEDIAN
    # (all windows go into the JSON). The shared bench platform has
    # intermittent multi-x slowdowns (tunnel/server contention): measured
    # 64-step windows of 8.4 s and 15.7 s back-to-back for the identical
    # compiled program, while the per-op device profile is stable at
    # ~129 ms/step (docs/PERF.md). The median is robust to those outliers;
    # the per-window list and the best window document the spread.
    window_steps = 32
    window_rates: list[float] = []
    # First window discarded: on this platform the first post-compile
    # measurement can read 3-5x slow (server-side warmup). 8 measured
    # windows (~34 s at the headline config): a 4-window median was
    # hostage to a single contention burst spanning two windows
    # (observed 878/859/979/979 -> median 929 for the same executable
    # that medians 979 in calm sessions); 8 windows keep the median on
    # the steady rate unless the burst covers half the run.
    for window in range(9):
        start = time.perf_counter()
        for _i in range(window_steps):
            state, stats = step(state)
        _ = float(np.asarray(stats.nll_sum))  # sync: completed work only
        elapsed = time.perf_counter() - start
        rate = window_steps * batch_size / elapsed
        _log(f"{tag}window {window}: {window_steps} steps in {elapsed:.1f}s "
             f"= {rate:.1f} pairs/s" + (" (warmup, discarded)" if window == 0 else ""))
        if window > 0:
            window_rates.append(round(rate, 1))

    # Headline = MEDIAN of windows (robust to the platform's intermittent
    # slow-window outliers without overstating sustained rate the way a
    # best-of headline would); the best window is still reported explicitly.
    return {
        "median": float(np.median(window_rates)),
        "best": max(window_rates),
        "windows": window_rates,
        "compile_seconds": round(compile_seconds, 2),
        "step_source": step_source,
        "steps_per_window": window_steps,
        "state": state,
        "inner_step": inner_step,
    }


def bench_host_paths(state, step, batch_size, hw, n_samples):
    """The host-fed PRODUCTION paths, yielded as result sections in RISK
    order so the caller can emit after each: the HBM-windowed modes first
    (epoch-granularity host crossings; carries the windowed_pinned
    production number), then the per-step streamed loop + H2D probe —
    the phases where the platform's multi-minute RPC hangs land, last.

    Streamed is measured separately from the device-resident number
    because it crosses the host boundary every step; on this bench
    platform the device transport is a network tunnel, so the gap between
    the two numbers is dominated by tunnel bandwidth, not framework
    overhead (a locally attached chip pays ~59 MB / PCIe-or-better per
    128-batch; see docs/PERF.md)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    if _time_left() < 180.0:
        _log("host-fed phases skipped: time budget exceeded")
        return

    from stereo_depth_estimation_tpu.data.packed_cache import (
        PackedCache,
        PackedCacheWriter,
    )
    from stereo_depth_estimation_tpu.data.pipeline import (
        batch_iterator,
        prefetch_to_device,
    )

    tmpdir = tempfile.mkdtemp(prefix="bench_packed_")
    try:
        rng = np.random.default_rng(0)
        writer = PackedCacheWriter(tmpdir, hw)
        for _ in range(n_samples):
            img = rng.integers(0, 256, (*hw, 6), dtype=np.uint8)
            disp = rng.uniform(0.5, 64.0, hw).astype(np.float32)
            writer.add(img[..., :3], img[..., 3:], disp)
        writer.finalize()
        cache = PackedCache(tmpdir)
        _log(f"host-fed: packed cache written ({n_samples} samples)")

        # The train step donates its state argument, so buffers must be
        # threaded through each section, never reused.
        windowed, state = bench_windowed(state, step, cache, batch_size, n_samples)
        yield windowed

        if _time_left() < 120.0:
            _log("streamed phase skipped: time budget exceeded")
            return

        def epoch(ep: int):
            return prefetch_to_device(
                batch_iterator(
                    cache.gather, n_samples, batch_size,
                    shuffle=True, seed=0, epoch=ep,
                )
            )

        stats = None
        # Warm (first window discarded like the main measurement).
        for batch in epoch(0):
            state2, stats = step(state, batch)
            state = state2
        _ = float(np.asarray(stats.nll_sum))

        steps = 0
        start = time.perf_counter()
        ep = 1
        while time.perf_counter() - start < MEASURE_SECONDS:
            for batch in epoch(ep):
                state, stats = step(state, batch)
                steps += 1
            _ = float(np.asarray(stats.nll_sum))
            ep += 1
        _ = float(np.asarray(stats.nll_sum))
        elapsed = time.perf_counter() - start
        rate = steps * batch_size / elapsed
        _log(f"streamed: {steps} steps in {elapsed:.1f}s = {rate:.1f} pairs/s")

        # Raw H2D bandwidth probe: device_put of one batch payload, timed.
        # Makes the streamed-vs-resident gap self-explaining: the streamed
        # path ships ~78 MB/step, so when this probe reads single-digit
        # MB/s (a tunneled transport) the streamed rate is transport-bound,
        # not framework-bound; at PCIe-class bandwidth the H2D cost is a
        # few ms against a >100 ms step and prefetch hides it entirely.
        # RANDOM payload, not zeros: a zeros probe measured ~110 MB/s where
        # real window staging moved at 35-46 MB/s — the tunnel compresses —
        # so an all-zeros probe overstates the bandwidth training data gets.
        # Synced by fetching a reduction of the staged buffer:
        # block_until_ready can return before the transfer completes here.
        payload = np.random.default_rng(0).integers(
            0, 256, (batch_size, *hw, 6), dtype=np.uint8
        )
        checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
        _ = int(checksum(jax.device_put(payload)))  # lazy-init costs out
        t0 = time.perf_counter()
        _ = int(checksum(jax.device_put(payload)))
        h2d_secs = time.perf_counter() - t0
        h2d_mbps = payload.nbytes / 1e6 / h2d_secs
        _log(f"streamed: H2D probe {h2d_mbps:.1f} MB/s "
             f"({payload.nbytes / 1e6:.0f} MB in {h2d_secs:.2f}s)")
        yield {
            "streamed_pairs_per_sec": round(rate, 1),
            "streamed_steps_measured": steps,
            "h2d_mb_per_sec": round(h2d_mbps, 1),
        }
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def bench_windowed(state, step, cache, batch_size, n_samples) -> tuple[dict, object]:
    """HBM-windowed production path (parallel/window.py), both regimes:

    - pinned: the whole packed set fits the HBM budget -> staged once,
      epochs 1+ pay ZERO host traffic (steady-state == device-resident);
    - rotating: budget forced below the set size -> double-buffered epoch
      windows with the next window's H2D overlapped behind training. On a
      tunneled transport this is transport-bound at dataset-bytes/epoch —
      the structural fix over per-step streaming, which pays the same bytes
      but serialises them against every step."""
    import jax

    from stereo_depth_estimation_tpu.parallel.mesh import make_mesh
    from stereo_depth_estimation_tpu.parallel.window import HBMWindowLoader

    mesh = make_mesh(jax.devices()[:1])
    bytes_per_sample = (
        cache._images.nbytes + cache._disparity.nbytes
    ) // n_samples
    results: dict[str, float] = {}
    for label, budget in (
        ("windowed_pinned", 4 << 30),
        ("windowed_rotating", (n_samples * bytes_per_sample) // 2),
    ):
        # These regimes re-cross the host boundary (rotating every epoch),
        # where the platform's intermittent multi-minute RPC hangs land
        # (one measured 216 s for an 8-step epoch); short on budget,
        # skip rather than risk the driver's overall timeout — the JSON
        # then simply omits the key (the headline is already emitted).
        if _time_left() < 120.0:
            _log(f"{label}: skipped, overall time budget exceeded")
            continue
        loader = HBMWindowLoader(
            cache.gather, n_samples, batch_size, mesh,
            bytes_per_sample=bytes_per_sample, budget_bytes=budget, seed=0,
        )
        wstep = loader.step_adapter(step)
        stats = None
        # Epoch 0 warms (and, for pinned, amortises the one-time staging).
        for wb in loader.epoch_batches(0):
            state, stats = wstep(state, wb)
        _ = float(np.asarray(stats.nll_sum))
        steps = 0
        ep = 1
        start = time.perf_counter()
        while time.perf_counter() - start < MEASURE_SECONDS:
            for wb in loader.epoch_batches(ep):
                state, stats = wstep(state, wb)
                steps += 1
            _ = float(np.asarray(stats.nll_sum))
            ep += 1
        elapsed = time.perf_counter() - start
        rate = steps * batch_size / elapsed
        plan = loader.plan
        _log(
            f"{label}: {steps} steps in {elapsed:.1f}s = {rate:.1f} pairs/s "
            f"({plan.num_windows} window(s) of {plan.window_samples})"
        )
        results[f"{label}_pairs_per_sec"] = round(rate, 1)
    return results, state


if __name__ == "__main__":
    main()
