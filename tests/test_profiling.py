"""StepProfiler: arms after skip_steps, captures num_steps, writes a trace."""

from pathlib import Path

from stereo_depth_estimation_tpu.training.profiling import StepProfiler


def test_disabled_profiler_is_noop() -> None:
    profiler = StepProfiler(None)
    for _ in range(5):
        profiler.step()
    profiler.stop()  # must not raise


def test_profiler_captures_requested_window(tmp_path: Path) -> None:
    logdir = tmp_path / "trace"
    profiler = StepProfiler(logdir, num_steps=2, skip_steps=1)
    profiler.step()  # skipped (compile step)
    assert not profiler._active
    profiler.step()  # starts the trace
    assert profiler._active
    profiler.step()
    profiler.step()  # window done -> stops
    assert not profiler._active and profiler._done
    profiler.step()  # further steps are no-ops
    assert list(logdir.rglob("*.xplane.pb")), "no trace file written"


def test_profiler_stop_flushes_short_epochs(tmp_path: Path) -> None:
    logdir = tmp_path / "trace2"
    profiler = StepProfiler(logdir, num_steps=100, skip_steps=0)
    profiler.step()
    profiler.stop()
    assert profiler._done
    assert list(logdir.rglob("*.xplane.pb"))
