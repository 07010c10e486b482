"""Step-scoped ``jax.profiler`` capture for the trainer.

The reference's only timing artifacts are ``epoch_seconds`` and a live FPS
HUD (SURVEY.md §5); the TPU-native equivalent is a real profiler trace.
``--profile-dir`` arms a capture of the first ``--profile-steps`` training
batches (compile excluded: the trace starts at the first post-warmup batch),
viewable with TensorBoard's profile plugin or Perfetto.
"""

from __future__ import annotations

from pathlib import Path


class StepProfiler:
    """Trace training batches [skip_steps, skip_steps + num_steps).

    ``step()`` is called once per training batch; the first ``skip_steps``
    calls are skipped so compilation doesn't dominate the trace.
    """

    def __init__(
        self, logdir: str | Path | None, num_steps: int = 10, skip_steps: int = 1
    ) -> None:
        self.logdir = str(logdir) if logdir else None
        self.num_steps = num_steps
        self.skip_steps = skip_steps
        self._seen = 0
        self._active = False
        self._done = self.logdir is None

    def step(self) -> None:
        if self._done:
            return
        if not self._active:
            if self._seen >= self.skip_steps:
                import jax

                Path(self.logdir).mkdir(parents=True, exist_ok=True)
                jax.profiler.start_trace(self.logdir)
                self._active = True
                self._started_at = self._seen
        elif self._seen - self._started_at >= self.num_steps:
            self.stop()
        self._seen += 1

    def stop(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            print(f"Profiler trace written to {self.logdir}")
        self._done = True
