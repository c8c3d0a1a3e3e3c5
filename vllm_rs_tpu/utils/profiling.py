"""xprof/jax-profiler capture hooks.

The tracing half of the reference's observability story redone for TPU:
instead of nvtx ranges, a step-bounded `jax.profiler` trace capture that
tensorboard/xprof can open. Driven either by the server endpoints
(POST /v1/profile/start|stop) or by CLI flags (--profile-dir
--profile-steps), which capture the first N engine steps after startup.
"""

from __future__ import annotations

import logging
import threading

logger = logging.getLogger(__name__)


class StepProfiler:
    """Captures a jax.profiler trace spanning a bounded number of engine
    steps. Thread-safe; attach as `engine.profiler`."""

    def __init__(self, trace_dir: str, max_steps: int = 64):
        self.trace_dir = trace_dir
        self.max_steps = max_steps
        self._lock = threading.Lock()
        self._active = False
        self._steps = 0

    # -- external control (server endpoints) --------------------------------

    def start(self) -> bool:
        import jax

        with self._lock:
            if self._active:
                return False
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            self._steps = 0
            logger.info("xprof trace started → %s", self.trace_dir)
            return True

    def stop(self) -> bool:
        import jax

        with self._lock:
            if not self._active:
                return False
            jax.profiler.stop_trace()
            self._active = False
            logger.info(
                "xprof trace stopped after %d steps → %s",
                self._steps, self.trace_dir,
            )
            return True

    @property
    def active(self) -> bool:
        return self._active

    # -- engine hooks --------------------------------------------------------

    def on_step_start(self) -> None:
        pass  # the whole step loop is inside the trace while active

    def on_step_end(self) -> None:
        stop = False
        with self._lock:
            if not self._active:
                return
            self._steps += 1
            stop = self.max_steps > 0 and self._steps >= self.max_steps
        if stop:
            self.stop()
