"""Loading progress reporting.

Counterpart of the reference's progress.rs (SURVEY.md §2.6 layer-loading
progress bars): a dependency-free stderr bar used by the checkpoint
loaders. Multi-host runs report only on rank 0 (the analog of the
reference's cross-process RemoteProgressReporter — under SPMD every host
loads identical shards, so one bar suffices).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional


class ProgressBar:
    """`with ProgressBar(total, "loading layers") as p: p.step()` — renders
    at most ~30 Hz; silent when stderr is not a TTY or VLLM_RS_TPU_QUIET
    is set, so logs and CI stay clean."""

    def __init__(self, total: int, label: str = "", width: int = 32):
        self.total = max(total, 1)
        self.label = label
        self.width = width
        self.n = 0
        self.t0 = time.time()
        self._last = 0.0
        rank = int(os.environ.get("JAX_PROCESS_INDEX", "0") or 0)
        self.enabled = (
            sys.stderr.isatty()
            and not os.environ.get("VLLM_RS_TPU_QUIET")
            and rank == 0
        )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def step(self, n: int = 1, note: Optional[str] = None) -> None:
        self.n += n
        now = time.time()
        if not self.enabled or (now - self._last < 0.033 and self.n < self.total):
            return
        self._last = now
        frac = min(self.n / self.total, 1.0)
        filled = int(frac * self.width)
        bar = "█" * filled + "░" * (self.width - filled)
        dt = now - self.t0
        eta = dt / frac - dt if frac > 0 else 0.0
        msg = f"\r{self.label} [{bar}] {self.n}/{self.total} ({dt:.0f}s"
        msg += f", eta {eta:.0f}s)" if frac < 1.0 else ")"
        if note:
            msg += f" {note}"
        sys.stderr.write(msg + "\x1b[K")
        sys.stderr.flush()

    def close(self) -> None:
        if self.enabled:
            sys.stderr.write("\n")
            sys.stderr.flush()
