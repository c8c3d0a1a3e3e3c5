"""Stream pacing: smooth ITL delivery for multi-step decode bursts.

On-device multi-step decode computes k tokens per engine step and the
engine delivers the whole burst at once — throughput and TTFT love it, but
a streaming client sees k tokens back-to-back followed by a full-step
stall (p50 ITL ~0 ms, p99 ~step time). The reference's per-token stepping
never has this problem because every token costs one step
(/root/reference/src/core/engine.rs:1693-1759 delivers one StreamItem per
loop iteration).

The pacer restores smooth inter-token latency WITHOUT giving up the
multi-step throughput: burst n's tokens are re-delivered spread across the
duration of step n+1 (which is computing burst n+1 concurrently), so the
client-visible token rate equals the true generation rate with ~step/k
inter-token gaps instead of one step-sized gap per burst.

Invariants:
- per-stream delivery order is exactly the generation order (per-sid FIFO
  deques gated on the head's deadline — a later item never overtakes);
- a burst containing the finish item is flushed immediately (the request
  is done; there is no next step to overlap, holding tokens back would be
  pure added latency);
- scheduling a new burst for a stream flushes that stream's leftovers
  first (the new burst's existence proves the step the leftovers were
  paced against has completed — this self-corrects any span overestimate
  so backlog can never build up);
- flush(sid) delivers everything pending for the stream now (abort /
  error / drain paths call it before putting their own terminal item).

All engine-side token work (guidance commit, detokenization, stop-string
scan, scheduler finishes) still runs on the engine thread at the step
boundary; only the final queue.put is deferred, so the determinism
contract (same request stream → same schedule → same tokens) is untouched.
"""

from __future__ import annotations

import os
import threading
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Tuple

# never pace a single gap longer than this (the ITL SLO this feature
# exists to meet); a span estimate degenerate enough to exceed it per
# token just delivers faster than planned
MAX_INTERVAL_S = 0.2
# fraction of the estimated next-step duration to spread a burst across.
# 1.0 = exact-rate delivery. A margin > 1 absorbs step-time overruns (an
# exact-rate pacer goes dry when step n+1 runs long, and every stream
# records the overrun as one gap), at the cost of a leftover clump after
# fast steps. The round-4 ITL tail that motivated a margin turned out to
# be KV-pool preemption, not pacing (PERF_NOTES r4 #5): once the pool was
# sized, margins 1.0 and 1.5 measured inside noise of each other, so the
# default stays at exact-rate 1.0. Override: VLLM_RS_TPU_PACE_MARGIN.
SPAN_FRACTION = float(os.environ.get("VLLM_RS_TPU_PACE_MARGIN", "1.0"))


class StreamPacer:
    """Deadline-paced re-delivery of StreamItems into per-request queues."""

    def __init__(self):
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        # sid → FIFO of (deadline, queue, item); only the head's deadline
        # gates delivery, so per-sid order is structural
        self._pending: Dict[int, Deque[Tuple[float, object, object]]] = {}
        # sid → (last burst arrival, EMA of inter-burst interval): the
        # engine's span estimate assumes the next step is the same-kind
        # decode step, but under prefill/decode interleave (staggered
        # arrivals) the true burst cadence is 2-3 steps — pacing to the
        # observed cadence (bounded) spreads tokens across the real gap
        # instead of clumping in its first third
        self._cadence: Dict[int, Tuple[float, float]] = {}
        self._stopped = False
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="stream-pacer"
        )
        self._thread.start()

    # -- producer side (engine thread) ---------------------------------

    def schedule(self, sid: int, q, items: List[object], span_s: float) -> None:
        """Queue one burst for a stream, paced across span_s seconds.

        items must be in generation order. A burst whose last item is a
        finish is delivered immediately (flush-on-finish)."""
        if not items:
            return
        now = time.monotonic()
        finished = bool(getattr(items[-1], "finished", False))
        n = len(items)
        # blend the engine's span estimate with the observed per-stream
        # burst cadence (EMA), bounded at 3x the estimate so a one-off
        # stall cannot stretch pacing indefinitely; leftovers flush on the
        # next burst either way, so overestimates self-correct
        prev = self._cadence.get(sid)
        if prev is not None and not finished:
            gap = now - prev[0]
            ema = 0.5 * prev[1] + 0.5 * gap if prev[1] > 0 else gap
            self._cadence[sid] = (now, ema)
            if span_s > 0.0:
                span_s = max(span_s, min(ema, 3.0 * span_s))
        elif finished:
            self._cadence.pop(sid, None)
        else:
            self._cadence[sid] = (now, 0.0)
        if finished or span_s <= 0.0 or n == 1:
            interval = 0.0
        else:
            interval = min(SPAN_FRACTION * span_s / n, MAX_INTERVAL_S)
        with self._cond:
            dq = self._pending.get(sid)
            leftovers: List[Tuple[object, object]] = []
            if dq:
                # the previous burst's step has completed (this burst is
                # its output) — its stragglers are overdue by definition
                leftovers = [(entry[1], entry[2]) for entry in dq]
                dq.clear()
            if interval == 0.0:
                for qq, it in leftovers:
                    it.ts = now
                    qq.put(it)
                for it in items:
                    it.ts = now
                    q.put(it)
                self._pending.pop(sid, None)
                return
            for qq, it in leftovers:
                it.ts = now
                qq.put(it)
            if dq is None:
                dq = deque()
                self._pending[sid] = dq
            for i, it in enumerate(items):
                dq.append((now + i * interval, q, it))
            self._cond.notify()

    def flush(self, sid: Optional[int] = None) -> None:
        """Deliver everything pending now (for one stream, or all)."""
        with self._cond:
            sids = [sid] if sid is not None else list(self._pending)
            for s in sids:
                dq = self._pending.pop(s, None)
                if dq:
                    now = time.monotonic()
                    for _, q, it in dq:
                        it.ts = now
                        q.put(it)
            if sid is None:
                self._cadence.clear()
            else:
                # abort/error paths end a stream without a finished burst;
                # drop its cadence state so sids don't accumulate
                self._cadence.pop(sid, None)

    def stop(self) -> None:
        self.flush()
        with self._cond:
            self._stopped = True
            self._cond.notify()
        self._thread.join(timeout=5)

    # -- pacer thread ---------------------------------------------------

    def _run(self) -> None:
        with self._cond:
            while not self._stopped:
                now = time.monotonic()
                next_deadline: Optional[float] = None
                for sid in list(self._pending):
                    dq = self._pending[sid]
                    while dq and dq[0][0] <= now:
                        _, q, it = dq.popleft()
                        it.ts = now
                        q.put(it)
                    if dq:
                        d = dq[0][0]
                        if next_deadline is None or d < next_deadline:
                            next_deadline = d
                    else:
                        del self._pending[sid]
                if next_deadline is None:
                    self._cond.wait(timeout=1.0)
                else:
                    self._cond.wait(timeout=max(next_deadline - now, 0.0005))
