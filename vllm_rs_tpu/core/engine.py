"""LLM engine: request admission, step loop, streaming delivery.

Counterpart of the reference's LLMEngine (src/core/engine.rs): add_request
tokenizes + clamps max_tokens + admits into the scheduler (engine.rs:505-685),
the step loop alternates schedule → run → postprocess (engine.rs:1683-1759),
and per-request streaming goes through queues (the reference's tokio mpsc
StreamItem channels, engine.rs:63-70).

jax's async dispatch gives the reference's "server stays responsive during
forward" property without the engine-lock dance: the host thread returns to
scheduling while the device is still executing.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

from vllm_rs_tpu.config import EngineConfig, SamplingParams
from vllm_rs_tpu.core.block_manager import BlockManager
from vllm_rs_tpu.core.runner import ModelRunner
from vllm_rs_tpu.core.scheduler import Scheduler
from vllm_rs_tpu.core.sequence import FinishReason, Sequence, SequenceStatus
from vllm_rs_tpu.utils.detok import IncrementalDetokenizer

logger = logging.getLogger(__name__)


class EngineDrainingError(RuntimeError):
    """Raised by add_request during graceful shutdown (server drain) —
    handlers map it to HTTP 503."""


@dataclass
class StreamItem:
    """One streaming event (reference StreamItem, engine.rs:63-70)."""

    seq_id: int
    token_id: Optional[int] = None
    text: str = ""
    finished: bool = False
    finish_reason: Optional[str] = None
    # time.monotonic() at queue.put — when the token crossed the engine
    # boundary (what a socket write would see). ITL measured at the
    # consumer thread conflates this with host thread-scheduling noise
    # (64 consumer threads on a 1-core dev host starve for ~800 ms at
    # p99); bench_serving reports both. 0.0 on paths that don't stamp.
    ts: float = 0.0


@dataclass
class RequestOutput:
    seq_id: int
    prompt_token_ids: List[int] = field(default_factory=list)
    output_token_ids: List[int] = field(default_factory=list)
    text: str = ""
    finish_reason: Optional[str] = None
    # timing (reference GenerationOutput, core/mod.rs:13-44)
    ttft_s: Optional[float] = None
    latency_s: Optional[float] = None
    cached_tokens: int = 0


class _RequestState:
    def __init__(self, seq: Sequence, detok: Optional[IncrementalDetokenizer]):
        self.seq = seq
        self.detok = detok
        self.text = ""
        # prompt-replay tokens (reference engine.rs:731-791): the prompt's
        # trailing generation-prompt suffix (e.g. "<think>\n") prepended to
        # the first emitted delta so the client's assistant message — and
        # therefore the next turn's template re-render — matches the served
        # prompt+output token-for-token, keeping prefix-cache hits alive
        self.replay_ids: Optional[List[int]] = None
        self.stream: "queue.Queue[StreamItem]" = queue.Queue()
        # offline batch (engine.generate): nobody consumes the stream, so
        # _deliver can skip the per-token StreamItem/queue work — ~30 µs
        # of host glue per token that matters on single-core hosts
        self.stream_disabled = False
        self.stop_strings = tuple(seq.sampling_params.stop or ())
        # stop-string scan resumes here each token; advanced so that only a
        # max_stop_len-1 tail is ever re-scanned (the reference checks a
        # bounded tail; a full .find over accumulated text is quadratic)
        self.stop_scan_from = 0
        self.max_stop_len = max((len(s) for s in self.stop_strings), default=0)
        # multi-host leader: set when a stop string matched and the finish
        # is queued for the next step boundary (suppresses further deltas)
        self.mh_suppressed = False


class LLMEngine:
    def __init__(
        self,
        econfig: EngineConfig,
        runner: ModelRunner,
        tokenizer=None,
    ):
        self.econfig = econfig
        self.runner = runner
        self.tokenizer = tokenizer
        self.block_manager = BlockManager(
            econfig.cache.num_blocks,
            econfig.cache.block_size,
            prefix_cache_enabled=econfig.scheduler.prefix_cache_enabled,
        )
        # hybrid GDN models: recurrent-state slot allocator (reference
        # MambaCache slots) + mamba prefix snapshots so cached prefixes
        # carry their recurrent state (core/hybrid_state.py; reference
        # block_manager.rs:444-550) + no CPU swap (recurrent state is
        # slot-resident, not block-resident)
        self.is_hybrid = any(
            t == "linear" for t in getattr(runner.model, "layer_types", ())
        )
        self._mamba_pool = None
        if self.is_hybrid:
            self._mamba_free = list(range(econfig.cache.mamba_slots - 1, -1, -1))
            if econfig.cache.mamba_snapshot_slots > 0:
                from vllm_rs_tpu.core.hybrid_state import MambaSnapshotPool

                self._mamba_pool = MambaSnapshotPool(
                    runner,
                    self.block_manager,
                    econfig.cache.mamba_snapshot_slots,
                    econfig.cache.mamba_snapshot_interval_blocks,
                )
                self.block_manager.hybrid_trim = self._mamba_pool.trim_hook
                self.block_manager.prefix_cache.on_evict = (
                    self._mamba_pool.on_evict_hash
                )
            else:
                self.block_manager.prefix_cache.enabled = False
                # still reset stale slot state on (re)allocation — a
                # preempted-then-recomputed sequence reuses its slot
                self.block_manager.hybrid_trim = (
                    lambda seq, hashes: self._reset_seq_slot(seq)
                )
        # CPU KV swap enabled via cache.num_swap_blocks (reference
        # block_manager.rs:876-1001 swap pool)
        swap_backend = (
            runner
            if econfig.cache.num_swap_blocks > 0 and not self.is_hybrid
            else None
        )
        self.scheduler = Scheduler(
            econfig.scheduler, self.block_manager, swap_backend=swap_backend,
            swap_pool_blocks=econfig.cache.num_swap_blocks,
        )
        self.scheduler.set_eos_token_ids(econfig.model.eos_token_ids)
        self.requests: Dict[int, _RequestState] = {}
        self._lock = threading.Lock()
        self._loop_thread: Optional[threading.Thread] = None
        self._running = False
        # usage counters (reference get_usage_stats, engine.rs:1480-1518)
        self.total_prompt_tokens = 0
        self.total_output_tokens = 0
        self.total_cached_tokens = 0
        # periodic throughput reporting (engine.rs:1172-1215, every 5 s)
        self._tp_last_time = time.time()
        self._tp_last_tokens = 0
        # per-step timing ring (tracing/profiling surface; reference logs
        # per-iteration timings in its runner loop): (kind, rows, tokens, s)
        from collections import deque as _deque

        self.step_timings = _deque(maxlen=512)
        # optional xprof trace capture (utils/profiling.py)
        self.profiler = None
        # ---- multi-host lockstep state (parallel/multihost.py) ----
        # role None = single host; "leader" defers every scheduler-visible
        # mutation (admission/abort/stop-finish) to its next step boundary
        # and publishes it in a step marker; "follower" applies marker k
        # before scheduling step k. step_index counts drained steps.
        self.mh_role: Optional[str] = None
        self.mh_feed = None  # StepFeed (leader)
        self.mh_follower = None  # StepFollower
        # set to the failure reason when a multi-host peer is lost /
        # desynced; every in-flight request is cancelled and the loop stops
        # (reference heartbeat abort semantics, utils/heartbeat.rs:43-66)
        self.mh_failed: Optional[str] = None
        self.step_index = 0
        self._mh_pending_admissions: list = []
        self._mh_pending_finishes: list = []  # (seq_id, reason_str)
        self._mh_pending_aborts: list = []
        # optional schedule trace for lockstep tests: list of
        # (step_index, kind, seq_ids, chunk_sizes, n_steps)
        self.schedule_trace: Optional[list] = None
        # graceful drain (server SIGTERM): refuse admissions, finish
        # in-flight work, then the server stops the loop
        self.draining = False
        # stream pacing (scheduler.stream_pacing): multi-step bursts are
        # re-delivered spread across the next step's duration (core/pacer.py)
        self._pacer = None

    def _get_pacer(self):
        if self._pacer is None:
            from vllm_rs_tpu.core.pacer import StreamPacer

            self._pacer = StreamPacer()
        return self._pacer

    def _pacing_active(self) -> bool:
        return (
            self.econfig.scheduler.stream_pacing and self.mh_role != "follower"
        )

    def _pacer_flush(self, sid: Optional[int] = None) -> None:
        """Deliver any paced items now — called before every out-of-band
        terminal StreamItem (abort/error/finish) so it can't overtake
        in-flight paced tokens."""
        if self._pacer is not None:
            self._pacer.flush(sid)

    def begin_drain(self) -> None:
        self.draining = True

    # ------------------------------------------------------------------
    # multi-host lockstep (reference: runner lockstep loop,
    # src/runner/runner.rs:249-434 + block-manager broadcast mirror)
    # ------------------------------------------------------------------

    def enable_multihost_leader(self, feed) -> None:
        self.mh_role = "leader"
        self.mh_feed = feed

    def enable_multihost_follower(self, follower) -> None:
        self.mh_role = "follower"
        self.mh_follower = follower

    def _mh_apply(self, admissions, finishes, aborts) -> None:
        """Apply one step marker's control events — runs under self._lock
        at the step boundary, identically on every host."""
        from vllm_rs_tpu.config import SamplingParams

        for a in admissions:
            if isinstance(a, dict):  # follower: reconstruct the sequence
                sp = SamplingParams.from_dict(a["sampling"])
                seq = Sequence(a["token_ids"], sp, seq_id=a["seq_id"])
                if sp.constraint is not None or sp.reasoning_effort:
                    seq.guidance = self._make_guidance(sp)
                self.requests[seq.seq_id] = _RequestState(seq, None)
                self.total_prompt_tokens += seq.prompt_len
            else:  # leader: already constructed + registered
                seq = a
            if self.is_hybrid:
                # slot allocation at the boundary keeps the free-list pop
                # order identical across hosts
                if not self._mamba_free:
                    raise RuntimeError("no free mamba slots (raise cache.mamba_slots)")
                seq.mamba_slot = self._mamba_free.pop()
                self.runner.reset_mamba_slot(seq.mamba_slot)
            self.scheduler.add(seq)
        for sid, reason in finishes:
            st = self.requests.get(sid)
            if st is None or st.seq.is_finished:
                continue
            self.scheduler.finish_seq(st.seq, FinishReason(reason))
            self._free_mamba(st.seq)
            if self.mh_role == "leader":
                self._pacer_flush(sid)
                st.stream.put(
                    StreamItem(seq_id=sid, finished=True, finish_reason=reason)
                )
        for sid in aborts:
            seq = self.scheduler.abort(sid)
            if seq is not None:
                self._free_mamba(seq)
            st = self.requests.get(sid)
            if st is not None and self.mh_role == "leader":
                self._pacer_flush(sid)
                st.stream.put(
                    StreamItem(seq_id=sid, finished=True, finish_reason="abort")
                )

    def _mh_take_pending(self):
        adm = self._mh_pending_admissions
        fins = self._mh_pending_finishes
        abr = self._mh_pending_aborts
        self._mh_pending_admissions = []
        self._mh_pending_finishes = []
        self._mh_pending_aborts = []
        wire = [
            {
                "seq_id": s.seq_id,
                "token_ids": s.all_token_ids()[: s.prompt_len],
                "sampling": s.sampling_params.to_dict(),
            }
            for s in adm
        ]
        return adm, wire, fins, abr

    def _mh_follower_drain(self) -> bool:
        """Block for this step's marker (poll briefly when idle). Returns
        False when idle with no marker pending. Raises PeerLostError /
        StepDesyncError (handled in step()) when the leader is gone or the
        control streams diverged."""
        with self._lock:
            has_work = self.scheduler.has_work()
        marker = self.mh_follower.next_marker(
            self.step_index, timeout=None if has_work else 0.05
        )
        if marker is None:
            return False
        with self._lock:
            self._mh_apply(
                marker["admissions"], marker["finishes"], marker["aborts"]
            )
        return True

    def _mh_fail(self, reason: str) -> None:
        """A multi-host peer died or desynced: cancel every in-flight
        request, stop the loop, and record the reason (mh_failed) so the
        serving process can exit non-zero. Surviving without the peer is
        not an option — the next pjit collective would hang forever.
        Reference: engine-loop error cancel-all + heartbeat abort
        (engine.rs:1707-1745, heartbeat.rs:43-66)."""
        logger.error("multi-host failure: %s — cancelling all requests", reason)
        self.mh_failed = reason
        self._running = False
        with self._lock:
            # per-sid pacer flush INSIDE the lock, right before each
            # terminal put: _mh_fail can run on a feed/reader thread while
            # the engine thread is inside _deliver — a global flush before
            # the lock would let a burst scheduled after it deliver tokens
            # AFTER the terminal item (round-4 advisor finding)
            for st in self.requests.values():
                if not st.seq.is_finished:
                    seq = self.scheduler.abort(st.seq.seq_id)
                    if seq is not None:
                        self._free_mamba(seq)
                    self._pacer_flush(st.seq.seq_id)
                    st.stream.put(
                        StreamItem(
                            seq_id=st.seq.seq_id,
                            finished=True,
                            finish_reason="error",
                        )
                    )
        if self.mh_feed is not None:
            self.mh_feed.close()
        if self.mh_follower is not None:
            self.mh_follower.close()

    def _trace(self, batch) -> None:
        if self.schedule_trace is not None:
            self.schedule_trace.append(
                (
                    self.step_index,
                    batch.kind,
                    tuple(s.seq_id for s in batch.seqs),
                    tuple(batch.chunk_sizes),
                    batch.n_steps,
                )
            )

    # ------------------------------------------------------------------
    # admission (reference add_request, engine.rs:687-810)
    # ------------------------------------------------------------------

    def set_prompt_replay_candidates(self, candidates) -> None:
        """Install generation-prompt replay suffixes (token id lists).
        The server computes these from the chat template at startup
        (reference build_prompt_replay_candidates, engine.rs:731-777);
        longest-first so the most specific suffix wins."""
        self._replay_candidates = sorted(
            {tuple(c) for c in candidates if c}, key=len, reverse=True
        )

    def _match_replay_candidate(self, token_ids) -> Optional[List[int]]:
        for cand in getattr(self, "_replay_candidates", ()):
            if len(token_ids) >= len(cand) and tuple(token_ids[-len(cand):]) == cand:
                return list(cand)
        return None

    def add_request(
        self,
        prompt: Union[str, List[int]],
        sampling_params: Optional[SamplingParams] = None,
        images: Optional[list] = None,
    ) -> int:
        if self.draining:
            raise EngineDrainingError(
                "engine is draining (shutdown in progress); not accepting requests"
            )
        sp = sampling_params or SamplingParams()
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "text prompt needs a tokenizer"
            token_ids = self.tokenizer.encode(prompt)
            if hasattr(token_ids, "ids"):  # raw `tokenizers` object
                token_ids = token_ids.ids
        else:
            token_ids = list(prompt)
        if not token_ids:
            raise ValueError("empty prompt")
        max_len = self.econfig.scheduler.max_model_len
        if len(token_ids) >= max_len:
            raise ValueError(f"prompt ({len(token_ids)} tokens) >= max_model_len {max_len}")
        # clamp max_tokens to the KV budget (engine.rs:505-685)
        sp.max_tokens = max(1, min(sp.max_tokens, max_len - len(token_ids)))
        # PD offload: long prompts prefill on the remote server
        # (scheduler.rs:52-54 thresholds live in PdClient.should_offload)
        pd = getattr(self, "pd_client", None)
        if (
            pd is not None
            and pd.should_offload(token_ids)
            and not images
            and sp.constraint is None
            and not sp.reasoning_effort
        ):
            return pd.prefill_remote(list(token_ids), sp)
        image_seed = None
        if images:
            if self.mh_role is not None:
                raise ValueError(
                    "multimodal requests are not yet supported in multi-host "
                    "mode (image embeddings are host-computed)"
                )
            image_seed = images[0].seed
        seq = Sequence(token_ids, sp, image_seed=image_seed)
        if images:
            self._attach_images(seq, images, token_ids)
        if sp.constraint is not None or sp.reasoning_effort:
            seq.guidance = self._make_guidance(sp)
        if self.is_hybrid and self.mh_role is None:
            with self._lock:
                if not self._mamba_free:
                    raise RuntimeError("no free mamba slots (raise cache.mamba_slots)")
                seq.mamba_slot = self._mamba_free.pop()
            self.runner.reset_mamba_slot(seq.mamba_slot)
        detok = (
            IncrementalDetokenizer(self.tokenizer) if self.tokenizer is not None else None
        )
        with self._lock:
            st = _RequestState(seq, detok)
            st.replay_ids = self._match_replay_candidate(token_ids)
            self.requests[seq.seq_id] = st
            if self.mh_role == "leader":
                # admission is deferred to the next step boundary where it
                # is broadcast + applied (multi-host determinism contract)
                self._mh_pending_admissions.append(seq)
            else:
                self.scheduler.add(seq)
            self.total_prompt_tokens += len(token_ids)
        return seq.seq_id

    def _attach_images(self, seq, images, token_ids) -> None:
        """Encode images through the vision tower and bind their embeddings
        to the prompt's image-placeholder positions (engine admission path,
        reference build_messages_and_images → ImageData)."""
        model = self.runner.model
        assert hasattr(model, "encode_image"), "model has no vision tower"
        img_tok = model.image_token_id
        positions = [i for i, t in enumerate(token_ids) if t == img_tok]
        expected = sum(img.num_tokens for img in images)
        if len(positions) != expected:
            raise ValueError(
                f"prompt has {len(positions)} image tokens, images need {expected}"
            )
        import numpy as np  # noqa: F811

        outs = [self.runner.model.encode_image(self.runner.params, im) for im in images]
        if outs and isinstance(outs[0], tuple):  # deepstack levels present
            seq.mm_embeds = np.concatenate([o[0] for o in outs], axis=0)
            seq.mm_deepstack = np.concatenate([o[1] for o in outs], axis=1)
        else:
            seq.mm_embeds = np.concatenate(outs, axis=0)
        seq.mm_positions = positions
        if model.config.extra_get("mrope_section"):
            seq.mrope_table, seq.mrope_delta = model.build_mrope_table(
                token_ids, images
            )

    def _make_guidance(self, sp):
        """Build a GuidanceState from the request's constraint and/or
        reasoning-effort controls (reference build_llg_factory + per-seq
        GuidanceState, engine.rs + core/runner.rs:188-330; reasoning block
        composition per utils/reasoning.rs)."""
        from vllm_rs_tpu.utils.guidance import (
            GuidanceState,
            TokenTrie,
            build_constraint,
            wrap_with_reasoning,
        )

        assert self.tokenizer is not None, "guided decoding needs a tokenizer"
        if getattr(self, "_token_trie", None) is None:
            self._token_trie = TokenTrie.from_tokenizer(
                self.tokenizer, self.econfig.model.vocab_size
            )

        def token_decoder(tid: int) -> str:
            return self.tokenizer.decode([tid])

        automaton = None
        if sp.constraint is not None:
            kind, arg = sp.constraint
            automaton = build_constraint(kind, arg, token_decoder)
        if sp.reasoning_effort or sp.reasoning_budget:
            start, end = sp.think_markers or ("<think>", "</think>")
            automaton = wrap_with_reasoning(
                automaton, sp.reasoning_effort, start, end, sp.reasoning_budget
            )
        if automaton is None:
            return None
        g = GuidanceState(
            automaton, self._token_trie, self.econfig.model.eos_token_ids
        )
        # admission pre-warm: the initial state's vocab-trie walk runs on
        # the prefetch pool NOW, overlapping the prefill — instead of
        # stalling the first decode step's prepare_sampling (VERDICT r2
        # item 8; SURVEY hard-part #5)
        g.prefetch()
        return g

    def _reset_seq_slot(self, seq) -> int:
        slot = getattr(seq, "mamba_slot", None)
        if slot is not None:
            self.runner.reset_mamba_slot(slot)
        return 0

    def _free_mamba(self, seq) -> None:
        slot = getattr(seq, "mamba_slot", None)
        if self.is_hybrid and slot is not None:
            self._mamba_free.append(slot)
            seq.mamba_slot = None

    def abort_request(self, seq_id: int) -> None:
        if self.mh_role == "leader":
            # deferred + broadcast at the next step boundary
            with self._lock:
                st = self.requests.get(seq_id)
                if st is not None and not st.seq.is_finished:
                    self._mh_pending_aborts.append(seq_id)
            return
        with self._lock:
            seq = self.scheduler.abort(seq_id)
            st = self.requests.get(seq_id)
        if seq is not None:
            self._free_mamba(seq)
        if seq is not None and st is not None:
            self._pacer_flush(seq_id)
            st.stream.put(
                StreamItem(seq_id=seq_id, finished=True, finish_reason="abort")
            )

    def get_stream(self, seq_id: int) -> "queue.Queue[StreamItem]":
        return self.requests[seq_id].stream

    # ------------------------------------------------------------------
    # step loop (reference 3-phase loop, engine.rs:1693-1757)
    # ------------------------------------------------------------------

    def step(self) -> int:
        """One engine iteration. Returns number of sequences stepped."""
        if self.mh_role == "follower":
            from vllm_rs_tpu.parallel.multihost import PeerLostError, StepDesyncError

            try:
                if not self._mh_follower_drain():
                    return 0
            except (PeerLostError, StepDesyncError) as e:
                self._mh_fail(str(e))
                raise
            with self._lock:
                batch = self.scheduler.schedule()
                self._trace(batch)
                self.step_index += 1
        elif self.mh_role == "leader":
            from vllm_rs_tpu.parallel.multihost import PeerLostError, StepDesyncError

            try:
                with self._lock:
                    # liveness check runs every loop iteration, idle ones
                    # included — a follower death must surface even when no
                    # requests are flowing
                    self.mh_feed.check_liveness()
                    if (
                        not self._mh_pending_admissions
                        and not self._mh_pending_finishes
                        and not self._mh_pending_aborts
                        and not self.scheduler.has_work()
                    ):
                        return 0
                    adm, wire, fins, abr = self._mh_take_pending()
                    # publish BEFORE applying: followers must never observe a
                    # schedule the leader ran with events they don't have
                    self.mh_feed.publish(self.step_index, wire, fins, abr)
                    self._mh_apply(adm, fins, abr)
                    batch = self.scheduler.schedule()
                    self._trace(batch)
                    self.step_index += 1
            except (PeerLostError, StepDesyncError) as e:
                self._mh_fail(str(e))
                raise
        else:
            with self._lock:
                batch = self.scheduler.schedule()
                self._trace(batch)
                self.step_index += 1
        if batch.is_empty:
            return 0
        if self.profiler is not None:
            self.profiler.on_step_start()
        t_fwd = time.time()
        if batch.kind == "decode" and batch.spec_k > 0 and not self._spec_allow():
            # adaptive spec gate: measured acceptance is below break-even
            # (~1.5 — a verify iteration pays a (k+1)-query attention pass
            # per emitted group), so this burst decodes plain; every 8th
            # burst re-probes. Bit-identical outputs either way.
            tokens = self.runner.run_multi(batch, batch.n_steps)
        elif batch.kind == "decode" and batch.spec_k > 0:
            # on-device speculative loop: propose+verify in one program
            # (n_steps is the per-seq emission budget)
            st0 = dict(getattr(self.runner, "spec_stats", None) or {})
            tokens = self.runner.run_spec_multi(batch, batch.n_steps, batch.spec_k)
            self._spec_observe(st0)
        elif batch.kind == "decode" and batch.drafts is not None:
            tokens = self.runner.run_verify(batch, batch.drafts)
        elif batch.kind == "decode" and batch.n_steps > 1:
            tokens = self.runner.run_multi(batch, batch.n_steps)
        else:
            tokens = self.runner.run(batch)
        step_s = time.time() - t_fwd
        self.step_timings.append(
            (batch.kind, len(batch.seqs), batch.num_tokens * batch.n_steps, step_s)
        )
        if self.profiler is not None:
            self.profiler.on_step_end()
        with self._lock:
            emitted = self.scheduler.postprocess(batch, tokens)
            if self._mamba_pool is not None:
                self._mamba_pool.after_step(batch)
            # pacing span: a decode burst is re-delivered across the NEXT
            # step's duration. The just-measured step estimates it, scaled
            # by the next step's k (the stream-pacing ramp doubles k early
            # on — pacing a k-burst over a k-step span while the next step
            # takes 2k would run the pacer dry half-way every transition)
            pace_span = 0.0
            if (
                batch.kind == "decode"
                and (batch.n_steps > 1 or batch.spec_k > 0 or batch.drafts is not None)
                and self._pacing_active()
            ):
                nxt = (
                    self.scheduler._decode_steps(self.scheduler.running)
                    if self.scheduler.running
                    else batch.n_steps
                )
                pace_span = step_s * nxt / max(batch.n_steps, 1)
            self._deliver(emitted, pace_span)
            self._maybe_log_throughput()
        return len(batch.seqs)

    # -- adaptive speculative decode gate (config.spec_adaptive) --------
    # integer state evolved from device-computed integer counters only:
    # multi-host replicas run the same bursts and flip the gate at the
    # same step boundaries (determinism contract)

    _spec_plain_countdown = 0

    def _spec_allow(self) -> bool:
        if not self.econfig.scheduler.spec_adaptive:
            return True
        if self._spec_plain_countdown > 0:
            self._spec_plain_countdown -= 1
            return False
        return True  # optimistic start + periodic re-probe

    def _spec_observe(self, st0: dict) -> None:
        if not self.econfig.scheduler.spec_adaptive:
            return
        st1 = getattr(self.runner, "spec_stats", None) or {}
        d_emit = st1.get("emitted", 0) - st0.get("emitted", 0)
        d_vsteps = st1.get("vsteps", 0) - st0.get("vsteps", 0)
        # acceptance < 1.5 (integer compare) → plain for the next 7
        # spec-eligible bursts, then re-probe
        if d_vsteps > 0 and 2 * d_emit < 3 * d_vsteps:
            self._spec_plain_countdown = 7

    def _maybe_log_throughput(self) -> None:
        now = time.time()
        dt = now - self._tp_last_time
        if dt < 5.0:
            return
        d_tokens = self.total_output_tokens - self._tp_last_tokens
        if d_tokens:
            logger.info(
                "decode throughput: %.1f tok/s (%d seqs running, %d waiting, "
                "KV %.0f%% used)",
                d_tokens / dt,
                len(self.scheduler.running),
                len(self.scheduler.waiting),
                100 * self.block_manager.used_ratio,
            )
        self._tp_last_time = now
        self._tp_last_tokens = self.total_output_tokens

    def _deliver(self, emitted, pace_span: float = 0.0) -> None:
        pacing = self._pacing_active()
        # sid → (queue, [StreamItem]) bursts, handed to the pacer after the
        # loop; everything else (guidance commit, detok, stop strings,
        # scheduler finishes) still runs here, on the engine thread
        bursts: Dict[int, tuple] = {}

        def put(st, item):
            if pacing:
                bursts.setdefault(item.seq_id, (st.stream, []))[1].append(item)
            else:
                item.ts = time.monotonic()
                st.stream.put(item)

        # a multi-step burst's sequence is already state-finished when
        # _deliver runs (postprocess finished it), so naively checking
        # seq.is_finished would stamp finished=True on EVERY token of the
        # final burst — a streaming client stops at the first one and loses
        # up to k-1 tail tokens. Only the LAST emitted token of a finished
        # sequence is the terminal item.
        last_idx: Dict[int, int] = {}
        for i, (seq, _t) in enumerate(emitted):
            last_idx[seq.seq_id] = i
        # sids finished by a stop-string match mid-burst: their remaining
        # burst tokens are overshoot (multi-step ran k tokens ahead; the
        # reference's per-token loop never generates them) and are dropped
        stopped: set = set()
        for i, (seq, tok) in enumerate(emitted):
            st = self.requests.get(seq.seq_id)
            if st is None or seq.seq_id in stopped:
                continue
            finishing = seq.is_finished and i == last_idx[seq.seq_id]
            stop_hit = False
            self.total_output_tokens += 1
            g = getattr(seq, "guidance", None)
            if g is not None:  # commit into the grammar (runner.rs:336-372)
                g.advance(tok, self.tokenizer.decode([tok]))
                # warm the NEW state's mask off-thread: the walk overlaps
                # the next device step instead of running inside its
                # prepare_sampling (first-visit states walk the full
                # vocab trie — tests/test_guidance_latency.py)
                g.prefetch()
            if st.mh_suppressed:
                # leader already hit this seq's stop string; the finish is
                # queued for the next step boundary — drop extra deltas
                continue
            if st.stream_disabled and st.detok is None and not st.stop_strings:
                # offline-batch fast path: counters/guidance above already
                # ran; outputs are read from seq state by generate()
                if finishing:
                    self._free_mamba(seq)
                continue
            text = ""
            if st.detok is not None:
                if st.replay_ids:
                    # replay the prompt's generation-suffix tokens ahead of
                    # the first output delta (engine.rs:1034-1037); they are
                    # prompt tokens, so they don't count toward output usage
                    text = "".join(st.detok.push(t) for t in st.replay_ids)
                    st.replay_ids = None
                text += st.detok.push(tok)
                st.text += text
                if not seq.is_finished and st.stop_strings:
                    hit = self._find_stop_string(st)
                    if hit is not None:
                        # trim the emitted text at the stop string
                        sp = seq.sampling_params
                        keep = st.text[: hit[1]] if sp.include_stop_str_in_output else st.text[: hit[0]]
                        text = text[: max(len(keep) - (len(st.text) - len(text)), 0)]
                        st.text = keep
                        if self.mh_role == "leader":
                            # the scheduler mutation must happen at a step
                            # boundary on EVERY host — queue it for the next
                            # marker; meanwhile suppress further deltas
                            st.mh_suppressed = True
                            self._mh_pending_finishes.append((seq.seq_id, "stop"))
                            put(
                                st,
                                StreamItem(seq_id=seq.seq_id, token_id=tok, text=text),
                            )
                            continue
                        # drop this burst's overshoot tokens from the seq
                        # BEFORE finish_seq caches its blocks, so the prefix
                        # cache hashes exactly the tokens a client sees
                        overshoot = sum(
                            1 for s2, _ in emitted[i + 1:] if s2.seq_id == seq.seq_id
                        )
                        if overshoot:
                            del seq.output_token_ids[-overshoot:]
                        stopped.add(seq.seq_id)
                        self.scheduler.finish_seq(seq, FinishReason.STOP)
                        # the match IS the finish: deliver the terminal item
                        # now (a streaming client must always receive
                        # finished=True — regression: stop-string finishes
                        # previously never emitted one and SSE clients hung)
                        stop_hit = True
                        finishing = True
            item = StreamItem(seq_id=seq.seq_id, token_id=tok, text=text)
            if finishing:
                self._free_mamba(seq)
                if st.detok is not None and not stop_hit:
                    # (stop finishes skip the tail flush: the pending detok
                    # buffer is text past the trimmed match)
                    tail = st.detok.flush()
                    st.text += tail
                    item.text += tail
                item.finished = True
                item.finish_reason = (
                    seq.finish_reason.value if seq.finish_reason else None
                )
            if self.mh_role != "follower":
                put(st, item)
        if pacing and bursts:
            pacer = self._get_pacer()
            for sid, (q, items) in bursts.items():
                pacer.schedule(sid, q, items, pace_span)

    @staticmethod
    def _find_stop_string(st: _RequestState):
        best = None
        for s in st.stop_strings:
            idx = st.text.find(s, st.stop_scan_from)
            if idx != -1 and (best is None or idx < best[0]):
                best = (idx, idx + len(s))
        if best is not None:
            return best
        # no hit: next scan only needs to cover suffixes that could still
        # complete a stop string across the append boundary
        st.stop_scan_from = max(0, len(st.text) - st.max_stop_len + 1)
        return None

    # ------------------------------------------------------------------
    # blocking + background APIs
    # ------------------------------------------------------------------

    def generate(
        self,
        prompts: List[Union[str, List[int]]],
        sampling_params: Optional[Union[SamplingParams, List[SamplingParams]]] = None,
    ) -> List[RequestOutput]:
        """Synchronous batch generation (reference generate_sync,
        engine.rs:1291)."""
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        ids = [self.add_request(p, sp) for p, sp in zip(prompts, sampling_params)]
        for sid in ids:  # outputs are read from seq state, not the stream
            self.requests[sid].stream_disabled = True
        pending = set(ids)
        while pending:
            if self.step() == 0 and not self.scheduler.has_work():
                break
            for sid in list(pending):
                if self.requests[sid].seq.is_finished:
                    pending.discard(sid)
        return [self._output_of(sid) for sid in ids]

    def _output_of(self, seq_id: int) -> RequestOutput:
        st = self.requests[seq_id]
        seq = st.seq
        ttft = (
            seq.first_token_time - seq.arrival_time if seq.first_token_time else None
        )
        latency = seq.finish_time - seq.arrival_time if seq.finish_time else None
        return RequestOutput(
            seq_id=seq_id,
            prompt_token_ids=list(seq.prompt_token_ids),
            output_token_ids=list(seq.output_token_ids),
            text=st.text,
            finish_reason=seq.finish_reason.value if seq.finish_reason else None,
            ttft_s=ttft,
            latency_s=latency,
            cached_tokens=seq.num_prefix_cached_tokens,
        )

    def start_loop(self) -> None:
        """Background engine loop (reference start_engine, engine.rs:1683)."""
        if self._running:
            return
        self._running = True

        def loop():
            while self._running:
                try:
                    if self.step() == 0:
                        time.sleep(0.005)  # idle (reference sleeps 20ms)
                except Exception:  # pragma: no cover
                    logger.exception("engine loop error; cancelling active requests")
                    with self._lock:
                        for st in self.requests.values():
                            if not st.seq.is_finished:
                                self.scheduler.abort(st.seq.seq_id)
                                self._pacer_flush(st.seq.seq_id)
                                st.stream.put(
                                    StreamItem(
                                        seq_id=st.seq.seq_id,
                                        finished=True,
                                        finish_reason="error",
                                    )
                                )

        self._loop_thread = threading.Thread(target=loop, daemon=True, name="engine-loop")
        self._loop_thread.start()

    def stop_loop(self) -> None:
        self._running = False
        if self._loop_thread is not None:
            self._loop_thread.join(timeout=5)
            self._loop_thread = None
        if self._pacer is not None:
            self._pacer.stop()
            self._pacer = None

    # ------------------------------------------------------------------
    # embeddings (reference LLMEngine::embed, engine.rs:1520)
    # ------------------------------------------------------------------

    def embed(
        self,
        prompts: List[Union[str, List[int]]],
        pooling: str = "last",
    ) -> List["np.ndarray"]:
        """Encode prompts into pooled hidden-state vectors."""
        if self.mh_role is not None:
            # embed mutates the block pool outside the step-marker protocol;
            # supporting it needs an embed admission kind in the marker
            raise RuntimeError("embeddings are not supported in multi-host mode")
        import numpy as np  # noqa: F811

        from vllm_rs_tpu.core.scheduler import ScheduledBatch

        out: List[np.ndarray] = []
        max_t = self.econfig.prefill_buckets[-1]
        for prompt in prompts:
            if isinstance(prompt, str):
                assert self.tokenizer is not None
                ids = self.tokenizer.encode(prompt)
                ids = ids.ids if hasattr(ids, "ids") else ids
            else:
                ids = list(prompt)
            if len(ids) > max_t:
                raise ValueError(
                    f"embedding prompt ({len(ids)} tokens) exceeds max bucket {max_t}"
                )
            seq = Sequence(ids, SamplingParams(max_tokens=1))
            # engine lock only around block-table mutation: holding it
            # across the device forward would stall all decode scheduling
            # (reference runs embed through the engine loop, engine.rs:1520;
            # the forward itself is serialized vs steps by the runner's
            # internal KV lock)
            with self._lock:
                if not self.block_manager.allocate_prompt(seq):
                    raise RuntimeError("KV pool exhausted for embedding request")
                # prefix-cached blocks still need this forward's KV writes to
                # land somewhere valid; embed runs the full prompt (writes to
                # shared prefix blocks rewrite identical K/V values)
                seq.num_cached_tokens = 0
            batch = ScheduledBatch(
                kind="prefill", seqs=[seq], chunk_sizes=[len(ids)]
            )
            try:
                vec = self.runner.embed(batch, pooling=pooling)[0]
            finally:
                with self._lock:
                    self.block_manager.free_seq(seq, cache=False)
            with self._lock:
                self.total_prompt_tokens += len(ids)
            out.append(vec)
        return out

    # ------------------------------------------------------------------
    # stats (reference /v1/usage, engine.rs:1480-1518)
    # ------------------------------------------------------------------

    def usage_stats(self) -> dict:
        bm = self.block_manager
        return {
            "prompt_tokens": self.total_prompt_tokens,
            "output_tokens": self.total_output_tokens,
            "kv_blocks_total": bm.num_blocks,
            "kv_blocks_free": bm.num_free,
            "kv_usage_ratio": round(bm.used_ratio, 4),
            "prefix_cache_blocks": bm.prefix_cache.num_cached_blocks,
            "active_requests": self.scheduler.num_active,
            "num_preemptions": self.scheduler.num_preemptions,
            "step_timings": self.step_timing_stats(),
        }

    def step_timing_stats(self) -> dict:
        """Per-step latency percentiles over the last 512 steps, split by
        step kind (the per-step timing surface of the tracing subsystem)."""
        out: dict = {}
        by_kind: dict = {}
        for kind, rows, toks, dt in list(self.step_timings):
            by_kind.setdefault(kind, []).append((dt, toks))
        for kind, items in by_kind.items():
            ds = sorted(dt for dt, _ in items)
            n = len(ds)
            total_t = sum(dt for dt, _ in items)
            total_tok = sum(t for _, t in items)
            out[kind] = {
                "steps": n,
                "p50_ms": round(1e3 * ds[n // 2], 2),
                "p99_ms": round(1e3 * ds[min(n - 1, int(n * 0.99))], 2),
                "mean_ms": round(1e3 * total_t / n, 2),
                "tokens_per_s": round(total_tok / total_t, 1) if total_t else 0.0,
            }
        return out
