"""Multi-host SPMD serving.

Replaces the reference's runner-process fleet + bincode IPC + NCCL-id
handshake (src/runner/, SURVEY.md §2.2) with the jax multi-controller
model:

- every host calls `init_distributed()` (jax.distributed) and constructs
  the same global Mesh over all chips; weights/KV shard by NamedSharding
  and XLA places collectives on ICI/DCN;
- every host runs the SAME engine: scheduler state is a pure function of
  the control stream, so if all hosts apply the same control events at the
  same STEP BOUNDARY they make bit-identical scheduling decisions and pass
  identical batch descriptors to the shared jitted step — the moral
  equivalent of the reference's `def_broadcast_message_to_runners!` mirror
  (block_manager.rs:746-874) plus the lockstep runner message loop
  (src/runner/runner.rs:249-434), collapsed to ONE small marker frame per
  engine step;
- request ingress happens on rank 0 (the HTTP server). The leader defers
  every scheduler-visible mutation (admission, abort, stop-string finish)
  to its next step boundary, publishes them in a step-indexed marker via
  `StepFeed`, and applies them locally at that same boundary. Followers
  block on `StepFollower.next_marker(step)` before scheduling, so every
  host's scheduler sees the identical event sequence at the identical
  step index.

Determinism of the scheduler itself is pinned by
tests/test_multihost.py::test_scheduler_is_deterministic; the end-to-end
lockstep contract (2 jax.distributed processes, one global mesh, requests
injected mid-stream → bit-identical tokens and schedules) by
tests/test_multihost_lockstep.py.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import socket
import struct
import threading
import time
from typing import Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


class PeerLostError(RuntimeError):
    """A multi-host peer died or went silent. Surviving hosts must cancel
    in-flight requests and exit — their next pjit collective would hang
    forever waiting for the dead host's chips. Reference counterpart:
    heartbeat abort after 5 missed pings / runner exit on parent EOF
    (src/utils/heartbeat.rs:8-78, utils/command.rs)."""


class StepDesyncError(RuntimeError):
    """The step-marker streams diverged (marker gap): scheduler state is no
    longer bit-identical across hosts — fatal, cancel and exit."""


# Liveness knobs (documented in STATUS.md §2.6): markers double as leader→
# follower liveness; followers send 1 Hz heartbeat frames back on the feed
# socket (the reference's heartbeat.rs 1 Hz ping). A follower with
# HB_MISS_LIMIT stale intervals, a failed marker send, or a marker wait
# exceeding the timeout declares the peer lost.
HB_INTERVAL_S = 1.0
HB_MISS_LIMIT = 5


def mh_timeout_s() -> float:
    """Bound on any cross-host wait (marker arrival on followers). Also the
    knob to raise when single steps legitimately take longer (giant
    prefills): VLLM_RS_TPU_MH_TIMEOUT_S, default 60 s."""
    return float(os.environ.get("VLLM_RS_TPU_MH_TIMEOUT_S", "60"))


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the jax distributed runtime (multi-host pod slice).

    On Cloud TPU the arguments auto-detect from the metadata server; pass
    them explicitly elsewhere.
    """
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs = {
            "coordinator_address": coordinator,
            "num_processes": num_processes,
            "process_id": process_id,
        }
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def _send_frame(sock: socket.socket, obj: dict) -> None:
    msg = json.dumps(obj).encode()
    sock.sendall(struct.pack("<I", len(msg)) + msg)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("feed closed")
        buf.extend(chunk)
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> dict:
    (n,) = struct.unpack("<I", _recv_exact(sock, 4))
    return json.loads(_recv_exact(sock, n))


class StepFeed:
    """Leader-side step-synchronized control broadcast.

    One marker frame per engine step carrying every scheduler-visible
    control event the leader applies at that step boundary:
    `{"step": k, "admissions": [...], "finishes": [...], "aborts": [...]}`.
    Followers apply marker k before their schedule() for step k — this is
    the step-boundary half of the determinism contract (the round-1 feed
    carried only an arrival seqno, so followers injected on arrival from a
    thread and could admit at a different step than rank 0).
    """

    def __init__(self, port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("0.0.0.0", port))
        self._srv.listen(64)
        self.port = self._srv.getsockname()[1]
        self._followers: List[socket.socket] = []
        self._last_heard: Dict[socket.socket, float] = {}
        self._lost = 0  # followers that died after connecting
        self.expected = 0  # set by wait_followers; >0 makes loss fatal
        self._closed = False
        self._lock = threading.Lock()
        self._accept_thread = threading.Thread(target=self._accept, daemon=True)
        self._accept_thread.start()

    def _accept(self) -> None:
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            # Bound SENDS only (SO_SNDTIMEO, not settimeout — the reader
            # thread's recv must stay blocking): a follower that is frozen
            # but keeps its TCP connection alive (stuck in a device call,
            # recv buffer full) would otherwise block publish() — and with
            # it the leader's engine thread, where check_liveness runs —
            # forever, so the heartbeat fail-fast never fired for this
            # failure mode (advisor r3 finding). struct timeval on LP64
            # Linux is two native longs ("@qq"); "<LL" (8 bytes) gets
            # EINVAL — and an exception here must not kill the accept loop.
            t = mh_timeout_s()
            try:
                conn.setsockopt(
                    socket.SOL_SOCKET,
                    socket.SO_SNDTIMEO,
                    struct.pack("@qq", int(t), int((t % 1.0) * 1e6)),
                )
            except OSError:  # pragma: no cover - platform-specific
                pass  # unbounded sends degrade to the pre-timeout behavior
            with self._lock:
                self._followers.append(conn)
                self._last_heard[conn] = time.monotonic()
            threading.Thread(
                target=self._reader, args=(conn,), daemon=True
            ).start()

    def _reader(self, conn: socket.socket) -> None:
        """Drain follower→leader heartbeat frames ({"hb": 1} at 1 Hz),
        refreshing last_heard; EOF/error marks the follower lost."""
        try:
            while True:
                _recv_frame(conn)
                with self._lock:
                    self._last_heard[conn] = time.monotonic()
        except (ConnectionError, OSError):
            self._drop(conn)

    def _drop(self, conn: socket.socket) -> None:
        with self._lock:
            if conn in self._followers:
                self._followers.remove(conn)
                self._last_heard.pop(conn, None)
                if not self._closed:
                    self._lost += 1

    def num_followers(self) -> int:
        with self._lock:
            return len(self._followers)

    def wait_followers(self, n: int, timeout: float = 60.0) -> None:
        """Block until n followers are connected (call before serving — a
        marker published before a follower joins is lost to it). From this
        point follower loss is FATAL: check_liveness()/publish() raise
        PeerLostError."""
        deadline = time.time() + timeout
        while self.num_followers() < n:
            if time.time() > deadline:
                raise TimeoutError(
                    f"only {self.num_followers()}/{n} followers connected"
                )
            time.sleep(0.01)
        self.expected = n

    def check_liveness(self) -> None:
        """Raise PeerLostError when a follower died (socket EOF) or its
        heartbeat is stale beyond HB_MISS_LIMIT intervals. Called by the
        leader every engine-loop iteration (including idle ones)."""
        if not self.expected or self._closed:
            return
        with self._lock:
            if self._lost:
                raise PeerLostError(
                    f"{self._lost} follower(s) disconnected "
                    f"({len(self._followers)}/{self.expected} alive)"
                )
            now = time.monotonic()
            stale = HB_INTERVAL_S * HB_MISS_LIMIT
            for conn, heard in self._last_heard.items():
                if now - heard > stale:
                    raise PeerLostError(
                        f"follower heartbeat silent for {now - heard:.1f}s "
                        f"(> {stale:.0f}s)"
                    )

    def publish(
        self,
        step: int,
        admissions: Optional[list] = None,
        finishes: Optional[list] = None,
        aborts: Optional[list] = None,
    ) -> None:
        """Broadcast the step-k marker to all followers, in order. After
        wait_followers, a send failure raises PeerLostError (a follower
        missing a marker would deadlock the surviving hosts' collectives);
        before it (tests, ad-hoc feeds), dead followers drop silently."""
        marker = {
            "step": step,
            "admissions": admissions or [],
            "finishes": finishes or [],
            "aborts": aborts or [],
        }
        with self._lock:
            dead = []
            for f in self._followers:
                try:
                    _send_frame(f, marker)
                except OSError:
                    dead.append(f)
        for f in dead:
            self._drop(f)
        self.check_liveness()

    def close(self) -> None:
        self._closed = True
        self._srv.close()
        with self._lock:
            for f in self._followers:
                try:
                    f.close()
                except OSError:
                    pass


class StepFollower:
    """Follower-side: receive step markers and hand them to the engine
    loop strictly in step order."""

    def __init__(self, addr, heartbeat: bool = True, connect_timeout_s: float = 60.0):
        # retry the connect: follower and leader hosts start concurrently,
        # and the leader binds its feed port only after its (slow) engine
        # init — a single connect attempt races it and dies with
        # ECONNREFUSED (observed as the 2-process kill test's startup
        # flake; the production `--multihost` follower had the same race)
        deadline = time.time() + connect_timeout_s
        while True:
            try:
                self._sock = socket.create_connection(addr, timeout=5.0)
                break
            except OSError:
                if time.time() >= deadline:
                    raise
                time.sleep(0.25)
        self._sock.settimeout(None)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._q: "queue.Queue[dict]" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        if heartbeat:
            # 1 Hz follower→leader liveness ping on the feed socket (the
            # reference's heartbeat.rs ping); the reader thread never
            # writes, so the socket's send side is single-threaded here
            self._hb_thread = threading.Thread(target=self._heartbeat, daemon=True)
            self._hb_thread.start()

    def _run(self) -> None:
        try:
            while True:
                self._q.put(_recv_frame(self._sock))
        except (ConnectionError, OSError):
            self._closed = True
            # sentinel wakes a next_marker blocked in q.get immediately
            # instead of after the full marker timeout
            self._q.put({"step": None})
            return

    def _heartbeat(self) -> None:
        while not self._closed:
            time.sleep(HB_INTERVAL_S)
            try:
                _send_frame(self._sock, {"hb": 1})
            except OSError:
                self._closed = True
                return

    def next_marker(self, step: int, timeout: Optional[float] = None) -> Optional[dict]:
        """Block until the marker for `step` arrives.

        timeout=None means "the engine has work and NEEDS this marker":
        waits up to mh_timeout_s() then raises PeerLostError (a leader that
        stops publishing mid-stream is dead or hung — the reference's
        runner exits on parent EOF, utils/command.rs). An explicit short
        timeout is an idle poll: returns None when nothing arrived, unless
        the feed is closed (leader EOF) → PeerLostError.

        Markers arrive strictly in order; a step mismatch means the control
        streams diverged → StepDesyncError (fatal: scheduler state is no
        longer bit-identical)."""
        fatal = timeout is None
        if fatal:
            timeout = mh_timeout_s()
        try:
            marker = self._q.get(timeout=timeout)
        except queue.Empty:
            if self._closed:
                raise PeerLostError("step feed closed (leader gone)") from None
            if fatal:
                raise PeerLostError(
                    f"no step marker within {timeout:.0f}s "
                    "(VLLM_RS_TPU_MH_TIMEOUT_S)"
                ) from None
            return None
        if marker["step"] is None:  # EOF sentinel from the reader thread
            raise PeerLostError("step feed closed (leader gone)")
        if marker["step"] != step:
            raise StepDesyncError(
                f"step-marker gap: got {marker['step']}, expected {step}"
            )
        return marker

    def close(self) -> None:
        self._closed = True
        try:
            self._sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# legacy arrival-order feed (round 1) — kept for the simple broadcast tests;
# the engine integration uses StepFeed/StepFollower above
# ---------------------------------------------------------------------------


class RequestFeed:
    """Rank-0 → follower broadcast of admitted requests (arrival-ordered,
    NOT step-synchronized — superseded by StepFeed)."""

    def __init__(self, port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("0.0.0.0", port))
        self._srv.listen(64)
        self.port = self._srv.getsockname()[1]
        self._followers: List[socket.socket] = []
        self._seqno = 0
        self._lock = threading.Lock()
        self._accept_thread = threading.Thread(target=self._accept, daemon=True)
        self._accept_thread.start()

    def _accept(self) -> None:
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with self._lock:
                self._followers.append(conn)

    def publish(self, seq_id: int, token_ids, sampling_dict: dict) -> None:
        with self._lock:
            self._seqno += 1
            msg = {
                "seqno": self._seqno,
                "seq_id": seq_id,
                "token_ids": list(token_ids),
                "sampling": sampling_dict,
            }
            dead = []
            for f in self._followers:
                try:
                    _send_frame(f, msg)
                except OSError:
                    dead.append(f)
            for f in dead:
                self._followers.remove(f)

    def close(self) -> None:
        self._srv.close()


class RequestFollower:
    """Follower-side of the legacy arrival-order feed."""

    def __init__(self, addr, on_request: Callable[[int, list, dict], None]):
        self._sock = socket.create_connection(addr)
        self._on_request = on_request
        self._expected = 1
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        try:
            while True:
                msg = _recv_frame(self._sock)
                assert msg["seqno"] == self._expected, (
                    f"request stream gap: got {msg['seqno']}, want {self._expected}"
                )
                self._expected += 1
                self._on_request(msg["seq_id"], msg["token_ids"], msg["sampling"])
        except (ConnectionError, OSError):
            return

    def close(self) -> None:
        self._sock.close()
