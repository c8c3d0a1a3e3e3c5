"""Multi-host SPMD serving.

Replaces the reference's runner-process fleet + bincode IPC + NCCL-id
handshake (src/runner/, SURVEY.md §2.2) with the jax multi-controller
model:

- every host calls `init_distributed()` (jax.distributed) and constructs
  the same global Mesh over all chips; weights/KV shard by NamedSharding
  and XLA places collectives on ICI/DCN;
- every host runs the SAME engine: scheduler state is a pure function of
  the request stream, so if all hosts see requests in the same order they
  make bit-identical scheduling decisions and pass identical batch
  descriptors to the shared jitted step — the moral equivalent of the
  reference's `def_broadcast_message_to_runners!` mirror
  (block_manager.rs:746-874) with zero control-plane messages per step;
- request ingress happens on rank 0 (the HTTP server); `RequestFeed`
  broadcasts (seq_id, token_ids, sampling, arrival order) to follower
  hosts over TCP with a monotonic sequence number, and followers inject
  them through the same `LLMEngine.add_request` path.

Scheduler determinism is load-bearing and is pinned by
tests/test_multihost.py::test_scheduler_is_deterministic.
"""

from __future__ import annotations

import json
import logging
import socket
import struct
import threading
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)


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


class RequestFeed:
    """Rank-0 → follower broadcast of admitted requests.

    Keeps every host's engine fed with an identical, identically-ordered
    request stream (seq ids are assigned by rank 0 and carried over).
    """

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
        """Broadcast one admitted request to all followers, in order."""
        with self._lock:
            self._seqno += 1
            msg = json.dumps(
                {
                    "seqno": self._seqno,
                    "seq_id": seq_id,
                    "token_ids": list(token_ids),
                    "sampling": sampling_dict,
                }
            ).encode()
            dead = []
            for f in self._followers:
                try:
                    f.sendall(struct.pack("<I", len(msg)) + msg)
                except OSError:
                    dead.append(f)
            for f in dead:
                self._followers.remove(f)

    def close(self) -> None:
        self._srv.close()


class RequestFollower:
    """Follower-side: receive the rank-0 stream and inject into the local
    engine in publication order."""

    def __init__(self, addr, on_request: Callable[[int, list, dict], None]):
        self._sock = socket.create_connection(addr)
        self._on_request = on_request
        self._expected = 1
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        try:
            while True:
                raw = self._recv_exact(4)
                (n,) = struct.unpack("<I", raw)
                msg = json.loads(self._recv_exact(n))
                assert msg["seqno"] == self._expected, (
                    f"request stream gap: got {msg['seqno']}, want {self._expected}"
                )
                self._expected += 1
                self._on_request(msg["seq_id"], msg["token_ids"], msg["sampling"])
        except (ConnectionError, OSError):
            return

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("feed closed")
            buf.extend(chunk)
        return bytes(buf)

    def close(self) -> None:
        self._sock.close()
