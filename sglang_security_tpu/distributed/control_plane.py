"""Multi-host scheduler lockstep: per-iteration op broadcast.

The reference runs one scheduler process per rank and has attn-tp0
broadcast each iteration's newly-arrived requests to the other ranks
(``srt/managers/scheduler.py:830-906`` recv_requests + broadcast_pyobj
over the gloo CPU group).  The TPU build keeps that design shape across
HOSTS: node 0 owns the API surface and, before every scheduler
iteration that has work, broadcasts the iteration's op batch (new
requests / aborts / flushes, pickled) to every follower node over TCP.
Each node then runs the SAME deterministic scheduler step, so all
processes issue identical jit calls on the global mesh and XLA's
collectives line up (the multi-controller SPMD requirement).

Determinism notes: requests carry node-0's timestamps (pickled
verbatim), the RNG key derives from --random-seed, and scheduler
decisions are pure functions of (state, op batch).  SafeKV's global
epoch rides the same stream: the leader prepends ("__epoch__", value)
to every broadcast and followers pin their GlobalEpoch to it
(global_epoch.py pin), so attack-window statistics and probe-eviction
decisions are identical on every node.
"""

from __future__ import annotations

import logging
import pickle
import socket
import struct
import threading
from typing import List, Optional, Tuple

logger = logging.getLogger(__name__)

_LEN = struct.Struct("!I")


def _send_msg(sock: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_LEN.pack(len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("control-plane peer closed")
        buf += chunk
    return buf


def _recv_msg(sock: socket.socket):
    (n,) = _LEN.unpack(_recv_exact(sock, 4))
    return pickle.loads(_recv_exact(sock, n))


class ControlPlaneLeader:
    """Node 0: accepts one connection per follower, broadcasts op
    batches in iteration order."""

    def __init__(self, host: str, port: int, num_followers: int):
        self.num_followers = num_followers
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(num_followers)
        self._socks: List[socket.socket] = []
        for _ in range(num_followers):
            conn, addr = srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._socks.append(conn)
            logger.info("control plane: follower joined from %s", addr)
        srv.close()
        self._lock = threading.Lock()

    is_leader = True

    def broadcast(self, ops) -> None:
        with self._lock:
            for s in self._socks:
                _send_msg(s, ops)

    def close(self) -> None:
        for s in self._socks:
            try:
                _send_msg(s, ("__shutdown__",))
            except OSError:
                pass
            s.close()


class ControlPlaneFollower:
    """Node > 0: receives op batches; recv() blocks until the leader's
    next iteration message."""

    def __init__(self, host: str, port: int, timeout: float = 300.0):
        import time

        deadline = time.monotonic() + timeout
        while True:
            try:
                s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                s.connect((host, port))
                break
            except OSError:
                s.close()
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock = s

    is_leader = False

    def recv(self):
        return _recv_msg(self._sock)

    def close(self) -> None:
        self._sock.close()


def control_plane_endpoint(server_args) -> Tuple[str, int]:
    """The op-broadcast endpoint: the coordinator host at
    --control-plane-port (default: coordinator port + 1)."""
    host, _, port = server_args.dist_init_addr.partition(":")
    cp_port = server_args.control_plane_port or int(port) + 1
    return host, cp_port


def make_control_plane(server_args):
    if server_args.nnodes <= 1:
        return None
    host, port = control_plane_endpoint(server_args)
    if server_args.node_rank == 0:
        return ControlPlaneLeader(
            "0.0.0.0" if host not in ("127.0.0.1", "localhost") else host,
            port, server_args.nnodes - 1,
        )
    return ControlPlaneFollower(host, port)
