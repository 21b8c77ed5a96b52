"""Prefill/decode disaggregation: KV handoff connections.

Re-creates the reference's ``srt/disaggregation/base/conn.py`` interface
(BaseKVManager/Sender/Receiver/BootstrapServer:31-114) and its backend
set: the RDMA mooncake engine maps to a TCP/DCN transfer here (the
reference's ``fake`` test backend is re-created in-process).  Protocol:
the client (or the C++ PD load balancer) assigns each request a
``bootstrap_room`` and posts it to one prefill and one decode server;
the decode server's bootstrap endpoint is the rendezvous — the prefill
server pushes {metadata, first token, KV page bytes} for the room, the
decode server injects the KV into its own pool and continues decoding.
"""

from __future__ import annotations

import json
import logging
import pickle
import queue
import socket
import struct
import threading
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class KVPayload:
    room: int
    token_ids: list  # prompt token ids whose KV is included (aligned part)
    first_token: int
    k_bytes: bytes  # [L, n_tokens, Hkv, hd] flattened
    v_bytes: bytes
    shape: tuple
    dtype: str
    meta: dict = field(default_factory=dict)


class BaseKVSender:
    def send(self, payload: KVPayload) -> bool:
        raise NotImplementedError


class BaseKVReceiver:
    def poll(self, room: int) -> Optional[KVPayload]:
        raise NotImplementedError


class BaseBootstrapServer:
    def start(self) -> None: ...
    def close(self) -> None: ...


# ----------------------------------------------------------------- fake
class _FakeRegistry:
    """Process-global room -> payload store (reference fake/conn.py)."""

    rooms: Dict[int, KVPayload] = {}
    lock = threading.Lock()


class FakeKVSender(BaseKVSender):
    def __init__(self, host: str = "", port: int = 0):
        pass

    def send(self, payload: KVPayload) -> bool:
        with _FakeRegistry.lock:
            _FakeRegistry.rooms[payload.room] = payload
        return True


class FakeKVReceiver(BaseKVReceiver):
    def poll(self, room: int) -> Optional[KVPayload]:
        with _FakeRegistry.lock:
            return _FakeRegistry.rooms.pop(room, None)


class FakeBootstrapServer(BaseBootstrapServer):
    def __init__(self, port: int = 0):
        pass


# ------------------------------------------------------------------ tcp
MAGIC = b"SGLT"


class TcpKVSender(BaseKVSender):
    """Pushes a payload to the decode server's bootstrap endpoint."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self.host = host
        self.port = port
        self.timeout = timeout

    def send(self, payload: KVPayload) -> bool:
        try:
            blob = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
            with socket.create_connection(
                (self.host, self.port), timeout=self.timeout
            ) as s:
                s.sendall(MAGIC + struct.pack("<Q", len(blob)) + blob)
                ack = s.recv(2)
                return ack == b"ok"
        except OSError as e:
            logger.error("KV send to %s:%d failed: %s", self.host, self.port, e)
            return False


class TcpBootstrapServer(BaseBootstrapServer, BaseKVReceiver):
    """Decode-side rendezvous: accepts pushed payloads, indexed by room."""

    def __init__(self, port: int):
        self.port = port
        self._rooms: Dict[int, KVPayload] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._sock: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("0.0.0.0", self.port))
        self._sock.listen(64)
        self._sock.settimeout(0.2)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        logger.info("KV bootstrap server on :%d", self.port)

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            with conn:
                head = self._recv_exact(conn, 12)
                if head is None or head[:4] != MAGIC:
                    return
                (n,) = struct.unpack("<Q", head[4:])
                blob = self._recv_exact(conn, n)
                if blob is None:
                    return
                payload: KVPayload = pickle.loads(blob)
                with self._lock:
                    self._rooms[payload.room] = payload
                conn.sendall(b"ok")
        except OSError:
            pass

    @staticmethod
    def _recv_exact(conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(min(n - len(buf), 1 << 20))
            if not chunk:
                return None
            buf += chunk
        return buf

    def poll(self, room: int) -> Optional[KVPayload]:
        with self._lock:
            return self._rooms.pop(room, None)

    def close(self) -> None:
        self._stop.set()
        if self._sock is not None:
            self._sock.close()
        if self._thread is not None:
            self._thread.join(timeout=1)


def make_sender(backend: str, host: str, port: int) -> BaseKVSender:
    if backend == "fake":
        return FakeKVSender(host, port)
    return TcpKVSender(host, port)


def make_bootstrap(backend: str, port: int):
    if backend == "fake":
        return FakeKVReceiver()
    srv = TcpBootstrapServer(port)
    srv.start()
    return srv
