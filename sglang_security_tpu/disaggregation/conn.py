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

try:  # registers the "bfloat16" numpy dtype name used on the wire
    import ml_dtypes  # noqa: F401
except ImportError:  # pragma: no cover
    pass

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

    def is_failed(self, room: int) -> bool:
        """True if a transfer for this room started and died (peer hang,
        mid-stream disconnect) — the reference's heartbeat-driven room
        failure (mooncake/conn.py:488-540)."""
        return False


class BaseBootstrapServer:
    def start(self) -> None: ...
    def close(self) -> None: ...


# ----------------------------------------------------------------- fake
class _FakeRegistry:
    """Process-global room -> payload store (reference fake/conn.py)."""

    rooms: Dict[int, KVPayload] = {}
    failed: set = set()
    lock = threading.Lock()


def fake_fail_room(room: int) -> None:
    """Test hook: simulate a dead prefill peer for this room."""
    with _FakeRegistry.lock:
        _FakeRegistry.failed.add(room)


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

    def is_failed(self, room: int) -> bool:
        with _FakeRegistry.lock:
            return room in _FakeRegistry.failed


class FakeBootstrapServer(BaseBootstrapServer):
    def __init__(self, port: int = 0):
        pass


# ------------------------------------------------------------------ tcp
MAGIC = b"SGLT"
MAGIC_CHUNKED = b"SGLC"
MAGIC_STREAM = b"SGLS"
CHUNK_BYTES = 4 << 20  # per-write granularity (reference's per-layer chunks)
_FRAME_HDR = struct.Struct("<qqQQ")  # token_start, n_tokens, k_len, v_len


class StreamingKVSender:
    """Progressive KV push over one persistent connection: page-aligned
    chunks stream to the decode server WHILE later prefill chunks still
    compute (the reference's layer-by-layer send during prefill,
    ``mooncake/conn.py:233-288``).  The TPU-native progressive unit is
    the prefill CHUNK — one jit computes all layers of a chunk, so KV
    becomes available chunk-by-chunk, not layer-by-layer; within a
    chunk the receiver still gets bounded sub-writes and imports each
    chunk into its pool as it lands."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self.host = host
        self.port = port
        self.timeout = timeout
        self._sock: Optional[socket.socket] = None

    def begin(self, room: int, token_ids: list, dtype: str,
              meta: Optional[dict] = None) -> bool:
        head = {
            "room": room,
            "token_ids": token_ids,
            "dtype": dtype,
            "meta": meta or {},
        }
        try:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout
            )
            blob = pickle.dumps(head, protocol=pickle.HIGHEST_PROTOCOL)
            self._sock.sendall(
                MAGIC_STREAM + struct.pack("<Q", len(blob)) + blob
            )
            return True
        except OSError as e:
            logger.error("KV stream begin to %s:%d failed: %s",
                         self.host, self.port, e)
            self.abort()
            return False

    def send_chunk(self, token_start: int, k_np, v_np) -> bool:
        """k_np/v_np: [L, Hkv, n_tokens, hd] host arrays for this chunk."""
        if self._sock is None:
            return False
        kb, vb = k_np.tobytes(), v_np.tobytes()
        hdr = _FRAME_HDR.pack(token_start, k_np.shape[2], len(kb), len(vb))
        shape = pickle.dumps(
            (tuple(k_np.shape), tuple(v_np.shape)),
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        try:
            self._sock.sendall(hdr + struct.pack("<Q", len(shape)) + shape)
            for data in (kb, vb):
                for off in range(0, len(data), CHUNK_BYTES):
                    self._sock.sendall(data[off : off + CHUNK_BYTES])
            return True
        except OSError as e:
            logger.error("KV stream chunk failed: %s", e)
            self.abort()
            return False

    def finish(self, first_token: int, meta: Optional[dict] = None) -> bool:
        if self._sock is None:
            return False
        tail = pickle.dumps(
            {"first_token": first_token, "meta": meta or {}},
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        try:
            self._sock.sendall(
                _FRAME_HDR.pack(-1, 0, 0, 0)
                + struct.pack("<Q", len(tail)) + tail
            )
            ack = self._sock.recv(2)
            return ack == b"ok"
        except OSError as e:
            logger.error("KV stream finish failed: %s", e)
            return False
        finally:
            self.abort()

    def abort(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None


class TcpKVSender(BaseKVSender):
    """Pushes a payload to the decode server's bootstrap endpoint.

    The KV tensors stream in bounded chunks after a small metadata
    header (the reference sends per-layer slices, mooncake/conn.py:
    233-288); the receiver tracks per-chunk progress so a dead peer is
    detected mid-transfer instead of hanging the room forever."""

    def __init__(self, host: str, port: int, timeout: float = 30.0,
                 retries: int = 2):
        self.host = host
        self.port = port
        self.timeout = timeout
        self.retries = retries

    def send(self, payload: KVPayload) -> bool:
        for attempt in range(self.retries):
            if self._send_once(payload):
                return True
            logger.warning(
                "KV send to %s:%d failed (attempt %d/%d)",
                self.host, self.port, attempt + 1, self.retries,
            )
        return False

    def _send_once(self, payload: KVPayload) -> bool:
        meta = {
            "room": payload.room,
            "token_ids": payload.token_ids,
            "first_token": payload.first_token,
            "shape": payload.shape,
            "dtype": payload.dtype,
            "meta": payload.meta,
            "k_len": len(payload.k_bytes),
            "v_len": len(payload.v_bytes),
        }
        try:
            blob = pickle.dumps(meta, protocol=pickle.HIGHEST_PROTOCOL)
            with socket.create_connection(
                (self.host, self.port), timeout=self.timeout
            ) as s:
                s.sendall(MAGIC_CHUNKED + struct.pack("<Q", len(blob)) + blob)
                for data in (payload.k_bytes, payload.v_bytes):
                    for off in range(0, len(data), CHUNK_BYTES):
                        s.sendall(data[off : off + CHUNK_BYTES])
                ack = s.recv(2)
                return ack == b"ok"
        except OSError as e:
            logger.error("KV send to %s:%d failed: %s", self.host, self.port, e)
            return False


class TcpBootstrapServer(BaseBootstrapServer, BaseKVReceiver):
    """Decode-side rendezvous: accepts pushed payloads, indexed by room."""

    def __init__(self, port: int, chunk_timeout: float = 20.0):
        self.port = port
        self.chunk_timeout = chunk_timeout  # max silence mid-transfer
        self._rooms: Dict[int, KVPayload] = {}
        self._failed: set = set()
        self._progress: Dict[int, float] = {}  # room -> last chunk time
        # streaming rooms: room -> {"head": dict, "frames": [(start,
        # k_np, v_np)], "done": bool, "first_token": int|None}
        self._staging: Dict[int, dict] = {}
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
        import time as _time

        room = None
        try:
            with conn:
                conn.settimeout(self.chunk_timeout)
                head = self._recv_exact(conn, 12)
                if head is None:
                    return
                (n,) = struct.unpack("<Q", head[4:])
                if head[:4] == MAGIC:  # legacy single-blob frame
                    blob = self._recv_exact(conn, n)
                    if blob is None:
                        return
                    payload: KVPayload = pickle.loads(blob)
                    with self._lock:
                        self._rooms[payload.room] = payload
                    conn.sendall(b"ok")
                    return
                if head[:4] == MAGIC_STREAM:
                    self._handle_stream(conn, n)
                    return
                if head[:4] != MAGIC_CHUNKED:
                    return
                blob = self._recv_exact(conn, n)
                if blob is None:
                    return
                meta = pickle.loads(blob)
                room = meta["room"]
                bufs = []
                for total in (meta["k_len"], meta["v_len"]):
                    buf = bytearray(total)
                    got = 0
                    while got < total:
                        chunk = conn.recv(min(total - got, CHUNK_BYTES))
                        if not chunk:
                            raise OSError("peer closed mid-transfer")
                        buf[got : got + len(chunk)] = chunk
                        got += len(chunk)
                        with self._lock:
                            self._progress[room] = _time.monotonic()
                    bufs.append(bytes(buf))
                payload = KVPayload(
                    room=room,
                    token_ids=meta["token_ids"],
                    first_token=meta["first_token"],
                    k_bytes=bufs[0],
                    v_bytes=bufs[1],
                    shape=tuple(meta["shape"]),
                    dtype=meta["dtype"],
                    meta=meta.get("meta", {}),
                )
                with self._lock:
                    self._rooms[room] = payload
                    self._progress.pop(room, None)
                conn.sendall(b"ok")
        except OSError as e:
            if room is not None:
                logger.error("KV transfer for room %s died: %s", room, e)
                with self._lock:
                    self._failed.add(room)
                    self._progress.pop(room, None)

    def _handle_stream(self, conn: socket.socket, head_len: int) -> None:
        """Streaming protocol: header, then (frame-hdr, shapes, K bytes,
        V bytes)* until an end frame (token_start = -1) carrying the
        first token.  Frames become visible to ``poll_stream`` as they
        land, so the decode scheduler imports KV while later prefill
        chunks are still computing/transferring.  A dropped connection
        mid-stream marks the room failed (and poisons its staging)."""
        import time as _time

        room = None
        try:
            blob = self._recv_exact(conn, head_len)
            if blob is None:
                return
            head = pickle.loads(blob)
            room = head["room"]
            with self._lock:
                self._staging[room] = {
                    "head": head, "frames": [], "done": False,
                    "first_token": None, "tail_meta": {},
                }
                self._progress[room] = _time.monotonic()
            while True:
                fh = self._recv_exact(conn, _FRAME_HDR.size + 8)
                if fh is None:
                    raise OSError("peer closed mid-stream")
                token_start, n_tok, k_len, v_len = _FRAME_HDR.unpack(
                    fh[: _FRAME_HDR.size]
                )
                (blob_len,) = struct.unpack("<Q", fh[_FRAME_HDR.size:])
                blob = self._recv_exact(conn, blob_len)
                if blob is None:
                    raise OSError("peer closed mid-stream")
                if token_start < 0:  # end frame
                    tail = pickle.loads(blob)
                    with self._lock:
                        st = self._staging.get(room)
                        if st is not None:
                            st["first_token"] = tail["first_token"]
                            st["tail_meta"] = tail.get("meta", {})
                            st["done"] = True
                        self._progress.pop(room, None)
                    conn.sendall(b"ok")
                    return
                k_shape, v_shape = pickle.loads(blob)
                bufs = []
                for total in (k_len, v_len):
                    buf = bytearray(total)
                    got = 0
                    while got < total:
                        chunk = conn.recv(min(total - got, CHUNK_BYTES))
                        if not chunk:
                            raise OSError("peer closed mid-stream")
                        buf[got : got + len(chunk)] = chunk
                        got += len(chunk)
                        with self._lock:
                            self._progress[room] = _time.monotonic()
                    bufs.append(bytes(buf))
                dtype = np.dtype(head["dtype"])
                k_np = np.frombuffer(bufs[0], dtype).reshape(k_shape)
                v_np = np.frombuffer(bufs[1], dtype).reshape(v_shape)
                with self._lock:
                    st = self._staging.get(room)
                    if st is not None:
                        st["frames"].append((token_start, k_np, v_np))
        except OSError as e:
            if room is not None:
                logger.error("KV stream for room %s died: %s", room, e)
                with self._lock:
                    self._failed.add(room)
                    self._staging.pop(room, None)
                    self._progress.pop(room, None)

    def poll_stream(self, room: int) -> Optional[dict]:
        """Drain newly-arrived frames for a streaming room.  Returns
        {"head", "frames" (new since last poll), "done", "first_token"}
        or None if no stream has begun for the room."""
        with self._lock:
            st = self._staging.get(room)
            if st is None:
                return None
            frames, st["frames"] = st["frames"], []
            out = {
                "head": st["head"],
                "frames": frames,
                "done": st["done"],
                "first_token": st["first_token"],
                "tail_meta": st["tail_meta"],
            }
            if st["done"] and not st["frames"]:
                self._staging.pop(room, None)
            return out

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

    def is_failed(self, room: int) -> bool:
        with self._lock:
            return room in self._failed

    def clear_failed(self, room: int) -> None:
        with self._lock:
            self._failed.discard(room)

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
