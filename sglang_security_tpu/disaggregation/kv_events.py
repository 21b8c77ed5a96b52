"""KV cache event bus for external cache-aware routers.

Parity with the reference's ``srt/disaggregation/kv_events.py``
(BlockStored / BlockRemoved / AllBlocksCleared published over a ZMQ PUB
socket with sequence numbers + a replay socket): external observers
(e.g. the C++ router) can mirror which prefixes each worker caches.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import asdict, dataclass, field
from typing import List, Optional

logger = logging.getLogger(__name__)


@dataclass
class BlockStored:
    block_hashes: List[int]
    token_ids: List[int]
    parent_block_hash: Optional[int]
    num_tokens: int
    ts: float = field(default_factory=time.time)
    event: str = "block_stored"


@dataclass
class BlockRemoved:
    block_hashes: List[int]
    ts: float = field(default_factory=time.time)
    event: str = "block_removed"


@dataclass
class AllBlocksCleared:
    ts: float = field(default_factory=time.time)
    event: str = "all_blocks_cleared"


class ZmqEventPublisher:
    """PUB socket with monotonically increasing seq numbers and a bounded
    replay buffer served over a REP socket (late-joiner catch-up)."""

    def __init__(self, endpoint: str, replay_endpoint: Optional[str] = None,
                 buffer_size: int = 4096):
        import zmq

        self._ctx = zmq.Context.instance()
        self._pub = self._ctx.socket(zmq.PUB)
        self._pub.bind(endpoint)
        self._seq = 0
        self._buffer: List[bytes] = []
        self._buffer_size = buffer_size
        self._lock = threading.Lock()
        self._replay_thread = None
        if replay_endpoint:
            self._rep = self._ctx.socket(zmq.REP)
            self._rep.bind(replay_endpoint)
            self._stop = threading.Event()
            self._replay_thread = threading.Thread(
                target=self._replay_loop, daemon=True
            )
            self._replay_thread.start()

    def publish(self, event) -> None:
        with self._lock:
            payload = json.dumps(
                {"seq": self._seq, **asdict(event)}
            ).encode()
            self._seq += 1
            self._buffer.append(payload)
            if len(self._buffer) > self._buffer_size:
                self._buffer.pop(0)
            self._pub.send(payload)

    def _replay_loop(self) -> None:
        import zmq

        while not self._stop.is_set():
            try:
                if self._rep.poll(200):
                    msg = self._rep.recv_json()
                    since = msg.get("since_seq", 0)
                    with self._lock:
                        out = [
                            json.loads(b)
                            for b in self._buffer
                            if json.loads(b)["seq"] >= since
                        ]
                    self._rep.send_json(out)
            except Exception:
                logger.exception("kv-event replay error")

    def close(self) -> None:
        if self._replay_thread:
            self._stop.set()
            self._replay_thread.join(timeout=1)
        self._pub.close(0)


def tree_event_hook(publisher: ZmqEventPublisher):
    """Adapter for RadixCache(kv_event_fn=...): node ops -> events."""

    def hook(kind: str, node) -> None:
        h = [hash((node.id, node.key.tobytes()))]
        if kind == "stored":
            publisher.publish(
                BlockStored(
                    block_hashes=h,
                    token_ids=node.key.tolist()[:64],
                    parent_block_hash=(
                        hash((node.parent.id, node.parent.key.tobytes()))
                        if node.parent is not None
                        else None
                    ),
                    num_tokens=node.num_tokens,
                )
            )
        elif kind == "removed":
            publisher.publish(BlockRemoved(block_hashes=h))

    return hook
