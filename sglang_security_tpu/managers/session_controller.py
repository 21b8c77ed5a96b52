"""Multi-turn session control.

Parity with the reference's ``srt/managers/session_controller.py``
(SessionReqNode/Session) + scheduler open/close RPCs
(``scheduler.py:2423-2444``): a session keeps the token history of a
conversation tree so follow-up turns send only the delta; the radix
cache then reuses the previous turns' KV verbatim (same pages, zero
recompute).  Branches fork from any previous request id.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class SessionNode:
    rid: str
    input_ids: List[int]
    output_ids: List[int] = field(default_factory=list)
    parent: Optional["SessionNode"] = None
    children: List["SessionNode"] = field(default_factory=list)
    aborted: bool = False

    def full_ids(self) -> List[int]:
        ids: List[int] = []
        node = self
        chain = []
        while node is not None:
            chain.append(node)
            node = node.parent
        for n in reversed(chain):
            ids.extend(n.input_ids)
            ids.extend(n.output_ids)
        return ids


class Session:
    def __init__(self, session_id: str, capacity_tokens: int = 1 << 20):
        self.session_id = session_id
        self.capacity_tokens = capacity_tokens
        self.nodes: Dict[str, SessionNode] = {}
        self.last_rid: Optional[str] = None

    def context_for(self, branch_rid: Optional[str]) -> List[int]:
        rid = branch_rid or self.last_rid
        if rid is None or rid not in self.nodes:
            return []
        return self.nodes[rid].full_ids()

    def record(self, rid: str, input_delta: List[int],
               branch_rid: Optional[str]) -> SessionNode:
        parent = self.nodes.get(branch_rid or self.last_rid or "")
        node = SessionNode(rid, list(input_delta), parent=parent)
        if parent is not None:
            parent.children.append(node)
        self.nodes[rid] = node
        self.last_rid = rid
        return node

    def finish(self, rid: str, output_ids: List[int]) -> None:
        node = self.nodes.get(rid)
        if node is not None:
            node.output_ids = list(output_ids)

    def abort_branch(self, rid: str) -> List[str]:
        """Abort a node and its descendants; returns affected rids."""
        node = self.nodes.get(rid)
        if node is None:
            return []
        out = []
        stack = [node]
        while stack:
            n = stack.pop()
            n.aborted = True
            out.append(n.rid)
            stack.extend(n.children)
        return out


class SessionController:
    def __init__(self):
        self._sessions: Dict[str, Session] = {}
        self._lock = threading.Lock()

    def open_session(self, session_id: Optional[str] = None,
                     capacity_tokens: int = 1 << 20) -> str:
        sid = session_id or uuid.uuid4().hex
        with self._lock:
            if sid in self._sessions:
                raise ValueError(f"session {sid!r} already exists")
            self._sessions[sid] = Session(sid, capacity_tokens)
        return sid

    def close_session(self, session_id: str) -> bool:
        with self._lock:
            return self._sessions.pop(session_id, None) is not None

    def get(self, session_id: str) -> Optional[Session]:
        with self._lock:
            return self._sessions.get(session_id)
