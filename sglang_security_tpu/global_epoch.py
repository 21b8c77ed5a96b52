"""Global epoch service for the SafeKV side-channel defense.

A process-wide monotonically increasing epoch, advanced every
``TIME_WINDOW_LENGTH`` seconds by a daemon thread.  Radix-tree nodes record
per-epoch hit counts and distinct-user counts; on epoch rollover the defense
logic (``mem_cache/radix_cache.py``) snapshots the previous window and checks
for access-pattern anomalies (probing spikes with low user entropy).

Re-creates the capability of the reference's ``python/sglang/global_epoch.py``
(GlobalEpoch singleton, 10 s window), designed fresh: we use a lazy,
lock-free monotonic-clock derivation instead of a ticker thread so that unit
tests can advance time deterministically without sleeping.
"""

from __future__ import annotations

import time

TIME_WINDOW_LENGTH = 10.0  # seconds per epoch window


class GlobalEpoch:
    """Monotonic epoch counter derived from a monotonic clock.

    ``value`` is ``floor((now - start) / window)``.  ``advance()`` lets tests
    (and the attack-stat unit tests) push the epoch forward without sleeping.
    """

    def __init__(self, window: float = TIME_WINDOW_LENGTH):
        self.window = float(window)
        self._start = time.monotonic()
        self._offset = 0  # test-controlled manual advancement
        self._pinned = None  # multi-host follower: leader-broadcast value

    @property
    def value(self) -> int:
        if self._pinned is not None:
            return self._pinned
        return int((time.monotonic() - self._start) / self.window) + self._offset

    def pin(self, value: int) -> None:
        """Multi-host followers: the epoch is whatever the leader last
        broadcast over the control-plane op stream — local wall clocks
        are never consulted again, so eviction/attack-window decisions
        (mem_cache/radix_cache.py) are identical on every node.  Kept
        monotonic: a late/reordered pin can never move the epoch back."""
        v = int(value)
        if self._pinned is None or v > self._pinned:
            self._pinned = v

    def advance(self, n: int = 1) -> int:
        """Manually advance the epoch by ``n`` windows (testing hook)."""
        self._offset += n
        return self.value

    def set_window(self, seconds: float) -> None:
        """--safekv-epoch-seconds: epoch length for attack-window stats
        (reference TIME_WINDOW_LENGTH, global_epoch.py:10)."""
        cur = self.value
        self.window = float(seconds)
        self._start = time.monotonic()
        self._offset = cur  # keep the counter monotonic across the change

    def reset(self) -> None:
        self._start = time.monotonic()
        self._offset = 0
        self._pinned = None

    def __int__(self) -> int:
        return self.value


global_epoch = GlobalEpoch()
