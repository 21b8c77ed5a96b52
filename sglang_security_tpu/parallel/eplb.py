"""Expert Parallelism Load Balancer (EPLB) + expert distribution stats.

TPU-native re-creation of the reference's EPLB stack
(``srt/managers/eplb_manager.py:18``, ``expert_distribution.py:40``,
``expert_location.py``, ``eplb_algorithms/deepseek.py`` — itself the
public DeepSeek EPLB recipe): record per-expert routed-token counts,
periodically compute a balanced physical placement (replicating hot
experts into redundant slots and packing replicas onto devices), and
remap routing so each (token, k) pair targets one replica.

Differences by design:
  * counts leave the jitted step via ``jax.experimental.io_callback``
    (the XLA-native analog of the reference's eager forward hooks);
  * the physical placement is applied by gathering the stacked expert
    weight tensors along the expert dim (one XLA gather per layer
    group) instead of NCCL weight shuffles;
  * routing remap happens inside the jitted step with two small device
    arrays (``log2phy [E, R]``, ``logcnt [E]``) — see
    ``layers/moe.moe_ffn``.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# --------------------------------------------------------------- algorithms
def balanced_packing(
    weight: np.ndarray, num_packs: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack ``n`` weighted items into ``num_packs`` packs of exactly
    ``n/num_packs`` items each, greedily (heaviest item first, least
    loaded pack with free capacity). Returns (pack_index, rank_in_pack),
    both [L, n]."""
    weight = np.asarray(weight, np.float64)
    L, n = weight.shape
    assert n % num_packs == 0, (n, num_packs)
    cap = n // num_packs
    if cap == 1:
        return (
            np.tile(np.arange(n), (L, 1)),
            np.zeros((L, n), np.int64),
        )
    pack_index = np.full((L, n), -1, np.int64)
    rank_in_pack = np.full((L, n), -1, np.int64)
    for i in range(L):
        loads = np.zeros(num_packs)
        fill = np.zeros(num_packs, np.int64)
        for item in np.argsort(-weight[i]):
            open_packs = np.flatnonzero(fill < cap)
            pack = open_packs[np.argmin(loads[open_packs])]
            pack_index[i, item] = pack
            rank_in_pack[i, item] = fill[pack]
            loads[pack] += weight[i, item]
            fill[pack] += 1
    return pack_index, rank_in_pack


def replicate_experts(
    weight: np.ndarray, num_phy: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assign ``num_phy - E`` redundant replicas, each time to the
    logical expert with the highest per-replica load. Returns
    (phy2log [L, P], replica_rank [L, P], logcnt [L, E])."""
    weight = np.asarray(weight, np.float64)
    L, E = weight.shape
    assert num_phy >= E
    phy2log = np.tile(np.arange(num_phy), (L, 1))
    rank = np.zeros((L, num_phy), np.int64)
    logcnt = np.ones((L, E), np.int64)
    rows = np.arange(L)
    for p in range(E, num_phy):
        hot = np.argmax(weight / logcnt, axis=-1)  # [L]
        phy2log[:, p] = hot
        rank[:, p] = logcnt[rows, hot]
        logcnt[rows, hot] += 1
    return phy2log, rank, logcnt


def rebalance_experts(
    weight: np.ndarray,  # [L, E] logical expert loads
    num_physical_experts: int,
    num_devices: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global (non-hierarchical) EPLB: replicate hot experts into the
    redundant slots, then balanced-pack all physical replicas onto
    devices so each holds exactly P/num_devices. Returns
    (phy2log [L, P], log2phy [L, E, R] padded with -1, logcnt [L, E])
    where physical id p lives on device p // (P / num_devices)."""
    weight = np.asarray(weight, np.float64)
    L, E = weight.shape
    assert num_physical_experts % num_devices == 0
    phy2log, phyrank, logcnt = replicate_experts(
        weight, num_physical_experts
    )
    # pack replicas (weighted by their share of the expert's load)
    rep_load = np.take_along_axis(weight / logcnt, phy2log, axis=1)
    pack_index, rank_in_pack = balanced_packing(rep_load, num_devices)
    per_dev = num_physical_experts // num_devices
    new_pos = pack_index * per_dev + rank_in_pack  # [L, P]
    final_phy2log = np.full_like(phy2log, -1)
    np.put_along_axis(final_phy2log, new_pos, phy2log, axis=1)
    final_rank = np.full_like(phyrank, -1)
    np.put_along_axis(final_rank, new_pos, phyrank, axis=1)
    R = int(logcnt.max())
    log2phy = np.full((L, E, R), -1, np.int64)
    for i in range(L):
        for p in range(num_physical_experts):
            log2phy[i, final_phy2log[i, p], final_rank[i, p]] = p
    return final_phy2log, log2phy, logcnt


# ----------------------------------------------------------------- recorder
class ExpertDistributionRecorder:
    """Accumulates per-layer logical-expert token counts from inside the
    jitted step (``moe_ffn`` stats callback). Layers are identified by
    call order within a forward pass — the scheduler runs passes
    serially and the callback is ordered, matching the reference's
    per-layer gatherer (expert_distribution.py:40)."""

    def __init__(self, num_moe_layers: int, num_experts: int,
                 window: int = 1000):
        self.L, self.E = num_moe_layers, num_experts
        self.window = window
        self._lock = threading.Lock()
        self._buf = np.zeros((window, num_moe_layers, num_experts), np.int64)
        self._pass = 0
        self._layer = 0
        self.recording = True

    def on_layer_counts(self, counts) -> None:
        """io_callback target: one [E] count vector per MoE layer call."""
        if not self.recording:
            return
        with self._lock:
            c = np.asarray(counts)
            slot = self._pass % self.window
            if self._layer == 0:
                self._buf[slot] = 0
            self._buf[slot, self._layer % self.L] = c[: self.E]
            self._layer += 1
            if self._layer % self.L == 0:
                self._layer = 0
                self._pass += 1

    @property
    def num_passes(self) -> int:
        return self._pass

    def dump(self) -> np.ndarray:
        """Summed logical counts [L, E] over the recorded window."""
        with self._lock:
            return self._buf.sum(axis=0)

    def reset(self) -> None:
        with self._lock:
            self._buf[:] = 0
            self._pass = 0
            self._layer = 0


# ------------------------------------------------------------------ manager
class EPLBManager:
    """Periodically recomputes the physical expert placement from the
    recorder and applies it via ``apply_fn(phy2log, log2phy, logcnt)``
    (reference eplb_manager.py:40 rebalance)."""

    def __init__(
        self,
        recorder: ExpertDistributionRecorder,
        num_physical_experts: int,
        num_devices: int,
        rebalance_every: int = 1000,
        apply_fn=None,
    ):
        self.recorder = recorder
        self.P = num_physical_experts
        self.D = num_devices
        self.every = rebalance_every
        self.apply_fn = apply_fn
        self.rebalances = 0
        self._last_pass = 0

    def on_forward_end(self) -> bool:
        p = self.recorder.num_passes
        if p - self._last_pass < self.every:
            return False
        self._last_pass = p
        self.rebalance()
        return True

    def rebalance(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        counts = self.recorder.dump().astype(np.float64)
        counts += 1e-3  # unseen experts keep a deterministic order
        phy2log, log2phy, logcnt = rebalance_experts(counts, self.P, self.D)
        self.rebalances += 1
        logger.info(
            "EPLB rebalance #%d: max/mean device load %.3f",
            self.rebalances, _device_imbalance(counts, phy2log, logcnt, self.D),
        )
        if self.apply_fn is not None:
            self.apply_fn(phy2log, log2phy, logcnt)
        return phy2log, log2phy, logcnt


def _device_imbalance(
    weight: np.ndarray, phy2log: np.ndarray, logcnt: np.ndarray,
    num_devices: int,
) -> float:
    """max/mean per-device load under the placement (1.0 = perfect)."""
    L, P = phy2log.shape
    per_dev = P // num_devices
    rep_load = np.take_along_axis(
        weight / logcnt, phy2log, axis=1
    )  # [L, P]
    dev_load = rep_load.reshape(L, num_devices, per_dev).sum(-1)
    return float((dev_load.max(1) / np.maximum(dev_load.mean(1), 1e-9)).mean())
