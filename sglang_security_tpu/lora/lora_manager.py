"""Multi-LoRA batched serving.

Re-creates the reference's LoRA stack (``srt/lora/lora_manager.py:44``,
GPU LoRAMemoryPool, patched layers, triton sgemm backends) TPU-first:

  * Adapters (HF PEFT format) load into a device-resident slot pool of
    stacked low-rank factors per target projection:
      A: [slots, L, H_in, r_max]   B: [slots, L, r_max, N_out]
    padded to the pool's r_max so every adapter shares one shape.
  * Application happens inside the jitted step: per-token slot ids ride
    the ForwardBatch, and each projection adds
    ``sum_s mask_s * ((x * mask_s) @ A_s) @ B_s * scale_s`` — a short
    unrolled loop of tiny rank-r matmuls (the role of the reference's
    segment-gather triton sgemm), fully fused by XLA.
  * Slot assignment/LRU is host-side; the scheduler enforces
    max_loras_per_batch at admission like the reference
    (``scheduler.py:1465-1480``).

Targets covered: q/k/v (into the merged qkv columns), o, gate/up (into
merged gate_up), down.  TP>1 requires column re-interleaving of B and is
deferred (tp_size==1 asserted at load).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

TARGETS = ("qkv", "o", "gate_up", "down")


class LoRAManager:
    def __init__(self, model, config, max_loras_per_batch: int = 8,
                 max_rank: int = 64, dtype=None):
        import jax.numpy as jnp

        self.model = model
        self.tp_size = model.tp_size
        self.config = config
        self.max_slots = max_loras_per_batch
        self.max_rank = max_rank
        self.dtype = dtype or jnp.bfloat16
        self._path_to_slot: Dict[str, int] = {}
        self._slot_paths: List[Optional[str]] = [None] * self.max_slots
        self._lru: List[str] = []
        # running requests pinning each slot; only ref==0 slots may be
        # evicted (reference scheduler.py:1465-1480 max_loras_per_batch)
        self.slot_refs: List[int] = [0] * self.max_slots
        self.pool = None  # lazy: {target: {"A": [S,L,K,r], "B": [S,L,r,N]}}
        self.scales = np.zeros(self.max_slots, np.float32)

    # ------------------------------------------------------------- pool
    def _dims(self):
        cfg = self.config
        H, hd = cfg.hidden_size, cfg.head_dim
        return {
            "qkv": (H, (cfg.num_q_heads + 2 * cfg.num_kv_heads) * hd),
            "o": (cfg.num_q_heads * hd, H),
            "gate_up": (H, 2 * cfg.intermediate_size),
            "down": (cfg.intermediate_size, H),
        }

    def _init_pool(self):
        import jax.numpy as jnp

        L = self.config.num_layers
        r = self.max_rank
        self.pool = {}
        for t, (k, n) in self._dims().items():
            self.pool[t] = {
                "A": jnp.zeros((self.max_slots, L, k, r), self.dtype),
                "B": jnp.zeros((self.max_slots, L, r, n), self.dtype),
            }

    # ------------------------------------------------------------- load
    def acquire_slot(self, lora_path: str) -> Optional[int]:
        """Returns the adapter's slot (refcount incremented), loading it if
        needed; None when every slot is pinned by a running request
        (caller defers the req).  Callers MUST pair each successful
        acquire with release_slot when the request finishes/retracts."""
        if lora_path in self._path_to_slot:
            self._touch(lora_path)
            slot = self._path_to_slot[lora_path]
            self.slot_refs[slot] += 1
            return slot
        if self.pool is None:
            self._init_pool()
        # find a free slot, else the least-recently-used *unpinned* one
        slot = None
        for s, p in enumerate(self._slot_paths):
            if p is None:
                slot = s
                break
        if slot is None:
            for victim in self._lru:
                vs = self._path_to_slot[victim]
                if self.slot_refs[vs] == 0:
                    slot = self._path_to_slot.pop(victim)
                    self._lru.remove(victim)
                    break
            if slot is None:
                return None  # all slots referenced by running requests
        self._load_into_slot(lora_path, slot)
        self._path_to_slot[lora_path] = slot
        self._slot_paths[slot] = lora_path
        self._touch(lora_path)
        self.slot_refs[slot] += 1
        return slot

    def release_slot(self, slot: int) -> None:
        if 0 <= slot < self.max_slots and self.slot_refs[slot] > 0:
            self.slot_refs[slot] -= 1

    def _touch(self, path: str) -> None:
        if path in self._lru:
            self._lru.remove(path)
        self._lru.append(path)

    def _load_into_slot(self, lora_path: str, slot: int) -> None:
        import jax.numpy as jnp
        from safetensors import safe_open

        cfg_path = os.path.join(lora_path, "adapter_config.json")
        with open(cfg_path) as f:
            acfg = json.load(f)
        r = acfg["r"]
        alpha = acfg.get("lora_alpha", r)
        assert r <= self.max_rank, (r, self.max_rank)
        self.scales[slot] = alpha / r

        st_path = os.path.join(lora_path, "adapter_model.safetensors")
        f = safe_open(st_path, framework="flax")
        tensors = {k: f.get_tensor(k) for k in f.keys()}

        def find(layer, proj, which):
            for k, v in tensors.items():
                if f"layers.{layer}." in k and f"{proj}.lora_{which}" in k:
                    return jnp.asarray(v).astype(jnp.float32)
            return None

        cfg = self.config
        L = cfg.num_layers
        hd = cfg.head_dim
        dims = self._dims()
        for target in TARGETS:
            K, N = dims[target]
            A = np.zeros((L, K, self.max_rank), np.float32)
            B = np.zeros((L, self.max_rank, N), np.float32)
            for li in range(L):
                # merged projections use a block-diagonal low-rank factor:
                # A = [A_q | A_k | A_v] (columns), B = blockdiag(B_q, B_k,
                # B_v) mapped onto the merged output columns — exact.
                if target == "qkv":
                    assert 3 * r <= self.max_rank, (r, self.max_rank)
                    col = 0
                    for j, (proj, width) in enumerate((
                        ("q_proj", cfg.num_q_heads * hd),
                        ("k_proj", cfg.num_kv_heads * hd),
                        ("v_proj", cfg.num_kv_heads * hd),
                    )):
                        a = find(li, proj, "A")  # [r, H]
                        b = find(li, proj, "B")  # [width, r]
                        if a is not None and b is not None:
                            A[li, :, j * r : (j + 1) * r] = np.asarray(a).T
                            B[li, j * r : (j + 1) * r, col : col + width] = (
                                np.asarray(b).T
                            )
                        col += width
                elif target == "gate_up":
                    assert 2 * r <= self.max_rank
                    col = 0
                    for j, (proj, width) in enumerate((
                        ("gate_proj", cfg.intermediate_size),
                        ("up_proj", cfg.intermediate_size),
                    )):
                        a = find(li, proj, "A")
                        b = find(li, proj, "B")
                        if a is not None and b is not None:
                            A[li, :, j * r : (j + 1) * r] = np.asarray(a).T
                            B[li, j * r : (j + 1) * r, col : col + width] = (
                                np.asarray(b).T
                            )
                        col += width
                else:
                    proj = {"o": "o_proj", "down": "down_proj"}[target]
                    a = find(li, proj, "A")
                    b = find(li, proj, "B")
                    if a is not None and b is not None:
                        A[li, :, :r] = np.asarray(a).T
                        B[li, :r, :] = np.asarray(b).T
            if self.tp_size > 1 and target in ("qkv", "gate_up"):
                B = B[:, :, self._merged_col_perm(target)]
            self.pool[target]["A"] = (
                self.pool[target]["A"].at[slot].set(jnp.asarray(A, self.dtype))
            )
            self.pool[target]["B"] = (
                self.pool[target]["B"].at[slot].set(jnp.asarray(B, self.dtype))
            )
        logger.info("loaded LoRA %s into slot %d (r=%d)", lora_path, slot, r)

    def _merged_col_perm(self, target: str) -> np.ndarray:
        """Column permutation putting a merged projection's GLOBAL
        [w0 | w1 | ...] layout into the base's per-shard interleaved
        order (layers/linear.py merge_for_tp), so contiguous
        tp-sharding of B's N dim matches the base weight shards."""
        cfg = self.config
        hd = cfg.head_dim
        if target == "qkv":
            widths = (cfg.num_q_heads * hd, cfg.num_kv_heads * hd,
                      cfg.num_kv_heads * hd)
        else:  # gate_up
            widths = (cfg.intermediate_size, cfg.intermediate_size)
        offs = np.cumsum((0,) + widths)[:-1]
        perm = []
        for sshard in range(self.tp_size):
            for off, w in zip(offs, widths):
                n = w // self.tp_size
                perm.extend(range(off + sshard * n, off + (sshard + 1) * n))
        return np.asarray(perm)

    def lora_pspecs(self):
        """PartitionSpecs for step_params() under a tp mesh: merged
        column-parallel targets shard B's output columns (interleaved
        at load to match the base shards); row-parallel targets shard
        A's input dim — the partial [T, r] products sum in the layer's
        existing output psum."""
        from jax.sharding import PartitionSpec as P

        specs = {}
        for t in TARGETS:
            if t in ("qkv", "gate_up"):
                specs[t] = {"A": P(None, None, None, None),
                            "B": P(None, None, None, "tp")}
            else:  # o, down
                specs[t] = {"A": P(None, None, "tp", None),
                            "B": P(None, None, None, None)}
        specs["scale"] = P()
        return specs

    # --------------------------------------------------------- step input
    def step_params(self):
        """Pytree passed into the jitted step: per-layer-scannable factors.

        Leaves reshaped to [L, slots, ...] so lax.scan slices per layer.
        """
        import jax.numpy as jnp

        if self.pool is None:
            return None
        out = {}
        for t, ab in self.pool.items():
            out[t] = {
                "A": jnp.swapaxes(ab["A"], 0, 1),  # [L, S, K, r]
                "B": jnp.swapaxes(ab["B"], 0, 1),  # [L, S, r, N]
            }
        out["scale"] = jnp.asarray(self.scales)
        return out


def apply_lora(x, lp_lora, target: str, lora_ids, scales):
    """Inside-jit application: x [T, K] (+ lora dicts for this layer)."""
    import jax.numpy as jnp

    A = lp_lora[target]["A"]  # [S, K, r]
    B = lp_lora[target]["B"]  # [S, r, N]
    S = A.shape[0]
    out = 0.0
    for s in range(S):
        mask = (lora_ids == s).astype(x.dtype)[:, None]
        xa = jnp.dot(x * mask, A[s], preferred_element_type=jnp.float32)
        out = out + jnp.dot(
            xa.astype(x.dtype), B[s], preferred_element_type=jnp.float32
        ) * scales[s]
    return out
