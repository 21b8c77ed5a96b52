"""Bucketed-jit model runner.

The TPU analog of the reference's ``ModelRunner``
(``srt/model_executor/model_runner.py:131``) + ``CudaGraphRunner``
(``cuda_graph_runner.py:192``) in one: XLA's compile-once model replaces
CUDA graphs, so "capture" is just jitting the step at a fixed bucket of
(tokens, seqs, pages-per-seq, block_q) and "replay" is calling it.  The
KV pool is donated through every step so XLA updates it in place.

Owns: model + params, KV pool sizing from device memory, the jit cache,
and the sampling PRNG chain.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.layers.sampler import SamplingTensors, sample, compute_logprobs
from sglang_security_tpu.mem_cache.kv_pool import KVCachePool
from sglang_security_tpu.model_executor.forward_batch import ForwardBatch
from sglang_security_tpu.model_loader import load_model
from sglang_security_tpu.server_args import ServerArgs
from sglang_security_tpu.utils import (
    cdiv,
    get_dtype,
    next_bucket,
    round_up,
    use_interpret_mode,
)

logger = logging.getLogger(__name__)

PREFILL_BLOCK_Q = 128


def _pad_bool(a, n):
    out = np.zeros(n, bool)
    out[: len(a)] = a
    return out


def _pad_f32(a, n):
    out = np.zeros(n, np.float32)
    out[: len(a)] = a
    return out


@dataclass
class BatchPlan:
    """Host-side (numpy, unpadded) description of one step."""

    is_decode: bool
    token_ids: np.ndarray  # [T]
    positions: np.ndarray  # [T]
    slots: np.ndarray  # [T]
    q_starts: np.ndarray  # [S] (aligned rows, decode: arange)
    q_lens: np.ndarray  # [S]
    kv_lens: np.ndarray  # [S]
    page_indices: List[np.ndarray]  # per-seq page lists (ragged)
    # sampling (per seq)
    temperature: np.ndarray
    top_k: np.ndarray
    top_p: np.ndarray
    min_p: np.ndarray
    presence_penalty: Optional[np.ndarray] = None  # [S]
    frequency_penalty: Optional[np.ndarray] = None
    repetition_penalty: Optional[np.ndarray] = None
    penalty_slots: Optional[np.ndarray] = None  # [S] i32, -1 = no penalties
    vocab_mask: Optional[np.ndarray] = None  # [S, V] bool (grammar)
    out_rows: Optional[np.ndarray] = None  # [R] override (spec verify)
    lora_ids: Optional[np.ndarray] = None  # [T] adapter slot per token
    ft_rows: Optional[np.ndarray] = None  # [R] EAGLE feature-table rows
    # multimodal: image items feeding this chunk (ordered) + per-token
    # feature-row mapping (-1 = text token)
    mm_items: Optional[list] = None
    mm_rows: Optional[np.ndarray] = None  # [T] i32
    mrope_positions: Optional[np.ndarray] = None  # [3, T] (Qwen-VL prefill)
    dp_shards: Optional[np.ndarray] = None  # [S] dp-attention shard per seq
    bias_tokens: Optional[np.ndarray] = None  # [S, NB] OpenAI logit_bias ids
    bias_values: Optional[np.ndarray] = None  # [S, NB] additive biases
    lp_targets: Optional[np.ndarray] = None  # [T] prompt-logprob targets
    # custom logit processors: [(name, row_mask [S], {param: [S]})]
    custom_procs: Optional[list] = None
    # EAGLE tree verify: per-seq dense-block attention mask over the
    # verify rows (ancestor closure + self) and the committed prefix
    # length for the paged non-causal pass
    tree_mask: Optional[np.ndarray] = None  # [S, bq, bq] bool
    tree_prefix_kv_lens: Optional[np.ndarray] = None  # [S] i32
    # speculative verify: parent sampling-row of each row (-1 = root)
    spec_parents: Optional[np.ndarray] = None  # [R] i32
    # cross-attention VLMs (mllama): per-seq vision-KV slot (-1 = no
    # image) and valid vision-token count
    cross_slots: Optional[np.ndarray] = None  # [S] i32
    cross_lens: Optional[np.ndarray] = None  # [S] i32


@dataclass
class DecodeHandle:
    """A dispatched (not yet materialized) multi-step decode round.

    ``toks``/``lps`` are on-device [num_steps, S] arrays in the padded
    (dp-remapped) row layout; ``last_tokens`` feeds the next chained
    round's step 0 (the overlap scheduler's device-resident future
    token ids, reference ``tp_worker_overlap_thread.py:71-76``)."""

    toks: object  # jax.Array [K, S]
    lps: object  # jax.Array [K, S]
    out_slot: Optional[np.ndarray]
    S_real: int
    S: int
    num_steps: int

    @property
    def last_tokens(self):
        return self.toks[self.num_steps - 1]


@dataclass
class PrefillHandle:
    """A dispatched (not yet materialized) prefill chunk.

    Prefill analog of ``DecodeHandle`` (VERDICT r3 §2.1 noted prefill
    dispatch was still serial): the scheduler dispatches chunk N+1 and
    only then materializes chunk N, so per-chunk host work + dispatch
    latency hide under device compute.  ``lp_dev`` carries the prompt
    token logprobs device array when the request asked for them."""

    toks: object  # jax.Array [S]
    lps: object  # jax.Array [S]
    out_slot: Optional[np.ndarray]
    S_real: int
    lp_dev: object = None  # jax.Array [T] or None


class ModelRunner:
    def __init__(self, server_args: ServerArgs, mesh=None, devices=None):
        """``mesh``/``devices``: explicit placement for engine-level DP
        replicas; by default tp_size > 1 builds a (1, tp) mesh over the
        first tp_size local devices and the whole step runs under
        shard_map with TP collectives inside the model (the serving-path
        analog of the reference's per-rank TP scheduler processes,
        ``entrypoints/engine.py:537-603`` + ``parallel_state.py:1102``)."""
        self.server_args = server_args
        sa = server_args
        self.dp_attn_size = 1
        if sa.enable_dp_attention:
            # DP attention (reference dp_attention.py:33): requests shard
            # over the dp mesh axis -- each dp group holds its own slice
            # of the batch and of the KV pool's token dim, attention runs
            # per group (TP within the group), and the final hidden
            # states all-gather over dp for sampling.  Dense FFN weights
            # stay dp-replicated/tp-sharded: with the token rows already
            # dp-sharded, the FFN is data-parallel over dp with ZERO
            # extra collectives (XLA mesh makes the reference's
            # gather/scatter unnecessary for dense layers).
            assert sa.dp_size > 1, (
                "enable_dp_attention needs dp_size > 1 (attention-dp "
                "groups within one engine)"
            )
            assert sa.pp_size == 1, "dp attention + pp not wired yet"
            assert not sa.lora_paths, "dp attention + LoRA not wired yet"
            assert not sa.enable_hierarchical_cache
            self.dp_attn_size = sa.dp_size
        if sa.sp_size > 1:
            raise NotImplementedError("sp_size > 1 is not implemented yet")
        if sa.ep_size not in (1, sa.tp_size):
            raise ValueError(
                "experts shard over the tp mesh axis; set ep_size equal to "
                f"tp_size (got ep_size={sa.ep_size}, tp_size={sa.tp_size})"
            )
        self.tp_size = sa.tp_size
        self.pp_size = sa.pp_size
        if sa.pp_size > 1:
            if sa.unroll_layers:
                sa.unroll_layers = False  # pp scans stacked layer shards
            assert not sa.lora_paths, "LoRA is not supported with pp yet"
            assert sa.speculative_algorithm is None, (
                "speculative decoding is not supported with pp yet"
            )
        if mesh is None and (
            sa.tp_size > 1 or sa.pp_size > 1 or self.dp_attn_size > 1
        ):
            from sglang_security_tpu.parallel.shardings import build_mesh

            mesh = build_mesh(
                tp_size=sa.tp_size, dp_size=self.dp_attn_size,
                pp_size=sa.pp_size, devices=devices,
            )
        self.mesh = mesh
        self.dtype = get_dtype(server_args.dtype)
        self.interpret = use_interpret_mode()
        if server_args.compilation_cache_dir:
            import os

            path = os.path.expanduser(server_args.compilation_cache_dir)
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        t0 = time.time()
        from sglang_security_tpu.layers.linear import set_default_group_size

        set_default_group_size(server_args.quantization_group_size)
        self.model, self.params, self.config = load_model(
            server_args.model_path,
            load_format=server_args.load_format,
            quantization=server_args.quantization,
            dtype=server_args.dtype,
            download_dir=server_args.download_dir,
            tp_size=self.tp_size,
            revision=server_args.revision,
            lm_head_quantization=server_args.lm_head_quantization,
        )
        if server_args.context_length:
            # --context-length overrides the checkpoint's max positions
            # (reference model_config context_length handling)
            self.config.max_position = server_args.context_length
        logger.info("model loaded in %.1fs", time.time() - t0)
        self.eplb_manager = None
        self.eplb_recorder = None
        if (
            sa.enable_eplb
            or sa.ep_num_redundant_experts
            or sa.enable_expert_distribution_recorder
        ):
            self._init_eplb(sa)
        if sa.enable_double_sparsity:
            self._init_double_sparsity(sa)
        self._pspecs = None
        self._kv_pspec = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from sglang_security_tpu.parallel.shardings import (
                kv_pspec,
                param_pspecs,
                shard_params,
                unroll_pspecs,
            )

            if self.pp_size > 1:
                assert self.config.num_layers % self.pp_size == 0, (
                    f"num_layers={self.config.num_layers} must divide by "
                    f"pp_size={self.pp_size}"
                )
            self._pspecs = param_pspecs(self.params, pp=self.pp_size > 1)
            self.params = shard_params(self.params, self.mesh, self._pspecs)
            self._kv_pspec = kv_pspec(
                self.config.kv_cache_num_heads, self.tp_size,
                pp=self.pp_size > 1, dp=self.dp_attn_size > 1,
            )
        if server_args.unroll_layers:
            self.params = self.model.unroll_params(self.params)
            if self._pspecs is not None:
                from sglang_security_tpu.parallel.shardings import (
                    unroll_pspecs,
                )

                self._pspecs = unroll_pspecs(self._pspecs, self.params)
        self.page_size = server_args.page_size
        self.model.kv_page_size = self.page_size
        self.num_pages = self._profile_num_pages()
        if self.dp_attn_size > 1:
            # the pool's token dim shards over dp; keep shards equal
            self.num_pages -= self.num_pages % self.dp_attn_size
        kv_quant = (
            server_args.kv_cache_dtype
            if server_args.kv_cache_dtype in ("int8", "fp8", "fp8_static")
            else None
        )
        # fp8_static is a PLAIN pool of e4m3 (scale fixed at 1.0): no
        # scale arrays, so the fused-write decode kernel still applies
        kv_scaled = kv_quant in ("int8", "fp8")
        # Spec tree for ONE KV buffer as threaded through the step:
        # plain pool -> the [L, H, T, D] pspec; quantized pool ->
        # (data, per-(L, H, token) scale) tuple, the scale sharded on
        # the same head/token axes (north-star configs 3-4 need
        # quantized KV *and* mesh sharding together; VERDICT r2 weak #7).
        self._kv_specs = self._kv_pspec
        kv_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            if kv_scaled:
                scale_pspec = P(*tuple(self._kv_pspec)[:3])
                self._kv_specs = (self._kv_pspec, scale_pspec)
                kv_sharding = (
                    NamedSharding(self.mesh, self._kv_pspec),
                    NamedSharding(self.mesh, scale_pspec),
                )
            else:
                kv_sharding = NamedSharding(self.mesh, self._kv_pspec)
        # EAGLE tree verify: scratch rows after the paged region hold
        # draft-node K/V (one verify block per running request); the
        # accepted path is copied to canonical slots post-accept
        self.spec_scratch_rows = 0
        if (
            server_args.speculative_algorithm is not None
            and server_args.speculative_eagle_topk > 1
        ):
            rows = (
                1 + server_args.speculative_eagle_topk
                * server_args.speculative_num_steps
            )
            vbq = max(8, 1 << (rows - 1).bit_length())
            self.spec_scratch_rows = (
                server_args.max_running_requests or 256
            ) * vbq
            # stay inside the profiled HBM budget: scratch comes out of
            # the paged region
            self.num_pages -= cdiv(self.spec_scratch_rows, self.page_size)
        # cross-attention VLMs (mllama): vision KV pool, slot-per-request
        # page regions (models/mllama.py design note).  Sized before the
        # self pool so _profile_num_pages' budget is honored jointly.
        self.cross_pool = None
        if getattr(self.model, "has_cross_kv", False):
            assert self.pp_size == 1 and self.dp_attn_size == 1, (
                "cross-attention VLMs (mllama) support tp/dp-replica "
                "parallelism; pp and dp-attention are not wired"
            )
            assert server_args.speculative_algorithm is None, (
                "speculative decoding + cross-attention VLM not wired"
            )
            ppc = cdiv(self.model.cross_seq_len, self.page_size)
            self.cross_pages_per_slot = ppc
            self.cross_slots = server_args.max_running_requests or 256
            cross_pages = 1 + self.cross_slots * ppc  # page 0 = null
            self.cross_pool = KVCachePool(
                num_layers=self.model.num_cross_layers,
                num_kv_heads=self.config.kv_cache_num_heads,
                num_pages=cross_pages,
                page_size=self.page_size,
                head_dim=self.config.kv_cache_head_dim,
                dtype=self.dtype,
                sharding=kv_sharding,
            )
            # cross pages come out of the same HBM budget (a cross page
            # spans C layers vs the self pool's L)
            self.num_pages -= cdiv(
                cross_pages * self.model.num_cross_layers,
                getattr(self.model, "kv_num_layers",
                        self.config.num_layers),
            )
            logger.info(
                "cross-KV pool: %d slots x %d pages (%.2f GB)",
                self.cross_slots, ppc,
                self.cross_pool.mem_usage_bytes() / 1e9,
            )
        self.kv_pool = KVCachePool(
            num_layers=getattr(
                self.model, "kv_num_layers", self.config.num_layers
            ),
            num_kv_heads=self.config.kv_cache_num_heads,
            num_pages=self.num_pages,
            page_size=self.page_size,
            head_dim=self.config.kv_cache_head_dim,
            dtype=self.dtype,
            kv_quant_dtype=kv_quant,
            sharding=kv_sharding,
            extra_rows=self.spec_scratch_rows,
        )
        logger.info(
            "KV pool: %d pages x %d tokens (%.2f GB)",
            self.num_pages,
            self.page_size,
            self.kv_pool.mem_usage_bytes() / 1e9,
        )
        self._step_cache: Dict[tuple, callable] = {}
        # w4a8 decode (FIDELITY_r04.json gate): int8 activations on the
        # weight-int4 linears for DECODE traces only — 2x MXU rate on the
        # bandwidth-bound phase; prefill/verify keep bf16 activations
        self.decode_act_int8 = bool(
            server_args.decode_act_int8
            and (server_args.quantization or "") in ("int4", "awq", "gptq")
        )
        self.prefill_act_int8 = bool(
            server_args.prefill_act_int8
            and (server_args.quantization or "") in ("int4", "awq", "gptq")
        )
        self._last_input_lps = None  # prompt logprobs of the last prefill
        self.eagle = None  # EagleWorker when speculative_algorithm == EAGLE
        self._rng_key = jax.random.PRNGKey(server_args.random_seed)
        self.max_penalty_slots = (server_args.max_running_requests or 256) * 2
        self.penalty_counts = None  # lazy [max_slots, V] i32 device array
        self.lora_manager = None  # lazy (lora/lora_manager.py)
        # multimodal: content-hash -> device feature array [n_tok, H]
        # (reference mem_cache/multimodal_cache.py); LRU-capped
        self.mm_cache: Dict[int, jax.Array] = {}
        self.mm_cache_capacity = server_args.mm_feature_cache_size
        self._max_pps = max(
            server_args.max_seq_pages_buckets
        )  # hard cap pages/seq

    # ------------------------------------------------------------------
    def _init_double_sparsity(self, sa) -> None:
        """Token-level sparse decode attention (reference
        double_sparsity_backend.py): per-(layer, kv head) heavy channels
        from the ds channel config json, else the k-projection
        column-norm fallback (ops/double_sparsity.py)."""
        from sglang_security_tpu.ops.double_sparsity import (
            heavy_channels_from_config,
            heavy_channels_from_k_weights,
        )

        cfg = self.config
        r = min(sa.ds_heavy_channel_num, cfg.head_dim)
        L, Hkv = cfg.num_layers, cfg.num_kv_heads
        if sa.ds_channel_config_path:
            ch = heavy_channels_from_config(
                sa.ds_channel_config_path, L, Hkv, r
            )
        else:
            ch = None
            layers = self.params.get("layers")
            if isinstance(layers, dict):
                qkv = layers.get("qkv")
                if isinstance(qkv, dict) and "w" in qkv and self.tp_size == 1:
                    hd, Hq = cfg.head_dim, cfg.num_q_heads
                    w = np.asarray(jax.device_get(qkv["w"]))
                    ch = np.stack([
                        heavy_channels_from_k_weights(
                            w[li][:, Hq * hd:(Hq + Hkv) * hd], Hkv, hd, r
                        )
                        for li in range(w.shape[0])
                    ])
            if ch is None:
                logger.warning(
                    "double sparsity: no channel config and k weights "
                    "not inspectable (quantized/TP); using first %d dims",
                    r,
                )
                ch = np.tile(
                    np.arange(r, dtype=np.int32), (L, Hkv, 1)
                )
        self.model.ds_cfg = {
            "channels": jnp.asarray(ch, jnp.int32),
            "heavy_tokens": int(sa.ds_heavy_token_num),
            "threshold": int(sa.ds_sparse_decode_threshold),
        }
        logger.info(
            "double sparsity on: r=%d heavy_tokens=%d threshold=%d",
            r, sa.ds_heavy_token_num, sa.ds_sparse_decode_threshold,
        )

    def _init_eplb(self, sa) -> None:
        """EPLB: expand expert stacks with redundant replicas, install
        the logical->physical routing maps, and (optionally) the
        expert-distribution recorder + rebalance manager
        (reference eplb_manager.py:18, expert_location.py init_by_eplb).
        """
        import numpy as np

        from sglang_security_tpu.parallel.eplb import (
            EPLBManager,
            ExpertDistributionRecorder,
            rebalance_experts,
        )

        layers = self.params.get("layers")
        if not isinstance(layers, dict) or "experts_gate_up" not in layers:
            raise NotImplementedError(
                "EPLB/expert-distribution requires a MoE model with "
                "stacked expert weights (Mixtral/Qwen-MoE families)"
            )
        if sa.unroll_layers:
            sa.unroll_layers = False  # maps/replicas ride the scanned stack
        L, E = layers["experts_gate_up"].shape[:2]
        P = E + int(sa.ep_num_redundant_experts)
        D = max(sa.ep_size, 1)
        assert P % D == 0, (
            f"physical experts {P} must divide over ep_size={D}"
        )
        # uniform initial placement
        phy2log, log2phy, logcnt = rebalance_experts(
            np.ones((L, E)), P, D
        )
        self._eplb_shape = (L, E, P, D)
        self._apply_expert_location(phy2log, log2phy, logcnt, initial=True)
        if sa.enable_expert_distribution_recorder or sa.enable_eplb:
            if self.mesh is not None:
                logger.warning(
                    "expert-distribution recorder disabled under a device "
                    "mesh (host callback per shard not supported); EPLB "
                    "placement stays static"
                )
            else:
                self.eplb_recorder = ExpertDistributionRecorder(L, E)
                self.model.eplb_stats_cb = self.eplb_recorder.on_layer_counts
        if sa.enable_eplb and self.eplb_recorder is not None:
            self.eplb_manager = EPLBManager(
                self.eplb_recorder, P, D,
                rebalance_every=sa.eplb_rebalance_num_iterations,
                apply_fn=self._apply_expert_location,
            )

    def _apply_expert_location(
        self, phy2log, log2phy, logcnt, initial: bool = False
    ) -> None:
        """Re-gather the stacked expert weights into the new physical
        placement and refresh the routing maps. Replicas are exact
        copies, so logical weights are recovered from each expert's
        first replica of the previous placement (the XLA-gather analog
        of the reference's update_expert_location weight shuffle)."""
        import numpy as np

        layers = self.params["layers"]
        L = phy2log.shape[0]
        rows = np.arange(L)[:, None]
        for key in ("experts_gate_up", "experts_down",
                    "experts_gate_up_scale", "experts_down_scale"):
            if key not in layers:
                continue
            w = layers[key]
            if not initial:
                first = self._eplb_log2phy_np[:, :, 0]  # [L, E] prev
                w = w[rows, first]  # recover logical stacks
            layers[key] = jnp.asarray(np.asarray(w)[rows, phy2log])
        layers["eplb_log2phy"] = jnp.asarray(log2phy, jnp.int32)
        layers["eplb_logcnt"] = jnp.asarray(
            np.maximum(logcnt, 1), jnp.int32
        )
        self._eplb_log2phy_np = np.asarray(log2phy)
        self._eplb_last = (np.asarray(phy2log), np.asarray(log2phy),
                           np.asarray(logcnt))

    def _profile_num_pages(self) -> int:
        sa = self.server_args
        cfg = self.config
        if sa.kv_cache_dtype in ("int8", "fp8"):
            per_elem = 1
            scale_bytes = 2  # bf16 scale per (token, head)
        elif sa.kv_cache_dtype == "fp8_static":
            per_elem = 1
            scale_bytes = 0
        else:
            per_elem = jnp.dtype(self.dtype).itemsize
            scale_bytes = 0
        bytes_per_token = (
            cfg.num_layers
            * cfg.kv_cache_num_heads
            * (cfg.kv_cache_head_dim * per_elem + scale_bytes)
            * 2  # K and V
        )
        # TP shards weights 1/tp per chip; the KV pool shards over heads
        # when divisible (MLA replicates), so per-chip sizing scales both.
        kv_div = (
            self.tp_size
            if self.tp_size > 1
            and cfg.kv_cache_num_heads % self.tp_size == 0
            else 1
        )
        if sa.max_total_tokens is not None:
            tokens = sa.max_total_tokens
        else:
            try:
                stats = jax.local_devices()[0].memory_stats()
                total = stats.get("bytes_limit", 16e9)
            except Exception:
                total = 16e9
            param_bytes = sum(
                np.prod(l.shape) * l.dtype.itemsize
                for l in jax.tree.leaves(self.params)
            ) / max(self.tp_size, 1)
            budget = total * sa.mem_fraction_static - param_bytes
            tokens = max(
                int(budget // (bytes_per_token / kv_div)),
                4 * self.page_size,
            )
        return cdiv(tokens, self.page_size) + 1  # +1 for the null page

    # ------------------------------------------------------------------
    @staticmethod
    def _sampling_mode(plan: BatchPlan) -> str:
        from sglang_security_tpu.layers.sampler import APPROX_TOPK

        if (np.asarray(plan.temperature) == 0).all():
            return "greedy"
        unfiltered = (
            (np.asarray(plan.top_p) >= 1.0).all()
            and (np.asarray(plan.top_k) <= 0).all()
            and (np.asarray(plan.min_p) <= 0.0).all()
        )
        if unfiltered:
            return "categorical"
        # a requested top_k beyond the approximate window must take the
        # exact full-vocab-sort path or the user's k would silently clamp
        if (np.asarray(plan.top_k) > APPROX_TOPK).any():
            return "full"
        return "topk"

    def get_lora_manager(self):
        if self.lora_manager is None:
            from sglang_security_tpu.lora import LoRAManager

            self.lora_manager = LoRAManager(
                self.model, self.config,
                max_loras_per_batch=self.server_args.max_loras_per_batch,
                max_rank=(self.server_args.max_lora_rank or 64),
                dtype=self.dtype,
            )
        return self.lora_manager

    def _lora_step_params(self):
        if self.lora_manager is None or self.lora_manager.pool is None:
            return None
        return self.lora_manager.step_params()

    def _fb_pspecs(self):
        """ForwardBatch leaf specs: under dp attention every per-token /
        per-seq array shards its leading dim over dp (rows are grouped
        per shard by _pad_plan); otherwise replicated."""
        from jax.sharding import PartitionSpec as P

        if self.dp_attn_size <= 1:
            return P()
        return ForwardBatch(
            token_ids=P("dp"), positions=P("dp"), slots=P("dp"),
            q_starts=P("dp"), q_lens=P("dp"), kv_lens=P("dp"),
            page_indices=P("dp", None), out_rows=P("dp"),
            lora_ids=None, mm_embeds=None, mm_rows=None,
        )

    def _fb_cross_pspecs(self, fb):
        """Full-structure spec tree for a ForwardBatch carrying a cross
        pool: pool leaves get the KV pspec, everything else replicated
        (cross + dp-attention is unsupported, asserted at init)."""
        from jax.sharding import PartitionSpec as P

        kvp = self._kv_pspec

        def spec(path, leaf):
            names = [
                str(getattr(p, "name", getattr(p, "key", ""))) for p in path
            ]
            if "cross" in names and names[-1] in ("k_pages", "v_pages"):
                return kvp
            return P()

        import jax.tree_util as jtu

        return jtu.tree_map_with_path(spec, fb)

    def _cross_spec_dict(self):
        """Spec tree for a bare cross dict passed as its own argument
        (multi-step decode)."""
        from jax.sharding import PartitionSpec as P

        return {
            "k_pages": self._kv_pspec, "v_pages": self._kv_pspec,
            "page_indices": P(), "kv_lens": P(), "has_tok": P(),
        }

    def _shard_step(self, step, out_specs=None, fb_argnum=3,
                    extra_specs=None, lora_argnum=None):
        """Wrap a step function in shard_map over the runner's mesh: params
        and KV arrive pre-sharded (TP; dp-attention also shards the KV
        token dim and the ForwardBatch rows), everything else is
        replicated, and the model emits the collectives internally.
        ``extra_specs``: {argnum: PartitionSpec} overrides (dp-attention
        multi-step shards its raw per-seq arrays)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if out_specs is None:  # (tokens, logprobs, k, v, counts)
            out_specs = (P(), P(), self._kv_specs, self._kv_specs, P())

        def wrap(*args):
            n_in = len(args)
            in_specs = [self._pspecs, self._kv_specs, self._kv_specs] + [
                P(),
            ] * (n_in - 3)
            if self.dp_attn_size > 1 and fb_argnum is not None:
                in_specs[fb_argnum] = self._fb_pspecs()
            elif (
                fb_argnum is not None
                and isinstance(args[fb_argnum], ForwardBatch)
                and args[fb_argnum].cross is not None
            ):
                # cross-attention VLM: the vision KV pool rides in
                # fb.cross and shards over heads like the self pool
                in_specs[fb_argnum] = self._fb_cross_pspecs(
                    args[fb_argnum]
                )
            if extra_specs:
                for argnum, spec in extra_specs.items():
                    in_specs[argnum] = spec
            if (
                lora_argnum is not None
                and lora_argnum < n_in
                and args[lora_argnum] is not None
                and self.lora_manager is not None
            ):
                in_specs[lora_argnum] = self.lora_manager.lora_pspecs()
            return shard_map(
                step,
                mesh=self.mesh,
                in_specs=tuple(in_specs),
                out_specs=out_specs,
                check_vma=False,
            )(*args)

        return wrap

    @property
    def _dp_kwargs(self) -> dict:
        if self.dp_attn_size <= 1:
            return {}
        return dict(dp_axis="dp")

    @property
    def _tp_axis(self):
        return "tp" if self.mesh is not None else None

    @property
    def _pp_kwargs(self) -> dict:
        if self.pp_size <= 1:
            return {}
        return dict(
            pp_axis="pp",
            pp_size=self.pp_size,
            pp_microbatches=self.server_args.pp_microbatches or self.pp_size,
        )

    def _get_step(self, T: int, S: int, PPS: int, block_q: int, masked: bool,
                  penalized: bool = False, mode: str = "topk",
                  eagle: bool = False, prompt_lp: bool = False,
                  proc_names: tuple = (), tree: bool = False,
                  spec: bool = False):
        key = (T, S, PPS, block_q, masked, penalized, mode, eagle,
               prompt_lp, proc_names, tree, spec)
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        model = self.model
        interpret = self.interpret
        tp_size, tp_axis = self.tp_size, self._tp_axis
        pp_kwargs = self._pp_kwargs
        dp_kwargs = self._dp_kwargs

        if proc_names:
            from sglang_security_tpu.sampling.custom_processors import (
                get_custom_logit_processor,
            )

            proc_fns = tuple(
                get_custom_logit_processor(n) for n in proc_names
            )

        def step(params, k_pages, v_pages, fb, st, key, vocab_mask,
                 counts, slots, lora, proc_data=None, ft=None,
                 ft_rows=None):
            out = model.forward(
                params, k_pages, v_pages, fb, block_q=block_q,
                interpret=interpret, lora=lora,
                tp_size=tp_size, tp_axis=tp_axis,
                return_all=eagle or prompt_lp, **pp_kwargs, **dp_kwargs,
            )
            if eagle or prompt_lp:
                hidden, x_all, k_pages, v_pages = out
            else:
                hidden, k_pages, v_pages = out
                x_all = None
            logits = model.compute_logits(
                params, hidden, tp_axis=tp_axis
            )  # [S, V] f32
            if proc_names:
                # registered jax-traceable processors, row-masked per
                # request (reference custom logit processor batching)
                for fn, (mask, pdict) in zip(proc_fns, proc_data):
                    logits = jnp.where(
                        mask[:, None], fn(logits, pdict), logits
                    )
            row_counts = None
            if penalized:
                safe = jnp.clip(slots, 0, counts.shape[0] - 1)
                row_counts = jnp.where(
                    (slots >= 0)[:, None], counts[safe], 0
                )
            spec_extras = ()
            if spec:
                assert fb.spec_parents is not None
                # stochastic speculative verify: edge accept probs +
                # residual fallback samples (layers/sampler.py
                # spec_verify_sample; reference speculative_sampling.cu)
                from sglang_security_tpu.layers.sampler import (
                    spec_verify_sample,
                )

                R = logits.shape[0]
                fed = fb.token_ids[
                    jnp.clip(fb.out_rows, 0, fb.token_ids.shape[0] - 1)
                ]
                tokens, edge_prob, fallback = spec_verify_sample(
                    logits, st, key, fb.spec_parents, fed,
                    vocab_mask=vocab_mask, output_counts=row_counts,
                    mode=mode,
                )
                lp_full = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1
                )
                safe_parent = jnp.clip(fb.spec_parents, 0, R - 1)
                edge_lp = lp_full[safe_parent, jnp.clip(fed, 0)]
                fallback_lp = jnp.take_along_axis(
                    lp_full, fallback[:, None], axis=-1
                )[:, 0]
                spec_extras = (edge_prob, edge_lp, fallback, fallback_lp)
            else:
                tokens = sample(logits, st, key, vocab_mask=vocab_mask,
                                output_counts=row_counts, mode=mode)
                spec_extras = ()
            logprobs = compute_logprobs(logits, tokens)
            if penalized and not spec:
                # spec rounds update counts host-side post-accept:
                # rejected rows' samples must not count
                drop = jnp.where(slots < 0, counts.shape[0], slots)
                counts = counts.at[drop, tokens].add(1, mode="drop")
            if eagle:
                # stash this step's features in the flat feature table so
                # the draft phase reads them without a host round-trip.
                # EAGLE-1 features = post-norm selected hidden; EAGLE3
                # features = the 3-layer aux concat rows (x_all)
                if getattr(model, "eagle3_aux_layers", None):
                    feats = x_all[
                        jnp.clip(fb.out_rows, 0, x_all.shape[0] - 1)
                    ]
                else:
                    feats = hidden
                ft = ft.at[ft_rows].set(feats.astype(ft.dtype), mode="drop")
                return (tokens, logprobs, k_pages, v_pages, counts, ft,
                        x_all, *spec_extras)
            if prompt_lp:
                return tokens, logprobs, k_pages, v_pages, counts, x_all
            return (tokens, logprobs, k_pages, v_pages, counts,
                    *spec_extras)

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            out_specs = None
            spec_tail = (P(), P(), P(), P()) if spec else ()
            if eagle:
                # (+ ft, x_all): the feature table and all-row hidden
                # states are replicated (attention output is psum'd)
                out_specs = (P(), P(), self._kv_specs, self._kv_specs,
                             P(), P(), P(), *spec_tail)
            elif prompt_lp:
                out_specs = (P(), P(), self._kv_specs, self._kv_specs,
                             P(), P())
            elif spec:
                out_specs = (P(), P(), self._kv_specs, self._kv_specs,
                             P(), *spec_tail)
            step = self._shard_step(step, out_specs=out_specs,
                                    lora_argnum=9)
        # donate the KV pool (1, 2), penalty counts (7), feature table (11)
        donate = (1, 2, 7, 11) if eagle else (1, 2, 7)
        fn = jax.jit(step, donate_argnums=donate)
        self._step_cache[key] = fn
        logger.info(
            "compiling step T=%d S=%d PPS=%d block_q=%d tp=%d",
            T, S, PPS, block_q, tp_size,
        )
        return fn

    def _get_prompt_lp_fn(self, T: int):
        """Chunked prompt logprobs: log P(targets[t] | rows <= t) from
        the prefill's full hidden states (reference input_token_logprobs,
        schedule_batch extend_logprob machinery).  Row blocks of 128 keep
        the [block, V] logits transient small."""
        key = ("prompt_lp", T)
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        model = self.model
        CH = 128
        assert T % CH == 0, T

        def f(params, x_all, targets):
            def blk(i):
                h = jax.lax.dynamic_slice_in_dim(x_all, i * CH, CH)
                logits = model.compute_logits(params, h)  # [CH, V] f32
                t = jax.lax.dynamic_slice_in_dim(targets, i * CH, CH)
                lse = jax.nn.logsumexp(logits, axis=-1)
                tgt = jnp.take_along_axis(
                    logits, jnp.clip(t, 0)[:, None], axis=-1
                )[:, 0]
                return jnp.where(t >= 0, tgt - lse, 0.0)

            return jax.lax.map(
                blk, jnp.arange(T // CH, dtype=jnp.int32)
            ).reshape(T)

        fn = jax.jit(f)
        self._step_cache[key] = fn
        return fn

    # --------------------------------------------------------- multimodal
    def _get_mm_encode(self):
        """Jitted vision encode (retraces per pixel-batch bucket)."""
        fn = self._step_cache.get("mm_encode")
        if fn is None:
            model = self.model

            def enc(params, px):
                return model.encode_images(params, px)

            fn = jax.jit(enc)
            self._step_cache["mm_encode"] = fn
        return fn

    def _get_mm_encode_varlen(self):
        """Jitted per-image vision encode for dynamic-resolution towers
        (Qwen-VL); retraces per padded-patch-count bucket."""
        fn = self._step_cache.get("mm_encode_varlen")
        if fn is None:
            model = self.model

            def enc(params, patches, rot_freqs, win_seg, full_seg):
                return model.encode_image(
                    params, patches, rot_freqs, win_seg, full_seg
                )

            fn = jax.jit(enc)
            self._step_cache["mm_encode_varlen"] = fn
        return fn

    def _encode_varlen_item(self, it) -> jax.Array:
        """One dynamic-resolution image: permute patches to the tower's
        (window) order, pad the sequence to a power-of-two bucket, run
        the tower, and un-permute the merged output rows."""
        meta = it.vis_meta
        n = it.pixel_values.shape[0]
        Sp = 1 << max(6, (n - 1).bit_length())
        pd = it.pixel_values.shape[1]
        patches = np.zeros((Sp, pd), np.float32)
        patches[:n] = it.pixel_values[meta["perm"]]
        rot = np.zeros((Sp, meta["rot_freqs"].shape[1]), np.float32)
        rot[:n] = meta["rot_freqs"]
        win = np.full(Sp, -1, np.int32)
        win[:n] = meta["win_seg"]
        full = np.full(Sp, -1, np.int32)
        full[:n] = meta["full_seg"]
        out = self._get_mm_encode_varlen()(
            self.params, jnp.asarray(patches), jnp.asarray(rot),
            jnp.asarray(win), jnp.asarray(full),
        )
        return out[jnp.asarray(meta["inv_perm"])].astype(self.dtype)

    def prepare_mm(self, items) -> List[jax.Array]:
        """Encode any items missing from the feature cache (one bucketed
        vision-jit call for all of them) and return each item's device
        feature array [n_tok, H], in order.  The separate encode pass is
        the TPU-native form of the reference running the vision tower
        inside the LM forward (srt/models/llava.py): features become
        content-addressed and reusable across chunks/requests."""
        uniq, uniq_audio, seen = [], [], set()
        for it in items:
            if it.hash not in self.mm_cache and it.hash not in seen:
                seen.add(it.hash)
                if getattr(it, "modality", "image") == "audio":
                    uniq_audio.append(it)
                else:
                    uniq.append(it)
        if uniq and getattr(self.model, "varlen_vision", False):
            for it in uniq:
                self.mm_cache[it.hash] = self._encode_varlen_item(it)
        elif uniq:
            n_real = len(uniq)
            n = 1 << (n_real - 1).bit_length()  # bucket to power of 2
            px = np.zeros((n,) + uniq[0].pixel_values.shape, np.float32)
            for i, it in enumerate(uniq):
                px[i] = it.pixel_values
            feats = self._get_mm_encode()(self.params, jnp.asarray(px))
            feats = feats.astype(self.dtype)
            for i, it in enumerate(uniq):
                # slice per image; [n_tok, H] rows stay on device
                self.mm_cache[it.hash] = feats[i, : it.num_tokens]
        if uniq_audio:
            # audio clips: pad mel frames to a power-of-two bucket
            # (bounded retraces), mask padding via per-clip lengths
            n_real = len(uniq_audio)
            n = 1 << (n_real - 1).bit_length()
            fmax = max(it.pixel_values.shape[1] for it in uniq_audio)
            F = 1 << max(7, (fmax - 1).bit_length())
            n_mels = uniq_audio[0].pixel_values.shape[0]
            mels = np.zeros((n, n_mels, F), np.float32)
            lens = np.zeros(n, np.int32)
            for i, it in enumerate(uniq_audio):
                mels[i, :, : it.pixel_values.shape[1]] = it.pixel_values
                lens[i] = it.audio_len
            fn = self._step_cache.get("mm_encode_audio")
            if fn is None:
                model = self.model
                fn = jax.jit(
                    lambda p, m, l: model.encode_audio(p, m, l)
                )
                self._step_cache["mm_encode_audio"] = fn
            feats = fn(self.params, jnp.asarray(mels), jnp.asarray(lens))
            feats = feats.astype(self.dtype)
            for i, it in enumerate(uniq_audio):
                self.mm_cache[it.hash] = feats[i, : it.num_tokens]
        while len(self.mm_cache) > self.mm_cache_capacity:
            oldest = next(iter(self.mm_cache))
            if any(oldest == it.hash for it in items):
                break  # everything older is in use this step
            del self.mm_cache[oldest]
        out = []
        for it in items:
            f = self.mm_cache.pop(it.hash)
            self.mm_cache[it.hash] = f  # LRU touch (dict keeps order)
            out.append(f)
        return out

    def _pad_mm(self, plan: BatchPlan, T: int):
        """(mm_embeds [M, H] device, mm_rows [T] device) or (None, None).
        M is bucketed in whole-image units to bound retraces."""
        if plan.mm_rows is None or not plan.mm_items:
            return None, None
        if self.cross_pool is not None:
            # cross-attention VLM: vision feeds the cross-KV pool, not
            # token rows.  The pseudo-id row (radix-cache keyed) just
            # gets the real <|image|> token embedding back.
            emb = self._step_cache.get("cross_img_embed")
            if emb is None:
                tok = self.model.image_token_id
                emb = self.params["embed"][tok][None]  # [1, H]
                self._step_cache["cross_img_embed"] = emb
            rows = np.full(T, -1, np.int32)
            rows[: len(plan.mm_rows)] = np.where(
                np.asarray(plan.mm_rows) >= 0, 0, -1
            )
            return emb, jnp.asarray(rows)
        feats = self.prepare_mm(plan.mm_items)
        cat = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=0)
        m_real = cat.shape[0]
        tpi = max(f.shape[0] for f in feats)
        n_items = 1 << (len(feats) - 1).bit_length()
        M = max(n_items * tpi, m_real)
        if M > m_real:
            cat = jnp.pad(cat, ((0, M - m_real), (0, 0)))
        rows = np.full(T, -1, np.int32)
        rows[: len(plan.mm_rows)] = plan.mm_rows
        return cat, jnp.asarray(rows)

    def _build_cross(self, plan: BatchPlan, T: int, S: int, bq: int):
        """fb.cross for a cross-attention VLM batch: slot -> page region
        mapping (slot s owns pages [1 + s*ppc, 1 + (s+1)*ppc)), per-seq
        kv_lens (min 1: slotless rows attend the null page, then their
        contribution is zeroed via has_tok), and the per-token has-image
        mask."""
        ppc = self.cross_pages_per_slot
        PPSc = round_up(ppc, 8)
        slots = np.full(S, -1, np.int64)
        lens = np.zeros(S, np.int64)
        if plan.cross_slots is not None:
            n = len(plan.cross_slots)
            slots[:n] = plan.cross_slots
            lens[:n] = plan.cross_lens
        pi = np.zeros((S, PPSc), np.int32)
        has_seq = slots >= 0
        base = 1 + np.maximum(slots, 0) * ppc
        pi[:, :ppc] = np.where(
            has_seq[:, None],
            base[:, None] + np.arange(ppc)[None, :],
            0,
        )
        kv_lens = np.where(has_seq, lens, 1).astype(np.int32)
        has_tok = np.zeros(T, np.int32)
        if plan.is_decode:
            has_tok[: len(plan.kv_lens)] = has_seq[: len(plan.kv_lens)]
        else:
            for i, (qs, ql) in enumerate(zip(plan.q_starts, plan.q_lens)):
                if has_seq[i]:
                    has_tok[qs: qs + ql] = 1
        return {
            "k_pages": self.cross_pool.k_pages,
            "v_pages": self.cross_pool.v_pages,
            "page_indices": jnp.asarray(pi),
            "kv_lens": jnp.asarray(kv_lens),
            "has_tok": jnp.asarray(has_tok),
        }

    # ------------------------------------------- cross-KV encode + fill
    def _get_cross_encode(self):
        fn = self._step_cache.get("cross_encode")
        if fn is None:
            model = self.model

            def enc(params, tiles, ar_id, n_tiles):
                return model.encode_cross_states(
                    params, tiles, ar_id, n_tiles
                )

            if self.mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                enc = lambda *a, _e=enc: shard_map(  # noqa: E731
                    _e, mesh=self.mesh,
                    in_specs=(self._pspecs, P(), P(), P()),
                    out_specs=P(), check_vma=False,
                )(*a)
            fn = jax.jit(enc)
            self._step_cache["cross_encode"] = fn
        return fn

    def _get_cross_fill(self):
        fn = self._step_cache.get("cross_fill")
        if fn is None:
            model = self.model
            dtype = self.dtype
            region = self.cross_pages_per_slot * self.page_size

            def fill(params, ck, cv, states, off):
                k, v = model.cross_kv_fill(params, states, dtype=dtype)
                # [C, S_vis, Hkv, hd] -> pool layout [C, Hkv, tokens, hd]
                k = k.transpose(0, 2, 1, 3)
                v = v.transpose(0, 2, 1, 3)
                pad = region - k.shape[2]
                if pad:
                    k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
                ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, off, 0))
                cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, off, 0))
                return ck, cv

            if self.mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                kvp = self._kv_pspec

                def sharded_fill(*a, _f=fill):
                    return shard_map(
                        _f, mesh=self.mesh,
                        in_specs=(self._pspecs, kvp, kvp, P(), P()),
                        out_specs=(kvp, kvp), check_vma=False,
                    )(*a)

                fill = sharded_fill
            fn = jax.jit(fill, donate_argnums=(1, 2))
            self._step_cache["cross_fill"] = fn
        return fn

    def prepare_cross(self, fills) -> None:
        """Encode + fill vision KV for newly admitted image requests.
        ``fills``: [(MultimodalDataItem, slot)].  Projected states are
        content-hash cached (reference multimodal feature cache); the
        per-slot K/V fill always runs (slots are per-request)."""
        enc = self._get_cross_encode()
        fill = self._get_cross_fill()
        for it, slot in fills:
            states = self.mm_cache.get(("cross", it.hash))
            if states is None:
                meta = it.vis_meta
                states = enc(
                    self.params,
                    jnp.asarray(it.pixel_values),
                    jnp.int32(meta["aspect_ratio_id"]),
                    jnp.int32(meta["num_tiles"]),
                )
                self.mm_cache[("cross", it.hash)] = states
                while len(self.mm_cache) > self.mm_cache_capacity:
                    oldest = next(iter(self.mm_cache))
                    del self.mm_cache[oldest]
            off = (1 + slot * self.cross_pages_per_slot) * self.page_size
            ck, cv = fill(
                self.params, self.cross_pool.k_pages,
                self.cross_pool.v_pages, states, jnp.int32(off),
            )
            self.cross_pool.k_pages = ck
            self.cross_pool.v_pages = cv

    def _get_embed_step(self, T: int, S: int, PPS: int):
        """Prefill step returning L2-normalized last-token hidden states
        (Engine.encode / /v1/embeddings; reference Pooler last-token
        pooling, ``srt/layers/pooler.py``)."""
        key = ("embed", T, S, PPS)
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        model = self.model
        interpret = self.interpret
        tp_size, tp_axis = self.tp_size, self._tp_axis
        pp_kwargs = self._pp_kwargs
        dp_kwargs = self._dp_kwargs

        def step(params, k_pages, v_pages, fb):
            hidden, k_pages, v_pages = model.forward(
                params, k_pages, v_pages, fb, block_q=PREFILL_BLOCK_Q,
                interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
                **pp_kwargs, **dp_kwargs,
            )
            emb = model.pool(params, hidden)
            return emb, k_pages, v_pages

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            step = self._shard_step(
                step, out_specs=(P(), self._kv_specs, self._kv_specs)
            )
        fn = jax.jit(step, donate_argnums=(1, 2))
        self._step_cache[key] = fn
        return fn

    def execute_embedding(self, plan: BatchPlan) -> np.ndarray:
        if self.dp_attn_size > 1:
            raise NotImplementedError(
                "embedding requests + dp attention not wired yet"
            )
        """Run an embedding prefill; returns [S_real, H] f32 pooled
        (last-token, L2-normalized) embeddings."""
        sa = self.server_args
        S_real = len(plan.q_lens)
        T_real = len(plan.token_ids)
        T = next_bucket(max(T_real, PREFILL_BLOCK_Q), sa.prefill_token_buckets)
        T = round_up(T, PREFILL_BLOCK_Q)
        S = T // PREFILL_BLOCK_Q
        pps_real = max((len(p) for p in plan.page_indices), default=1)
        PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)
        fb, _, _ = self._pad_plan(plan, T, S, PPS)
        fn = self._get_embed_step(T, S, PPS)
        emb, k_pages, v_pages = fn(
            self.params, self.kv_pool.k_pages, self.kv_pool.v_pages, fb
        )
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        return np.asarray(jax.device_get(emb))[:S_real]

    def _get_multi_step(self, B: int, PPS: int, num_steps: int,
                        penalized: bool = False, mode: str = "topk"):
        """Decode `num_steps` tokens per host round-trip: lax.scan chains
        sampled tokens on device (the TPU-native form of the reference's
        future-token-ids overlap scheduler, tp_worker_overlap_thread.py:43)."""
        key = ("multi", B, PPS, num_steps, penalized, mode)
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        model = self.model
        interpret = self.interpret
        tp_size, tp_axis = self.tp_size, self._tp_axis
        pp_kwargs = self._pp_kwargs
        dp_kwargs = self._dp_kwargs

        dp_size = self.dp_attn_size

        def multi(params, k_pages, v_pages, tokens0, positions0, slot_mat,
                  kv_lens0, page_indices, st, key, counts, pslots, lora,
                  lora_ids0, cross=None):
            # slot_mat: [num_steps, B] precomputed KV slots per step.
            # Under dp attention the per-seq arrays arrive dp-sharded
            # (B_loc = B/dp rows each) while sampled tokens stay
            # replicated: each shard slices out its own row block.
            B_loc = positions0.shape[0]

            def body(carry, xs):
                tokens, k_pages, v_pages, step_i, key, counts = carry
                slots = xs
                tok_in = tokens
                if dp_size > 1:
                    tok_in = jax.lax.dynamic_slice_in_dim(
                        tokens, jax.lax.axis_index("dp") * B_loc, B_loc
                    )
                fb = ForwardBatch(
                    token_ids=tok_in,
                    positions=positions0 + step_i,
                    slots=slots,
                    q_starts=jnp.arange(B_loc, dtype=jnp.int32),
                    q_lens=(kv_lens0 > 0).astype(jnp.int32),
                    kv_lens=jnp.where(kv_lens0 > 0, kv_lens0 + step_i, 0),
                    page_indices=page_indices,
                    out_rows=jnp.arange(B_loc, dtype=jnp.int32),
                    lora_ids=lora_ids0,
                    cross=cross,
                )
                hidden, k_pages, v_pages = model.forward(
                    params, k_pages, v_pages, fb, block_q=1,
                    interpret=interpret, lora=lora,
                    tp_size=tp_size, tp_axis=tp_axis, **pp_kwargs, **dp_kwargs,
                )
                logits = model.compute_logits(params, hidden, tp_axis=tp_axis)
                key, sub = jax.random.split(key)
                row_counts = None
                if penalized:
                    safe = jnp.clip(pslots, 0, counts.shape[0] - 1)
                    row_counts = jnp.where(
                        (pslots >= 0)[:, None], counts[safe], 0
                    )
                nxt = sample(logits, st, sub, output_counts=row_counts,
                             mode=mode)
                lps = compute_logprobs(logits, nxt)
                if penalized:
                    drop = jnp.where(pslots < 0, counts.shape[0], pslots)
                    counts = counts.at[drop, nxt].add(1, mode="drop")
                return (nxt, k_pages, v_pages, step_i + 1, key, counts), (nxt, lps)

            (tokens, k_pages, v_pages, _, _, counts), (all_toks, all_lps) = jax.lax.scan(
                body,
                (tokens0, k_pages, v_pages, jnp.int32(0), key, counts),
                slot_mat,
            )
            return all_toks, all_lps, k_pages, v_pages, counts

        if self.mesh is not None:
            extra = None
            if self.dp_attn_size > 1:
                from jax.sharding import PartitionSpec as P

                extra = {4: P("dp"), 5: P(None, "dp"), 6: P("dp"),
                         7: P("dp", None)}
            if self.cross_pool is not None:
                extra = dict(extra or {})
                extra[14] = self._cross_spec_dict()
            multi = self._shard_step(multi, fb_argnum=None,
                                     extra_specs=extra, lora_argnum=12)
        fn = jax.jit(multi, donate_argnums=(1, 2, 10))
        self._step_cache[key] = fn
        logger.info(
            "compiling multi-step decode B=%d PPS=%d steps=%d", B, PPS, num_steps
        )
        return fn

    SPEC_BLOCK_Q = 8

    # ------------------------------------------------ fused spec rounds
    def _get_fused_spec_step(self, S: int, PPS: int, L_hist: int,
                             K: int, R: int, ngram: int):
        """Device-resident speculative serving loop (greedy NGRAM):
        ``R`` rounds of [prompt-lookup draft -> chain verify -> accept ->
        history update] inside ONE jit.  Host-driven speculative rounds
        are serial (each draft needs the previous round's tokens), so on
        a dispatch-latency-heavy link every round pays a full
        round-trip; device-side drafting amortizes R rounds per trip —
        the speculative analog of the multi-step decode scan.  The
        reference's equivalent loop (eagle_worker.py round loop) is
        host-driven because GPU dispatch is ~free; on TPU the loop
        belongs in the program."""
        key = ("fusedspec", S, PPS, L_hist, K, R, ngram)
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        model = self.model
        interpret = self.interpret
        page_size = self.page_size
        bq = self.SPEC_BLOCK_Q
        assert K + 1 <= bq
        T = S * bq

        def draft_one(hist, n):
            """Prompt-lookup (spec_algorithm.NgramDrafter.draft): most
            recent earlier occurrence of the trailing `ngram` tokens;
            propose the K tokens that followed."""
            idx = jnp.arange(L_hist - 1)
            a = hist[jnp.clip(n - 2, 0, L_hist - 1)]
            b = hist[jnp.clip(n - 1, 0, L_hist - 1)]
            match = (hist[:-1] == a) & (
                jnp.roll(hist, -1)[:-1] == b
            ) & (idx <= n - 3)
            j = jnp.max(jnp.where(match, idx, -1))
            has = j >= 0
            dpos = j + ngram + jnp.arange(K)
            draft = hist[jnp.clip(dpos, 0, L_hist - 1)]
            # no match: propose repeats of the last token (the verify
            # keeps output lossless either way)
            return jnp.where(has & (dpos < n), draft, b)

        def round_body(params, carry, _):
            hist, n, k_pages, v_pages, pi = carry
            alive = n > 0
            draft = jax.vmap(draft_one)(hist, n)  # [S, K]
            last = jax.vmap(
                lambda h, m: h[jnp.clip(m - 1, 0, L_hist - 1)]
            )(hist, n)
            fed = jnp.concatenate([last[:, None], draft], axis=1)  # [S, K+1]
            pos0 = n - 1  # position of the fed last-committed token
            j = jnp.arange(K + 1)
            positions = pos0[:, None] + j[None, :]  # [S, K+1]
            page = positions // page_size
            slot = jax.vmap(
                lambda p_row, pg_row: p_row[
                    jnp.clip(pg_row, 0, PPS - 1)
                ] * page_size
            )(pi, page) + positions % page_size
            row_ok = alive[:, None]
            slot = jnp.where(row_ok, slot, -1)

            def pad_rows(x, fill):
                out = jnp.full((S, bq), fill, x.dtype)
                return out.at[:, : K + 1].set(x).reshape(T)

            fb = ForwardBatch(
                token_ids=pad_rows(fed, 0),
                positions=pad_rows(jnp.maximum(positions, 0), 0),
                slots=pad_rows(slot, -1),
                q_starts=jnp.arange(S, dtype=jnp.int32) * bq,
                q_lens=jnp.where(alive, K + 1, 0).astype(jnp.int32),
                kv_lens=jnp.where(alive, n + K, 0).astype(jnp.int32),
                page_indices=pi,
                out_rows=(
                    jnp.arange(S, dtype=jnp.int32)[:, None] * bq + j
                ).reshape(-1),
            )
            hidden, k_pages, v_pages = model.forward(
                params, k_pages, v_pages, fb, block_q=bq,
                interpret=interpret, spec_verify=True,
            )
            logits = model.compute_logits(params, hidden)  # [S*(K+1), V]
            t = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lp = jnp.max(jax.nn.log_softmax(logits, axis=-1), axis=-1)
            t = t.reshape(S, K + 1)
            lp = lp.reshape(S, K + 1).astype(jnp.float32)
            # chain accept: leading exact matches of draft vs target
            ok = jnp.cumprod(
                (draft == t[:, :-1]).astype(jnp.int32), axis=1
            )
            n_acc = jnp.sum(ok, axis=1)  # [S] accepted draft tokens
            commit_mask = (j[None, :] <= n_acc[:, None]) & alive[:, None]
            out_t = jnp.where(commit_mask, t, -1)
            out_lp = jnp.where(commit_mask, lp, 0.0)
            # history scatter + length advance
            wpos = jnp.where(commit_mask, n[:, None] + j[None, :], L_hist)
            hist = jax.vmap(
                lambda h, p, v: h.at[p].set(v, mode="drop")
            )(hist, wpos, t)
            n = jnp.where(alive, n + n_acc + 1, n)
            return (hist, n, k_pages, v_pages, pi), (out_t, out_lp)

        def fused(params, k_pages, v_pages, hist0, len0, page_indices):
            body = functools.partial(round_body, params)
            (hist, n, k_pages, v_pages, _), (toks, lps) = jax.lax.scan(
                body, (hist0, len0, k_pages, v_pages, page_indices),
                None, length=R,
            )
            # hist/n returned so chained calls keep the token history
            # device-resident (pipelined fused rounds: no host rebuild,
            # no round-trip on the dispatch path)
            return toks, lps, hist, n, k_pages, v_pages

        # single-chip path (the scheduler gates on mesh is None; the
        # sharded serving paths keep the host-driven spec rounds)
        fn = jax.jit(fused, donate_argnums=(1, 2, 3, 4))
        self._step_cache[key] = fn
        logger.info(
            "compiling fused spec rounds S=%d PPS=%d K=%d R=%d",
            S, PPS, K, R,
        )
        return fn

    def spec_fused_dispatch(self, reqs, K: int, R: int, ngram: int,
                            state=None):
        """Dispatch R device-resident speculative rounds WITHOUT
        blocking (the spec analog of ``dispatch_decode_multi``).

        With ``state`` (from a previous handle), the token history and
        per-seq lengths stay device-resident — call N+1 chains off call
        N's on-device outputs, so dispatch never waits on a host
        round-trip.  The page table re-uploads each call (the host owns
        allocation; an upload rides the dispatch at no RTT cost).
        Pages for 2*R*(K+1) tokens of overshoot must be preallocated by
        the caller (in-flight call + this call, worst case).

        Returns a handle for :meth:`spec_fused_wait`; ``handle[-1]`` is
        the state tuple for the next chained dispatch."""
        sa = self.server_args
        S_real = len(reqs)
        S = next_bucket(S_real, sa.decode_bs_buckets)
        pps_real = max(len(r.pages) for r in reqs)
        PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)
        pi = np.zeros((S, PPS), np.int32)
        for i, r in enumerate(reqs):
            m = min(len(r.pages), PPS)
            pi[i, :m] = r.pages[:m]
        if state is None:
            # size the history to the CURRENT lengths plus pipeline
            # slack (in-flight call + this call + two more before the
            # scheduler's rebucket guard triggers), NOT the whole
            # remaining generation: the per-round ngram match scan is
            # O(L_hist), so one request with a huge max_new_tokens must
            # not inflate every round (ADVICE r4).  Power-of-2 buckets
            # mean long generations rebucket (drain + recompile) once
            # per doubling.
            max_len = max(r.seq_len for r in reqs) + 4 * R * (K + 1)
            L_hist = 1 << max(8, (max_len - 1).bit_length())
            hist0 = np.zeros((S, L_hist), np.int32)
            len0 = np.zeros(S, np.int32)
            for i, r in enumerate(reqs):
                ids = r.all_ids()
                hist0[i, : len(ids)] = ids
                len0[i] = r.seq_len
            hist, n = jnp.asarray(hist0), jnp.asarray(len0)
        else:
            hist, n, L_hist = state
            assert hist.shape[0] == S, (hist.shape, S)
        fn = self._get_fused_spec_step(S, PPS, L_hist, K, R,
                                       ngram=ngram)
        act_int8 = bool(int(os.environ.get(
            "SGLANG_TPU_FUSED_SPEC_ACT_INT8", "0"
        )))
        if act_int8:  # A/B knob: w4a8 verify matmuls
            from sglang_security_tpu.layers.linear import set_act_override

            set_act_override("int8")
        try:
            toks, lps, hist, n, k_pages, v_pages = fn(
                self.params, self.kv_pool.k_pages, self.kv_pool.v_pages,
                hist, n, jnp.asarray(pi),
            )
        finally:
            if act_int8:
                set_act_override(None)
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        return (toks, lps, S_real, (hist, n, L_hist))

    @staticmethod
    def spec_fused_wait(handle):
        """Materialize a dispatched fused-spec call: (tokens
        [R, S_real, K+1] with -1 padding, logprobs [R, S_real, K+1])."""
        toks, lps, S_real, _ = handle
        toks = np.asarray(jax.device_get(toks))[:, :S_real]
        lps = np.asarray(jax.device_get(lps))[:, :S_real]
        return toks, lps

    def execute_spec_fused(self, reqs, K: int, R: int, ngram: int):
        """Synchronous fused spec rounds (dispatch + wait)."""
        handle = self.spec_fused_dispatch(reqs, K, R, ngram)
        return self.spec_fused_wait(handle)

    # ------------------------------------------- fused EAGLE rounds
    def _get_fused_eagle_step(self, S: int, PPS: int, K: int, R: int,
                              Amax: int, eagle3: bool):
        """Device-resident EAGLE/NEXTN rounds (greedy chain): ``R``
        rounds of [draft-extend over last round's accepted (token,
        feature) pairs -> K-step greedy draft chain -> target verify ->
        chain accept -> feature handoff] inside ONE jit.  The host-driven
        EAGLE loop pays a dispatch round-trip for the draft call AND the
        verify call every round (measured 0.087x non-spec on the axon
        chip); here the only host work per R rounds is the dispatch and
        the token materialization — the EAGLE analog of
        ``_get_fused_spec_step`` (reference round loop:
        ``srt/speculative/eagle_worker.py:273`` host-driven because GPU
        dispatch is ~free; on TPU the loop belongs in the program).

        Feature plumbing per round: verify returns every row's hidden
        (EAGLE-1/NEXTN: post-final-norm; EAGLE3: the 3-layer aux concat),
        and the accepted rows' features become the next round's
        draft-extend inputs — the feature table is only touched at
        dispatch (seed) and drain (writeback)."""
        key = ("fusedeagle", S, PPS, K, R, Amax, eagle3)
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        model = self.model
        dmodel = self.eagle.model
        interpret = self.interpret
        page_size = self.page_size
        bq = self.SPEC_BLOCK_Q
        assert K + 1 <= bq and K + 1 <= Amax
        T = S * bq
        jrow = jnp.arange(K + 1)

        def slot_of(pi_row, pos):
            page = pos // page_size
            return (
                pi_row[jnp.clip(page, 0, PPS - 1)] * page_size
                + pos % page_size
            )

        def round_body(params, dparams, pi, carry, _):
            pend_f, pend_t, counts, n, k_pages, v_pages, kd, vd = carry
            alive = n > 0
            # ---- draft-extend: one block_q=Amax ragged batch over the
            # pending accepted pairs (token t_{p+1}, feature f_p)
            rows = jnp.arange(Amax)
            feats = pend_f.reshape(S * Amax, -1)
            valid = (rows[None, :] < counts[:, None]) & alive[:, None]
            q_starts = jnp.arange(S, dtype=jnp.int32) * Amax
            pos_rows = n[:, None] - counts[:, None] - 1 + rows[None, :]
            slot_rows = jax.vmap(
                lambda p_row, pos: slot_of(p_row, pos)
            )(pi, jnp.maximum(pos_rows, 0))
            fb_ext = ForwardBatch(
                token_ids=pend_t.reshape(S * Amax),
                positions=jnp.maximum(pos_rows, 0).reshape(-1),
                slots=jnp.where(valid, slot_rows, -1).reshape(-1),
                q_starts=q_starts,
                q_lens=jnp.where(alive, counts, 0).astype(jnp.int32),
                kv_lens=(jnp.maximum(n - 1, 0) * alive).astype(jnp.int32),
                page_indices=pi,
                out_rows=q_starts + jnp.maximum(counts - 1, 0),
            )
            g, kd, vd = dmodel.forward_draft(
                dparams, kd, vd, feats, fb_ext,
                block_q=Amax, interpret=interpret,
            )  # [S, Hf] chain seed features

            # ---- K-step greedy draft chain
            def chain_body(carry2, i):
                g, kd, vd = carry2
                d = dmodel.draft_greedy(model, params, dparams, g)
                pos = jnp.maximum(n - 1 + i, 0)
                cslot = jax.vmap(slot_of)(pi, pos[:, None])[:, 0]
                fb_c = ForwardBatch(
                    token_ids=d,
                    positions=pos,
                    slots=jnp.where(alive, cslot, -1),
                    q_starts=jnp.arange(S, dtype=jnp.int32),
                    q_lens=alive.astype(jnp.int32),
                    kv_lens=((n + i) * alive).astype(jnp.int32),
                    page_indices=pi,
                    out_rows=jnp.arange(S, dtype=jnp.int32),
                )
                g, kd, vd = dmodel.forward_draft(
                    dparams, kd, vd, g, fb_c,
                    block_q=1, interpret=interpret,
                )
                return (g, kd, vd), d

            (g, kd, vd), drafts = jax.lax.scan(
                chain_body, (g, kd, vd), jnp.arange(K)
            )
            draft = drafts.T  # [S, K]

            # ---- target verify (same layout as the fused ngram verify)
            last = jax.vmap(
                lambda t, c: t[jnp.clip(c - 1, 0, Amax - 1)]
            )(pend_t, counts)
            fed = jnp.concatenate([last[:, None], draft], axis=1)
            pos0 = n - 1
            positions = pos0[:, None] + jrow[None, :]  # [S, K+1]
            vslot = jax.vmap(
                lambda p_row, pos: slot_of(p_row, pos)
            )(pi, jnp.maximum(positions, 0))
            vslot = jnp.where(alive[:, None], vslot, -1)

            def pad_rows(x, fill):
                out = jnp.full((S, bq), fill, x.dtype)
                return out.at[:, : K + 1].set(x).reshape(T)

            out_rows = (
                jnp.arange(S, dtype=jnp.int32)[:, None] * bq + jrow
            ).reshape(-1)
            fb_v = ForwardBatch(
                token_ids=pad_rows(fed, 0),
                positions=pad_rows(jnp.maximum(positions, 0), 0),
                slots=pad_rows(vslot, -1),
                q_starts=jnp.arange(S, dtype=jnp.int32) * bq,
                q_lens=jnp.where(alive, K + 1, 0).astype(jnp.int32),
                kv_lens=jnp.where(alive, n + K, 0).astype(jnp.int32),
                page_indices=pi,
                out_rows=out_rows,
            )
            out = model.forward(
                params, k_pages, v_pages, fb_v, block_q=bq,
                interpret=interpret, spec_verify=True,
                return_all=eagle3,
            )
            if eagle3:
                hidden, x_all, k_pages, v_pages = out
                featsrc = x_all[jnp.clip(out_rows, 0, T - 1)]
            else:
                hidden, k_pages, v_pages = out
                featsrc = hidden
            logits = model.compute_logits(params, hidden)
            t = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lp = jnp.max(jax.nn.log_softmax(logits, axis=-1), axis=-1)
            t = t.reshape(S, K + 1)
            lp = lp.reshape(S, K + 1).astype(jnp.float32)
            ok = jnp.cumprod(
                (draft == t[:, :-1]).astype(jnp.int32), axis=1
            )
            n_acc = jnp.sum(ok, axis=1)
            commit_mask = (jrow[None, :] <= n_acc[:, None]) & alive[:, None]
            out_t = jnp.where(commit_mask, t, -1)
            out_lp = jnp.where(commit_mask, lp, 0.0)
            # next round's pending pairs = this round's committed rows
            featsrc = featsrc.reshape(S, K + 1, -1)
            pend_f = jnp.zeros_like(pend_f).at[:, : K + 1].set(
                jnp.where(
                    commit_mask[..., None],
                    featsrc.astype(pend_f.dtype), 0,
                )
            )
            pend_t = jnp.zeros_like(pend_t).at[:, : K + 1].set(
                jnp.where(commit_mask, t, 0)
            )
            counts = jnp.where(alive, n_acc + 1, counts)
            n = jnp.where(alive, n + n_acc + 1, n)
            return (
                (pend_f, pend_t, counts, n, k_pages, v_pages, kd, vd),
                (out_t, out_lp),
            )

        def fused(params, dparams, k_pages, v_pages, kd, vd,
                  pend_f, pend_t, counts, n, pi):
            body = functools.partial(round_body, params, dparams, pi)
            carry, (toks, lps) = jax.lax.scan(
                body, (pend_f, pend_t, counts, n, k_pages, v_pages,
                       kd, vd),
                None, length=R,
            )
            pend_f, pend_t, counts, n, k_pages, v_pages, kd, vd = carry
            return (toks, lps, pend_f, pend_t, counts, n,
                    k_pages, v_pages, kd, vd)

        fn = jax.jit(fused, donate_argnums=(2, 3, 4, 5, 6))
        self._step_cache[key] = fn
        logger.info(
            "compiling fused eagle rounds S=%d PPS=%d K=%d R=%d", S, PPS,
            K, R,
        )
        return fn

    def eagle_fused_dispatch(self, reqs, K: int, R: int, state=None):
        """Dispatch R device-resident EAGLE rounds without blocking.
        With ``state`` (from the previous handle) the pending (token,
        feature) pairs and lengths stay device-resident, so chained
        dispatches never wait on a host round-trip.  Returns a handle
        for :meth:`spec_fused_wait`; ``handle[-1]`` is the next chained
        dispatch's state."""
        worker = self.eagle
        sa = self.server_args
        Amax = worker.rows_per_slot
        S_real = len(reqs)
        S = next_bucket(S_real, sa.decode_bs_buckets)
        pps_real = max(len(r.pages) for r in reqs)
        PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)
        pi = np.zeros((S, PPS), np.int32)
        for i, r in enumerate(reqs):
            m = min(len(r.pages), PPS)
            pi[i, :m] = r.pages[:m]
        if state is None:
            pend_t0 = np.zeros((S, Amax), np.int32)
            counts0 = np.zeros(S, np.int32)
            n0 = np.zeros(S, np.int32)
            ft_rows = np.full((S, Amax), worker.ft.shape[0], np.int32)
            for i, r in enumerate(reqs):
                pend = r.spec_pending[-min(len(r.spec_pending), Amax):]
                counts0[i] = len(pend)
                pend_t0[i, : len(pend)] = pend
                n0[i] = r.seq_len
                ft_rows[i] = worker.ft_row(r.spec_slot, 0) + np.arange(
                    Amax
                )
            gather = self._step_cache.get("eagle_ft_gather")
            if gather is None:
                gather = jax.jit(
                    lambda ft, rows: ft[
                        jnp.clip(rows, 0, ft.shape[0] - 1)
                    ]
                )
                self._step_cache["eagle_ft_gather"] = gather
            pend_f = gather(worker.ft, jnp.asarray(ft_rows))
            pend_t, counts, n = (
                jnp.asarray(pend_t0), jnp.asarray(counts0),
                jnp.asarray(n0),
            )
        else:
            pend_f, pend_t, counts, n = state
            assert pend_f.shape[0] == S, (pend_f.shape, S)
        fn = self._get_fused_eagle_step(
            S, PPS, K, R, Amax, eagle3=worker.is_eagle3
        )
        (toks, lps, pend_f, pend_t, counts, n, k_pages, v_pages,
         kd, vd) = fn(
            self.params, worker.params,
            self.kv_pool.k_pages, self.kv_pool.v_pages,
            worker.pool.k_pages, worker.pool.v_pages,
            pend_f, pend_t, counts, n, jnp.asarray(pi),
        )
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        worker.pool.k_pages = kd
        worker.pool.v_pages = vd
        return (toks, lps, S_real, (pend_f, pend_t, counts, n))

    def eagle_fused_writeback(self, reqs, state) -> None:
        """Sync the device-resident fused-EAGLE state back into the
        host-path structures (feature table + ``spec_pending``) so the
        host-driven rounds/prefill can resume after a drain."""
        worker = self.eagle
        Amax = worker.rows_per_slot
        pend_f, pend_t, counts, n = state
        S = pend_f.shape[0]
        ft_rows = np.full((S, Amax), worker.ft.shape[0], np.int32)
        for i, r in enumerate(reqs):
            if r.spec_slot >= 0:
                ft_rows[i] = worker.ft_row(r.spec_slot, 0) + np.arange(
                    Amax
                )
        scatter = self._step_cache.get("eagle_ft_scatter")
        if scatter is None:
            scatter = jax.jit(
                lambda ft, rows, f: ft.at[rows.reshape(-1)].set(
                    f.reshape(rows.size, -1).astype(ft.dtype),
                    mode="drop",
                ),
                donate_argnums=(0,),
            )
            self._step_cache["eagle_ft_scatter"] = scatter
        worker.ft = scatter(worker.ft, jnp.asarray(ft_rows), pend_f)
        pend_t = np.asarray(jax.device_get(pend_t))
        counts = np.asarray(jax.device_get(counts))
        for i, r in enumerate(reqs):
            c = int(counts[i])
            if c > 0:
                r.spec_pending = [int(t) for t in pend_t[i, :c]]

    def execute_spec_verify(
        self, plan: BatchPlan, rows_per_seq: int,
        block_q: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Target verify pass for speculative decoding: each sequence feeds
        [last_committed, *draft] (q_len = rows_per_seq) and logits are
        sampled at every fed position.  Chain verify is causal; tree
        verify (plan.tree_mask set) runs the prefix ⊕ dense-tree merged
        attention.  Returns ([R] tokens, logprobs) reshaped host-side by
        the caller."""
        sa = self.server_args
        bq = block_q or self.SPEC_BLOCK_Q
        assert rows_per_seq <= bq
        assert plan.spec_parents is not None
        S_real = len(plan.q_lens)
        S = next_bucket(S_real, sa.decode_bs_buckets)
        T = S * bq
        R = S * rows_per_seq
        pps_real = max((len(p) for p in plan.page_indices), default=1)
        PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)
        fb, st, vocab_mask = self._pad_plan(
            plan, T, S, PPS, block_q=bq, R=R, rows_per_seq=rows_per_seq
        )
        self._rng_key, sub = jax.random.split(self._rng_key)
        penalized, counts, pslots = self._get_penalty_state(plan, R)
        eagle_on = self.eagle is not None and plan.ft_rows is not None
        fn = self._get_step(
            T, R, PPS, bq, plan.vocab_mask is not None, penalized,
            self._sampling_mode(plan), eagle=eagle_on,
            tree=plan.tree_mask is not None, spec=True,
        )
        args = [
            self.params, self.kv_pool.k_pages, self.kv_pool.v_pages,
            fb, st, sub, vocab_mask, counts, pslots,
            self._lora_step_params() if plan.lora_ids is not None else None,
            None,  # proc_data (custom processors don't ride spec verify)
        ]
        if eagle_on:
            args += list(self._eagle_ft_args(plan.ft_rows, R))
            (tokens, logprobs, k_pages, v_pages, counts, ft, _,
             *extras) = fn(*args)
            self.eagle.ft = ft
        else:
            tokens, logprobs, k_pages, v_pages, counts, *extras = fn(*args)
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        if penalized:
            self.penalty_counts = counts
        R_real = S_real * rows_per_seq
        edge_prob, edge_lp, fallback, fallback_lp = extras
        # ONE host transfer: each device_get pays a full tunnel
        # round-trip (~35 ms on axon), and six of them made a spec round
        # ~6x more expensive than the verify compute itself.  f32 holds
        # token ids exactly (vocab << 2^24).
        packed = np.asarray(jax.device_get(jnp.stack([
            tokens.astype(jnp.float32),
            logprobs.astype(jnp.float32),
            edge_prob.astype(jnp.float32),
            edge_lp.astype(jnp.float32),
            fallback.astype(jnp.float32),
            fallback_lp.astype(jnp.float32),
        ])))
        return {
            "tokens": packed[0, :R_real].astype(np.int64),
            "logprobs": packed[1, :R_real],
            "edge_prob": packed[2, :R_real],
            "edge_lp": packed[3, :R_real],
            "fallback": packed[4, :R_real].astype(np.int64),
            "fallback_lp": packed[5, :R_real],
        }

    def penalty_add(self, slots: np.ndarray, tokens: np.ndarray) -> None:
        """Host-driven penalty-count update (spec rounds: only COMMITTED
        tokens count; the in-device per-step update is for plain decode).
        """
        if self.penalty_counts is None:
            return
        fn = self._step_cache.get("penalty_add")
        if fn is None:

            def add(counts, slots, tokens):
                return counts.at[slots, tokens].add(1, mode="drop")

            fn = jax.jit(add, donate_argnums=(0,))
            self._step_cache["penalty_add"] = fn
        # pad to a pow2 bucket (out-of-range slot rows are dropped) so
        # the jit does not retrace per round length
        n = max(8, 1 << (len(slots) - 1).bit_length())
        ns = self.penalty_counts.shape[0]  # out-of-range => mode="drop"
        slots = np.pad(np.asarray(slots, np.int32), (0, n - len(slots)),
                       constant_values=ns)
        tokens = np.pad(np.asarray(tokens, np.int32),
                        (0, n - len(tokens)))
        self.penalty_counts = fn(
            self.penalty_counts,
            jnp.asarray(slots),
            jnp.asarray(tokens),
        )

    def eagle_tree_commit(
        self,
        src_rows: np.ndarray,  # [N] scratch KV rows of accepted tree nodes
        dst_slots: np.ndarray,  # [N] canonical position slots (-1 = pad)
        ft_src: np.ndarray,  # [M] feature-table rows of accepted path
        ft_dst: np.ndarray,  # [M] compacted destination rows (-1 = pad)
    ) -> None:
        """Post-accept commit for tree verify: copy accepted draft-node
        K/V from the scratch region into canonical position slots (the
        paged kernels address KV strictly by position), and compact the
        captured features to rows 0..A-1 of each slot so the next round's
        draft-extend reads them contiguously.  One jit, a few hundred
        rows — noise next to a decode step."""
        fn = self._step_cache.get("tree_commit")
        if fn is None:

            def commit(k_pages, v_pages, ft, src, dst, fsrc, fdst):
                def cp(a):
                    n = a.shape[2]
                    d = jnp.where(dst < 0, n, dst)
                    return a.at[:, :, d].set(
                        a[:, :, src], mode="drop"
                    )

                k_pages = jax.tree.map(cp, k_pages)
                v_pages = jax.tree.map(cp, v_pages)
                fd = jnp.where(fdst < 0, ft.shape[0], fdst)
                ft = ft.at[fd].set(ft[fsrc], mode="drop")
                return k_pages, v_pages, ft

            fn = jax.jit(commit, donate_argnums=(0, 1, 2))
            self._step_cache["tree_commit"] = fn

        def padded(a, n, fill):
            out = np.full(n, fill, np.int32)
            out[: len(a)] = a
            return jnp.asarray(out)

        # fixed shapes (one compile): caps sized for a full batch
        sa = self.server_args
        n_kv = (sa.max_running_requests or 256) * max(
            1, sa.speculative_num_steps
        )
        n_ft = n_kv + (sa.max_running_requests or 256)
        k_pages, v_pages, ft = fn(
            self.kv_pool.k_pages, self.kv_pool.v_pages, self.eagle.ft,
            padded(np.maximum(src_rows, 0), n_kv, 0),
            padded(dst_slots, n_kv, -1),
            padded(np.maximum(ft_src, 0), n_ft, 0),
            padded(ft_dst, n_ft, -1),
        )
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        self.eagle.ft = ft

    def _eagle_ft_args(self, ft_rows: np.ndarray, R: int):
        ft = self.eagle.ft
        rows = np.full(R, ft.shape[0], np.int32)  # OOB rows drop
        rows[: len(ft_rows)] = ft_rows
        return ft, jnp.asarray(rows)

    def eagle_draft_prefill(self, draft_tok: np.ndarray) -> None:
        """Run the draft model over the prefill chunk just executed
        (reference eagle_worker.py forward_draft_extend)."""
        fb, T, S, PPS, x_all = self._eagle_prefill_ctx
        dt = np.zeros(T, np.int32)
        dt[: len(draft_tok)] = draft_tok
        self.eagle.draft_prefill(fb, x_all, dt, T, S, PPS)
        self._eagle_prefill_ctx = None

    def dispatch_decode_multi(
        self,
        plan: BatchPlan,
        slot_mat: np.ndarray,
        num_steps: int,
        token_ids_dev=None,
    ) -> "DecodeHandle":
        """Dispatch `num_steps` chained decode steps WITHOUT materializing
        the result — jax async dispatch returns immediately and the handle
        holds the on-device [K, S] token/logprob arrays.

        This is the TPU analog of the reference's overlap scheduler
        (``tp_worker_overlap_thread.py:43-76``): the scheduler chains
        round N+1 by passing ``handle.last_tokens`` (round N's final
        sampled tokens, still on device) as ``token_ids_dev`` — the
        device-resident "future token ids" — so host bookkeeping for
        round N overlaps round N+1's device compute.  ``token_ids_dev``
        must already be in the padded (and dp-remapped, if dp attention)
        row layout, which holds whenever the running batch and buckets
        are unchanged between rounds.

        plan fields describe step 0 exactly like a single-step decode
        plan (kv_lens includes the fed token); slot_mat[k, i] is request
        i's KV slot for the token fed at step k."""
        sa = self.server_args
        S_real = len(plan.kv_lens)
        out_slot = None
        if self.dp_attn_size > 1 and plan.dp_shards is not None:
            plan, out_slot, _, S = self._dp_remap_plan(plan)
            pps_real = max(
                (len(p) for p in plan.page_indices), default=1
            )
            PPS = round_up(
                next_bucket(pps_real, sa.max_seq_pages_buckets), 8
            )
            fb, st, _ = self._pad_plan(
                plan, S, S, PPS, dp_local=S // self.dp_attn_size
            )
            sm = np.full((num_steps, S), -1, np.int32)
            sm[:, out_slot] = slot_mat
        else:
            S = next_bucket(S_real, sa.decode_bs_buckets)
            pps_real = max((len(p) for p in plan.page_indices), default=1)
            PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)
            fb, st, _ = self._pad_plan(plan, S, S, PPS)
            sm = np.full((num_steps, S), -1, np.int32)
            sm[:, :S_real] = slot_mat
        self._rng_key, sub = jax.random.split(self._rng_key)
        penalized, counts, pslots = self._get_penalty_state(plan, S)
        if self.decode_act_int8:
            # trace-time switch: the multi-step decode trace (first call
            # compiles) takes the int8-activation linear path
            from sglang_security_tpu.layers.linear import set_act_override

            set_act_override("int8")
        try:
            fn = self._get_multi_step(
                S, PPS, num_steps, penalized, self._sampling_mode(plan)
            )
            step0_tokens = fb.token_ids
            if token_ids_dev is not None:
                assert token_ids_dev.shape == (S,), (token_ids_dev.shape, S)
                step0_tokens = token_ids_dev
            margs = [
                self.params,
                self.kv_pool.k_pages,
                self.kv_pool.v_pages,
                step0_tokens,
                fb.positions,
                jnp.asarray(sm),
                fb.kv_lens,
                fb.page_indices,
                st,
                sub,
                counts,
                pslots,
                self._lora_step_params()
                if plan.lora_ids is not None else None,
                fb.lora_ids,
            ]
            if self.cross_pool is not None:
                margs.append(fb.cross)
            toks, lps, k_pages, v_pages, counts = fn(*margs)
        finally:
            if self.decode_act_int8:
                set_act_override(None)
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        if penalized:
            self.penalty_counts = counts
        return DecodeHandle(
            toks=toks, lps=lps, out_slot=out_slot, S_real=S_real, S=S,
            num_steps=num_steps,
        )

    @staticmethod
    def wait_decode(handle: "DecodeHandle") -> Tuple[np.ndarray, np.ndarray]:
        """Materialize a dispatched decode round (blocks until done).

        NOTE: do NOT fuse these transfers with an extra device op (e.g.
        jnp.stack): with the overlap scheduler the NEXT round is already
        dispatched, so a new op enqueues BEHIND it in the device FIFO
        and the wait would serialize the pipeline (measured -7% e2e,
        round 4).  Plain gets of already-produced arrays don't queue."""
        toks = np.asarray(jax.device_get(handle.toks))
        lps = np.asarray(jax.device_get(handle.lps))
        if handle.out_slot is not None:  # dp attention: request order
            return toks[:, handle.out_slot], lps[:, handle.out_slot]
        return toks[:, : handle.S_real], lps[:, : handle.S_real]

    def execute_decode_multi(
        self, plan: BatchPlan, slot_mat: np.ndarray, num_steps: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Dispatch + wait (the non-pipelined entry)."""
        return self.wait_decode(
            self.dispatch_decode_multi(plan, slot_mat, num_steps)
        )

    # ------------------------------------------------------------------

    def _dp_remap_plan(self, plan: BatchPlan):
        """DP attention: rewrite the plan so rows/seqs are grouped per dp
        shard, each shard block padded to a common bucket (the shard_map
        P("dp") split then hands every shard exactly its own requests).
        Returns (plan2, out_slot, T, S) -- out_slot maps each original
        seq index to its row in the padded shard-grouped layout."""
        sa = self.server_args
        dp = self.dp_attn_size
        shards = np.asarray(plan.dp_shards, np.int64)
        S_real = len(plan.q_lens)
        assert plan.mm_items is None and plan.lora_ids is None
        assert plan.out_rows is None and plan.ft_rows is None

        def scat1(src, n, slot, fill=0, dtype=None):
            src = np.asarray(src)
            out = np.full(n, fill, dtype or src.dtype)
            out[slot] = src
            return out

        if plan.is_decode:
            counts = np.bincount(shards, minlength=dp)
            S_shard = next_bucket(
                max(int(counts.max()), 1), sa.decode_bs_buckets
            )
            S = T = dp * S_shard
            nxt = np.zeros(dp, np.int64)
            out_slot = np.empty(S_real, np.int64)
            for i, sh in enumerate(shards):
                out_slot[i] = sh * S_shard + nxt[sh]
                nxt[sh] += 1
            pages2 = [np.empty(0, np.int32)] * S
            for i, pages in enumerate(plan.page_indices):
                pages2[out_slot[i]] = pages
            plan2 = BatchPlan(
                is_decode=True,
                token_ids=scat1(plan.token_ids, T, out_slot),
                positions=scat1(plan.positions, T, out_slot),
                slots=scat1(plan.slots, T, out_slot, fill=-1),
                q_starts=np.tile(np.arange(S_shard, dtype=np.int32), dp),
                q_lens=scat1(plan.q_lens, S, out_slot),
                kv_lens=scat1(plan.kv_lens, S, out_slot),
                page_indices=pages2,
                temperature=scat1(plan.temperature, S, out_slot, 0.0),
                top_k=scat1(plan.top_k, S, out_slot),
                top_p=scat1(plan.top_p, S, out_slot, 1.0),
                min_p=scat1(plan.min_p, S, out_slot, 0.0),
            )
        else:
            rows_req = np.asarray([
                round_up(max(int(ql), 1), PREFILL_BLOCK_Q)
                for ql in plan.q_lens
            ])
            shard_rows = np.zeros(dp, np.int64)
            for r, sh in zip(rows_req, shards):
                shard_rows[sh] += r
            T_shard = round_up(
                next_bucket(
                    max(int(shard_rows.max()), PREFILL_BLOCK_Q),
                    sa.prefill_token_buckets,
                ),
                PREFILL_BLOCK_Q,
            )
            T = dp * T_shard
            S_shard = T_shard // PREFILL_BLOCK_Q
            S = dp * S_shard
            tok = np.zeros(T, np.int32)
            pos = np.zeros(T, np.int32)
            slt = np.full(T, -1, np.int32)
            q_starts2 = np.full(S, T_shard, np.int32)  # local sentinel
            out_rows2 = np.zeros(S, np.int32)
            nxt_row = np.zeros(dp, np.int64)
            nxt_seq = np.zeros(dp, np.int64)
            out_slot = np.empty(S_real, np.int64)
            pages2 = [np.empty(0, np.int32)] * S
            for i, sh in enumerate(shards):
                r = rows_req[i]
                src0 = int(plan.q_starts[i])
                loc = int(nxt_row[sh])
                dst0 = sh * T_shard + loc
                span = min(r, len(plan.token_ids) - src0)
                tok[dst0:dst0 + span] = plan.token_ids[src0:src0 + span]
                pos[dst0:dst0 + span] = plan.positions[src0:src0 + span]
                slt[dst0:dst0 + span] = plan.slots[src0:src0 + span]
                slot = int(sh * S_shard + nxt_seq[sh])
                out_slot[i] = slot
                q_starts2[slot] = loc
                out_rows2[slot] = loc + max(int(plan.q_lens[i]) - 1, 0)
                pages2[slot] = plan.page_indices[i]
                nxt_row[sh] += r
                nxt_seq[sh] += 1
            plan2 = BatchPlan(
                is_decode=False,
                token_ids=tok,
                positions=pos,
                slots=slt,
                q_starts=q_starts2,
                q_lens=scat1(plan.q_lens, S, out_slot),
                kv_lens=scat1(plan.kv_lens, S, out_slot),
                page_indices=pages2,
                temperature=scat1(plan.temperature, S, out_slot, 0.0),
                top_k=scat1(plan.top_k, S, out_slot),
                top_p=scat1(plan.top_p, S, out_slot, 1.0),
                min_p=scat1(plan.min_p, S, out_slot, 0.0),
                out_rows=out_rows2,
            )
        for name in ("presence_penalty", "frequency_penalty",
                     "repetition_penalty"):
            v = getattr(plan, name)
            if v is not None:
                fill = 1.0 if name == "repetition_penalty" else 0.0
                setattr(plan2, name, scat1(v, S, out_slot, fill))
        if plan.penalty_slots is not None:
            plan2.penalty_slots = scat1(
                plan.penalty_slots, S, out_slot, -1
            )
        if plan.vocab_mask is not None:
            V = plan.vocab_mask.shape[1]
            vm = np.ones((S, V), bool)
            vm[out_slot] = plan.vocab_mask
            plan2.vocab_mask = vm
        if plan.bias_tokens is not None:
            NB = plan.bias_tokens.shape[1]
            bt = np.full((S, NB), -1, np.int32)
            bv = np.zeros((S, NB), np.float32)
            bt[out_slot] = plan.bias_tokens
            bv[out_slot] = plan.bias_values
            plan2.bias_tokens, plan2.bias_values = bt, bv
        return plan2, out_slot, T, S

    def _get_penalty_state(self, plan: BatchPlan, S: int):
        penalized = plan.penalty_slots is not None and (
            np.asarray(plan.penalty_slots) >= 0
        ).any()
        if not penalized:
            dummy = jnp.zeros((1, 1), jnp.int32)
            return False, dummy, jnp.full((S,), -1, jnp.int32)
        if self.penalty_counts is None:
            self.penalty_counts = jnp.zeros(
                (self.max_penalty_slots, self.config.vocab_size), jnp.int32
            )
        slots = np.full(S, -1, np.int32)
        slots[: len(plan.penalty_slots)] = plan.penalty_slots
        return True, self.penalty_counts, jnp.asarray(slots)

    def reset_penalty_slot(self, slot: int) -> None:
        if self.penalty_counts is not None:
            self.penalty_counts = self.penalty_counts.at[slot].set(0)

    def execute(self, plan: BatchPlan, dispatch_only: bool = False):
        """Run one step; returns (next_token per seq [S_real], logprobs).

        With ``dispatch_only`` (non-eagle prefill pipelining) the call
        returns a :class:`PrefillHandle` immediately after async
        dispatch; materialize with :meth:`wait_prefill`."""
        sa = self.server_args
        S_real = len(plan.q_lens)
        out_slot = None
        if self.dp_attn_size > 1 and plan.dp_shards is not None:
            plan, out_slot, T, S = self._dp_remap_plan(plan)
            block_q = 1 if plan.is_decode else PREFILL_BLOCK_Q
        elif plan.is_decode:
            S = next_bucket(S_real, sa.decode_bs_buckets)
            T = S
            block_q = 1
        else:
            T_real = len(plan.token_ids)
            T = next_bucket(
                max(T_real, PREFILL_BLOCK_Q), sa.prefill_token_buckets
            )
            T = round_up(T, PREFILL_BLOCK_Q)
            block_q = PREFILL_BLOCK_Q
            S = T // block_q  # max distinct seqs a prefill of T rows can hold
        pps_real = max((len(p) for p in plan.page_indices), default=1)
        PPS = next_bucket(pps_real, sa.max_seq_pages_buckets)
        ppb = 8 if PPS % 8 == 0 else max(1, PPS)
        PPS = round_up(PPS, 8)

        fb, st, vocab_mask = self._pad_plan(
            plan, T, S, PPS,
            dp_local=(S // self.dp_attn_size if out_slot is not None else 0),
        )
        self._rng_key, sub = jax.random.split(self._rng_key)
        penalized, counts, pslots = self._get_penalty_state(plan, S)
        eagle_on = self.eagle is not None and plan.ft_rows is not None
        prompt_lp = plan.lp_targets is not None and not plan.is_decode
        proc_names = ()
        proc_data = None
        if plan.custom_procs:
            proc_names = tuple(n for n, _, _ in plan.custom_procs)
            proc_data = tuple(
                (
                    jnp.asarray(_pad_bool(mask, S)),
                    {k: jnp.asarray(_pad_f32(v, S))
                     for k, v in pdict.items()},
                )
                for _, mask, pdict in plan.custom_procs
            )
        fn = self._get_step(
            T, S, PPS, block_q, plan.vocab_mask is not None, penalized,
            self._sampling_mode(plan), eagle=eagle_on,
            prompt_lp=prompt_lp, proc_names=proc_names,
        )
        args = [
            self.params,
            self.kv_pool.k_pages,
            self.kv_pool.v_pages,
            fb,
            st,
            sub,
            vocab_mask,
            counts,
            pslots,
            self._lora_step_params() if plan.lora_ids is not None else None,
            proc_data,
        ]
        x_all = None
        input_lps = None
        act_int8 = (
            (self.decode_act_int8 and plan.is_decode)
            or (self.prefill_act_int8 and not plan.is_decode
                and plan.spec_parents is None)
        )
        if act_int8:  # single-step decode trace also runs w4a8
            from sglang_security_tpu.layers.linear import set_act_override

            set_act_override("int8")
        try:
            if eagle_on:
                args += list(self._eagle_ft_args(plan.ft_rows, S))
                (tokens, logprobs, k_pages, v_pages, counts, ft,
                 x_all) = fn(*args)
                self.eagle.ft = ft
                if not plan.is_decode:
                    self._eagle_prefill_ctx = (fb, T, S, PPS, x_all)
            elif prompt_lp:
                tokens, logprobs, k_pages, v_pages, counts, x_all = fn(*args)
                targets = np.full(T, -1, np.int32)
                targets[: len(plan.lp_targets)] = plan.lp_targets
                lp_dev = self._get_prompt_lp_fn(T)(
                    self.params, x_all, jnp.asarray(targets)
                )
                if not dispatch_only:
                    input_lps = np.asarray(jax.device_get(lp_dev))
                    self._last_input_lps = input_lps
            else:
                tokens, logprobs, k_pages, v_pages, counts = fn(*args)
        finally:
            if act_int8:
                set_act_override(None)
        self.kv_pool.k_pages = k_pages
        self.kv_pool.v_pages = v_pages
        if penalized:
            self.penalty_counts = counts
        if dispatch_only:
            assert not eagle_on, "prefill pipelining excludes EAGLE"
            return PrefillHandle(
                toks=tokens, lps=logprobs, out_slot=out_slot,
                S_real=S_real,
                lp_dev=lp_dev if prompt_lp else None,
            )
        tokens_np = np.asarray(jax.device_get(tokens))
        logprobs_np = np.asarray(jax.device_get(logprobs))
        if out_slot is not None:  # dp attention: back to request order
            tokens_np = tokens_np[out_slot]
            logprobs_np = logprobs_np[out_slot]
        else:
            tokens_np = tokens_np[:S_real]
            logprobs_np = logprobs_np[:S_real]
        if eagle_on:
            return tokens_np, logprobs_np, x_all
        return tokens_np, logprobs_np

    def wait_prefill(self, handle: "PrefillHandle"):
        """Materialize a dispatched prefill chunk (blocks until done).
        Returns (tokens [S_real], logprobs [S_real], input_lps or None)."""
        # plain gets: see wait_decode's FIFO note — the next chunk is
        # already dispatched, a packing op would enqueue behind it
        tokens_np = np.asarray(jax.device_get(handle.toks))
        logprobs_np = np.asarray(jax.device_get(handle.lps))
        if handle.out_slot is not None:
            tokens_np = tokens_np[handle.out_slot]
            logprobs_np = logprobs_np[handle.out_slot]
        else:
            tokens_np = tokens_np[: handle.S_real]
            logprobs_np = logprobs_np[: handle.S_real]
        input_lps = None
        if handle.lp_dev is not None:
            input_lps = np.asarray(jax.device_get(handle.lp_dev))
            self._last_input_lps = input_lps
        return tokens_np, logprobs_np, input_lps

    # ------------------------------------------------------------------
    def _pad_plan(self, plan: BatchPlan, T: int, S: int, PPS: int,
                  block_q: Optional[int] = None, R: Optional[int] = None,
                  rows_per_seq: int = 1, dp_local: int = 0):
        """R: number of output/sampling rows (defaults to S; spec verify
        samples rows_per_seq positions per sequence)."""
        def pad1(a, n, fill=0):
            a = np.asarray(a)
            out = np.full(n, fill, a.dtype)
            out[: len(a)] = a
            return out

        S_real = len(plan.q_lens)
        bq = block_q or PREFILL_BLOCK_Q
        pi = np.zeros((S, PPS), np.int32)
        for i, pages in enumerate(plan.page_indices):
            m = min(len(pages), PPS)
            pi[i, :m] = pages[:m]
        if plan.is_decode:
            if dp_local:  # dp attention: local row ids, tiled per shard
                q_starts = np.tile(
                    np.arange(dp_local, dtype=np.int32), S // dp_local
                )
            else:
                q_starts = np.arange(S, dtype=np.int32)
            out_rows = q_starts.copy()
        else:
            q_starts = pad1(plan.q_starts, S).astype(np.int32)
            if plan.out_rows is not None:
                out_rows = pad1(plan.out_rows, R or S)
            else:
                # row of each seq's last new token
                out_rows = (
                    np.asarray(plan.q_starts)
                    + np.maximum(np.asarray(plan.q_lens) - 1, 0)
                ).astype(np.int32)
                out_rows = pad1(out_rows, R or S)
            # padded q_starts must stay sorted & aligned for the kernel's
            # block->seq mapping; point them at the last block
            if S_real < S:
                q_starts[S_real:] = T

        mm_embeds, mm_rows = self._pad_mm(plan, T)
        cross = None
        if self.cross_pool is not None:
            cross = self._build_cross(plan, T, S, bq)
        tree = None
        if plan.tree_mask is not None:
            # padded sequences keep an identity mask so their (discarded)
            # rows still see one finite score through the softmax
            tm = np.broadcast_to(
                np.eye(bq, dtype=bool), (S, bq, bq)
            ).copy()
            tm[:S_real] = plan.tree_mask
            tree = {
                "mask": jnp.asarray(tm),
                "prefix_kv_lens": jnp.asarray(
                    pad1(plan.tree_prefix_kv_lens, S)
                ),
            }
        fb = ForwardBatch(
            token_ids=jnp.asarray(pad1(plan.token_ids, T)),
            positions=jnp.asarray(pad1(plan.positions, T)),
            slots=jnp.asarray(pad1(plan.slots, T, fill=-1)),
            q_starts=jnp.asarray(q_starts),
            q_lens=jnp.asarray(pad1(plan.q_lens, S)),
            kv_lens=jnp.asarray(pad1(plan.kv_lens, S)),
            page_indices=jnp.asarray(pi),
            out_rows=jnp.asarray(out_rows),
            lora_ids=(
                jnp.asarray(pad1(plan.lora_ids, T, fill=-1))
                if plan.lora_ids is not None
                else None
            ),
            mm_embeds=mm_embeds,
            mm_rows=mm_rows,
            mrope_positions=(
                jnp.asarray(np.stack([
                    pad1(plan.mrope_positions[c], T) for c in range(3)
                ]).astype(np.int32))
                if plan.mrope_positions is not None
                else None
            ),
            tree=tree,
            spec_parents=(
                jnp.asarray(pad1(plan.spec_parents, R or S, fill=-1))
                if plan.spec_parents is not None
                else None
            ),
            cross=cross,
        )
        Rr = R or S
        rep = rows_per_seq

        def srow(a, fill):
            a = np.asarray(a)
            if rep > 1:
                a = np.repeat(a, rep)
            return pad1(a, Rr, fill=fill)

        def opt(a, fill):
            if a is None:
                a = np.full(S_real, fill, np.float32)
            return jnp.asarray(srow(a, fill).reshape(Rr, 1), jnp.float32)

        bias_tokens = bias_values = None
        if plan.bias_tokens is not None:
            NB = plan.bias_tokens.shape[1]
            bt = np.full((Rr, NB), -1, np.int32)
            bv = np.zeros((Rr, NB), np.float32)
            rows = np.repeat(np.arange(S_real), rep)[: Rr]
            bt[: len(rows)] = plan.bias_tokens[rows]
            bv[: len(rows)] = plan.bias_values[rows]
            bias_tokens = jnp.asarray(bt)
            bias_values = jnp.asarray(bv)
        st = SamplingTensors(
            temperature=jnp.asarray(
                srow(plan.temperature, 0.0).reshape(Rr, 1), jnp.float32
            ),
            top_k=jnp.asarray(srow(plan.top_k, 0), jnp.int32),
            top_p=jnp.asarray(srow(plan.top_p, 1.0), jnp.float32),
            min_p=jnp.asarray(srow(plan.min_p, 0.0), jnp.float32),
            presence_penalty=opt(plan.presence_penalty, 0.0),
            frequency_penalty=opt(plan.frequency_penalty, 0.0),
            repetition_penalty=opt(plan.repetition_penalty, 1.0),
            bias_tokens=bias_tokens,
            bias_values=bias_values,
        )
        if plan.vocab_mask is not None:
            V = self.config.vocab_size
            vm = np.ones((Rr, V), bool)
            if plan.vocab_mask.shape[0] == S_real * rep:
                # already per-row (spec verify: per-draft-position masks)
                src_vm = plan.vocab_mask
            elif rep > 1:
                src_vm = np.repeat(plan.vocab_mask, rep, axis=0)
            else:
                src_vm = plan.vocab_mask
            vm[: len(src_vm)] = src_vm
            vocab_mask = jnp.asarray(vm)
        else:
            vocab_mask = None
        return fb, st, vocab_mask

    # ------------------------------------------------------------------
    def _page_rows(self, pages: np.ndarray) -> np.ndarray:
        ps = self.page_size
        return (
            np.asarray(pages, np.int64)[:, None] * ps + np.arange(ps)[None, :]
        ).reshape(-1)

    def export_kv(self, pages: np.ndarray):
        """Fetch whole pages (all layers) to host: PD prefill-side handoff.
        (Both plain arrays and quantized (data, scale) pytrees: the token
        dim is dim 2 in every leaf.)"""
        rows = jnp.asarray(self._page_rows(pages))
        return jax.device_get(
            jax.tree.map(
                lambda a: a[:, :, rows],
                (self.kv_pool.k_pages, self.kv_pool.v_pages),
            )
        )

    def import_kv(self, pages: np.ndarray, k_np, v_np) -> None:
        """Inject received pages into the pool: PD decode-side handoff."""
        rows = jnp.asarray(self._page_rows(pages))
        pool = self.kv_pool
        pool.k_pages = jax.tree.map(
            lambda a, upd: a.at[:, :, rows].set(jnp.asarray(upd)),
            pool.k_pages, k_np,
        )
        pool.v_pages = jax.tree.map(
            lambda a, upd: a.at[:, :, rows].set(jnp.asarray(upd)),
            pool.v_pages, v_np,
        )

    def flush_cache(self) -> None:
        self.kv_pool.clear()

    def update_weights_from_tensor(self, named_tensors,
                                   load_format=None) -> None:
        """RL weight push (reference model_runner.py:754): rebuild params
        from (HF tensor name -> array) pairs; tensors not in the push are
        read from the original checkpoint.  The push is whole-model
        consistent because load_weights re-merges/re-quantizes into the
        serving layout in one pass (no torch named_parameters surgery)."""
        if load_format not in (None, "auto"):
            raise NotImplementedError(f"load_format={load_format!r}")
        from sglang_security_tpu.model_loader.loader import (
            SafetensorsAccessor,
            _resolve_model_path,
        )

        upd = {name: np.asarray(t) for name, t in named_tensors}
        base = [None]

        def get_tensor(name):
            if name in upd:
                return upd[name]
            if base[0] is None:
                base[0] = SafetensorsAccessor(_resolve_model_path(
                    self.server_args.model_path,
                    self.server_args.download_dir,
                ))
            return base[0](name)

        params = self.model.load_weights(get_tensor, dtype=self.dtype)
        self._install_params(params)

    def get_weights_by_name(self, name: str, truncate_size: int = 100):
        """Fetch a param leaf by its pytree path (e.g.
        "layers/qkv/w" or "embed"); returns a truncated host array
        (reference model_runner.py:771 get_weights_by_name)."""
        node = self.params
        for part in name.split("/"):
            if isinstance(node, dict):
                if part not in node:
                    return None
                node = node[part]
            elif isinstance(node, list):
                node = node[int(part)]
            else:
                return None
        arr = np.asarray(jax.device_get(node)).reshape(-1)
        return arr[:truncate_size]

    def release_memory_occupation(self) -> None:
        """Stash weights to host RAM and free the KV pool so a co-located
        trainer can use the chip's HBM (reference memory-saver path,
        engine.py:442).  resume_memory_occupation restores both."""
        assert getattr(self, "_released_params", None) is None
        self._released_params = jax.device_get(self.params)
        self.params = None
        self.kv_pool.release()
        import gc

        gc.collect()

    def resume_memory_occupation(self) -> None:
        host = getattr(self, "_released_params", None)
        assert host is not None, "release_memory_occupation first"
        shard = None
        if self.mesh is not None and self._pspecs is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            shard = jax.tree.map(
                lambda ps: NamedSharding(self.mesh, ps), self._pspecs,
                is_leaf=lambda x: isinstance(x, _P),
            )
            self.params = jax.tree.map(
                lambda a, sh: jax.device_put(a, sh), host, shard
            )
        else:
            self.params = jax.tree.map(jnp.asarray, host)
        self._released_params = None
        self.kv_pool.reallocate()

    def save_sharded_checkpoint(self, path: str) -> int:
        """Save the serving-layout params as a TPU-native sharded
        checkpoint: one safetensors file of '/'-joined pytree paths +
        meta.json (reference save_sharded_model, model_runner.py:1303 --
        theirs shards per GPU rank; ours is layout-exact so reload skips
        the HF merge/quantize pass entirely)."""
        import json as _json
        import os

        from safetensors.numpy import save_file

        os.makedirs(path, exist_ok=True)
        flat = {}

        def walk(node, prefix):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, f"{prefix}/{k}" if prefix else k)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    walk(v, f"{prefix}/{i}")
            else:
                flat[prefix] = np.asarray(jax.device_get(node))

        walk(self.params, "")
        save_file(flat, os.path.join(path, "sgl_tpu_params.safetensors"))
        meta = {
            "format": "sgl_tpu_sharded",
            "architecture": self.config.architecture,
            "quantization": self.server_args.quantization,
            "dtype": self.server_args.dtype,
            "unroll_layers": bool(self.server_args.unroll_layers),
        }
        with open(os.path.join(path, "sgl_tpu_ckpt.json"), "w") as f:
            _json.dump(meta, f)
        return len(flat)

    def load_sharded_checkpoint(self, path: str) -> None:
        """Restore params saved by save_sharded_checkpoint (layout must
        match the current server config)."""
        import json as _json
        import os

        from safetensors import safe_open

        with open(os.path.join(path, "sgl_tpu_ckpt.json")) as f:
            meta = _json.load(f)
        assert meta["architecture"] == self.config.architecture, meta
        f = safe_open(
            os.path.join(path, "sgl_tpu_params.safetensors"),
            framework="flax",
        )
        flat = {name: f.get_tensor(name) for name in f.keys()}

        def rebuild(node, prefix):
            if isinstance(node, dict):
                return {
                    k: rebuild(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()
                }
            if isinstance(node, list):
                return [
                    rebuild(v, f"{prefix}/{i}") for i, v in enumerate(node)
                ]
            return jnp.asarray(flat[prefix])

        params = rebuild(self.params, "")
        self._install_params(params)

    def _install_params(self, params) -> None:
        """Shard/unroll freshly built params like __init__ does, then
        swap them in."""
        already_placed = (
            isinstance(params.get("layers"), dict)
            and "eplb_log2phy" in params["layers"]
        )
        if getattr(self, "_eplb_last", None) is not None and already_placed:
            # params restored from a checkpoint saved under EPLB: the
            # stacks are already physical; adopt its maps instead of
            # re-expanding (which would permute physical stacks again)
            l2p = np.asarray(params["layers"]["eplb_log2phy"])
            self._eplb_log2phy_np = l2p
            cnt = np.asarray(params["layers"]["eplb_logcnt"])
            L, E, R = l2p.shape
            P = params["layers"]["experts_gate_up"].shape[1]
            p2l = np.zeros((L, P), np.int64)
            for i in range(L):
                for e in range(E):
                    for p_ in l2p[i, e][l2p[i, e] >= 0]:
                        p2l[i, p_] = e
            self._eplb_last = (p2l, l2p, cnt)
        elif getattr(self, "_eplb_last", None) is not None:
            # re-expand the fresh (logical) expert stacks into the
            # current EPLB physical placement; without this a later
            # rebalance would gather [L, P] indices on [L, E] stacks
            self.params = params
            self._apply_expert_location(*self._eplb_last, initial=True)
            params = self.params
        if self.mesh is not None:
            from sglang_security_tpu.parallel.shardings import (
                param_pspecs,
                shard_params,
            )

            params = shard_params(
                params, self.mesh,
                param_pspecs(params, pp=self.pp_size > 1),
            )
        if self.server_args.unroll_layers:
            params = self.model.unroll_params(params)
        self.params = params

    def update_weights_from_disk(self, model_path: str) -> None:
        """Live weight update (reference model_runner.py:621-787)."""
        _, params, _ = load_model(
            model_path,
            quantization=self.server_args.quantization,
            dtype=self.server_args.dtype,
            tp_size=self.tp_size,
            lm_head_quantization=self.server_args.lm_head_quantization,
        )
        self._install_params(params)
