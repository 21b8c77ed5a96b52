"""Server configuration.

One dataclass holds every engine/server knob, mirrored 1:1 into argparse
flags (capability parity with the reference's ``ServerArgs``,
``python/sglang/srt/server_args.py:44-224`` / ``add_cli_args:498``), with
post-init constraint solving.  TPU-specific additions: mesh shape axes
(tp/pp/dp/ep over one JAX process per host), bucketing controls that play
the role the reference's CUDA-graph batch-size list plays
(``cuda_graph_runner.py:129``), and page-size defaults aligned to TPU tile
layout.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import random
import tempfile
import typing
from dataclasses import dataclass, field
from typing import List, Optional

logger = logging.getLogger(__name__)


@dataclass
class ServerArgs:
    # ---- model & tokenizer ----
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    tokenizer_mode: str = "auto"
    chat_template: Optional[str] = None  # named template or .jinja path
    completion_template: Optional[str] = None  # FIM template name/json
    # tool-call dialect for parsing AND constrained composition (reference
    # --tool-call-parser): auto | json | qwen25 | mistral | llama32 |
    # deepseekv3 | pythonic.  "auto" parses leniently and composes "json".
    tool_call_parser: str = "auto"
    load_format: str = "auto"  # auto | safetensors | gguf | dummy
    trust_remote_code: bool = False
    dtype: str = "bfloat16"  # activation dtype: bfloat16 | float32
    quantization: Optional[str] = None  # int4 | int8 | fp8 | awq | gptq | None
    quantization_group_size: int = 128  # group size for weight-only int4/int8
    # w4a8: int8 activations on weight-int4 linears (QServe-style),
    # gated by the committed fidelity artifact (FIDELITY_r04.json:
    # incremental error of int8 acts over int4 weights ~ 0).  Decode
    # (2x MXU rate on the bandwidth-bound phase) and prefill (mm_slope
    # r4: int4 M=4096 bf16-act 157-169 TF/s vs int8-act 217-229 TF/s)
    # each have a switch; spec-verify traces stay bf16-activation.
    decode_act_int8: bool = True
    prefill_act_int8: bool = True
    # auto | bfloat16 | int8 | fp8 (per-token scales) | fp8_static
    # (e4m3, scale 1.0 — keeps the fused-write decode kernel, halves
    # decode attention HBM; the reference FP8 KV default when the
    # checkpoint ships no calibration scales is also scale=1.0)
    kv_cache_dtype: str = "auto"
    # lm_head weight quantization: auto = bf16 (reference fp16-head
    # default; FIDELITY_r05 measured the int8 head alone at 0.17 nats
    # KL — 5x the w4a8 body).  int8 halves the ~1 GB/step head read on
    # 128k-vocab models (+2.2% throughput) for users who opt in.
    lm_head_quantization: str = "auto"  # auto | none | int8 | int4
    context_length: Optional[int] = None
    revision: Optional[str] = None
    served_model_name: Optional[str] = None
    is_embedding: bool = False

    # ---- HTTP server ----
    host: str = "127.0.0.1"
    port: int = 30000
    api_key: Optional[str] = None
    log_level: str = "info"
    log_requests: bool = False
    enable_metrics: bool = True

    # ---- memory & KV cache ----
    mem_fraction_static: Optional[float] = None
    max_total_tokens: Optional[int] = None
    page_size: int = 32  # tokens per KV page (sublane-aligned for bf16 tiles)
    max_running_requests: Optional[int] = None
    max_prefill_tokens: int = 8192
    chunked_prefill_size: int = 4096
    disable_radix_cache: bool = False
    radix_eviction_policy: str = "lru"

    # ---- scheduling ----
    schedule_policy: str = "lpm"  # lpm | fcfs | lof | random | dfs-weight
    schedule_conservativeness: float = 1.0
    stream_interval: int = 1
    disable_overlap_schedule: bool = False
    # decode tokens generated per host round-trip (device-chained sampling;
    # the TPU analog of the reference's overlap scheduler). 1 = off.
    decode_steps_per_batch: int = 8
    # device-resident fused speculative rounds per dispatch (greedy
    # NGRAM path; scheduler._run_spec_decode_fused).  Independent of
    # decode_steps_per_batch, which spec mode forces to 1 for the
    # host-driven draft/verify loops.
    speculative_fused_rounds: int = 8
    retract_decode_steps: int = 20
    new_token_ratio: float = 0.4
    min_new_token_ratio: float = 0.2
    watchdog_timeout: float = 900.0  # generous: first-compile via tunnel is slow

    # ---- bucketing (XLA static-shape discipline; replaces CUDA graphs) ----
    decode_bs_buckets: List[int] = field(
        default_factory=lambda: [1, 2, 4, 8, 16, 32, 64, 128, 256]
    )
    prefill_token_buckets: List[int] = field(
        default_factory=lambda: [256, 512, 1024, 2048, 4096, 8192]
    )
    max_seq_pages_buckets: List[int] = field(default_factory=lambda: [16, 64, 256, 1024])

    # ---- parallelism (mesh axes, not rank processes) ----
    tp_size: int = 1
    pp_size: int = 1
    pp_microbatches: int = 0  # 0 = pp_size (decode microbatch overlap)
    dp_size: int = 1
    ep_size: int = 1
    sp_size: int = 1
    node_rank: int = 0
    nnodes: int = 1
    dist_init_addr: Optional[str] = None
    # op-broadcast endpoint for multi-host lockstep scheduling
    # (distributed/control_plane.py); default = coordinator port + 1
    control_plane_port: Optional[int] = None
    enable_ep_moe: bool = False
    # MoE EP token dispatch: "psum" replicates tokens per expert shard
    # and psum-combines (dropless; right for small ep); "a2a" is the
    # DeepEP analog — tokens shard over the ep axis and (x, expert) rows
    # travel by ragged all-to-all (dense capacity-padded all_to_all off
    # TPU), compute per shard scales 1/ep (reference --moe-a2a-backend,
    # token_dispatcher.py:38-51)
    moe_dispatch: str = "psum"
    # "a2a" receive-buffer budget as a multiple of the balanced load;
    # rows beyond it drop (EPLB keeps loads balanced)
    moe_capacity_factor: float = 2.0
    enable_dp_attention: bool = False
    # ---- double sparsity (reference server_args.py ds_*) ----
    enable_double_sparsity: bool = False
    ds_channel_config_path: Optional[str] = None
    ds_heavy_channel_num: int = 32
    ds_heavy_token_num: int = 1024
    ds_sparse_decode_threshold: int = 4096

    # ---- EPLB (reference server_args.py:175-185) ----
    enable_eplb: bool = False
    ep_num_redundant_experts: int = 0
    eplb_rebalance_num_iterations: int = 1000
    enable_expert_distribution_recorder: bool = False

    # ---- sampling / constrained decoding ----
    grammar_backend: str = "native"  # our own regex/json/ebnf engine
    enable_custom_logit_processor: bool = False
    constrained_json_whitespace_pattern: Optional[str] = None

    # ---- speculative decoding ----
    speculative_algorithm: Optional[str] = None  # EAGLE | EAGLE3 | NGRAM
    speculative_draft_model_path: Optional[str] = None
    speculative_num_steps: int = 5
    speculative_eagle_topk: int = 1  # >1 (tree drafting) not implemented
    speculative_num_draft_tokens: int = 8
    # Host-driven spec rounds pay a full dispatch round-trip per round —
    # measured 0.087x NON-spec throughput on the real chip (PERF_NOTES).
    # When the device-resident fused path is ineligible (mesh, mrope,
    # sampling extras), the scheduler falls back to PLAIN decode and
    # warns, unless this opts the host rounds back in.  None = auto:
    # allowed on the CPU/interpret backend (tests), refused on TPU.
    speculative_allow_host_rounds: Optional[bool] = None

    # ---- LoRA ----
    lora_paths: Optional[List[str]] = None
    max_loras_per_batch: int = 8
    max_lora_rank: Optional[int] = None

    # ---- multimodal ----
    # device entries in the encoder-output cache (content-hash keyed;
    # reference mem_cache/multimodal_cache.py)
    mm_feature_cache_size: int = 32

    # ---- SafeKV (privacy-aware KV sharing; fork capability) ----
    enable_safekv: bool = False
    safekv_epoch_seconds: float = 10.0
    safekv_hit_spike_threshold: float = 10.0
    safekv_entropy_threshold: float = 2.0
    safekv_chunk_size: int = 1024
    safekv_tier2_model_path: Optional[str] = None
    safekv_tier2_low: float = 0.3
    safekv_tier2_high: float = 0.7
    safekv_judge_batch_size: int = 16
    safekv_disable_llm_judge: bool = True

    # ---- hierarchical cache (host offload) ----
    enable_hierarchical_cache: bool = False
    hicache_ratio: float = 2.0
    hicache_write_policy: str = "write_through_selective"

    # ---- PD disaggregation ----
    disaggregation_mode: str = "null"  # null | prefill | decode
    disaggregation_bootstrap_port: int = 8998
    disaggregation_transfer_backend: str = "fake"  # fake | grpc
    # decode-side: abort a room if its KV hasn't fully arrived in time
    # (reference heartbeat-driven room failure, mooncake/conn.py:488-540)
    disaggregation_timeout: float = 120.0

    # ---- observability ----
    enable_request_time_stats_logging: bool = False
    kv_events_config: Optional[str] = None
    decode_log_interval: int = 40

    # unrolled per-layer weight buffers (vs lax.scan over stacked): avoids
    # re-materializing each layer's quantized weights every step
    unroll_layers: bool = True

    # ---- warmup / compile cache ----
    enable_warmup: bool = True  # precompile standard buckets at startup
    warmup_decode_bs: List[int] = field(default_factory=lambda: [8])
    warmup_prefill_tokens: List[int] = field(default_factory=lambda: [512])
    compilation_cache_dir: Optional[str] = "~/.cache/sgl_tpu_xla"

    # ---- misc / debug ----
    random_seed: Optional[int] = None
    skip_tokenizer_init: bool = False
    enable_nan_detection: bool = False
    allow_auto_truncate: bool = False
    enable_session: bool = True
    device: str = "auto"  # auto | tpu | cpu
    download_dir: Optional[str] = None

    def __post_init__(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.random_seed is None:
            self.random_seed = random.randint(0, 2**31 - 1)
        if self.mem_fraction_static is None:
            # Reference auto-sizes by TP; on TPU a single jax process owns all
            # chips, so leave generous headroom for compiled executables.
            self.mem_fraction_static = 0.80
        if self.page_size <= 0:
            raise ValueError("page_size must be positive")
        if self.chunked_prefill_size > self.max_prefill_tokens:
            self.chunked_prefill_size = self.max_prefill_tokens
        self.decode_bs_buckets = sorted(set(self.decode_bs_buckets))
        self.prefill_token_buckets = sorted(set(self.prefill_token_buckets))
        if self.speculative_algorithm is not None:
            # overlap scheduling composes poorly with draft/verify loops
            self.disable_overlap_schedule = True
        if self.disable_overlap_schedule:
            # overlap on TPU = device-chained multi-step decode; disabling
            # it means one host round-trip per token
            self.decode_steps_per_batch = 1
        if self.enable_safekv and self.disable_radix_cache:
            raise ValueError("SafeKV requires the radix cache to be enabled")
        if self.radix_eviction_policy != "lru":
            raise ValueError(
                f"radix_eviction_policy={self.radix_eviction_policy!r}: only"
                " 'lru' is implemented (epoch-ordered leaf heap)"
            )
        if self.tokenizer_mode not in ("auto", "slow"):
            raise ValueError("tokenizer_mode must be 'auto' or 'slow'")
        if self.enable_ep_moe and self.ep_size <= 1:
            # reference --enable-ep-moe shards experts over the TP group
            # (ep_moe/layer.py); our ep axis rides the tp axis the same way
            self.ep_size = self.tp_size
        if self.nnodes > 1:
            # multi-host lockstep scheduling (distributed/control_plane):
            # every node runs the same deterministic scheduler over the
            # broadcast op stream
            if self.dp_size > 1:
                raise NotImplementedError(
                    "nnodes > 1 with engine-level dp replicas is not "
                    "wired; scale dp with one engine per replica behind "
                    "the C++ router instead"
                )
            # SafeKV + nnodes > 1 is supported: the leader ships its
            # global-epoch value in every control-plane broadcast and
            # followers pin to it (engine._event_loop / _apply_op), so
            # attack-window stats and probe evictions stay in lockstep.

    # ------------------------------------------------------------------ CLI
    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> None:
        """Mirror every dataclass field into an argparse flag."""
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            ftype = f.type
            origin = typing.get_origin(ftype) if isinstance(ftype, type) else None
            if isinstance(ftype, str):
                ftype_s = ftype
            else:
                ftype_s = str(ftype)
            default = (
                f.default
                if f.default is not dataclasses.MISSING
                else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
            )
            if "bool" in ftype_s:
                parser.add_argument(
                    name,
                    action="store_false" if default is True else "store_true",
                    dest=f.name,
                    default=default,
                )
            elif "List[int]" in ftype_s or "list[int]" in ftype_s:
                parser.add_argument(name, type=int, nargs="+", dest=f.name, default=default)
            elif "List[str]" in ftype_s or "list[str]" in ftype_s:
                parser.add_argument(name, type=str, nargs="+", dest=f.name, default=default)
            elif "int" in ftype_s:
                parser.add_argument(name, type=int, dest=f.name, default=default)
            elif "float" in ftype_s:
                parser.add_argument(name, type=float, dest=f.name, default=default)
            else:
                parser.add_argument(name, type=str, dest=f.name, default=default)

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in names})

    def resolved_device(self) -> str:
        if self.device != "auto":
            return self.device
        import jax

        return "tpu" if jax.default_backend() in ("tpu", "axon") else jax.default_backend()


@dataclass
class PortArgs:
    """Control-plane endpoint names.

    The reference allocates ZMQ IPC/TCP sockets between its tokenizer,
    scheduler, and detokenizer *processes* (``server_args.py:1538-1615``).
    Our runtime is one process per host, so these are in-process queue names
    by default, with ZMQ endpoints only materialized for multi-node control
    planes and the PD-disaggregation bootstrap channel.
    """

    scheduler_input: str = ""
    detokenizer: str = ""
    api_output: str = ""
    metrics: str = ""

    @classmethod
    def init_new(cls, server_args: ServerArgs) -> "PortArgs":
        base = os.path.join(
            tempfile.gettempdir(), f"sgl_tpu_{server_args.port}_{os.getpid()}"
        )
        return cls(
            scheduler_input=f"ipc://{base}_sched",
            detokenizer=f"ipc://{base}_detok",
            api_output=f"ipc://{base}_out",
            metrics=f"ipc://{base}_metrics",
        )
