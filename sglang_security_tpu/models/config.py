"""Model configuration extracted from HF config.json.

Replaces the reference's reliance on transformers AutoConfig plumbed
through ``ModelConfig`` (``srt/configs/model_config.py``): we read the
json directly so the engine has no torch dependency on the hot path.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ModelConfig:
    architecture: str = "LlamaForCausalLM"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_q_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    rms_eps: float = 1e-6
    max_position: int = 4096
    tie_word_embeddings: bool = False
    qkv_bias: bool = False
    o_bias: bool = False
    mlp_bias: bool = False
    act_fn: str = "silu"
    qk_norm: bool = False  # per-head q/k RMSNorm (Qwen3, Gemma3)
    sliding_window: Optional[int] = None
    logit_softcap: Optional[float] = None
    attn_softcap: Optional[float] = None
    eos_token_ids: tuple = ()
    bos_token_id: Optional[int] = None
    # MoE (deepseek/mixtral/qwen-moe)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    # MLA (deepseek v2/v3)
    use_mla: bool = False
    kv_lora_rank: int = 0
    q_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    first_k_dense_layers: int = 0
    raw: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "ModelConfig":
        arch = (d.get("architectures") or ["LlamaForCausalLM"])[0]
        if "llm_config" in d and "text_config" not in d:
            # InternVL-class composite (reference internvl.py: llm_config
            # names the inner body); normalize to the text_config shape
            d = {**d, "text_config": d["llm_config"]}
        if "language_config" in d and "text_config" not in d:
            # DeepSeek-VL2 composite (reference deepseek_vl2.py)
            d = {**d, "text_config": d["language_config"]}
        if "text_config" in d and "num_hidden_layers" not in d:
            # VLM composite config (LLaVA-class): language-model dims live
            # in text_config; keep the outer arch + full raw dict so the
            # registry picks the VLM wrapper and it can read vision_config
            d = {**d["text_config"], "architectures": [arch], "_outer": d}
            d.setdefault("vision_config", d["_outer"].get("vision_config"))
            for k in ("image_token_index", "vision_feature_layer",
                      "projector_hidden_act", "image_token_id",
                      "vision_start_token_id", "vision_end_token_id",
                      "mm_tokens_per_image", "boi_token_index",
                      "eoi_token_index",
                      # InternVL (reference internvl.py)
                      "select_layer", "downsample_ratio", "ps_version",
                      "force_image_size",
                      # DeepSeek-VL2 (reference deepseek_vl2.py)
                      "projector_config", "candidate_resolutions"):
                if k in d["_outer"]:
                    d.setdefault(k, d["_outer"][k])
        nq = d.get("num_attention_heads", 32)
        hidden = d.get("hidden_size", 4096)
        eos = d.get("eos_token_id", [])
        if eos is None:
            eos = []
        if isinstance(eos, int):
            eos = [eos]
        cfg = cls(
            architecture=arch,
            vocab_size=d.get("vocab_size", 32000),
            hidden_size=hidden,
            intermediate_size=d.get("intermediate_size", 4 * hidden),
            num_layers=d.get("num_hidden_layers", 32),
            num_q_heads=nq,
            num_kv_heads=d.get("num_key_value_heads", nq),
            head_dim=d.get("head_dim") or hidden // nq,
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling=d.get("rope_scaling"),
            rms_eps=d.get("rms_norm_eps", d.get("layer_norm_eps", 1e-6)),
            max_position=d.get("max_position_embeddings", 4096),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            qkv_bias=d.get("attention_bias", False)
            or arch.startswith("Qwen2")
            # MiniCPM-V 2.6 rides the qwen2 body (reference minicpmv.py
            # get_version_by_config); 2.0/2.5 are llama-family, no bias
            or (arch == "MiniCPMV"
                and str(d.get("version", "")).startswith("2.6")),
            mlp_bias=d.get("mlp_bias", False),
            act_fn=d.get("hidden_act", "silu"),
            qk_norm=arch.startswith("Qwen3") or arch.startswith("Gemma3"),
            sliding_window=d.get("sliding_window"),
            logit_softcap=d.get("final_logit_softcapping"),
            attn_softcap=d.get("attn_logit_softcapping"),
            eos_token_ids=tuple(eos),
            bos_token_id=d.get("bos_token_id"),
            num_experts=d.get(
                "num_local_experts", d.get("n_routed_experts", d.get("num_experts", 0) or 0)
            ),
            num_experts_per_tok=d.get(
                "num_experts_per_tok", d.get("moe_top_k", 0)  # xverse-moe
            ),
            moe_intermediate_size=d.get("moe_intermediate_size", 0),
            num_shared_experts=d.get("n_shared_experts", 0),
            use_mla=arch.startswith("DeepseekV2")
            or arch.startswith("DeepseekV3")
            # composite VLM on the MLA body (reference deepseek_vl2.py:193
            # language_config.use_mla)
            or (arch in ("DeepseekVL2ForCausalLM",
                         "KimiVLForConditionalGeneration")
                and bool(d.get("kv_lora_rank"))),
            kv_lora_rank=d.get("kv_lora_rank", 0),
            q_lora_rank=d.get("q_lora_rank") or 0,
            qk_nope_head_dim=d.get("qk_nope_head_dim", 0),
            qk_rope_head_dim=d.get("qk_rope_head_dim", 0),
            v_head_dim=d.get("v_head_dim", 0),
            first_k_dense_layers=d.get("first_k_dense_replace", 0),
            raw=d,
        )
        return cfg

    @classmethod
    def from_pretrained(cls, model_path: str) -> "ModelConfig":
        cfg_path = os.path.join(model_path, "config.json")
        with open(cfg_path) as f:
            return cls.from_hf_dict(json.load(f))

    @property
    def kv_cache_head_dim(self) -> int:
        """Head dim stored in the KV pool.

        MLA stores the compressed latent + rope key padded up to a lane
        multiple (128) instead of per-head K/V.  Non-MLA head dims are
        also padded to the 128-lane tile: Mosaic rejects token-dim pool
        slices whose trailing dim is unaligned ("Slice shape along
        dimension 3 must be aligned to tiling (128)"), which broke every
        hd-64/96 model on real TPU.  The attention wrappers pad q/k/v and
        slice the output back (ops/ragged_paged_attention.py)."""
        if self.use_mla:
            d = self.kv_lora_rank + self.qk_rope_head_dim
        else:
            d = self.head_dim
        return ((d + 127) // 128) * 128

    @property
    def kv_cache_num_heads(self) -> int:
        return 1 if self.use_mla else self.num_kv_heads
