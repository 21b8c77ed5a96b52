"""DeepSeek-V2/V3: MLA attention + DeepSeek MoE.

TPU-native re-design of the reference's ``srt/models/deepseek_v2.py``
(2.7k LoC of CUDA-backend-specific MLA paths): the *absorbed* MLA
formulation maps onto the existing unified paged-attention kernel as
MQA with one latent "KV head":

  cache per token: [c_kv (kv_lora_rank, RMS-normed) | k_rope | pad]
  query per head:  [q_nope @ W_uk  (latent space)   | q_rope | pad]
  attention out [T, Hq, kv_lora] -> @ W_uv -> [T, Hq, v_dim] -> o_proj

so decode attention reads the 4-8x-compressed latent cache directly —
no decompression pass, no separate merge-states kernel (the reference
needs chunked-prefix ``merge_attn_states.cu`` + flashinfer_mla for the
same capability).

MoE: softmax routing with routed_scaling_factor + shared experts +
first_k_dense_replace dense layers (heterogeneous layer groups scanned
separately).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.moe import moe_ffn, pack_expert_params
from sglang_security_tpu.layers.norms import rms_norm
from sglang_security_tpu.layers.rotary import compute_inv_freq
from sglang_security_tpu.models.llama import LlamaForCausalLM, _act, _scatter_kv
from sglang_security_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention,
)

MLA_PREFILL_BLOCK_Q = 16  # Hq is large; keep rows = block_q * Hq bounded


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    """Also serves DeepSeek v1 MoE checkpoints (``DeepseekForCausalLM``,
    reference ``srt/models/deepseek.py``): same first-k-dense + shared
    -expert MoE FFN, with standard GQA attention instead of MLA
    (``config.use_mla`` selects the branch)."""

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        if config.use_mla:
            self.inv_freq = jnp.asarray(
                compute_inv_freq(
                    config.qk_rope_head_dim, config.rope_theta,
                    config.rope_scaling,
                )
            )

    # ------------------------------------------------------------- helpers
    @property
    def _noaux_tc(self) -> bool:
        """DeepSeek-V3/R1 aux-loss-free routing: e_score_correction_bias
        added to sigmoid scores for expert *selection* (combine weights
        stay un-biased), plus group-limited top-k (HF topk_method)."""
        return self.config.raw.get("topk_method") == "noaux_tc"

    @property
    def _dims(self):
        cfg = self.config
        return (
            cfg.kv_lora_rank,
            cfg.qk_nope_head_dim,
            cfg.qk_rope_head_dim,
            cfg.v_head_dim,
            cfg.kv_cache_head_dim,
        )

    def _sm_scale(self) -> float:
        cfg = self.config
        if not cfg.use_mla:
            return cfg.head_dim**-0.5
        scale = (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) ** -0.5
        rs = cfg.rope_scaling or {}
        if rs.get("type") == "yarn" or rs.get("rope_type") == "yarn":
            mscale_dim = rs.get("mscale_all_dim", 0)
            factor = rs.get("factor", 1.0)
            if mscale_dim and factor > 1:
                import math

                m = 0.1 * mscale_dim * math.log(factor) + 1.0
                scale = scale * m * m
        return scale

    # ------------------------------------------------------------- params
    def _make_attn_params_dummy(self, rand, dtype):
        cfg = self.config
        H = cfg.hidden_size
        if not cfg.use_mla:  # DeepSeek v1: plain GQA qkv/o
            from sglang_security_tpu.layers.linear import (
                make_linear_params,
                merge_for_tp,
            )

            hd = cfg.head_dim
            ws = [rand(H, n) for n in
                  (cfg.num_q_heads * hd, cfg.num_kv_heads * hd,
                   cfg.num_kv_heads * hd)]
            w, _ = merge_for_tp(ws, self.tp_size, None)
            return {
                "qkv": make_linear_params(
                    w, quantization=self.quantization, dtype=dtype
                ),
                "o": make_linear_params(
                    rand(cfg.num_q_heads * hd, H),
                    quantization=self.quantization, dtype=dtype,
                ),
            }
        c, nope, rope, vdim, _ = self._dims
        Hq = cfg.num_q_heads
        p = {}
        if cfg.q_lora_rank:
            p["q_a"] = rand(H, cfg.q_lora_rank).astype(dtype)
            p["q_a_norm"] = jnp.ones((cfg.q_lora_rank,), dtype)
            p["q_b"] = rand(cfg.q_lora_rank, Hq * (nope + rope)).astype(dtype)
        else:
            p["q_proj"] = rand(H, Hq * (nope + rope)).astype(dtype)
        p["kv_a"] = rand(H, c + rope).astype(dtype)
        p["kv_a_norm"] = jnp.ones((c,), dtype)
        p["w_uk"] = rand(Hq, nope, c, scale=1.0 / np.sqrt(nope)).astype(dtype)
        p["w_uv"] = rand(Hq, c, vdim, scale=1.0 / np.sqrt(c)).astype(dtype)
        p["o"] = {"w": rand(Hq * vdim, H).astype(dtype)}
        return p

    def _pack_experts(self, p: dict, gu, down, dtype) -> None:
        pack_expert_params(p, gu, down, dtype, self.quantization)

    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        cfg = self.config
        if i < cfg.first_k_dense_layers or cfg.num_experts == 0:
            I = cfg.intermediate_size
            return {
                "gate_up": lin_merged(cfg.hidden_size, [I, I], False),
                "down": lin(I, cfg.hidden_size, False),
            }
        E = cfg.num_experts
        I = cfg.moe_intermediate_size
        H = cfg.hidden_size
        p = {"router": rand(H, E).astype(jnp.float32)}
        self._pack_experts(
            p,
            jnp.stack([rand(H, 2 * I) for _ in range(E)]),
            jnp.stack([rand(I, H) for _ in range(E)]),
            dtype,
        )
        if self._noaux_tc:
            p["router_bias"] = jnp.zeros((E,), jnp.float32)
        if cfg.num_shared_experts:
            Is = I * cfg.num_shared_experts
            p["shared_gate_up"] = lin_merged(H, [Is, Is], False)
            p["shared_down"] = lin(Is, H, False)
        return p

    def init_dummy_params(self, seed: int = 0, dtype=jnp.bfloat16,
                          unique_layers: bool = True):
        cfg = self.config
        key = jax.random.PRNGKey(seed)
        counter = [0]

        def rand(*shape, scale=None):
            scale = scale or (1.0 / np.sqrt(shape[0]))
            counter[0] += 1
            return (
                jax.random.normal(
                    jax.random.fold_in(key, counter[0]), shape, jnp.float32
                )
                * scale
            )

        def lin(k, n, bias):
            from sglang_security_tpu.layers.linear import make_linear_params

            return make_linear_params(
                rand(k, n), quantization=self.quantization, dtype=dtype
            )

        def lin_merged(k, ns, bias):
            from sglang_security_tpu.layers.linear import (
                make_linear_params,
                merge_for_tp,
            )

            ws = [rand(k, n) for n in ns]
            w, b = merge_for_tp(ws, self.tp_size, None)
            return make_linear_params(
                w, quantization=self.quantization, dtype=dtype
            )

        H = cfg.hidden_size

        def one_layer(i):
            return {
                "input_norm": jnp.ones((H,), dtype),
                "post_norm": jnp.ones((H,), dtype),
                **self._make_attn_params_dummy(rand, dtype),
                **self._ffn_params_dummy(i, rand, lin, lin_merged, dtype),
            }

        k_dense = cfg.first_k_dense_layers if cfg.num_experts else 0
        dense = [one_layer(i) for i in range(k_dense)]
        moe = [one_layer(i) for i in range(k_dense, cfg.num_layers)]
        params = {
            "embed": rand(cfg.vocab_size, H, scale=0.02).astype(dtype),
            "final_norm": jnp.ones((H,), dtype),
        }
        if dense:
            params["dense_layers"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *dense
            )
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *moe)
        if not cfg.tie_word_embeddings:
            from sglang_security_tpu.layers.linear import make_linear_params

            params["lm_head"] = make_linear_params(
                rand(H, cfg.vocab_size), quantization=None, dtype=dtype
            )
        return params

    def _load_ffn_into(self, p, i, t, dtype) -> None:
        """DeepSeek MoE FFN tensors (shared across the MLA/v2 and plain
        -attention/v1 load paths): first_k_dense dense layers, routed
        experts, optional gateless shared experts."""
        cfg = self.config
        m = f"model.layers.{i}.mlp."
        if cfg.num_experts == 0 or i < cfg.first_k_dense_layers:
            p["gate_up"] = {
                "w": jnp.concatenate(
                    [t(m + "gate_proj.weight").T, t(m + "up_proj.weight").T],
                    axis=1,
                ).astype(dtype)
            }
            p["down"] = {"w": t(m + "down_proj.weight").T.astype(dtype)}
            return
        p["router"] = t(m + "gate.weight").T.astype(jnp.float32)
        if self._noaux_tc:
            p["router_bias"] = t(
                m + "gate.e_score_correction_bias"
            ).astype(jnp.float32)
        gus, downs = [], []
        for e in range(cfg.num_experts):
            ep = m + f"experts.{e}."
            gus.append(
                jnp.concatenate(
                    [t(ep + "gate_proj.weight").T,
                     t(ep + "up_proj.weight").T], axis=1,
                )
            )
            downs.append(t(ep + "down_proj.weight").T)
        self._pack_experts(p, jnp.stack(gus), jnp.stack(downs), dtype)
        if cfg.num_shared_experts:
            sp = m + "shared_experts."
            p["shared_gate_up"] = {
                "w": jnp.concatenate(
                    [t(sp + "gate_proj.weight").T,
                     t(sp + "up_proj.weight").T], axis=1,
                ).astype(dtype)
            }
            p["shared_down"] = {
                "w": t(sp + "down_proj.weight").T.astype(dtype)
            }

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        cfg = self.config
        c, nope, rope, vdim, _ = self._dims
        Hq = cfg.num_q_heads

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        def lin_merged(names, bias_names):
            from sglang_security_tpu.layers.linear import load_merged_linear

            return load_merged_linear(
                get_tensor, names, bias_names,
                quantization=self.quantization,
                tp_size=self.tp_size, dtype=dtype,
            )

        def layer_params(i):
            b = f"model.layers.{i}."
            a = b + "self_attn."
            p = {
                "input_norm": t(b + "input_layernorm.weight").astype(dtype),
                "post_norm": t(b + "post_attention_layernorm.weight").astype(dtype),
            }
            if not cfg.use_mla:  # DeepSeek v1: plain GQA
                p["qkv"] = lin_merged(
                    [a + "q_proj.weight", a + "k_proj.weight",
                     a + "v_proj.weight"], None,
                )
                p["o"] = lin_merged([a + "o_proj.weight"], None)
                self._load_ffn_into(p, i, t, dtype)
                return p
            if cfg.q_lora_rank:
                p["q_a"] = t(a + "q_a_proj.weight").T.astype(dtype)
                p["q_a_norm"] = t(a + "q_a_layernorm.weight").astype(dtype)
                p["q_b"] = t(a + "q_b_proj.weight").T.astype(dtype)
            else:
                p["q_proj"] = t(a + "q_proj.weight").T.astype(dtype)
            p["kv_a"] = t(a + "kv_a_proj_with_mqa.weight").T.astype(dtype)
            p["kv_a_norm"] = t(a + "kv_a_layernorm.weight").astype(dtype)
            kv_b = t(a + "kv_b_proj.weight")  # [Hq*(nope+vdim), c]
            kv_b = kv_b.reshape(Hq, nope + vdim, c)
            p["w_uk"] = kv_b[:, :nope, :].astype(dtype)  # [Hq, nope, c]
            p["w_uv"] = kv_b[:, nope:, :].transpose(0, 2, 1).astype(dtype)
            p["o"] = {"w": t(a + "o_proj.weight").T.astype(dtype)}
            self._load_ffn_into(p, i, t, dtype)
            return p

        k_dense = cfg.first_k_dense_layers if cfg.num_experts else 0
        dense = [layer_params(i) for i in range(k_dense)]
        moe = [layer_params(i) for i in range(k_dense, cfg.num_layers)]
        params = {
            "embed": t("model.embed_tokens.weight").astype(dtype),
            "final_norm": t("model.norm.weight").astype(dtype),
        }
        if dense:
            params["dense_layers"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *dense
            )
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *moe)
        if not cfg.tie_word_embeddings:
            from sglang_security_tpu.layers.linear import make_linear_params

            params["lm_head"] = make_linear_params(
                t("lm_head.weight").T, quantization=None, dtype=dtype
            )
        return params

    def _param_groups(self, params):
        groups = []
        if "dense_layers" in params:
            groups.append(params["dense_layers"])
        groups.append(params["layers"])
        return groups

    # ------------------------------------------------------------ attention
    def _attn_apply(
        self, lp, h, fb, k_pages, v_pages, li, safe_slots, *,
        block_q, pages_per_block, interpret, tp_size, tp_axis,
        lora_lp=None, lora_ids=None, lora_scale=None, **kw,
    ):
        cfg = self.config
        if not cfg.use_mla:  # DeepSeek v1: standard GQA path
            return LlamaForCausalLM._attn_apply(
                self, lp, h, fb, k_pages, v_pages, li, safe_slots,
                block_q=block_q, pages_per_block=pages_per_block,
                interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
                lora_lp=lora_lp, lora_ids=lora_ids, lora_scale=lora_scale,
                **kw,
            )
        T = h.shape[0]
        c, nope, rope, vdim, hd_pad = self._dims
        Hq = cfg.num_q_heads // tp_size

        # ---- queries ----
        if cfg.q_lora_rank:
            qa = rms_norm(
                jnp.dot(h, lp["q_a"], preferred_element_type=jnp.float32
                        ).astype(h.dtype),
                lp["q_a_norm"], cfg.rms_eps,
            )
            q = jnp.dot(qa, lp["q_b"], preferred_element_type=jnp.float32)
        else:
            q = jnp.dot(h, lp["q_proj"], preferred_element_type=jnp.float32)
        q = q.astype(h.dtype).reshape(T, Hq, nope + rope)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        # ---- latent kv ----
        kv = jnp.dot(h, lp["kv_a"], preferred_element_type=jnp.float32).astype(
            h.dtype
        )  # [T, c + rope]
        c_kv, k_pe = kv[:, :c], kv[:, c:]
        c_kv = rms_norm(c_kv, lp["kv_a_norm"], cfg.rms_eps)

        q_pe, k_pe = self._apply_mla_rope(q_pe, k_pe[:, None, :], fb.positions)

        # absorbed queries: [T, Hq, c]
        q_eff = jnp.einsum(
            "thn,hnc->thc", q_nope, lp["w_uk"],
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        q_full = jnp.concatenate(
            [q_eff, q_pe, jnp.zeros((T, Hq, hd_pad - c - rope), h.dtype)],
            axis=-1,
        )

        # cache write: k = [c_kv | k_pe | 0], v = [c_kv | 0]
        k_vec = jnp.concatenate(
            [c_kv, k_pe[:, 0, :], jnp.zeros((T, hd_pad - c - rope), h.dtype)],
            axis=-1,
        )[:, None, :]
        v_vec = jnp.concatenate(
            [c_kv, jnp.zeros((T, hd_pad - c), h.dtype)], axis=-1
        )[:, None, :]
        if block_q == 1 and not isinstance(k_pages, tuple):
            from sglang_security_tpu.ops.ragged_paged_attention import (
                paged_decode_attention,
            )

            attn, k_pages, v_pages = paged_decode_attention(
                q_full, k_pages, v_pages, fb.kv_lens, fb.page_indices,
                page_size=self.kv_page_size,
                layer=li,
                sm_scale=self._sm_scale(),
                sliding_window=None,
                soft_cap=None,
                interpret=interpret,
                k_new=k_vec, v_new=v_vec, slots=fb.slots,
            )
        else:
            k_pages, v_pages = _scatter_kv(
                k_pages, v_pages, k_vec, v_vec, li, safe_slots
            )
            attn = self._paged_attention(
                q_full, k_pages, v_pages, fb, li,
                sm_scale=self._sm_scale(),
                sliding_window=None,
                soft_cap=None,
                block_q=min(block_q, MLA_PREFILL_BLOCK_Q) if block_q > 1 else 1,
                pages_per_block=pages_per_block,
                interpret=interpret,
            )  # [T, Hq, hd_pad]
        attn_c = attn[..., :c]  # latent-space output
        o_h = jnp.einsum(
            "thc,hcv->thv", attn_c, lp["w_uv"],
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        o = apply_linear(o_h.reshape(T, Hq * vdim), lp["o"])
        if tp_axis is not None:
            o = lax.psum(o, tp_axis)
        return o, k_pages, v_pages

    def _apply_mla_rope(self, q_pe, k_pe, positions):
        """DeepSeek stores rope dims interleaved: de-interleave, rotate
        (NeoX half style), matching HF modeling_deepseek_v2."""
        rope = q_pe.shape[-1]
        half = rope // 2

        def deint(x):
            # [..., d] with (x0, y0, x1, y1, ...) -> (x..., y...)
            shape = x.shape
            x = x.reshape(*shape[:-1], half, 2)
            return jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)

        q_pe = deint(q_pe)
        k_pe = deint(k_pe)
        freqs = positions[:, None].astype(jnp.float32) * self.inv_freq[None, :]
        cos = jnp.cos(freqs)[:, None, :]
        sin = jnp.sin(freqs)[:, None, :]

        def rot(x):
            x1, x2 = x[..., :half], x[..., half:]
            xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
            o1 = xf1 * cos - xf2 * sin
            o2 = xf2 * cos + xf1 * sin
            return jnp.concatenate(
                [o1.astype(x.dtype), o2.astype(x.dtype)], axis=-1
            )

        return rot(q_pe), rot(k_pe)

    # ------------------------------------------------------------ FFN
    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        cfg = self.config
        if "router" not in lp:
            return super()._ffn_apply(lp, h, tp_size, tp_axis)
        rs = float(cfg.raw.get("routed_scaling_factor", 1.0))
        out = moe_ffn(
            h,
            lp["router"],
            lp["experts_gate_up"],
            lp["experts_down"],
            top_k=cfg.num_experts_per_tok,
            act=_act(cfg.act_fn),
            renormalize=bool(cfg.raw.get("norm_topk_prob", False)),
            scoring=cfg.raw.get("scoring_func", "softmax"),
            correction_bias=lp.get("router_bias"),
            n_group=cfg.raw.get("n_group"),
            topk_group=cfg.raw.get("topk_group"),
            ep_axis=tp_axis,
            ep_size=tp_size,
            routed_scaling=rs,
            log2phy=lp.get("eplb_log2phy"),
            logcnt=lp.get("eplb_logcnt"),
            stats_cb=getattr(self, "eplb_stats_cb", None),
            s_gate_up=lp.get("experts_gate_up_scale"),
            s_down=lp.get("experts_down_scale"),
            dispatch=getattr(self, "moe_dispatch", "psum"),
            capacity_factor=getattr(self, "moe_capacity_factor", None),
        )
        if "shared_gate_up" in lp:
            gate_up = apply_linear(h, lp["shared_gate_up"])
            g, u = jnp.split(gate_up, 2, axis=-1)
            shared = apply_linear(_act(cfg.act_fn)(g) * u, lp["shared_down"])
            if tp_axis is not None:
                shared = lax.psum(shared, tp_axis)
            out = out + shared
        return out


class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    pass
