"""MoE decoder models: Mixtral, Qwen2/3-MoE (shared-expert variant).

Subclasses the llama body (attention/norms/scan identical — compare the
reference's ``srt/models/mixtral.py`` / ``qwen2_moe.py`` which mirror
llama.py with the MLP swapped for a router + experts) and overrides the
FFN hooks with the capacity-dispatch MoE layer (layers/moe.py).

Param additions per layer:
  router: [H, E] f32
  experts_gate_up: [E, H, 2*I_moe]
  experts_down: [E, I_moe, H]
  (qwen-moe) shared gate_up/down dense params + shared_gate [H, 1]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sglang_security_tpu.layers.linear import apply_linear
from sglang_security_tpu.layers.moe import moe_ffn, pack_expert_params
from sglang_security_tpu.models.llama import LlamaForCausalLM, _act


class MixtralForCausalLM(LlamaForCausalLM):
    renormalize = True
    has_shared_expert = False

    def _moe_dims(self):
        cfg = self.config
        E = cfg.num_experts
        I = cfg.moe_intermediate_size or cfg.intermediate_size
        return E, I

    def _pack_experts(self, p: dict, gu, down, dtype) -> None:
        pack_expert_params(p, gu, down, dtype, self.quantization)

    # ------------------------------------------------------------- params
    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        cfg = self.config
        E, I = self._moe_dims()
        H = cfg.hidden_size
        p = {"router": rand(H, E).astype(jnp.float32)}
        self._pack_experts(
            p,
            jnp.stack([rand(H, 2 * I) for _ in range(E)]),
            jnp.stack([rand(I, H) for _ in range(E)]),
            dtype,
        )
        if self.has_shared_expert:
            Is = cfg.intermediate_size
            p["shared_gate_up"] = lin_merged(H, [Is, Is], False)
            p["shared_down"] = lin(Is, H, False)
            p["shared_gate"] = rand(H, 1).astype(dtype)
        return p

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        cfg = self.config
        E, I = self._moe_dims()
        base = f"model.layers.{i}."
        p = {}
        if self._is_mixtral_naming(t, i):
            m = base + "block_sparse_moe."
            p["router"] = t(m + "gate.weight").T.astype(jnp.float32)
            gus, downs = [], []
            for e in range(E):
                w1 = t(m + f"experts.{e}.w1.weight").T  # gate [H, I]
                w3 = t(m + f"experts.{e}.w3.weight").T  # up
                w2 = t(m + f"experts.{e}.w2.weight").T  # down [I, H]
                gus.append(jnp.concatenate([w1, w3], axis=1))
                downs.append(w2)
            self._pack_experts(p, jnp.stack(gus), jnp.stack(downs), dtype)
        else:  # qwen2-moe naming
            m = base + "mlp."
            p["router"] = t(m + "gate.weight").T.astype(jnp.float32)
            gus, downs = [], []
            for e in range(E):
                ep = m + f"experts.{e}."
                gus.append(
                    jnp.concatenate(
                        [t(ep + "gate_proj.weight").T, t(ep + "up_proj.weight").T],
                        axis=1,
                    )
                )
                downs.append(t(ep + "down_proj.weight").T)
            self._pack_experts(p, jnp.stack(gus), jnp.stack(downs), dtype)
            if self.has_shared_expert:
                sp = m + "shared_expert."
                p["shared_gate_up"] = lin_merged(
                    [sp + "gate_proj.weight", sp + "up_proj.weight"], None
                )
                p["shared_down"] = lin_merged([sp + "down_proj.weight"], None)
                p["shared_gate"] = t(
                    m + "shared_expert_gate.weight"
                ).T.astype(dtype)
        return p

    def _is_mixtral_naming(self, t, i) -> bool:
        try:
            t(f"model.layers.{i}.block_sparse_moe.gate.weight")
            return True
        except KeyError:
            return False

    # ------------------------------------------------------------ forward
    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        cfg = self.config
        out = moe_ffn(
            h,
            lp["router"],
            lp["experts_gate_up"],
            lp["experts_down"],
            top_k=cfg.num_experts_per_tok,
            act=_act(cfg.act_fn),
            renormalize=self.renormalize,
            ep_axis=tp_axis,  # experts sharded over the tp axis (EP=TP mesh)
            ep_size=tp_size,
            # EPLB physical placement (parallel/eplb.py); keys exist only
            # when enable_eplb expanded the expert stacks with replicas
            log2phy=lp.get("eplb_log2phy"),
            logcnt=lp.get("eplb_logcnt"),
            stats_cb=getattr(self, "eplb_stats_cb", None),
            s_gate_up=lp.get("experts_gate_up_scale"),
            s_down=lp.get("experts_down_scale"),
            dispatch=getattr(self, "moe_dispatch", "psum"),
            capacity_factor=getattr(self, "moe_capacity_factor", None),
        )
        if self.has_shared_expert:
            gate_up = apply_linear(h, lp["shared_gate_up"])
            g, u = jnp.split(gate_up, 2, axis=-1)
            shared = apply_linear(_act(cfg.act_fn)(g) * u, lp["shared_down"])
            if tp_axis is not None:
                shared = lax.psum(shared, tp_axis)
            sg = jax.nn.sigmoid(
                jnp.dot(h.astype(jnp.float32), lp["shared_gate"].astype(jnp.float32))
            )
            out = out + sg.astype(out.dtype) * shared
        return out


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    renormalize = False  # qwen2-moe: norm_topk_prob=False by default
    has_shared_expert = True

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        self.renormalize = bool(config.raw.get("norm_topk_prob", False))


class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):
    has_shared_expert = False

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        self.renormalize = bool(config.raw.get("norm_topk_prob", True))


class XverseMoeForCausalLM(MixtralForCausalLM):
    """XVERSE-MoE-A4.2B (reference ``srt/models/xverse_moe.py``):
    qwen-moe-style expert layout with an always-on UNGATED shared
    expert (``mlp.shared_experts.*``, deepseek-style) and the router
    named ``mlp.router``.  top-k comes from ``moe_top_k``;
    renormalize from ``norm_topk_prob`` (default False)."""

    has_shared_expert = False  # xverse shared expert handled below

    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        raw = config.raw
        self.renormalize = bool(raw.get("norm_topk_prob", False))
        if not config.num_experts_per_tok:
            config.num_experts_per_tok = raw.get("moe_top_k", 2)
        self.num_shared = raw.get("num_shared_experts") or 0

    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        cfg = self.config
        p = super()._ffn_params_dummy(i, rand, lin, lin_merged, dtype)
        if self.num_shared:
            Is = cfg.intermediate_size * self.num_shared
            H = cfg.hidden_size
            p["shared_gate_up"] = lin_merged(H, [Is, Is], False)
            p["shared_down"] = lin(Is, H, False)
        return p

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        cfg = self.config
        E, I = self._moe_dims()
        m = f"model.layers.{i}.mlp."
        p = {"router": t(m + "router.weight").T.astype(jnp.float32)}
        gus, downs = [], []
        for e in range(E):
            ep = m + f"experts.{e}."
            gus.append(jnp.concatenate(
                [t(ep + "gate_proj.weight").T, t(ep + "up_proj.weight").T],
                axis=1,
            ))
            downs.append(t(ep + "down_proj.weight").T)
        self._pack_experts(p, jnp.stack(gus), jnp.stack(downs), dtype)
        if self.num_shared:
            sp = m + "shared_experts."
            p["shared_gate_up"] = lin_merged(
                [sp + "gate_proj.weight", sp + "up_proj.weight"], None
            )
            p["shared_down"] = lin_merged([sp + "down_proj.weight"], None)
        return p

    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        cfg = self.config
        out = super()._ffn_apply(lp, h, tp_size, tp_axis)
        if self.num_shared:
            gate_up = apply_linear(h, lp["shared_gate_up"])
            g, u = jnp.split(gate_up, 2, axis=-1)
            shared = apply_linear(
                _act(cfg.act_fn)(g) * u, lp["shared_down"]
            )
            if tp_axis is not None:
                shared = lax.psum(shared, tp_axis)
            out = out + shared  # ungated, always-on (xverse_moe.py:180)
        return out


class OlmoeForCausalLM(Qwen3MoeForCausalLM):
    """OLMoE (Allen AI; reference ``srt/models/olmoe.py``): qwen-moe
    expert naming without a shared expert, plus OLMo-style
    whole-projection q/k RMSNorms applied before the head reshape."""

    def _layer_extra_load(self, i, t, lp, dtype) -> None:
        a = f"model.layers.{i}.self_attn."
        lp["q_norm_flat"] = t(a + "q_norm.weight").astype(dtype)
        lp["k_norm_flat"] = t(a + "k_norm.weight").astype(dtype)
