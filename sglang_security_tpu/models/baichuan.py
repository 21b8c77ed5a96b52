"""Baichuan (1/2) 7B decoder.

Capability parity with the reference's ``srt/models/baichuan.py``: the
llama body with Baichuan's fused ``W_pack`` qkv checkpoint tensor,
split at load into q/k/v slices.  Only the rotary (7B-class) variant
is supported; the 13B ALiBi variant is rejected at init (the reference
selects by ``position_embedding``/hidden size, ``baichuan.py:350``).
Baichuan2's NormHead (row-normalized lm_head) is applied at load when
``vocab_size`` marks a v2 checkpoint (125,696).
"""

from __future__ import annotations

import numpy as np

from sglang_security_tpu.models.llama import LlamaForCausalLM

_BAICHUAN2_VOCAB = 125696


class BaichuanForCausalLM(LlamaForCausalLM):
    def __init__(self, config, quantization=None, tp_size: int = 1):
        super().__init__(config, quantization, tp_size)
        # 13B (hidden 5120) uses ALiBi, no rope
        if config.hidden_size >= 5120:
            raise NotImplementedError(
                "Baichuan-13B (ALiBi position encoding) is not supported"
            )

    def load_weights(self, get_tensor, dtype=None):
        import jax.numpy as jnp

        cfg = self.config
        qd = cfg.num_q_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim

        def renamed(name: str):
            parts = name.rsplit(".", 2)
            if (len(parts) == 3 and parts[2] == "weight"
                    and parts[1] in ("q_proj", "k_proj", "v_proj")
                    and parts[0].endswith("self_attn")):
                w = np.asarray(get_tensor(parts[0] + ".W_pack.weight"))
                if parts[1] == "q_proj":
                    return w[:qd]
                if parts[1] == "k_proj":
                    return w[qd : qd + kd]
                return w[qd + kd :]
            if name == "lm_head.weight":
                w = np.asarray(get_tensor(name)).astype(np.float32)
                if cfg.vocab_size == _BAICHUAN2_VOCAB:
                    # Baichuan2 NormHead: rows are L2-normalized at
                    # inference (HF NormHead.forward)
                    w = w / np.maximum(
                        np.linalg.norm(w, axis=1, keepdims=True), 1e-7
                    )
                return w
            return get_tensor(name)

        return super().load_weights(
            renamed, dtype=dtype if dtype is not None else jnp.bfloat16
        )
