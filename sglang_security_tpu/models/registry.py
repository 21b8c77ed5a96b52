"""HF architecture-string -> model-class registry.

Parity with ``srt/models/registry.py:16-69``: the loader reads
``config.json.architectures[0]`` and instantiates the matching class.
Families that share a body are aliases of one implementation.
"""

from __future__ import annotations

from typing import Dict, Type

from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.models.llama import LlamaForCausalLM
from sglang_security_tpu.models.llama_eagle import EagleLlamaForCausalLM
from sglang_security_tpu.models.llama_eagle3 import Eagle3LlamaForCausalLM
from sglang_security_tpu.models.gemma2 import (
    Gemma2ForCausalLM,
    Gemma3ForCausalLM,
    GemmaForCausalLM,
)
from sglang_security_tpu.models.deepseek_v2 import (
    DeepseekV2ForCausalLM,
    DeepseekV3ForCausalLM,
)
from sglang_security_tpu.models.deepseek_nextn import (
    DeepseekV3ForCausalLMNextN,
)
from sglang_security_tpu.models.mixtral import (
    MixtralForCausalLM,
    OlmoeForCausalLM,
    Qwen2MoeForCausalLM,
    Qwen3MoeForCausalLM,
    XverseMoeForCausalLM,
)
from sglang_security_tpu.models.grok import Grok1ForCausalLM
from sglang_security_tpu.models.phi3_small import Phi3SmallForCausalLM
from sglang_security_tpu.models.phi3 import (
    InternLM2ForCausalLM,
    Phi3ForCausalLM,
)
from sglang_security_tpu.models.llava import LlavaForConditionalGeneration
from sglang_security_tpu.models.llavavid import LlavaVidForCausalLM
from sglang_security_tpu.models.yivl import YiVLForCausalLM
from sglang_security_tpu.models.mimo_mtp import MiMoMTP
from sglang_security_tpu.models.internvl import InternVLChatModel
from sglang_security_tpu.models.deepseek_vl2 import DeepseekVL2ForCausalLM
from sglang_security_tpu.models.minicpmv import MiniCPMO, MiniCPMV
from sglang_security_tpu.models.kimi_vl import KimiVLForConditionalGeneration
from sglang_security_tpu.models.janus_pro import MultiModalityCausalLM
from sglang_security_tpu.models.clip import CLIPModel
from sglang_security_tpu.models.phi4mm import Phi4MMForCausalLM
from sglang_security_tpu.models.mllama import MllamaForConditionalGeneration
from sglang_security_tpu.models.idefics2 import (
    Idefics2ForConditionalGeneration,
    Idefics3ForConditionalGeneration,
)
from sglang_security_tpu.models.qwen2_vl import (
    Qwen2VLForConditionalGeneration,
    Qwen2_5_VLForConditionalGeneration,
)
from sglang_security_tpu.models.glm4 import Glm4ForCausalLM, GlmForCausalLM
from sglang_security_tpu.models.olmo2 import Olmo2ForCausalLM
from sglang_security_tpu.models.stablelm import StableLmForCausalLM
from sglang_security_tpu.models.cohere import CohereForCausalLM
from sglang_security_tpu.models.granite import GraniteForCausalLM
from sglang_security_tpu.models.starcoder2 import Starcoder2ForCausalLM
from sglang_security_tpu.models.reward import (
    LlamaEmbeddingModel,
    LlamaForSequenceClassification,
    Qwen2ForRewardModel,
    Qwen2ForSequenceClassification,
    _make_score_head,
)
from sglang_security_tpu.models.olmo import OlmoForCausalLM
from sglang_security_tpu.models.exaone import ExaoneForCausalLM
from sglang_security_tpu.models.minicpm import (
    MiniCPM3ForCausalLM,
    MiniCPMForCausalLM,
)
from sglang_security_tpu.models.baichuan import BaichuanForCausalLM
from sglang_security_tpu.models.gpt2 import (
    GPT2LMHeadModel,
    GPTBigCodeForCausalLM,
)
from sglang_security_tpu.models.qwen import QWenLMHeadModel
from sglang_security_tpu.models.chatglm import ChatGLMForCausalLM
from sglang_security_tpu.models.dbrx import DbrxForCausalLM
from sglang_security_tpu.models.bert import BertModel, XLMRobertaModel
from sglang_security_tpu.models.llama4 import Llama4ForCausalLM
from sglang_security_tpu.models.mllama4 import (
    Llama4ForConditionalGeneration,
)
from sglang_security_tpu.models.gemma3_mm import (
    Gemma3ForConditionalGeneration,
)

MODEL_REGISTRY: Dict[str, Type] = {
    "LlamaForCausalLM": LlamaForCausalLM,
    "MistralForCausalLM": LlamaForCausalLM,
    "Qwen2ForCausalLM": LlamaForCausalLM,
    "Qwen3ForCausalLM": LlamaForCausalLM,
    "TinyLlamaForCausalLM": LlamaForCausalLM,
    # same body + config switches (bias/rope/tie all come from config.json)
    "YiForCausalLM": LlamaForCausalLM,
    "SmolLMForCausalLM": LlamaForCausalLM,
    "LlamaForCausalLMEagle": EagleLlamaForCausalLM,
    "LlamaForCausalLMEagle3": Eagle3LlamaForCausalLM,
    # Quantized Mixtral checkpoints too: the reference keeps a separate
    # mixtral_quant.py because its fused-MoE kernels lack quant support
    # (per-expert ReplicatedLinear fallback); here quantization composes
    # with the grouped-expert path directly (layers/moe.py
    # pack_expert_params + quantize_experts, tests/test_moe.py w8a8), so
    # one class serves both (reference mixtral.py + mixtral_quant.py).
    "MixtralForCausalLM": MixtralForCausalLM,
    "QuantMixtralForCausalLM": MixtralForCausalLM,
    "Grok1ForCausalLM": Grok1ForCausalLM,
    "Grok1ModelForCausalLM": Grok1ForCausalLM,
    "XverseForCausalLM": LlamaForCausalLM,
    "XverseMoeForCausalLM": XverseMoeForCausalLM,
    "Qwen2MoeForCausalLM": Qwen2MoeForCausalLM,
    "Qwen3MoeForCausalLM": Qwen3MoeForCausalLM,
    "OlmoeForCausalLM": OlmoeForCausalLM,
    "DeepseekForCausalLM": DeepseekV2ForCausalLM,  # v1: GQA + same MoE
    "DeepseekV2ForCausalLM": DeepseekV2ForCausalLM,
    "DeepseekV3ForCausalLM": DeepseekV3ForCausalLM,
    "DeepseekV3ForCausalLMNextN": DeepseekV3ForCausalLMNextN,
    "DeepseekVL2ForCausalLM": DeepseekVL2ForCausalLM,
    "KimiVLForConditionalGeneration": KimiVLForConditionalGeneration,
    # Janus-Pro (reference deepseek_janus_pro.py)
    "MultiModalityCausalLM": MultiModalityCausalLM,
    "JanusForConditionalGeneration": MultiModalityCausalLM,
    "GemmaForCausalLM": GemmaForCausalLM,
    "Gemma2ForCausalLM": Gemma2ForCausalLM,
    "Gemma3ForCausalLM": Gemma3ForCausalLM,
    "Gemma3ForConditionalGeneration": Gemma3ForConditionalGeneration,
    "Phi3ForCausalLM": Phi3ForCausalLM,
    "Phi3SmallForCausalLM": Phi3SmallForCausalLM,
    "Phi4ForCausalLM": Phi3ForCausalLM,
    "Phi4MMForCausalLM": Phi4MMForCausalLM,
    "InternLM2ForCausalLM": InternLM2ForCausalLM,
    "InternVLChatModel": InternVLChatModel,
    "InternLM3ForCausalLM": LlamaForCausalLM,
    "LlavaForConditionalGeneration": LlavaForConditionalGeneration,
    # legacy llava-hf export name (reference llava.py LlavaLlamaForCausalLM)
    "LlavaLlamaForCausalLM": LlavaForConditionalGeneration,
    "YiVLForCausalLM": YiVLForCausalLM,
    "LlavaVidForCausalLM": LlavaVidForCausalLM,
    "MllamaForConditionalGeneration": MllamaForConditionalGeneration,
    "Idefics2ForConditionalGeneration": Idefics2ForConditionalGeneration,
    "Idefics3ForConditionalGeneration": Idefics3ForConditionalGeneration,
    "SmolVLMForConditionalGeneration": Idefics3ForConditionalGeneration,
    "Qwen2VLForConditionalGeneration": Qwen2VLForConditionalGeneration,
    "Qwen2_5_VLForConditionalGeneration": Qwen2_5_VLForConditionalGeneration,
    "Glm4ForCausalLM": Glm4ForCausalLM,
    "GlmForCausalLM": GlmForCausalLM,
    "Olmo2ForCausalLM": Olmo2ForCausalLM,
    "StableLmForCausalLM": StableLmForCausalLM,
    "CohereForCausalLM": CohereForCausalLM,
    "GraniteForCausalLM": GraniteForCausalLM,
    "Starcoder2ForCausalLM": Starcoder2ForCausalLM,
    "OlmoForCausalLM": OlmoForCausalLM,
    "ExaoneForCausalLM": ExaoneForCausalLM,
    "MiniCPMForCausalLM": MiniCPMForCausalLM,
    "MiniCPMV": MiniCPMV,
    "MiniCPMO": MiniCPMO,
    "MiniCPM3ForCausalLM": MiniCPM3ForCausalLM,
    "MiMoForCausalLM": LlamaForCausalLM,  # qwen2 body (reference mimo.py)
    "MiMoMTP": MiMoMTP,  # MTP draft head (reference mimo_mtp.py)
    # qwen2-body EAGLE draft checkpoints (reference qwen2_eagle.py)
    "Qwen2ForCausalLMEagle": EagleLlamaForCausalLM,
    "BaichuanForCausalLM": BaichuanForCausalLM,
    "BaiChuanForCausalLM": BaichuanForCausalLM,  # 7B config spelling
    "XverseForCausalLM": LlamaForCausalLM,  # llama body + naming
    "GPT2LMHeadModel": GPT2LMHeadModel,
    "GPTBigCodeForCausalLM": GPTBigCodeForCausalLM,
    "QWenLMHeadModel": QWenLMHeadModel,
    "ChatGLMModel": ChatGLMForCausalLM,
    "ChatGLMForConditionalGeneration": ChatGLMForCausalLM,
    "DbrxForCausalLM": DbrxForCausalLM,
    "Llama4ForCausalLM": Llama4ForCausalLM,
    "Llama4ForConditionalGeneration": Llama4ForConditionalGeneration,
    "Qwen2ForRewardModel": Qwen2ForRewardModel,
    "LlamaForSequenceClassification": LlamaForSequenceClassification,
    "Qwen2ForSequenceClassification": Qwen2ForSequenceClassification,
    "Qwen3ForSequenceClassification": Qwen2ForSequenceClassification,
    # bare-decoder embedding exports (e5-mistral class)
    "LlamaEmbeddingModel": LlamaEmbeddingModel,
    "LlamaModel": LlamaEmbeddingModel,
    "MistralModel": LlamaEmbeddingModel,
    # reward / classification heads on non-llama bodies
    "Gemma2ForSequenceClassification": _make_score_head(Gemma2ForCausalLM),
    "InternLM2ForRewardModel": _make_score_head(
        InternLM2ForCausalLM, head_name="v_head"
    ),
    # bidirectional encoders (embedding path)
    "BertModel": BertModel,
    "CLIPModel": CLIPModel,
    "Contriever": BertModel,
    "RobertaModel": XLMRobertaModel,
    "XLMRobertaModel": XLMRobertaModel,
}


def register_model(name: str, cls: Type) -> None:
    MODEL_REGISTRY[name] = cls


def get_model_class(config: ModelConfig):
    try:
        return MODEL_REGISTRY[config.architecture]
    except KeyError:
        raise ValueError(
            f"Unsupported architecture {config.architecture!r}; known: "
            f"{sorted(MODEL_REGISTRY)}"
        )
