"""Llama-family causal decoder (Llama 1/2/3, TinyLlama, Mistral, Qwen2/2.5,
Gemma-style variants share this body via config switches).

Fresh TPU design (compare reference ``srt/models/llama.py:381`` +
``srt/models/qwen2.py``): a pure function over a param pytree, layers
stacked on a leading axis and iterated with ``lax.scan`` (one compile of
one layer body instead of L inlined copies), KV pages threaded through the
scan carry so XLA updates the pool in place, and attention running on the
unified ragged-paged Pallas kernel for both prefill and decode.

Param tree:
  embed: [V, H]
  final_norm: [H]
  lm_head: linear dict (absent if tied)
  layers (stacked over L on every leaf):
    input_norm, post_norm: [H]
    qkv: linear dict  [H, (Hq + 2*Hkv) * hd]
    o: linear dict    [Hq * hd, H]
    gate_up: linear dict [H, 2 * I]
    down: linear dict [I, H]
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_security_tpu.layers.linear import (
    apply_linear,
    make_linear_params,
    merge_for_tp,
)
from sglang_security_tpu.layers.norms import fused_add_rms_norm, rms_norm
from sglang_security_tpu.layers.rotary import apply_rope, compute_inv_freq
from sglang_security_tpu.model_executor.forward_batch import ForwardBatch
from sglang_security_tpu.models.config import ModelConfig
from sglang_security_tpu.ops.ragged_paged_attention import (
    paged_decode_attention,
    paged_verify_attention,
    ragged_paged_attention,
)


def _act(name: str):
    gelu_tanh = functools.partial(jax.nn.gelu, approximate=True)
    return {"silu": jax.nn.silu, "gelu": jax.nn.gelu, "relu": jax.nn.relu,
            "gelu_pytorch_tanh": gelu_tanh, "gelu_new": gelu_tanh,
            "gelu_fast": gelu_tanh}[name]


def _interp_default() -> bool:
    from sglang_security_tpu.utils import use_interpret_mode

    return use_interpret_mode()


def _scatter_kv(k_pages, v_pages, k, v, li, safe_slots):
    """Scatter new-token K/V into layer ``li`` of the head-major pool
    [L, Hkv, tokens, hd].

    Uses explicit (head, slot) index arrays so every scatter update window
    is a single [hd] row: with [T, Hkv, hd]-window updates XLA prefers a
    token-major physical layout for the pool and inserts a full-pool copy
    to satisfy the attention kernel's row-major operand (3 GB per step —
    the round-2 bench OOM), whereas row-window updates are layout-neutral
    and leave the pool row-major end to end.

    Quantized pools arrive as (data, scale) tuples: values are quantized
    per (token, head) symmetrically and the scales scattered alongside
    (reference fused_downcast, memory_pool.py:416)."""

    def one(pages, x):
        pool_hd = (pages[0] if isinstance(pages, tuple) else pages).shape[-1]
        if x.shape[-1] != pool_hd:  # lane-padded pool (kv_cache_head_dim)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pool_hd - x.shape[-1])))
        if isinstance(pages, tuple):
            data, scales = pages
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1)  # [T, Hkv]
            if data.dtype == jnp.int8:
                qmax = 127.0
                cast = lambda y: jnp.clip(jnp.round(y), -127, 127).astype(
                    jnp.int8
                )
            else:  # fp8 e4m3
                qmax = 448.0
                cast = lambda y: y.astype(data.dtype)
            scale = jnp.maximum(amax, 1e-6) / qmax
            xq = cast(xf / scale[:, :, None])
            Hkv = data.shape[1]
            head_idx = jnp.arange(Hkv, dtype=jnp.int32)[:, None]
            slot_idx = safe_slots[None, :]
            data = data.at[li, head_idx, slot_idx].set(
                xq.transpose(1, 0, 2), mode="drop"
            )
            scales = scales.at[li, head_idx, slot_idx].set(
                scale.astype(scales.dtype).T, mode="drop"
            )
            return data, scales
        Hkv = pages.shape[1]
        head_idx = jnp.arange(Hkv, dtype=jnp.int32)[:, None]  # [Hkv, 1]
        slot_idx = safe_slots[None, :]  # [1, T]
        if pages.dtype == jnp.float8_e4m3fn:  # static-scale fp8 pool:
            # saturate (XLA's convert maps out-of-range to NaN)
            x = jnp.clip(x.astype(jnp.float32), -448.0, 448.0)
        return pages.at[li, head_idx, slot_idx].set(
            x.astype(pages.dtype).transpose(1, 0, 2), mode="drop"
        )

    return one(k_pages, k), one(v_pages, v)


class LlamaForCausalLM:
    """Also serves Qwen2ForCausalLM / MistralForCausalLM (registry aliases)."""

    def __init__(
        self,
        config: ModelConfig,
        quantization: Optional[str] = None,
        tp_size: int = 1,
    ):
        self.config = config
        self.quantization = quantization
        # merged projections are column-interleaved per TP shard at load
        # (layers/linear.py merge_for_tp), so `tp_size` is fixed here
        self.tp_size = tp_size
        self.kv_page_size = 32  # set by the runner to ServerArgs.page_size
        self.inv_freq = jnp.asarray(
            compute_inv_freq(config.head_dim, config.rope_theta, config.rope_scaling)
        )

    # ----------------------------------------------------------- FFN hooks
    # Dense SwiGLU by default; MoE models (models/mixtral.py) override.
    def _ffn_params_dummy(self, i, rand, lin, lin_merged, dtype):
        cfg = self.config
        I = cfg.intermediate_size
        return {
            "gate_up": lin_merged(cfg.hidden_size, [I, I], cfg.mlp_bias),
            "down": lin(I, cfg.hidden_size, cfg.mlp_bias),
        }

    def _ffn_params_load(self, i, t, lin_merged, dtype):
        m = f"model.layers.{i}.mlp."
        return {
            "gate_up": lin_merged(
                [m + "gate_proj.weight", m + "up_proj.weight"], None
            ),
            "down": lin_merged([m + "down_proj.weight"], None),
        }

    def _ffn_apply(self, lp, h, tp_size, tp_axis, lora_lp=None,
                   lora_ids=None, lora_scale=None):
        cfg = self.config
        gate_up = apply_linear(h, lp["gate_up"])
        if lora_lp is not None:
            from sglang_security_tpu.lora.lora_manager import apply_lora

            gate_up = gate_up + apply_lora(
                h, lora_lp, "gate_up", lora_ids, lora_scale
            ).astype(gate_up.dtype)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        mlp = _act(cfg.act_fn)(gate) * up
        down = apply_linear(mlp, lp["down"])
        if lora_lp is not None:
            from sglang_security_tpu.lora.lora_manager import apply_lora

            down = down + apply_lora(
                mlp, lora_lp, "down", lora_ids, lora_scale
            ).astype(down.dtype)
        if tp_axis is not None:
            down = lax.psum(down, tp_axis)
        return down

    # ------------------------------------------------------------- params
    def init_dummy_params(
        self, seed: int = 0, dtype=jnp.bfloat16, unique_layers: bool = False
    ):
        """Random weights (reference DummyModelLoader, loader.py:475).

        Generated on device with jax.random.  By default one layer is
        generated and tiled across the stack (perf benchmarking doesn't
        care about values, and per-layer generation of an 8B model costs
        hundreds of dispatches); pass unique_layers=True for distinct
        layer weights.
        """
        cfg = self.config
        key = jax.random.PRNGKey(seed)
        counter = [0]
        H, hd = cfg.hidden_size, cfg.head_dim
        Hq, Hkv, I = cfg.num_q_heads, cfg.num_kv_heads, cfg.intermediate_size

        structured = os.environ.get(
            "SGLANG_TPU_DUMMY_SPECTRUM", ""
        ) == "structured"

        def rand(*shape, scale=None):
            scale = scale or (1.0 / np.sqrt(shape[0]))
            counter[0] += 1
            w = (
                jax.random.normal(
                    jax.random.fold_in(key, counter[0]), shape, jnp.float32
                )
                * scale
            )
            if structured and len(shape) == 2:
                # realistic per-channel dynamic range (quant_fidelity
                # proxy): lognormal column scales + ~1% outlier channels
                # x8 — the weight statistic that actually stresses
                # group-wise int4/int8 quantization in real checkpoints
                counter[0] += 1
                k2 = jax.random.fold_in(key, counter[0])
                s = jnp.exp(
                    0.5 * jax.random.normal(k2, (shape[1],), jnp.float32)
                )
                counter[0] += 1
                k3 = jax.random.fold_in(key, counter[0])
                outlier = (
                    jax.random.uniform(k3, (shape[1],)) < 0.01
                )
                s = jnp.where(outlier, s * 8.0, s)
                # norm-preserving: redistribute dynamic range across
                # channels without inflating the matrix (unnormalized
                # scales compound layer-over-layer into exploding
                # activations and a meaningless 50-nat KL)
                s = s / jnp.sqrt(jnp.mean(s * s))
                w = w * s[None, :]
            return w

        def lin(k, n, bias):
            return make_linear_params(
                rand(k, n),
                bias=jnp.zeros((n,)) if bias else None,
                quantization=self.quantization,
                dtype=dtype,
            )

        def lin_merged(k, ns, bias):
            ws = [rand(k, n) for n in ns]
            bs = [jnp.zeros((n,)) for n in ns] if bias else None
            w, b = merge_for_tp(ws, self.tp_size, bs)
            return make_linear_params(
                w, bias=b, quantization=self.quantization, dtype=dtype
            )

        def one_layer(i):
            p = {
                "input_norm": jnp.ones((H,), dtype),
                "post_norm": jnp.ones((H,), dtype),
                "qkv": lin_merged(
                    H, [Hq * hd, Hkv * hd, Hkv * hd], cfg.qkv_bias
                ),
                "o": lin(Hq * hd, H, cfg.o_bias),
                **self._ffn_params_dummy(i, rand, lin, lin_merged, dtype),
            }
            if cfg.qk_norm:
                p["q_norm"] = jnp.ones((hd,), dtype)
                p["k_norm"] = jnp.ones((hd,), dtype)
            return p

        if unique_layers:
            layers = [one_layer(i) for i in range(cfg.num_layers)]
            stacked = self._stack_layers(layers)
        else:
            one = one_layer(0)
            L = cfg.num_layers
            stacked = jax.tree.map(
                lambda x: jnp.tile(x[None], (L,) + (1,) * x.ndim), one
            )
        params = {
            "embed": rand(cfg.vocab_size, H, scale=0.02).astype(dtype),
            "final_norm": jnp.ones((H,), dtype),
            "layers": stacked,
        }
        if not cfg.tie_word_embeddings:
            if structured:
                # low-rank-DOMINANT head (real lm_heads have fast
                # singular-value decay) built from PLAIN gaussian
                # factors: channel-scaled factors would give the head
                # heavy within-column tails no real checkpoint has,
                # making per-channel int8 look far worse than reality.
                # 0.5x low-rank + 20% full-rank noise lands reference
                # entropy in the plausible-LLM range instead of a
                # near-delta distribution.
                def plain(*shape, scale):
                    counter[0] += 1
                    return jax.random.normal(
                        jax.random.fold_in(key, counter[0]), shape,
                        jnp.float32,
                    ) * scale

                r = min(1024, H)
                w = 0.5 * (
                    plain(H, r, scale=1.0)
                    @ plain(r, cfg.vocab_size, scale=1.0)
                ) / np.sqrt(H * r)
                w = w + 0.2 * plain(
                    H, cfg.vocab_size, scale=1.0 / np.sqrt(H)
                )
            else:
                w = rand(H, cfg.vocab_size)
            params["lm_head"] = make_linear_params(
                w,
                quantization=getattr(self, "lm_head_quant", None),
                dtype=dtype,
            )
        return params

    # ------------------------------------------------- family hooks
    def _sm_scale(self) -> float:
        return self.config.head_dim**-0.5

    def _norm_names(self):
        """Checkpoint names mapped to (input_norm, post_norm)."""
        return "input_layernorm", "post_attention_layernorm"

    def _load_norm(self, t, prefix, dtype):
        """A norm's params: a weight vector by default; LayerNorm
        families (StableLM, Starcoder2) return {"w", "b"} dicts."""
        return t(prefix + ".weight").astype(dtype)

    def _layer_extra_load(self, i, t, lp, dtype) -> None:
        """Per-layer extra/renamed tensors (e.g. OLMo2 flat q/k norms,
        GLM-4 sandwich norms)."""

    def _apply_final_norm(self, x, w):
        return rms_norm(x, w, self.config.rms_eps)

    def _post_embed(self, params, x, fb):
        """Hook after token embedding (learned-position families — GPT-2,
        GPT-BigCode — add ``params["wpe"][fb.positions]`` here)."""
        return x

    def _logit_scale(self) -> float:
        """Multiplier on the lm-head logits (Cohere logit_scale,
        Granite 1/logits_scaling)."""
        return 1.0

    def pool(self, params, hidden):
        """Pooling head for the encode path (reference
        srt/layers/pooler.py LAST + normalize): L2-normalized last-token
        hidden states.  Reward/classification models override with
        their score heads."""
        h = hidden.astype(jnp.float32)
        return h / jnp.maximum(
            jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9
        )

    def load_weights(self, get_tensor, dtype=jnp.bfloat16):
        """Build params from a name->np.ndarray accessor over an HF checkpoint.

        HF stores linear weights as [out, in]; we transpose to [in, out].
        QKV and gate/up are merged at load (reference MergedColumnParallel /
        QKVParallelLinear weight_loader behavior, linear.py:420-760).
        """
        cfg = self.config
        hd, Hq, Hkv = cfg.head_dim, cfg.num_q_heads, cfg.num_kv_heads

        def t(name):
            return jnp.asarray(get_tensor(name)).astype(jnp.float32)

        def lin_merged(names, bias_names):
            from sglang_security_tpu.layers.linear import load_merged_linear

            return load_merged_linear(
                get_tensor, names, bias_names,
                quantization=self.quantization,
                tp_size=self.tp_size, dtype=dtype,
            )

        n_in, n_post = self._norm_names()
        layers = []
        for i in range(cfg.num_layers):
            p = f"model.layers.{i}."
            a = p + "self_attn."
            m = p + "mlp."
            lp = {
                "input_norm": self._load_norm(t, p + n_in, dtype),
                "post_norm": self._load_norm(t, p + n_post, dtype),
                "qkv": lin_merged(
                    [a + "q_proj.weight", a + "k_proj.weight", a + "v_proj.weight"],
                    [a + "q_proj.bias", a + "k_proj.bias", a + "v_proj.bias"]
                    if cfg.qkv_bias
                    else None,
                ),
                "o": lin_merged(
                    [a + "o_proj.weight"],
                    [a + "o_proj.bias"] if cfg.o_bias else None,
                ),
                **self._ffn_params_load(i, t, lin_merged, dtype),
            }
            if cfg.qk_norm:
                lp["q_norm"] = t(a + "q_norm.weight").astype(dtype)
                lp["k_norm"] = t(a + "k_norm.weight").astype(dtype)
            self._layer_extra_load(i, t, lp, dtype)
            layers.append(lp)
        stacked = self._stack_layers(layers)
        params = {
            "embed": t("model.embed_tokens.weight").astype(dtype),
            "final_norm": self._load_norm(t, "model.norm", dtype),
            "layers": stacked,
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = make_linear_params(
                t("lm_head.weight").T,
                quantization=getattr(self, "lm_head_quant", None),
                dtype=dtype,
            )
        return params

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params,
        k_pages: jax.Array,  # [L, Hkv, P, ps, hd]
        v_pages: jax.Array,
        fb: ForwardBatch,
        *,
        block_q: int,
        pages_per_block: int = 8,
        interpret: Optional[bool] = None,
        tp_size: int = 1,
        tp_axis: Optional[str] = None,
        pp_axis: Optional[str] = None,  # pipeline axis (inside shard_map)
        pp_size: int = 1,
        pp_microbatches: int = 1,
        dp_axis: Optional[str] = None,  # dp-attention axis (inside shard_map)
        lora=None,  # LoRAManager.step_params() pytree, or None
        return_all: bool = False,  # also return every row's hidden (EAGLE)
        spec_verify: bool = False,  # fused-spec verify: block_q rows/seq,
        # new KV lands via the verify kernel's in-kernel RMW (no scatter)
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (selected_hidden [S, H], k_pages, v_pages); with
        ``return_all``, (selected, all_hidden [T, H], k_pages, v_pages) —
        the per-token features EAGLE's draft prefill consumes
        (reference eagle_worker.py:320 capture_hidden_mode).

        With ``tp_axis`` set (inside shard_map over a mesh), params and KV
        arrive pre-sharded: column-parallel projections produce local
        heads; row-parallel outputs are psum'd over the axis — the same
        collective points where the reference issues NCCL all-reduce.
        """
        from sglang_security_tpu.mem_cache.kv_pool import kv_data

        cfg = self.config
        T = fb.token_ids.shape[0]
        num_tokens = kv_data(k_pages).shape[2]  # [L, Hkv, tokens, hd]

        x = params["embed"][fb.token_ids]  # [T, H]
        if self._embed_scale() != 1.0:
            x = x * jnp.asarray(self._embed_scale(), x.dtype)
        x = self._post_embed(params, x, fb)
        if fb.mm_embeds is not None and fb.mm_rows is not None:
            # VLM prefill: image-token rows carry hash-derived pseudo ids
            # (>= vocab, gather clamps); substitute the projected vision
            # features (reference general_mm_embed_routine)
            safe_rows = jnp.clip(fb.mm_rows, 0, fb.mm_embeds.shape[0] - 1)
            x = jnp.where(
                (fb.mm_rows >= 0)[:, None],
                fb.mm_embeds[safe_rows].astype(x.dtype),
                x,
            )
        if pp_axis is not None:
            assert lora is None and not return_all, (
                "LoRA/EAGLE are not supported with pipeline parallelism"
            )
            return self._forward_pp(
                params, x, k_pages, v_pages, fb,
                block_q=block_q, pages_per_block=pages_per_block,
                interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
                pp_axis=pp_axis, pp_size=pp_size,
                pp_microbatches=pp_microbatches,
            )

        safe_slots = jnp.where(fb.slots < 0, num_tokens, fb.slots)

        lora_scale = lora["scale"] if lora is not None else None
        lora_ids = fb.lora_ids
        # EAGLE3: capture the residual stream before 3 target layers
        # (set by EagleWorker; reference capture_aux_hidden_states,
        # llama.py:329-332 + set_eagle3_layers_to_capture :700)
        aux_layers = (
            getattr(self, "eagle3_aux_layers", None) if return_all else None
        )

        def body(carry, xs):
            if aux_layers is not None:
                x, k_pages, v_pages, aux = carry
            else:
                x, k_pages, v_pages = carry
            if lora is not None:
                lp, li, lora_lp = xs
            else:
                lp, li = xs
                lora_lp = None
            if aux_layers is not None:
                aux = tuple(
                    jnp.where(jnp.equal(li, al), x, a)
                    for al, a in zip(aux_layers, aux)
                )

            x, k_pages, v_pages = self._layer_apply(
                lp, x,
                lambda h: self._attn_apply(
                    lp, h, fb, k_pages, v_pages, li, safe_slots,
                    block_q=block_q, pages_per_block=pages_per_block,
                    interpret=interpret, tp_size=tp_size, tp_axis=tp_axis,
                    lora_lp=lora_lp, lora_ids=lora_ids,
                    lora_scale=lora_scale, spec_verify=spec_verify,
                ),
                lambda h: self._ffn_apply(
                    lp, h, tp_size, tp_axis,
                    lora_lp=lora_lp, lora_ids=lora_ids,
                    lora_scale=lora_scale,
                ),
            )
            if aux_layers is not None:
                return (x, k_pages, v_pages, aux), None
            return (x, k_pages, v_pages), None

        carry = (x, k_pages, v_pages)
        if aux_layers is not None:
            carry += (tuple(jnp.zeros_like(x) for _ in aux_layers),)
        li0 = 0
        for group in self._param_groups(params):
            if isinstance(group, dict) and "__cross__" in group:
                # cross-attention layer (mllama): reads the per-request
                # vision KV pool (fb.cross), writes nothing, no self-KV
                # layer index — does not advance li0
                x_cur = self._cross_layer_apply(
                    group["__cross__"], group["ci"], carry[0], fb,
                    block_q=block_q, interpret=interpret,
                    tp_size=tp_size, tp_axis=tp_axis,
                )
                carry = (x_cur,) + tuple(carry[1:])
                continue
            if isinstance(group, list):
                # Unrolled layers (serving fast path): per-layer param
                # buffers referenced directly — lax.scan's per-iteration
                # xs dynamic-slice would materialize each layer's weights
                # before every Pallas matmul, burning HBM bandwidth equal
                # to a full extra weight read per step.
                for j, lp in enumerate(group):
                    li = li0 + j
                    if lora is not None:
                        lora_lp = jax.tree.map(
                            lambda a: a[li],
                            {t: lora[t] for t in ("qkv", "o", "gate_up", "down")},
                        )
                        xs_j = (lp, li, lora_lp)
                    else:
                        xs_j = (lp, li)
                    carry, _ = body(carry, xs_j)
                li0 += len(group)
                continue
            n_layers = jax.tree.leaves(group)[0].shape[0]
            if lora is not None:
                lora_layers = {
                    t: lora[t] for t in ("qkv", "o", "gate_up", "down")
                }
                xs = (group, li0 + jnp.arange(n_layers), lora_layers)
            else:
                xs = (group, li0 + jnp.arange(n_layers))
            carry, _ = lax.scan(body, carry, xs)
            li0 += n_layers
        x, k_pages, v_pages = carry[:3]
        x = self._apply_final_norm(x, params["final_norm"])
        sel = x[jnp.clip(fb.out_rows, 0, T - 1)]  # [S, H]
        if dp_axis is not None:
            # DP attention: rows (and KV) were sharded over dp; gather
            # each shard's selected hidden states so logits + sampling
            # run replicated (keeps sampler/penalty state consistent
            # across shards).  This is the one extra collective the
            # dp-attention path needs (reference dp_gather,
            # layers/dp_attention.py:224).
            assert lora is None and not return_all
            sel = lax.all_gather(sel, dp_axis, axis=0, tiled=True)
        if return_all:
            if aux_layers is not None:
                # EAGLE3 features: concat of the captured residual
                # streams [T, 3*H] (reference aux_hidden_states)
                x = jnp.concatenate(carry[3], axis=-1)
            return sel, x, k_pages, v_pages
        return sel, k_pages, v_pages

    def _forward_pp(
        self, params, x, k_pages, v_pages, fb, *, block_q,
        pages_per_block, interpret, tp_size, tp_axis,
        pp_axis, pp_size, pp_microbatches,
    ):
        """GPipe-style in-jit pipeline over the ``pp`` mesh axis.

        Runs inside shard_map: ``params['layers']`` and the KV pool arrive
        sharded on the layer dim, so each stage owns L/pp layers and their
        KV rows.  Decode batches split into microbatches along the
        sequence dim; activations hop stage→stage via ``lax.ppermute``
        each tick (n + pp − 1 ticks total), which is the TPU-native form
        of the reference's PP event loop + P2P sends
        (``srt/managers/scheduler.py:728`` event_loop_pp,
        ``distributed/parallel_state.py`` send/recv groups).  Inactive
        (bubble) ticks run with slots = −1, so they never write KV.
        Prefill / verify batches run as one microbatch (bubble = pp − 1).
        """
        from sglang_security_tpu.mem_cache.kv_pool import kv_data

        cfg = self.config
        T, H = x.shape
        S = fb.kv_lens.shape[0]
        num_tokens = kv_data(k_pages).shape[2]
        layers = params["layers"]
        assert not isinstance(layers, list), (
            "pipeline parallelism needs stacked layers (no unroll_layers)"
        )
        n_local = jax.tree.leaves(layers)[0].shape[0]
        stage = lax.axis_index(pp_axis)
        Pn = pp_size
        decode_shaped = block_q == 1 and T == S
        n = pp_microbatches if (
            decode_shaped and pp_microbatches > 1 and T % pp_microbatches == 0
        ) else 1
        Tm = T // n
        xm = x.reshape(n, Tm, H)

        def part(a):
            return a.reshape((n, Tm) + a.shape[1:])

        def fb_at(mbc, active):
            if n == 1:
                slots = jnp.where(active, fb.slots, -1)
                return fb._replace(slots=slots, lora_ids=None,
                                   mm_embeds=None, mm_rows=None)
            return ForwardBatch(
                token_ids=part(fb.token_ids)[mbc],
                positions=part(fb.positions)[mbc],
                slots=jnp.where(active, part(fb.slots)[mbc], -1),
                q_starts=jnp.arange(Tm, dtype=jnp.int32),
                q_lens=part(fb.q_lens)[mbc],
                kv_lens=part(fb.kv_lens)[mbc],
                page_indices=part(fb.page_indices)[mbc],
                out_rows=jnp.zeros((Tm,), jnp.int32),  # unused per tick
            )

        def run_stage(h, k_pages, v_pages, fb_t):
            safe_slots = jnp.where(fb_t.slots < 0, num_tokens, fb_t.slots)

            def body(carry, xs):
                h, k_pages, v_pages = carry
                lp, li = xs
                h, k_pages, v_pages = self._layer_apply(
                    lp, h,
                    lambda hn: self._attn_apply(
                        lp, hn, fb_t, k_pages, v_pages, li, safe_slots,
                        block_q=block_q, pages_per_block=pages_per_block,
                        interpret=interpret, tp_size=tp_size,
                        tp_axis=tp_axis,
                    ),
                    lambda hn: self._ffn_apply(lp, hn, tp_size, tp_axis),
                )
                return (h, k_pages, v_pages), None

            (h, k_pages, v_pages), _ = lax.scan(
                body, (h, k_pages, v_pages),
                (layers, jnp.arange(n_local)),
            )
            return h, k_pages, v_pages

        h_recv = jnp.zeros((Tm, H), x.dtype)
        outs = jnp.zeros((n, Tm, H), x.dtype)
        is_last = stage == Pn - 1
        for t in range(n + Pn - 1):
            mb = t - stage
            mbc = jnp.clip(mb, 0, n - 1)
            active = jnp.logical_and(mb >= 0, mb < n)
            fb_t = fb_at(mbc, active)
            h_in = jnp.where(stage == 0, xm[mbc], h_recv)
            h_out, k_pages, v_pages = run_stage(h_in, k_pages, v_pages, fb_t)
            outs = outs.at[mbc].set(
                jnp.where(jnp.logical_and(active, is_last), h_out, outs[mbc])
            )
            if t < n + Pn - 2:
                h_recv = lax.ppermute(
                    h_out, pp_axis, [(i, i + 1) for i in range(Pn - 1)]
                )
        # only the last stage holds real outputs; replicate across pp
        x = lax.psum(outs, pp_axis).reshape(T, H)
        x = self._apply_final_norm(x, params["final_norm"])
        sel = x[jnp.clip(fb.out_rows, 0, T - 1)]
        return sel, k_pages, v_pages

    def _stack_layers(self, layers):
        """Stack homogeneous per-layer dicts for lax.scan; heterogeneous
        families (Llama4's dense/MoE interleave) override to keep the
        per-layer list (forward()'s unrolled path handles either)."""
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    def unroll_params(self, params):
        """Convert stacked layer groups to per-layer buffer lists (the
        serving fast path; see forward()). One-time device copy at load."""
        out = dict(params)
        for key in ("layers", "dense_layers"):
            if key in params and not isinstance(params[key], list):
                stacked = params[key]
                L = jax.tree.leaves(stacked)[0].shape[0]
                out[key] = [
                    jax.tree.map(lambda a, i=i: a[i], stacked)
                    for i in range(L)
                ]
        return out

    def _embed_scale(self) -> float:
        return 1.0  # gemma scales embeddings by sqrt(hidden)

    def _param_groups(self, params):
        """Stacked layer groups scanned in order (heterogeneous models —
        e.g. DeepSeek's first-k-dense-then-MoE — return several)."""
        return [params["layers"]]

    def _layer_apply(self, lp, x, attn_fn, ffn_fn):
        """One decoder layer's norm/residual structure (pre-norm default;
        Llama/Mistral/Qwen).  ``attn_fn(h) -> (o, k_pages, v_pages)``,
        ``ffn_fn(h) -> out``.  Post-norm families (OLMo2), LayerNorm
        families (StableLM), and parallel-block families (Cohere)
        override this one hook; sandwich-norm families (Gemma2, GLM-4)
        instead wrap extra norms inside _attn_apply/_ffn_apply."""
        cfg = self.config
        h, resid = fused_add_rms_norm(x, None, lp["input_norm"], cfg.rms_eps)
        o, k_pages, v_pages = attn_fn(h)
        x = resid + o
        h, resid = fused_add_rms_norm(x, None, lp["post_norm"], cfg.rms_eps)
        x = resid + ffn_fn(h)
        return x, k_pages, v_pages

    def _attn_apply(
        self, lp, h, fb, k_pages, v_pages, li, safe_slots, *,
        block_q, pages_per_block, interpret, tp_size, tp_axis,
        lora_lp=None, lora_ids=None, lora_scale=None, spec_verify=False,
    ):
        """Standard GQA attention (MLA models override; models/deepseek_v2.py)."""
        cfg = self.config
        T = h.shape[0]
        hd = cfg.head_dim
        Hq, Hkv = cfg.num_q_heads // tp_size, cfg.num_kv_heads // tp_size

        qkv = apply_linear(h, lp["qkv"])
        if lora_lp is not None:
            from sglang_security_tpu.lora.lora_manager import apply_lora

            qkv = qkv + apply_lora(
                h, lora_lp, "qkv", lora_ids, lora_scale
            ).astype(qkv.dtype)
        clip = getattr(self, "clip_qkv", None)
        if clip:  # OLMo-0424 / DBRX qkv clamping
            qkv = jnp.clip(qkv, -clip, clip)
        q, k, v = jnp.split(qkv, [Hq * hd, (Hq + Hkv) * hd], axis=-1)
        if "q_norm_flat" in lp:  # whole-projection RMSNorm (OLMo2)
            q = rms_norm(q, lp["q_norm_flat"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm_flat"], cfg.rms_eps)
        q = q.reshape(T, Hq, hd)
        k = k.reshape(T, Hkv, hd)
        v = v.reshape(T, Hkv, hd)
        if "q_norm" in lp:  # per-head QK RMSNorm (Qwen3-family)
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q, k = self._rope_qk_lp(lp, q, k, fb)

        if fb.tree is not None:
            attn, k_pages, v_pages = self._tree_attn(
                q, k, v, fb, k_pages, v_pages, li, safe_slots,
                interpret=interpret,
            )
            attn2 = attn.reshape(T, Hq * hd)
            o = apply_linear(attn2, lp["o"])
            if lora_lp is not None:
                from sglang_security_tpu.lora.lora_manager import apply_lora

                o = o + apply_lora(
                    attn2, lora_lp, "o", lora_ids, lora_scale
                ).astype(o.dtype)
            if tp_axis is not None:
                o = lax.psum(o, tp_axis)
            return o, k_pages, v_pages

        ds = getattr(self, "ds_cfg", None)
        if (
            spec_verify
            and not isinstance(k_pages, tuple)
            and cfg.sliding_window is None
        ):
            # fused-spec verify: block_q new rows per sequence attend
            # paged prefix + in-register new KV in one kernel that also
            # lands the rows in the pool (no XLA scatter, no generic
            # prefill-path grid) — ops/ragged_paged_attention.py
            # paged_verify_attention
            S = T // block_q
            attn, k_pages, v_pages = paged_verify_attention(
                q.reshape(S, block_q, Hq, hd), k_pages, v_pages,
                fb.kv_lens, fb.q_lens, fb.page_indices,
                k.reshape(S, block_q, Hkv, hd),
                v.reshape(S, block_q, Hkv, hd),
                fb.slots.reshape(S, block_q),
                page_size=self.kv_page_size, layer=li,
                sm_scale=self._sm_scale(), soft_cap=cfg.attn_softcap,
                interpret=interpret,
            )
            attn = attn.reshape(T, Hq, hd)
        elif (
            ds is not None
            and block_q == 1
            and not isinstance(k_pages, tuple)
            and fb.page_indices.shape[1] * self.kv_page_size
            >= ds["threshold"]
        ):
            # double sparsity: the padded context bucket crossed the
            # threshold, so this compiled variant uses token-sparse
            # decode attention (ops/double_sparsity.py); shorter-context
            # buckets keep the dense fused kernel
            from sglang_security_tpu.ops.double_sparsity import (
                sparse_decode_attention,
            )

            k_pages, v_pages = _scatter_kv(
                k_pages, v_pages, k, v, li, safe_slots
            )
            attn = sparse_decode_attention(
                q, k_pages, v_pages, fb.kv_lens, fb.page_indices,
                ds["channels"][li], li,
                heavy_tokens=ds["heavy_tokens"],
                page_size=self.kv_page_size,
                sm_scale=self._sm_scale(),
            )
        elif block_q == 1 and not isinstance(k_pages, tuple):
            # decode fast path: the kernel writes the new token's K/V into
            # the (aliased) pool itself — no XLA scatter on the hot loop
            attn, k_pages, v_pages = paged_decode_attention(
                q, k_pages, v_pages, fb.kv_lens, fb.page_indices,
                page_size=self.kv_page_size,
                layer=li,
                sm_scale=self._sm_scale(),
                sliding_window=cfg.sliding_window,
                soft_cap=cfg.attn_softcap,
                interpret=interpret,
                k_new=k, v_new=v, slots=fb.slots,
            )
        elif (
            block_q == 1
            and isinstance(k_pages, tuple)
            and k_pages[0].dtype == jnp.int8
            and (
                self.kv_page_size % 128 == 0
                or (interpret if interpret is not None
                    else _interp_default())
            )
        ):
            # int8-KV decode fast path: int8-native attention (int8 MXU
            # dots, post-dot scale dequant) + in-kernel quantize/RMW of
            # the new token — no scatter, no int8->bf16 block retile
            kd, ks = k_pages
            vd, vs = v_pages
            attn, kd, vd, ks, vs = paged_decode_attention(
                q, kd, vd, fb.kv_lens, fb.page_indices,
                page_size=self.kv_page_size,
                layer=li,
                sm_scale=self._sm_scale(),
                sliding_window=cfg.sliding_window,
                soft_cap=cfg.attn_softcap,
                interpret=interpret,
                k_scales=ks, v_scales=vs,
                k_new=k, v_new=v, slots=fb.slots,
            )
            k_pages, v_pages = (kd, ks), (vd, vs)
        else:
            k_pages, v_pages = _scatter_kv(
                k_pages, v_pages, k, v, li, safe_slots
            )
            attn = self._paged_attention(
                q, k_pages, v_pages, fb, li,
                sm_scale=self._sm_scale(),
                sliding_window=cfg.sliding_window,
                soft_cap=cfg.attn_softcap,
                block_q=block_q,
                pages_per_block=pages_per_block,
                interpret=interpret,
            )
        attn2 = attn.reshape(T, Hq * hd)
        o = apply_linear(attn2, lp["o"])
        if lora_lp is not None:
            from sglang_security_tpu.lora.lora_manager import apply_lora

            o = o + apply_lora(
                attn2, lora_lp, "o", lora_ids, lora_scale
            ).astype(o.dtype)
        if tp_axis is not None:
            o = lax.psum(o, tp_axis)
        return o, k_pages, v_pages

    def _cross_layer_apply(
        self, clp, ci, x, fb, *, block_q, interpret, tp_size, tp_axis,
    ):
        """One gated cross-attention layer (mllama; reference
        ``srt/models/mllama.py:587`` MllamaCrossAttentionDecoderLayer).

        The vision K/V pool arrives in ``fb.cross`` in the same paged
        layout as the self-attention pool, so prefill runs the ragged
        kernel with ``causal=False`` and decode the fused decode kernel
        — the per-request vision context is just another page table.
        Rows with no image (``has_tok == 0``) reduce to the identity,
        the per-row form of HF's text-only layer skip."""
        cfg = self.config
        cross = fb.cross
        T = x.shape[0]
        hd = cfg.head_dim
        Hq = cfg.num_q_heads // tp_size
        h, resid = fused_add_rms_norm(x, None, clp["input_norm"], cfg.rms_eps)
        q = apply_linear(h, clp["q"]).reshape(T, Hq, hd)
        q = rms_norm(q, clp["q_norm"], cfg.rms_eps)
        if block_q == 1:
            attn = paged_decode_attention(
                q, cross["k_pages"], cross["v_pages"],
                cross["kv_lens"], cross["page_indices"],
                page_size=self.kv_page_size, layer=ci,
                sm_scale=hd**-0.5, interpret=interpret,
            )
        else:
            attn = ragged_paged_attention(
                q, cross["k_pages"], cross["v_pages"],
                cross["kv_lens"], cross["page_indices"],
                fb.q_starts, fb.q_lens,
                page_size=self.kv_page_size, layer=ci,
                sm_scale=hd**-0.5, block_q=block_q,
                pages_per_block=max(1, min(8, 256 // self.kv_page_size)),
                interpret=interpret, causal=False,
            )
        o = apply_linear(attn.reshape(T, Hq * hd), clp["o"])
        if tp_axis is not None:
            o = lax.psum(o, tp_axis)
        has = cross["has_tok"][:, None].astype(x.dtype)  # [T, 1] 0/1
        x = resid + jnp.tanh(
            clp["gate_attn"].astype(jnp.float32)
        ).astype(x.dtype) * o * has
        h, resid = fused_add_rms_norm(x, None, clp["post_norm"], cfg.rms_eps)
        mlp = self._ffn_apply(clp, h, tp_size, tp_axis)
        x = resid + jnp.tanh(
            clp["gate_mlp"].astype(jnp.float32)
        ).astype(x.dtype) * mlp * has
        return x

    def _tree_attn(
        self, q, k, v, fb, k_pages, v_pages, li, safe_slots, *, interpret
    ):
        """EAGLE tree attention: prefix (paged, non-causal, all rows see
        the committed [0, n-1)) ⊕ dense masked attention among the tree
        rows, merged by log-sum-exp (reference tree-mask verification,
        ``eagle_utils.cu`` / ``build_eagle_tree.py``; TPU design notes in
        ops/tree_attention.py).

        Verify mode: k_pages/v_pages are the real pool — tree-row K/V is
        scattered at scratch slots for the post-accept commit copy, and
        the dense block uses the in-batch K/V directly.
        Draft mode (``k_pool`` in fb.tree): k_pages/v_pages thread the
        [L, S, W, Hkv, hd] tree-KV carry; the pool (for the prefix part)
        rides in fb.tree; the new rows are appended to the carry at
        column fb.tree["col"]."""
        from sglang_security_tpu.ops.tree_attention import (
            merge_attention_states,
            tree_self_attention,
        )

        cfg = self.config
        tree = fb.tree
        T, Hq, hd = q.shape
        Hkv = k.shape[1]
        S = tree["mask"].shape[0]
        R = T // S
        assert cfg.sliding_window is None, "tree verify + SWA not wired"
        draft_mode = "k_pool" in tree
        if draft_mode:
            pk, pv = tree["k_pool"], tree["v_pool"]
        else:
            k_pages, v_pages = _scatter_kv(
                k_pages, v_pages, k, v, li, safe_slots
            )
            pk, pv = k_pages, v_pages
        k_scales = v_scales = None
        if isinstance(pk, tuple):
            pk, k_scales = pk
            pv, v_scales = pv
        op, lsep = ragged_paged_attention(
            q, pk, pv, tree["prefix_kv_lens"], fb.page_indices,
            fb.q_starts, fb.q_lens,
            page_size=self.kv_page_size, layer=li,
            sm_scale=self._sm_scale(), soft_cap=cfg.attn_softcap,
            block_q=R,
            pages_per_block=max(1, min(8, 256 // self.kv_page_size)),
            causal=False, return_lse=True, interpret=interpret,
            k_scales=k_scales, v_scales=v_scales,
        )
        q4 = q.reshape(S, R, Hq, hd)
        k4 = k.reshape(S, R, Hkv, hd)
        v4 = v.reshape(S, R, Hkv, hd)
        if draft_mode:
            kc = jnp.concatenate(
                [lax.dynamic_index_in_dim(k_pages, li, 0, keepdims=False),
                 k4], axis=1,
            )
            vc = jnp.concatenate(
                [lax.dynamic_index_in_dim(v_pages, li, 0, keepdims=False),
                 v4], axis=1,
            )
        else:
            kc, vc = k4, v4
        ot, lset = tree_self_attention(
            q4, kc, vc, tree["mask"],
            sm_scale=self._sm_scale(), soft_cap=cfg.attn_softcap,
        )
        merged = merge_attention_states(
            op.astype(jnp.float32).reshape(S, R, Hq, hd),
            lsep.reshape(S, R, Hq),
            ot, lset,
        )
        attn = merged.reshape(T, Hq, hd).astype(q.dtype)
        if draft_mode:
            col = tree["col"]
            k_pages = lax.dynamic_update_slice(
                k_pages, k4[None].astype(k_pages.dtype), (li, 0, col, 0, 0)
            )
            v_pages = lax.dynamic_update_slice(
                v_pages, v4[None].astype(v_pages.dtype), (li, 0, col, 0, 0)
            )
        return attn, k_pages, v_pages

    def _rope_qk_lp(self, lp, q, k, fb):
        """Layer-param-aware rotary hook (families with per-layer rope
        behavior — Llama4 NoPE layers — override this one)."""
        return self._rope_qk(q, k, fb)

    def _rope_qk(self, q, k, fb):
        """Rotary application hook (M-RoPE models override;
        models/qwen2_vl.py)."""
        hd = self.config.head_dim
        rot = getattr(self, "rotary_dim", hd)
        if rot < hd:  # partial rotary (GLM-4, StableLM, Phi-class)
            qr, kr = apply_rope(
                q[..., :rot], k[..., :rot], fb.positions, self.inv_freq
            )
            q = jnp.concatenate([qr, q[..., rot:]], axis=-1)
            k = jnp.concatenate([kr, k[..., rot:]], axis=-1)
            return q, k
        return apply_rope(q, k, fb.positions, self.inv_freq)

    def _paged_attention(
        self, q, k_pages, v_pages, fb, li, *, sm_scale, sliding_window,
        soft_cap, block_q, pages_per_block, interpret,
    ):
        """Dispatch decode (block_q==1) to the specialized multi-seq-per-cell
        kernel; prefill/extend/verify to the generic ragged kernel.
        Quantized KV (data, scale) tuples unpack into the kernels' in-VMEM
        dequant path."""
        k_scales = v_scales = None
        if isinstance(k_pages, tuple):
            k_pages, k_scales = k_pages
            v_pages, v_scales = v_pages
        if block_q == 1:
            return paged_decode_attention(
                q, k_pages, v_pages, fb.kv_lens, fb.page_indices,
                page_size=self.kv_page_size,
                layer=li,
                sm_scale=sm_scale,
                sliding_window=sliding_window,
                soft_cap=soft_cap,
                interpret=interpret,
                k_scales=k_scales,
                v_scales=v_scales,
            )
        return ragged_paged_attention(
            q, k_pages, v_pages, fb.kv_lens, fb.page_indices,
            fb.q_starts, fb.q_lens,
            page_size=self.kv_page_size,
            layer=li,
            sm_scale=sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            block_q=block_q,
            pages_per_block=max(1, min(pages_per_block,
                                       256 // self.kv_page_size)),
            interpret=interpret,
            k_scales=k_scales,
            v_scales=v_scales,
        )

    def compute_logits(
        self, params, hidden: jax.Array, tp_axis: Optional[str] = None
    ) -> jax.Array:
        cfg = self.config
        if cfg.tie_word_embeddings:
            # embed is replicated across tp, so tied logits are full-vocab
            # locally — no gather
            logits = jnp.dot(
                hidden.astype(jnp.float32),
                params["embed"].T.astype(jnp.float32),
            )
        else:
            logits = apply_linear(
                hidden, params["lm_head"], out_dtype=jnp.float32
            )
            if tp_axis is not None:
                # vocab-parallel head: gather shards to the full vocab
                logits = lax.all_gather(logits, tp_axis, axis=1, tiled=True)
        if self._logit_scale() != 1.0:
            logits = logits * self._logit_scale()
        if cfg.logit_softcap:
            logits = cfg.logit_softcap * jnp.tanh(logits / cfg.logit_softcap)
        return logits
