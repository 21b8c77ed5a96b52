"""EAGLE speculative decoding worker.

TPU-first re-design of the reference's ``srt/speculative/eagle_worker.py``
(draft ``:342``, verify ``:513``) + ``eagle_utils.py``: instead of draft
CUDA-graph runners and tree kernels, the whole draft phase — draft-extend
over last round's accepted (token, feature) pairs, then a K-step greedy
draft chain — runs as ONE jitted program with ``lax.scan``, and verify
rides the target's spec-verify batch (``ForwardMode.TARGET_VERIFY``
analog).  Chain drafts (top-1 per step); the tree variant layers on the
same machinery.

Device-resident state (no per-round feature transfers over the host):
  * ``ft`` — flat feature table [(max_running * (K+2)), H]: row
    ``slot*(K+2)+j`` holds the target feature for the j-th output row of
    the request's latest prefill/verify batch.
  * a draft KV pool sharing the target's page table: draft KV of pair
    (t_{p+1}, f_p) lives at the slot of target token p, so draft
    kv_lens = target position (no extra allocator).

Per round the host sends only small index arrays and receives the draft
tokens (chain) and verify tokens (accept decisions stay host-side,
reference ``speculative_sampling.cu`` greedy semantics).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_security_tpu.mem_cache.kv_pool import KVCachePool
from sglang_security_tpu.model_executor.forward_batch import ForwardBatch
from sglang_security_tpu.utils import cdiv, next_bucket, round_up

logger = logging.getLogger(__name__)

DRAFT_BLOCK_Q = 8


class EagleWorker:
    def __init__(self, runner, server_args):
        from sglang_security_tpu.models.config import ModelConfig
        from sglang_security_tpu.models.llama_eagle import EagleLlamaForCausalLM
        from sglang_security_tpu.models.llama_eagle3 import (
            Eagle3LlamaForCausalLM,
            eagle3_aux_layer_ids,
        )

        self.runner = runner
        self.sa = server_args
        algo = (server_args.speculative_algorithm or "").upper()
        self.is_eagle3 = algo == "EAGLE3"
        # NEXTN: DeepSeek MTP draft head (models/deepseek_nextn.py) on
        # the same worker; MLA attention has no tree-mask branch
        self.is_nextn = algo == "NEXTN"
        if self.is_nextn:
            assert server_args.speculative_eagle_topk <= 1, (
                "NEXTN (MTP) supports chain drafting only"
            )
        self.num_steps = server_args.speculative_num_steps
        # topk > 1: tree drafting (reference select_top_k_tokens
        # eagle_utils.py:793 + build_eagle_tree.py).  Each draft step
        # keeps a k-wide frontier (top-k over the k² expansions by
        # cumulative logprob); verification applies a tree mask.
        self.topk = max(1, server_args.speculative_eagle_topk)
        # tree nodes per request = k per step; verify rows = 1 + k*steps
        self.tree_width = self.topk * self.num_steps
        t0 = time.time()
        if server_args.speculative_draft_model_path:
            from sglang_security_tpu.model_loader.loader import (
                SafetensorsAccessor,
                _resolve_model_path,
            )

        draft_cls = (
            Eagle3LlamaForCausalLM if self.is_eagle3 else EagleLlamaForCausalLM
        )
        if self.is_nextn:
            # MTP weights live in the TARGET checkpoint: DeepSeek-V3 at
            # layer index num_hidden_layers (reference deepseek_nextn.py
            # remap), MiMo at model.mtp_layers.{i} (reference
            # mimo_mtp.py); --speculative-draft-model-path defaults to
            # the model path
            target_arch = (runner.config.raw.get("architectures")
                           or [""])[0]
            if "Deepseek" in target_arch:
                from sglang_security_tpu.models.deepseek_nextn import (
                    DeepseekV3ForCausalLMNextN,
                    nextn_draft_config,
                )

                cfg = nextn_draft_config(runner.config.raw)
                self.model = DeepseekV3ForCausalLMNextN(cfg)
                self.model.mtp_layer_idx = runner.config.num_layers
            else:
                from sglang_security_tpu.models.mimo_mtp import (
                    MiMoMTP,
                    mimo_mtp_draft_config,
                )

                cfg = mimo_mtp_draft_config(runner.config.raw)
                self.model = MiMoMTP(cfg)
            if server_args.load_format == "dummy":
                self.params = self.model.init_dummy_params(
                    seed=1, dtype=runner.dtype
                )
            else:
                from sglang_security_tpu.model_loader.loader import (
                    SafetensorsAccessor,
                    _resolve_model_path,
                )

                path = _resolve_model_path(
                    server_args.speculative_draft_model_path
                    or server_args.model_path,
                    server_args.download_dir,
                )
                self.params = self.model.load_weights(
                    SafetensorsAccessor(path), dtype=runner.dtype
                )
            if "embed" not in self.params:
                self.params["embed"] = runner.params["embed"]
        elif server_args.speculative_draft_model_path:
            path = _resolve_model_path(
                server_args.speculative_draft_model_path,
                server_args.download_dir,
            )
            cfg = ModelConfig.from_pretrained(path)
            if self.is_eagle3:
                self.model = draft_cls(
                    cfg, target_hidden_size=runner.config.hidden_size
                )
            else:
                self.model = draft_cls(cfg)
            if server_args.load_format == "dummy":
                self.params = self.model.init_dummy_params(
                    seed=1, dtype=runner.dtype
                )
            else:
                self.params = self.model.load_weights(
                    SafetensorsAccessor(path), dtype=runner.dtype
                )
                if "embed" not in self.params:
                    self.params["embed"] = runner.params["embed"]
        else:
            # self-draft for tests/benchmarks: a 1-layer draft net with the
            # target's config (random weights)
            cfg = ModelConfig.from_hf_dict(
                {**runner.config.raw, "num_hidden_layers": 1}
            )
            if self.is_eagle3:
                self.model = draft_cls(
                    cfg, target_hidden_size=runner.config.hidden_size
                )
            else:
                self.model = draft_cls(cfg)
            self.params = self.model.init_dummy_params(
                seed=1, dtype=runner.dtype
            )
        if self.is_eagle3:
            # the target's eagle steps must capture + stash aux hidden
            # states (reference set_eagle3_layers_to_capture)
            runner.model.eagle3_aux_layers = eagle3_aux_layer_ids(
                runner.config.num_layers
            )
        self.model.kv_page_size = runner.page_size
        logger.info("EAGLE draft model ready in %.1fs", time.time() - t0)

        self.pool = KVCachePool(
            num_layers=cfg.num_layers,
            num_kv_heads=cfg.kv_cache_num_heads,
            num_pages=runner.num_pages,
            page_size=runner.page_size,
            head_dim=cfg.kv_cache_head_dim,
            dtype=runner.dtype,
        )
        self.max_slots = server_args.max_running_requests or 256
        if self.topk > 1:
            # tree verify rows: root + k*steps nodes, padded to a block
            rows = 1 + self.tree_width
            self.verify_block_q = max(
                DRAFT_BLOCK_Q, 1 << (rows - 1).bit_length()
            )
            self.rows_per_slot = self.verify_block_q
        else:
            # K+1 verify rows (+ sentinel) padded to the draft block size
            assert self.num_steps <= DRAFT_BLOCK_Q - 1, (
                "speculative_num_steps must be <= 7 for the block-8 "
                "draft batch"
            )
            self.verify_block_q = DRAFT_BLOCK_Q
            self.rows_per_slot = DRAFT_BLOCK_Q
        # feature rows: target post-norm hidden (EAGLE-1) or the concat
        # of 3 captured residual streams (EAGLE3)
        H = runner.config.hidden_size * (3 if self.is_eagle3 else 1)
        self.ft = jnp.zeros(
            (self.max_slots * self.rows_per_slot, H), runner.dtype
        )
        self._free_slots = list(range(self.max_slots))
        self._jit_cache = {}

    # ------------------------------------------------------------- slots
    def acquire_slot(self) -> Optional[int]:
        return self._free_slots.pop() if self._free_slots else None

    def release_slot(self, slot: int) -> None:
        if slot >= 0:
            self._free_slots.append(slot)

    def ft_row(self, slot: int, j: int = 0) -> int:
        return slot * self.rows_per_slot + j

    # ------------------------------------------------------ draft prefill
    def draft_prefill(self, fb: ForwardBatch, x_all, draft_tokens: np.ndarray,
                      T: int, S: int, PPS: int) -> None:
        """Build the draft KV over freshly prefilled prompt rows.

        ``fb`` is the target's padded prefill batch; ``x_all`` its [T, H]
        features (device).  Draft row j re-uses the target row's position
        and slot but feeds token t_{j+1} (``draft_tokens``, host-built,
        with each sequence's final row already holding the sampled token)
        paired with feature f_j = x_all[j].
        """
        key = ("dpf", T, S, PPS)
        fn = self._jit_cache.get(key)
        if fn is None:
            model, interpret = self.model, self.runner.interpret

            def run(params, kd, vd, fb, x_all, draft_tok):
                # draft row j stores pair (t_{j+1}, f_j) at target row j's
                # slot/position; same causal extent as the target chunk
                fb2 = ForwardBatch(
                    token_ids=draft_tok,
                    positions=fb.positions,
                    slots=fb.slots,
                    q_starts=fb.q_starts,
                    q_lens=fb.q_lens,
                    kv_lens=fb.kv_lens,
                    page_indices=fb.page_indices,
                    out_rows=fb.out_rows,
                )
                _, kd, vd = model.forward_draft(
                    params, kd, vd, x_all, fb2,
                    block_q=128, interpret=interpret,
                )
                return kd, vd

            fn = jax.jit(run, donate_argnums=(1, 2))
            self._jit_cache[key] = fn
            logger.info("compiling eagle draft-prefill T=%d", T)
        kd, vd = fn(
            self.params, self.pool.k_pages, self.pool.v_pages,
            fb, x_all, jnp.asarray(draft_tokens),
        )
        self.pool.k_pages, self.pool.v_pages = kd, vd

    # ------------------------------------------------------- draft phase
    def draft(
        self,
        pend_counts: np.ndarray,  # [B] accepted pairs pending extend (1..K+2)
        pend_tokens: np.ndarray,  # [B, rows_per_slot] committed tokens
        ft_slots: np.ndarray,  # [B] feature-table slot per request
        positions0: np.ndarray,  # [B] target position n (next to generate)
        page_indices: List[np.ndarray],
        chain_slots: np.ndarray,  # [K, B] draft KV slot per chain step
        extend_slots: np.ndarray,  # [B, rows_per_slot] slots for pending pairs
    ) -> np.ndarray:
        """Runs draft-extend + K-step chain in one jit; returns draft
        tokens [K, B] (host)."""
        B = len(pend_counts)
        K = self.num_steps
        R = self.rows_per_slot
        sa = self.sa
        Bp = next_bucket(B, sa.decode_bs_buckets)
        pps_real = max((len(p) for p in page_indices), default=1)
        PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)

        def pad2(a, fill=0):
            a = np.asarray(a)
            out = np.full((Bp,) + a.shape[1:], fill, a.dtype)
            out[:B] = a
            return out

        pi = np.zeros((Bp, PPS), np.int32)
        for i, pages in enumerate(page_indices):
            m = min(len(pages), PPS)
            pi[i, :m] = pages[:m]
        cs = np.full((K, Bp), -1, np.int32)
        cs[:, :B] = chain_slots

        key = ("draft", Bp, PPS)
        fn = self._jit_cache.get(key)
        if fn is None:
            model, interpret = self.model, self.runner.interpret
            runner = self.runner
            tmodel = runner.model

            def run(params, tparams, kd, vd, ft, counts, toks, slots_ext,
                    pos0, pi, chain_slots, ft_slots):
                # ---- extend: one block_q=8 ragged batch over pending pairs
                rows = jnp.arange(R)
                feats = ft[
                    (ft_slots[:, None] * R + rows[None, :]).reshape(-1)
                ].reshape(Bp * R, -1)  # [Bp*R, H] row-major per seq
                tok_flat = toks.reshape(Bp * R)
                # row j of seq i is valid when j < counts[i]
                valid = rows[None, :] < counts[:, None]
                q_starts = jnp.arange(Bp, dtype=jnp.int32) * R
                # pending pair p = n-A+j is stored at draft position p-1
                pos_rows = (
                    pos0[:, None] - counts[:, None] - 1 + rows[None, :]
                )
                slot_flat = jnp.where(
                    valid, slots_ext, -1
                ).reshape(Bp * R)
                fb_ext = ForwardBatch(
                    token_ids=tok_flat,
                    positions=jnp.maximum(pos_rows, 0).reshape(Bp * R),
                    slots=slot_flat,
                    q_starts=q_starts,
                    q_lens=counts,
                    kv_lens=jnp.maximum(pos0 - 1, 0) * (counts > 0),
                    page_indices=pi,
                    out_rows=q_starts + jnp.maximum(counts - 1, 0),
                )
                g, kd, vd = model.forward_draft(
                    params, kd, vd, feats, fb_ext,
                    block_q=R, interpret=interpret,
                )  # [Bp, H] chain seed features

                # ---- chain: K greedy draft steps
                def body(carry, xs):
                    g, kd, vd, step_i = carry
                    slots_k = xs
                    d = model.draft_greedy(tmodel, tparams, params, g)
                    # chain pair p = n+i at draft position n-1+i
                    fb = ForwardBatch(
                        token_ids=d,
                        positions=jnp.maximum(pos0 - 1 + step_i, 0),
                        slots=slots_k,
                        q_starts=jnp.arange(Bp, dtype=jnp.int32),
                        q_lens=(counts > 0).astype(jnp.int32),
                        kv_lens=(pos0 + step_i) * (counts > 0),
                        page_indices=pi,
                        out_rows=jnp.arange(Bp, dtype=jnp.int32),
                    )
                    g, kd, vd = model.forward_draft(
                        params, kd, vd, g, fb,
                        block_q=1, interpret=interpret,
                    )
                    return (g, kd, vd, step_i + 1), d

                (_, kd, vd, _), drafts = jax.lax.scan(
                    body, (g, kd, vd, jnp.int32(0)), chain_slots
                )
                return drafts, kd, vd

            fn = jax.jit(run, donate_argnums=(2, 3))
            self._jit_cache[key] = fn
            logger.info("compiling eagle draft B=%d PPS=%d", Bp, PPS)
        drafts, kd, vd = fn(
            self.params, self.runner.params,
            self.pool.k_pages, self.pool.v_pages,
            self.ft,
            jnp.asarray(pad2(pend_counts)),
            jnp.asarray(pad2(pend_tokens)),
            jnp.asarray(pad2(extend_slots, fill=-1)),
            jnp.asarray(pad2(positions0)),
            jnp.asarray(pi),
            jnp.asarray(cs),
            jnp.asarray(pad2(ft_slots)),
        )
        self.pool.k_pages, self.pool.v_pages = kd, vd
        return np.asarray(jax.device_get(drafts))[:, :B]

    # -------------------------------------------------------- tree draft
    def draft_tree(
        self,
        pend_counts: np.ndarray,  # [B] accepted pairs pending extend
        pend_tokens: np.ndarray,  # [B, rows_per_slot] committed tokens
        ft_slots: np.ndarray,  # [B] feature-table slot per request
        positions0: np.ndarray,  # [B] target position n (next to generate)
        page_indices: List[np.ndarray],
        extend_slots: np.ndarray,  # [B, rows_per_slot] slots, pending pairs
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k tree drafting (reference select_top_k_tokens
        eagle_utils.py:793): draft-extend over accepted pairs, then
        `num_steps` frontier expansions keeping the top-k of each step's
        k² candidates by cumulative logprob.  Tree-node K/V never touches
        the draft pool — it lives in a dense scan carry and the next
        round's extend rebuilds the accepted path's pool KV (the same
        protocol the chain drafter uses).

        Returns (tokens [B, k*steps], parent_rows [B, k*steps]) where
        parent_rows are VERIFY-row indices: 0 = the committed root row,
        node (i, j) sits at verify row 1 + i*k + j."""
        B = len(pend_counts)
        K = self.num_steps
        k = self.topk
        W = self.tree_width
        R = self.rows_per_slot
        sa = self.sa
        Bp = next_bucket(B, sa.decode_bs_buckets)
        pps_real = max((len(p) for p in page_indices), default=1)
        PPS = round_up(next_bucket(pps_real, sa.max_seq_pages_buckets), 8)

        def pad2(a, fill=0):
            a = np.asarray(a)
            out = np.full((Bp,) + a.shape[1:], fill, a.dtype)
            out[:B] = a
            return out

        pi = np.zeros((Bp, PPS), np.int32)
        for i, pages in enumerate(page_indices):
            m = min(len(pages), PPS)
            pi[i, :m] = pages[:m]

        key = ("tree", Bp, PPS)
        fn = self._jit_cache.get(key)
        if fn is None:
            model, interpret = self.model, self.runner.interpret
            runner = self.runner
            tmodel = runner.model
            Hkv = self.model.config.kv_cache_num_heads
            # dense tree carry uses the TRUE head dim (the pool's
            # kv_cache_head_dim is lane-padded for the paged kernel)
            hd = self.model.config.head_dim
            L_d = self.model.config.num_layers
            dtype = runner.dtype

            def run(params, tparams, kd, vd, ft, counts, toks, slots_ext,
                    pos0, pi, ft_slots):
                # ---- extend: identical to the chain drafter ----
                rows = jnp.arange(R)
                feats = ft[
                    (ft_slots[:, None] * R + rows[None, :]).reshape(-1)
                ].reshape(Bp * R, -1)
                tok_flat = toks.reshape(Bp * R)
                valid = rows[None, :] < counts[:, None]
                q_starts = jnp.arange(Bp, dtype=jnp.int32) * R
                pos_rows = (
                    pos0[:, None] - counts[:, None] - 1 + rows[None, :]
                )
                slot_flat = jnp.where(valid, slots_ext, -1).reshape(Bp * R)
                fb_ext = ForwardBatch(
                    token_ids=tok_flat,
                    positions=jnp.maximum(pos_rows, 0).reshape(Bp * R),
                    slots=slot_flat,
                    q_starts=q_starts,
                    q_lens=counts,
                    kv_lens=jnp.maximum(pos0 - 1, 0) * (counts > 0),
                    page_indices=pi,
                    out_rows=q_starts + jnp.maximum(counts - 1, 0),
                )
                g, kd, vd = model.forward_draft(
                    params, kd, vd, feats, fb_ext,
                    block_q=R, interpret=interpret,
                )  # [Bp, H] seed features

                # ---- root expansion: top-k children of the root ----
                tok0, lp0 = model.draft_topk(tmodel, tparams, params, g, k)
                # frontier state
                fr_tok = tok0  # [Bp, k]
                fr_score = lp0  # [Bp, k] cumulative logprob
                fr_feat = jnp.repeat(g[:, None, :], k, axis=1)  # parent feat
                fr_parent_row = jnp.zeros((Bp, k), jnp.int32)  # verify rows
                anc = jnp.zeros((Bp, k, W), bool)  # ancestors among nodes

                tree_k = jnp.zeros((L_d, Bp, W, Hkv, hd), dtype)
                tree_v = jnp.zeros((L_d, Bp, W, Hkv, hd), dtype)

                active = (counts > 0)

                def body(carry, i):
                    (fr_tok, fr_score, fr_feat, fr_parent_row, anc,
                     tree_k, tree_v) = carry
                    # dense-block mask: [Bp, k, W + k] = ancestors among
                    # written tree rows + self among the current k rows
                    self_eye = jnp.broadcast_to(
                        jnp.eye(k, dtype=bool), (Bp, k, k)
                    )
                    mask = jnp.concatenate([anc, self_eye], axis=2)
                    fb_t = ForwardBatch(
                        token_ids=fr_tok.reshape(Bp * k),
                        positions=jnp.repeat(
                            jnp.maximum(pos0 - 1 + i, 0), k
                        ),
                        slots=jnp.full((Bp * k,), -1, jnp.int32),
                        q_starts=jnp.arange(Bp, dtype=jnp.int32) * k,
                        q_lens=jnp.where(active, k, 0).astype(jnp.int32),
                        kv_lens=jnp.maximum(pos0 - 1, 0) * active,
                        page_indices=pi,
                        out_rows=jnp.arange(Bp * k, dtype=jnp.int32),
                        tree={
                            "mask": mask,
                            "prefix_kv_lens": jnp.maximum(pos0 - 1, 0)
                            * active,
                            "k_pool": kd,
                            "v_pool": vd,
                            "col": i * k,
                        },
                    )
                    g_new, tree_k, tree_v = model.forward_draft(
                        params, tree_k, tree_v,
                        fr_feat.reshape(Bp * k, -1), fb_t,
                        block_q=k, interpret=interpret,
                    )  # [Bp*k, H]
                    g_new = g_new.reshape(Bp, k, -1)
                    # expansion: top-k per branch -> k² candidates ->
                    # global top-k by cumulative logprob
                    ctok, clp = model.draft_topk(
                        tmodel, tparams, params,
                        g_new.reshape(Bp * k, -1), k,
                    )
                    ctok = ctok.reshape(Bp, k, k)
                    cum = fr_score[:, :, None] + clp.reshape(Bp, k, k)
                    flat = cum.reshape(Bp, k * k)
                    top_v, top_i = jax.lax.top_k(flat, k)
                    parent = top_i // k  # [Bp, k] branch index
                    tok_next = jnp.take_along_axis(
                        ctok.reshape(Bp, k * k), top_i, axis=1
                    )
                    # ancestry: child inherits parent's ancestors + the
                    # parent's own tree row (i*k + parent)
                    anc_p = jnp.take_along_axis(
                        anc, parent[:, :, None], axis=1
                    )
                    prow_bit = jax.nn.one_hot(
                        i * k + parent, W, dtype=bool
                    )
                    anc_next = anc_p | prow_bit
                    feat_next = jnp.take_along_axis(
                        g_new, parent[:, :, None], axis=1
                    )
                    parent_row_next = 1 + i * k + parent  # verify rows
                    ys = (fr_tok, fr_parent_row)
                    return (
                        (tok_next, top_v, feat_next, parent_row_next,
                         anc_next, tree_k, tree_v),
                        ys,
                    )

                carry = (fr_tok, fr_score, fr_feat, fr_parent_row, anc,
                         tree_k, tree_v)
                _, (toks_steps, parents_steps) = jax.lax.scan(
                    body, carry, jnp.arange(K, dtype=jnp.int32)
                )
                # [K, Bp, k] -> [Bp, K*k] in step-major node order
                tokens = jnp.moveaxis(toks_steps, 0, 1).reshape(Bp, W)
                parents = jnp.moveaxis(parents_steps, 0, 1).reshape(Bp, W)
                return tokens, parents, kd, vd

            fn = jax.jit(run, donate_argnums=(2, 3))
            self._jit_cache[key] = fn
            logger.info("compiling eagle tree-draft B=%d PPS=%d", Bp, PPS)
        tokens, parents, kd, vd = fn(
            self.params, self.runner.params,
            self.pool.k_pages, self.pool.v_pages,
            self.ft,
            jnp.asarray(pad2(pend_counts)),
            jnp.asarray(pad2(pend_tokens)),
            jnp.asarray(pad2(extend_slots, fill=-1)),
            jnp.asarray(pad2(positions0)),
            jnp.asarray(pi),
            jnp.asarray(pad2(ft_slots)),
        )
        self.pool.k_pages, self.pool.v_pages = kd, vd
        packed = np.asarray(jax.device_get(jnp.stack([
            tokens.astype(jnp.float32), parents.astype(jnp.float32),
        ])))  # one tunnel round-trip, not two
        return (
            packed[0, :B].astype(np.int64),
            packed[1, :B].astype(np.int64),
        )
