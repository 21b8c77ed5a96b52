"""Double-sparsity decode attention (token-level sparse attention).

Re-creation of the reference's double-sparsity backend
(``srt/layers/attention/double_sparsity_backend.py`` +
``triton_ops/double_sparsity_attention.py``): approximate attention
scores from a small set of "heavy" channels pick the top
``heavy_token_num`` KV tokens per (seq, kv head); exact attention then
runs only over the selected tokens.  Decode cost scales with
heavy_token_num instead of context length.

TPU-native shape: everything is one jittable function (XLA gathers +
one small einsum-attention), selected per compiled bucket — the
"sparse vs dense" decision is the static padded context size, not a
runtime branch.  v1 gathers heavy channels directly from the K pool;
a dedicated label cache (contiguous [tokens, r] layout + Pallas DMA)
is the follow-up bandwidth optimization, noted in PERF_NOTES.

Channel selection: offline per-(layer, head) channel stats like the
reference's ds_channel_config (json), or the built-in "k_norm"
fallback that ranks channels by the k-projection weight column norms
at load time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def sparse_decode_attention(
    q: jax.Array,  # [S, Hq, hd] (post-rope)
    k_pages: jax.Array,  # [L, Hkv, tokens, hd] pool
    v_pages: jax.Array,
    kv_lens: jax.Array,  # [S] i32
    page_indices: jax.Array,  # [S, PPS] i32
    channels: jax.Array,  # [Hkv, r] i32 heavy channel ids per kv head
    layer,  # int or traced scalar
    *,
    heavy_tokens: int,
    page_size: int,
    sm_scale: float,
) -> jax.Array:
    """Returns [S, Hq, hd] attention output over the top-``heavy_tokens``
    KV positions per (seq, kv head), scored with the heavy channels."""
    S, Hq, hd = q.shape
    Hkv = k_pages.shape[1]
    G = Hq // Hkv  # q heads per kv head
    PPS = page_indices.shape[1]
    n_max = PPS * page_size
    r = channels.shape[1]
    K = min(heavy_tokens, n_max)

    # candidate token slots per seq: page table expanded to rows
    offs = jnp.arange(page_size, dtype=jnp.int32)
    rows = (
        page_indices[:, :, None] * page_size + offs[None, None, :]
    ).reshape(S, n_max)  # [S, n_max]
    pos = jnp.arange(n_max, dtype=jnp.int32)
    # candidate i is valid iff its page was real; compare against kv_len
    # by *logical* position (pages are filled in order)
    valid = pos[None, :] < kv_lens[:, None]  # [S, n_max]

    kl = k_pages[layer][..., :hd]  # [Hkv, tokens, hd] (pool may lane-pad)
    vl = v_pages[layer][..., :hd]

    # ---- approximate scores from heavy channels
    # q_label [S, Hkv, G, r]; k_label [Hkv, S, n_max, r]
    qh = q.reshape(S, Hkv, G, hd)
    q_label = jnp.take_along_axis(
        qh, channels[None, :, None, :], axis=-1
    )
    # one combined gather -> [Hkv, S, n_max, r]: reads only the heavy
    # channels of the candidate rows, never the full candidate KV
    k_label = kl[
        jnp.arange(Hkv, dtype=jnp.int32)[:, None, None, None],
        rows[None, :, :, None],
        channels[:, None, None, :],
    ]
    approx = jnp.einsum(
        "shgr,hsnr->shgn", q_label.astype(jnp.float32),
        k_label.astype(jnp.float32),
    )  # [S, Hkv, G, n_max]
    # per kv head: combine group scores (sum of |score| like the
    # reference's per-head union) and always keep the newest tokens
    score = jnp.abs(approx).sum(axis=2)  # [S, Hkv, n_max]
    recent = pos[None, :] >= (kv_lens[:, None] - 64)
    score = jnp.where(valid[:, None, :], score, -jnp.inf)
    score = jnp.where(
        (valid & recent)[:, None, :], jnp.inf, score
    )
    _, sel = jax.lax.top_k(score, K)  # [S, Hkv, K]

    # ---- exact attention over the selected tokens
    sel_rows = jnp.take_along_axis(
        jnp.broadcast_to(rows[:, None, :], (S, Hkv, n_max)), sel, axis=-1
    )  # [S, Hkv, K] pool rows
    sel_valid = jnp.take_along_axis(
        jnp.broadcast_to(valid[:, None, :], (S, Hkv, n_max)), sel, axis=-1
    )
    head_ix = jnp.arange(Hkv, dtype=jnp.int32)[None, :, None]
    k_sel = kl[head_ix, sel_rows]  # [S, Hkv, K, hd]
    v_sel = vl[head_ix, sel_rows]
    scores = jnp.einsum(
        "shgd,shkd->shgk", qh.astype(jnp.float32),
        k_sel.astype(jnp.float32),
    ) * sm_scale
    scores = jnp.where(sel_valid[:, :, None, :], scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shgk,shkd->shgd", w, v_sel.astype(jnp.float32))
    return out.reshape(S, Hq, hd).astype(q.dtype)


def heavy_channels_from_config(path: str, num_layers: int, num_kv_heads: int,
                               r: int) -> np.ndarray:
    """Load per-(layer, kv head) heavy channels from a ds channel config
    json (reference ds_channel_config_path): {"<layer>": {"<head>":
    [channel, ...]}}; missing entries fall back to the first r dims."""
    import json

    with open(path) as f:
        cfg = json.load(f)
    out = np.tile(np.arange(r, dtype=np.int32), (num_layers, num_kv_heads, 1))
    for li, heads in cfg.items():
        for hi, chans in heads.items():
            out[int(li), int(hi), :] = np.asarray(chans[:r], np.int32)
    return out


def heavy_channels_from_k_weights(wk: np.ndarray, num_kv_heads: int,
                                  head_dim: int, r: int) -> np.ndarray:
    """Fallback "k_norm" selection for one layer: rank each kv head's
    channels by the k-projection column norm [in, Hkv*hd] -> [Hkv, r]
    (offline-statistics-free approximation of the reference's
    ds_heavy_channel_type=qk stats)."""
    norms = np.linalg.norm(
        np.asarray(wk, np.float32), axis=0
    ).reshape(num_kv_heads, head_dim)
    return np.argsort(-norms, axis=-1)[:, :r].astype(np.int32)
