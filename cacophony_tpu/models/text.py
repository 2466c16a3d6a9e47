"""Causal RoBERTa-style text encoder, attention pooler, and caption decoder.

Semantics match the reference (src/caco/text_models/roberta_text_model.py):
- embeddings = word + absolute-position + token-type(0), LayerNorm, dropout
  (:92-129); position ids default to arange (:565-566 — the HF pad-offset
  helper exists there but is unused)
- post-LN blocks: selfattn → Dense+LN(residual) → [crossattn → Dense+LN] →
  FFN(gelu-exact) → Dense+LN(residual) (:295-428)
- the contrastive text tower is CAUSAL (GPT-style), not bidirectional (:385)
- single-query attention pooler (:510-536)
- caption decoder consumes TEXT-ENCODER HIDDEN STATES (not raw embeddings)
  and cross-attends to audio hidden states; vocab head (:585-627)

TPU-first deltas: layer stacks are `lax.scan` over stacked params with a
functional KV cache threaded through the scan (the reference uses flax
mutable 'cache' collections); cross-attention K/V for decode are computed
ONCE per utterance instead of per step (identical math — the reference
recomputes them for every generated token, :190-201); fused QKV projections.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cacophony_tpu.configs import TextConfig
from cacophony_tpu.models.layers import (
    act_dense,
    dense,
    dense_init,
    dropout,
    embed_init,
    gelu_exact,
    layer_norm,
    ln_init,
    mask_to_bias,
    stack_layers,
)
from cacophony_tpu.ops.attention import attention_init, multi_head_attention

# A/B escape hatch: True restores the r2 gather-based position/token-type
# embedding lookups (whose training VJPs are scatter-adds).  The default
# slice/broadcast forms are bit-identical in fwd and strictly cheaper in bwd.
#
# NOTE (jit caching): this is read at TRACE time.  Flipping it after
# text_encoder_apply has been jitted silently reuses the cached trace and the
# "variant" measures the default path.  A/B runs must build a fresh jitted
# closure per flag value or call jax.clear_caches() after flipping (the same
# jit-identity footgun CLAUDE.md documents for monkeypatch ablations).
_AUX_EMBED_GATHER = False

# lax.scan unroll factor for the layer stack (trace-time A/B knob; see
# models/audio.py SCAN_UNROLL).
SCAN_UNROLL = 1

# Decode cache / cross-KV storage layout (trace-time flag consumed by
# make_kv_cache / precompute_cross_kv only; consumers infer the layout
# from leaf shapes/ndim, so both run end-to-end):
#   "merged": leaves (L, B, T, E) with E = H·Dh — each token's K/V row is
#       CONTIGUOUS across the full 768 lanes, so per-step reads stream
#       dense (T, 768) tiles and the per-step write is one dense row.
#       Per-head logits/PV become block-diagonal-q batched matmuls
#       (exact same bf16 products, fp32 MXU accumulation; the ~12× MAC
#       overhead is noise at these shapes).
#   "legacy": leaves (L, B, T, H, Dh) + per-head einsums.  The (12, 64)
#       minor dims pad to (16, 128) tiles — a 2.67× HBM over-fetch on
#       reads that are ~63% of the decode step (r5 xplane).
# A THIRD layout, (L, B, H, Dh, T) time-last, was measured r5 and lost
# 2.5× (7.0k vs 17.9k tok/s at every stream count): reads stream dense
# (64, T) tiles but the per-step single-column write is LANE-SPARSE —
# read-modify-writes of every (8,128) tile it grazes — and swamps the
# read saving.  Removed; don't retry a time-minor cache layout.
CACHE_LAYOUT = "merged"

# Full-mode (non-cached) self-attention through the bespoke one-shot VMEM
# kernel with in-kernel causal masking (ops/encoder_attention.py) instead
# of the XLA einsum chain over a (B, 1, S, S) additive bias.  Trace-time
# flag (same jit-caching caveat as above).
# Measured r4 on 1x v5e (interleaved fresh-jit trials, steady state):
#   B=128 T=100 bf16 full mode: einsum 5366/5384 vs kernel 5286/5398
#     texts/s (wash, cosine 0.99999249)
#   B=64 T=16 (ZS prompt shape):  einsum 11143/12073 vs kernel
#     11759/12127 texts/s (+3% noisy, cosine 0.99997777)
# Below the ≥+5% keep bar at both shapes (Dh=64/T≤100 einsum attention is
# already a tiny slice of the tower; the MLP matmuls dominate) → default
# OFF.  The causal kernel path + its Pallas backward stay tested for
# future shapes.
TEXT_ATTN_KERNEL = False


# ------------------------------------------------------------------ init

def _block_init(rng, cfg: TextConfig):
    ks = jax.random.split(rng, 6)
    std = 0.02
    p = {
        # attn["o"] IS the RoBERTa attention.output.dense (one output proj).
        "attn": attention_init(ks[0], cfg.hidden_size, cfg.num_heads, stddev=std),
        "ln_attn": ln_init(cfg.hidden_size),
        "mlp_in": dense_init(ks[2], cfg.hidden_size, cfg.intermediate_size, std),
        "mlp_out": dense_init(ks[3], cfg.intermediate_size, cfg.hidden_size, std),
        "ln_mlp": ln_init(cfg.hidden_size),
    }
    if cfg.cross_attention:
        p["cross"] = attention_init(ks[4], cfg.hidden_size, cfg.num_heads,
                                    stddev=std, cross=True)
        p["ln_cross"] = ln_init(cfg.hidden_size)
    return p


def text_embeddings_init(rng, cfg: TextConfig):
    ks = jax.random.split(rng, 3)
    return {
        "word": embed_init(ks[0], cfg.vocab_size, cfg.hidden_size),
        "position": embed_init(ks[1], cfg.max_position_embeddings, cfg.hidden_size),
        "token_type": embed_init(ks[2], cfg.type_vocab_size, cfg.hidden_size),
        "ln": ln_init(cfg.hidden_size),
    }


def text_pooler_init(rng, cfg: TextConfig):
    ks = jax.random.split(rng, 3)
    return {
        "key": dense_init(ks[0], cfg.hidden_size, cfg.hidden_size, 0.02),
        "value": dense_init(ks[1], cfg.hidden_size, cfg.hidden_size, 0.02),
        "query": embed_init(ks[2], 1, cfg.hidden_size),
    }


def text_encoder_init(rng, cfg: TextConfig):
    ks = jax.random.split(rng, 3)
    return {
        "embeddings": text_embeddings_init(ks[0], cfg),
        "blocks": stack_layers(ks[1], cfg.num_layers, lambda r: _block_init(r, cfg)),
        "pooler": text_pooler_init(ks[2], cfg),
    }


def caption_decoder_init(rng, cfg: TextConfig):
    assert cfg.cross_attention
    ks = jax.random.split(rng, 2)
    return {
        "blocks": stack_layers(ks[0], cfg.num_layers, lambda r: _block_init(r, cfg)),
        "vocab_proj": dense_init(ks[1], cfg.hidden_size, cfg.vocab_size, 0.01),
    }


def make_kv_cache(cfg: TextConfig, batch: int, max_length: int, dtype=jnp.float32):
    """Stacked-per-layer functional KV cache + scalar/per-sample index.

    Layout per CACHE_LAYOUT (see the flag comment): "merged" (default)
    stores (L, B, T, E) rows — contiguous 768-lane reads AND writes;
    "legacy" stores (L, B, T, H, Dh) for the per-head einsum path.
    Serving passes dtype=bfloat16 (halves the per-step cache read, the
    decode bandwidth floor); fp32 is the parity default."""
    if CACHE_LAYOUT == "legacy":
        shape = (cfg.num_layers, batch, max_length, cfg.num_heads, cfg.head_dim)
    else:
        shape = (cfg.num_layers, batch, max_length, cfg.hidden_size)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
    }


# ------------------------------------------------------------------ apply

def _post_ln_residual(ln_p, h, residual, eps, rng, rate, det):
    """RoBERTa post-LN wrapper: LN(dropout(h) + residual); the output dense
    itself lives inside the attention / MLP params (reference :295-312,
    :363-380 — dense, dropout, LN(h + input))."""
    h = dropout(rng, h, rate, det)
    return layer_norm(ln_p, h + residual, eps)


def _text_block(
    p, x, cfg: TextConfig, bias, *, memory=None, memory_bias=None,
    kv_cache=None, cache_index=None, cross_kv=None, train=False, rngs=None,
    dtype=jnp.float32, flash_mask=None, causal=False,
):
    det = not train
    r = (lambda i: jax.random.fold_in(rngs, i)) if rngs is not None else (lambda i: None)
    eps = cfg.layer_norm_eps

    h, kv_slice = multi_head_attention(
        p["attn"], x, num_heads=cfg.num_heads, bias=bias,
        kv_cache=kv_cache, cache_index=cache_index, dtype=dtype,
        flash_mask=flash_mask, causal=causal,
        dropout_rate=0.0 if det else cfg.attention_dropout,
        dropout_rng=r(3),
    )
    x = _post_ln_residual(p["ln_attn"], h, x, eps, r(0), cfg.hidden_dropout, det)

    if memory is not None or cross_kv is not None:
        if cross_kv is not None:
            # decode fast path: precomputed cross K/V stored (B, H, Dh, S_mem)
            # — audio-time LAST so each step's K/V read streams dense
            # (64, S) tiles instead of the 2.67×-padded (12, 64) head-split
            # minors (r5 xplane: this read was 39% of the 256-stream decode
            # step at ~280 GB/s; see make_kv_cache)
            q = dense(p["cross"]["q"], x, dtype)
            b, s, d = q.shape
            q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
            q = q * (1.0 / jnp.sqrt(cfg.head_dim).astype(q.dtype))
            ck = cross_kv["k"].astype(q.dtype)
            cv = cross_kv["v"].astype(q.dtype)
            if ck.ndim == 3:
                # merged (B, S_mem, E) storage: block-diagonal-q batched
                # matmuls read K/V as dense (S, 768) tiles (see
                # CACHE_LAYOUT).  qm[b,(q,h),e] is q with each head's 64
                # values placed in its own E-block; the PV matmul computes
                # all (h, h') cross terms and the diagonal is extracted —
                # ~12× the minimal MACs, which is noise next to the K/V
                # read this layout un-pads.  Same bf16 products, fp32 MXU
                # accumulation as the einsum path.
                H, Dh = cfg.num_heads, cfg.head_dim
                eye = jnp.eye(H, dtype=q.dtype)
                qm = jnp.einsum("bqhd,hg->bqhgd", q, eye).reshape(b, s, H, d)
                logits = jnp.einsum("bqhe,bke->bhqk", qm, ck)
                logits = logits + memory_bias.astype(logits.dtype)
                w = jax.nn.softmax(logits.astype(jnp.float32), -1
                                   ).astype(logits.dtype)
                full = jnp.einsum("bhqk,bke->bqhe", w, cv)
                h = jnp.einsum("bqhhd->bqhd",
                               full.reshape(b, s, H, H, Dh)).reshape(b, s, d)
            else:
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, ck)
                logits = logits + memory_bias.astype(logits.dtype)
                w = jax.nn.softmax(logits.astype(jnp.float32), -1
                                   ).astype(logits.dtype)
                h = jnp.einsum("bhqk,bkhd->bqhd", w, cv).reshape(b, s, d)
            h = dense(p["cross"]["o"], h, dtype)
        else:
            h, _ = multi_head_attention(
                p["cross"], x, num_heads=cfg.num_heads, bias=memory_bias,
                memory=memory, dtype=dtype,
                dropout_rate=0.0 if det else cfg.attention_dropout,
                dropout_rng=r(4),
            )
        x = _post_ln_residual(p["ln_cross"], h, x, eps, r(1), cfg.hidden_dropout, det)

    h = dense(p["mlp_in"], x, dtype)
    # backward-lean fused tail: saves only the pre-activation, recomputes
    # gelu + its VJP in the backward (see layers.act_dense)
    h = act_dense(p["mlp_out"], h, gelu_exact, dtype)
    x = _post_ln_residual(p["ln_mlp"], h, x, eps, r(2), cfg.hidden_dropout, det)
    return x, kv_slice


def _run_text_blocks(blocks, x, cfg, bias, *, memory=None, memory_bias=None,
                     cache=None, cross_kv=None, train=False, rngs=None,
                     dtype=jnp.float32, flash_mask=None, causal=False):
    """lax.scan over stacked layer params (+ per-layer cache/cross-kv).

    Decode mode: the per-layer cache is read-only inside the scan; layers
    emit only their (B, 1, H, Dh) k/v slices, written into the stacked
    cache in ONE dynamic-slice/scatter afterwards (in-place under the
    decode while_loop's buffer aliasing — the cache is never copied)."""
    num_layers = cfg.num_layers

    def body(carry, xs):
        x = carry
        p = xs[0]
        layer_cache = xs[1] if cache is not None else None
        layer_cross = xs[2] if cross_kv is not None else None
        layer_rng = xs[3] if rngs is not None else None
        x, kv_slice = _text_block(
            p, x, cfg, bias, memory=memory, memory_bias=memory_bias,
            kv_cache=layer_cache, cache_index=cache["index"] if cache is not None else None,
            cross_kv=layer_cross, train=train, rngs=layer_rng, dtype=dtype,
            flash_mask=flash_mask, causal=causal,
        )
        return x, kv_slice

    xs = (
        blocks,
        {"k": cache["k"], "v": cache["v"]} if cache is not None else None,
        cross_kv,
        jax.random.split(rngs, num_layers) if rngs is not None else None,
    )
    # lax.scan can't take None leaves in xs; filter statically.
    keep = [i for i, v in enumerate(xs) if v is not None]
    packed = tuple(xs[i] for i in keep)

    def body_packed(carry, packed_xs):
        full = [None] * 4
        for slot, v in zip(keep, packed_xs):
            full[slot] = v
        return body(carry, full)

    x, kv_slices = jax.lax.scan(body_packed, x, packed, unroll=SCAN_UNROLL)
    new_cache = None
    if cache is not None:
        idx = cache["index"]
        # layers emit merged (L, B, 1, E) slices for the 4-D merged cache,
        # (L, B, 1, H, Dh) for the 5-D legacy one; the time axis is axis 2
        # in both, so the writes are identical up to trailing dims.
        sk = kv_slices["k"].astype(cache["k"].dtype)
        sv = kv_slices["v"].astype(cache["v"].dtype)
        if jnp.ndim(idx) == 0:
            start = (0, 0, idx) + (0,) * (cache["k"].ndim - 3)
            k = jax.lax.dynamic_update_slice(cache["k"], sk, start)
            v = jax.lax.dynamic_update_slice(cache["v"], sv, start)
        else:
            # per-sample positions (continuous batching): one scatter
            b_ids = jnp.arange(idx.shape[0])
            k = cache["k"].at[:, b_ids, idx].set(sk[:, :, 0])
            v = cache["v"].at[:, b_ids, idx].set(sv[:, :, 0])
        new_cache = {"k": k, "v": v, "index": idx + 1}
    return x, new_cache


def _causal_bias(text_mask: jnp.ndarray) -> jnp.ndarray:
    """Combine padding mask with a causal mask → (B, 1, S, S) additive bias
    (reference :210-218)."""
    s = text_mask.shape[-1]
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    combined = causal[None, :, :] & (text_mask[:, None, :] > 0)
    return mask_to_bias(combined)[:, None, :, :]


def _decode_bias(max_length: int, index: jnp.ndarray) -> jnp.ndarray:
    """Single-position decode over a READ-ONLY cache: valid cached positions
    are strictly < the write index (the current token's k/v is appended
    inside the attention op, not read from the cache — ops/attention.py).
    Attended set = {0..index-1} ∪ {current} ≡ the reference's ≤ index over a
    written cache (:252-259). index: scalar, or (B,) per-sample positions
    (continuous batching)."""
    if jnp.ndim(index) == 0:
        valid = jnp.arange(max_length) < index
        return mask_to_bias(valid)[None, None, None, :]
    valid = jnp.arange(max_length)[None, :] < index[:, None]
    return mask_to_bias(valid)[:, None, None, :]


def text_pooler_apply(p, hidden: jnp.ndarray, mask: Optional[jnp.ndarray],
                      dtype=None):
    """Single learned-query attention pool (reference :527-536).

    dtype: compute dtype for the K/V projections (without it the fp32
    weights silently promote bf16 hidden states to an fp32 pooler);
    softmax statistics stay fp32 either way."""
    d = hidden.shape[-1]
    key = dense(p["key"], hidden, dtype) / jnp.sqrt(jnp.asarray(d, hidden.dtype))
    value = dense(p["value"], hidden, dtype)
    logits = jnp.einsum("mh,bnh->bmn", p["query"].astype(hidden.dtype), key)
    if mask is not None:
        logits = jnp.where(mask[:, None] > 0, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(hidden.dtype)
    return jnp.einsum("bmn,bnh->bmh", w, value)[:, 0]


def text_encoder_apply(
    params,
    cfg: TextConfig,
    input_ids: jnp.ndarray,       # (B, S) int
    attention_mask: jnp.ndarray,  # (B, S)
    position_ids: Optional[jnp.ndarray] = None,
    *,
    cache: Optional[dict] = None,
    train: bool = False,
    rngs: Optional[jax.Array] = None,
    pool: bool = True,
    dtype=jnp.float32,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[dict]]:
    """→ (pooled (B, D) or None, hidden (B, S, D), new_cache).

    Full mode: causal self-attention over the padded sequence.
    Decode mode (cache given): S == 1, attends over the cache.
    dtype: matmul compute dtype (bf16 for serving; fp32 parity default).
    """
    det = not train
    r = (lambda i: jax.random.fold_in(rngs, i)) if rngs is not None else (lambda i: None)

    ids = input_ids.astype(jnp.int32)
    emb = params["embeddings"]
    if (position_ids is None and not _AUX_EMBED_GATHER
            and ids.shape[-1] <= emb["position"].shape[0]):
        # Full-sequence mode always uses arange positions — take a SLICE of
        # the table instead of a gather so the training VJP is a pad (free)
        # rather than a (B·S)-update scatter-add into the 514-row table.
        # (When S exceeds the table the gather path below keeps JAX's
        # clamp-to-last-row semantics instead of a shape error.)
        # (S, H): trailing-dim broadcasting against word[ids] keeps this path
        # rank-agnostic (1D ids stay (S, H), matching the gather path below).
        pos = emb["position"][: ids.shape[-1]]
    else:
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(ids.shape[-1]), ids.shape)
        pos = emb["position"][position_ids.astype(jnp.int32)]
    # Token-type ids are 0 everywhere in this model family (reference passes
    # zeros, src/caco/roberta.py) — broadcast row 0; the gather of an
    # all-zero index tensor had a fully-colliding scatter-add as its VJP.
    tt = (emb["token_type"][jnp.zeros_like(ids)] if _AUX_EMBED_GATHER
          else emb["token_type"][0])
    x = emb["word"][ids] + pos + tt
    x = layer_norm(emb["ln"], x, cfg.layer_norm_eps)
    x = dropout(r(0), x, cfg.hidden_dropout, det)
    # The embedding tables are fp32 params, so x is fp32 here; without this
    # cast every post-LN residual (h + x) promotes the block output back to
    # fp32 and the whole scan carry runs at double bandwidth (xplane r3:
    # f32[B,S,768] carries through all 12 layers while the audio tower ran
    # bf16 — the train step's text towers were ~2x their bf16 cost).
    # LayerNorm keeps fp32 statistics internally either way (layers.py).
    x = x.astype(dtype)

    bias, flash_mask, causal = None, None, False
    if cache is None:
        if TEXT_ATTN_KERNEL:
            # bespoke kernel path: padding mask + (optional) in-kernel
            # causal triangle; falls back to the einsum path with an
            # equivalent reconstructed bias wherever the kernel declines
            flash_mask, causal = attention_mask, cfg.causal
        elif cfg.causal:
            bias = _causal_bias(attention_mask)
        else:
            # optional bidirectional tower (TextConfig.causal=False):
            # padding-only masking, standard RoBERTa semantics
            bias = mask_to_bias(attention_mask)[:, None, None, :]
    else:
        assert cfg.causal, "KV-cached decode requires a causal tower"
        bias = _decode_bias(cache["k"].shape[2], cache["index"])

    x, new_cache = _run_text_blocks(params["blocks"], x, cfg, bias, cache=cache,
                                    train=train, dtype=dtype,
                                    flash_mask=flash_mask, causal=causal,
                                    rngs=r(1) if rngs is not None else None)
    pooled = (text_pooler_apply(params["pooler"], x, attention_mask, dtype=dtype)
              if pool else None)
    return pooled, x, new_cache


def precompute_cross_kv(blocks, cfg: TextConfig, memory: jnp.ndarray,
                        dtype=jnp.float32):
    """Compute every decoder layer's cross-attention K/V from the audio
    hidden states once per utterance → {'k','v': (L, B, S_mem, E)} under
    the default "merged" CACHE_LAYOUT ((L, B, S_mem, H, Dh) for "legacy").

    The reference recomputes these for every generated token
    (roberta_text_model.py:190-194 under the while_loop at caco.py:228).
    dtype=bf16 halves the dominant per-step HBM read when serving; the
    merged rows keep each audio position's K/V contiguous across all 768
    lanes, so the per-step read streams dense tiles (the legacy head-split
    minors over-fetch 2.67× — see CACHE_LAYOUT)."""
    def per_layer(p):
        kv = dense(p["cross"]["kv"], memory, dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        if CACHE_LAYOUT == "merged":
            return {"k": k, "v": v}
        b, s, d = k.shape
        shape = (b, s, cfg.num_heads, cfg.head_dim)
        return {"k": k.reshape(shape), "v": v.reshape(shape)}

    return jax.lax.map(per_layer, blocks)


def caption_decoder_apply(
    params,
    cfg: TextConfig,
    text_hidden: jnp.ndarray,      # (B, S, D) from the text encoder
    attention_mask: jnp.ndarray,   # (B, S)
    audio_hidden: Optional[jnp.ndarray],  # (B, S_a, D)
    audio_mask: jnp.ndarray,       # (B, S_a)
    *,
    cache: Optional[dict] = None,
    cross_kv: Optional[dict] = None,
    train: bool = False,
    rngs: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[dict]]:
    """→ (vocab logits (B, S, V), new_cache). Reference :606-627."""
    bias, flash_mask, causal = None, None, False
    if cache is None:
        if TEXT_ATTN_KERNEL:
            flash_mask, causal = attention_mask, True
        else:
            bias = _causal_bias(attention_mask)
    else:
        bias = _decode_bias(cache["k"].shape[2], cache["index"])
    memory_bias = mask_to_bias(audio_mask)[:, None, None, :]

    x, new_cache = _run_text_blocks(
        params["blocks"], text_hidden, cfg, bias,
        memory=audio_hidden if cross_kv is None else None,
        memory_bias=memory_bias, cache=cache, cross_kv=cross_kv,
        train=train, rngs=rngs, dtype=dtype,
        flash_mask=flash_mask, causal=causal,
    )
    return dense(params["vocab_proj"], x, dtype), new_cache
