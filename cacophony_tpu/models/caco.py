"""CACO top-level model: joint audio-text embedding space + captioning.

Reference semantics (src/caco/caco.py):
- owns `logit_scale` (:64), `text_proj` Dense (:66-69) and a multi-head
  single-query audio attention pooler (:19-54)
- get_audio_embedding (:72-96): audio encoder → pooler → L2 normalize
- get_text_embedding (:99-123): text encoder → pooler → text_proj → normalize
- L2 normalization is bug-compatible with the reference: it normalizes by
  ||x + eps|| (eps added to the VECTOR, not the norm; :91 — documented
  reference quirk, kept for checkpoint parity)
- contrastive scoring rule: exp(logit_scale) · A @ T.T (the reference states
  it in the torch mirror, src/caco_torch/caco.py:208-212, and uses it at
  eval_caco.py:171)
- greedy/temperature AR decode with KV caches (:154-230), including the
  quirk that the FULL text encoder runs (cached) inside every decode step
  because the caption decoder consumes text-encoder hidden states (:135-149)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cacophony_tpu.configs import CacoConfig
from cacophony_tpu.models.audio import audio_encoder_apply, audio_encoder_init
from cacophony_tpu.models.layers import dense, dense_init, embed_init
from cacophony_tpu.models.text import (
    caption_decoder_apply,
    caption_decoder_init,
    make_kv_cache,
    precompute_cross_kv,
    text_encoder_apply,
    text_encoder_init,
)

NORM_EPS = 1e-10  # reference caco.py:9


def audio_pooler_init(rng, cfg: CacoConfig):
    d = cfg.audio.hidden_size
    ks = jax.random.split(rng, 3)
    return {
        "kv": dense_init(ks[0], d, 2 * d),
        "query": embed_init(ks[1], 1, d)[0],  # (d,)
        "out": dense_init(ks[2], d, cfg.projection_size or d),
    }


def caco_init(rng, cfg: CacoConfig):
    ks = jax.random.split(rng, 5)
    params = {
        "audio": audio_encoder_init(ks[0], cfg.audio),
        "text": text_encoder_init(ks[1], cfg.text),
        "audio_pool": audio_pooler_init(ks[2], cfg),
        "text_proj": dense_init(ks[3], cfg.text.hidden_size, cfg.projection_size),
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }
    if cfg.use_decoder:
        params["decoder"] = caption_decoder_init(ks[4], cfg.decoder)
    return params


def audio_pooler_apply(p, cfg: CacoConfig, hidden: jnp.ndarray, mask: Optional[jnp.ndarray]):
    """Multi-head single-query attention pool (reference caco.py:19-54):
    K,V from one fused Dense(2d) split; learned query reshaped to
    (heads, head_dim); per-head masked softmax over the sequence; concat
    heads → output Dense.

    Runs in cfg.dtype: without the explicit dtype the fp32 weights promoted
    the bf16 hidden states and the whole pooler ran fp32 (measured ~3 ms of
    a 89 ms B=128 batch on v5e — half-rate matmul plus fp32 layout copies).
    Softmax statistics stay fp32 below."""
    m, hd = cfg.num_attention_pool_heads, cfg.pool_head_dim
    kv = dense(p["kv"], hidden, cfg.dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    b, s, d = k.shape
    k = k.reshape(b, s, m, hd)
    v = v.reshape(b, s, m, hd)
    q = p["query"].reshape(m, hd).astype(hidden.dtype)
    logits = jnp.einsum("hd,bjhd->bhj", q / jnp.sqrt(jnp.asarray(hd, q.dtype)), k)
    if mask is not None:
        logits = jnp.where(mask[:, None] > 0, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(hidden.dtype)
    out = jnp.einsum("bhj,bjhd->bhd", w, v).reshape(b, m * hd)
    return dense(p["out"], out, cfg.dtype)


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Bug-compatible L2 normalize: divide by ||x + eps|| (reference caco.py:91).

    Computed (and returned) in fp32 regardless of the pooler's compute
    dtype: the embedding is the retrieval-scoring currency, and the
    normalize is O(B·d) — precision is free here."""
    x = x.astype(jnp.float32)
    return x / jnp.linalg.norm(x + NORM_EPS, axis=-1, keepdims=True)


def get_audio_embedding(
    params, cfg: CacoConfig,
    audio_patches, audio_time_inds, audio_freq_inds, audio_mask,
    *, normalize: bool = True, train: bool = False, rngs=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (embedding (B, proj), hidden (B, S, D)). Reference caco.py:72-96."""
    hidden = audio_encoder_apply(
        params["audio"], cfg.audio, audio_patches, audio_time_inds,
        audio_freq_inds, audio_mask, dtype=cfg.dtype, train=train, rngs=rngs,
    )
    emb = audio_pooler_apply(params["audio_pool"], cfg, hidden, audio_mask)
    if normalize:
        emb = _normalize(emb)
    return emb, hidden


def get_text_embedding(
    params, cfg: CacoConfig, text_input_ids, text_mask,
    position_ids=None, *, normalize: bool = True, train: bool = False, rngs=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (embedding (B, proj), hidden (B, S, D)). Reference caco.py:99-123."""
    pooled, hidden, _ = text_encoder_apply(
        params["text"], cfg.text, text_input_ids, text_mask, position_ids,
        train=train, rngs=rngs, dtype=cfg.dtype,
    )
    emb = dense(params["text_proj"], pooled)
    if normalize:
        emb = _normalize(emb)
    return emb, hidden


def contrastive_logits(params, audio_emb: jnp.ndarray, text_emb: jnp.ndarray):
    """exp(logit_scale) · A @ T.T (reference scoring rule; embeddings must be
    normalized)."""
    scale = jnp.exp(params["logit_scale"])
    return scale * audio_emb @ text_emb.T


def caption_logits(
    params, cfg: CacoConfig, text_input_ids, text_mask,
    audio_hidden, audio_mask, *, train: bool = False, rngs=None,
) -> jnp.ndarray:
    """Teacher-forced caption logits (B, S, V): text encoder (causal) →
    4-layer cross-attention decoder (reference caco.py:125-150 full-seq mode)."""
    r1 = r2 = None
    if rngs is not None:
        r1, r2 = jax.random.split(rngs)
    _, text_hidden, _ = text_encoder_apply(
        params["text"], cfg.text, text_input_ids, text_mask,
        train=train, rngs=r1, pool=False, dtype=cfg.dtype,
    )
    logits, _ = caption_decoder_apply(
        params["decoder"], cfg.decoder, text_hidden, text_mask,
        audio_hidden, audio_mask, train=train, rngs=r2, dtype=cfg.dtype,
    )
    return logits.astype(jnp.float32)


# ------------------------------------------------------------------ decode

class DecodeState(NamedTuple):
    text_cache: dict
    dec_cache: dict
    input_ids: jnp.ndarray     # (B, max_len) int32
    index: jnp.ndarray         # scalar int32
    is_generating: jnp.ndarray  # (B,) int32


def sample_logits(
    rng: jax.Array, logits: jnp.ndarray, *, temperature: float = 1.0,
    top_k: Optional[int] = None, top_p: Optional[float] = None,
) -> jnp.ndarray:
    """Temperature / top-k / nucleus sampling (serving extension; the
    reference supports temperature only, caco.py:198)."""
    logits = logits / temperature
    if top_k is not None and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob ≥ top_p (always keep the best)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def decode_step(
    params, cfg: CacoConfig, state: DecodeState,
    cross_kv, audio_mask, *, temperature: float,
    eos_id: int, pad_id: int, rng: jax.Array,
    top_k: Optional[int] = None, top_p: Optional[float] = None,
) -> DecodeState:
    """One AR step, pure function (reference loop body caco.py:178-202)."""
    b = state.input_ids.shape[0]
    g = state.is_generating
    current = state.input_ids[:, state.index]
    current = current * g + (1 - g) * pad_id

    pos = jnp.full((b, 1), state.index, jnp.int32)
    _, text_hidden, new_text_cache = text_encoder_apply(
        params["text"], cfg.text, current[:, None], jnp.ones((b, 1)),
        position_ids=pos, cache=state.text_cache, pool=False, dtype=cfg.dtype,
    )
    logits, new_dec_cache = caption_decoder_apply(
        params["decoder"], cfg.decoder, text_hidden, jnp.ones((b, 1)),
        None, audio_mask, cache=state.dec_cache, cross_kv=cross_kv,
        dtype=cfg.dtype,
    )
    logits = logits[:, 0, :].astype(jnp.float32)

    step_rng = jax.random.fold_in(rng, state.index)
    sampled = sample_logits(step_rng, logits, temperature=temperature,
                            top_k=top_k, top_p=top_p)
    # NOTE (bug-compatible with reference caco.py:199): finished streams
    # write token id 0 — NOT pad_id — into the remaining positions.  With
    # the RoBERTa tokenizer id 0 is <s>, stripped by skip_special_tokens;
    # a custom tokenizer whose id 0 is a real token would leak it.
    new_ids = state.input_ids.at[:, state.index + 1].set(sampled * g)
    new_g = g * (sampled != eos_id).astype(jnp.int32)
    return DecodeState(new_text_cache, new_dec_cache, new_ids,
                       state.index + 1, new_g)


def decode(
    params, cfg: CacoConfig, audio_batch: dict, *,
    max_length: int, temperature: float,
    bos_id: int, eos_id: int, pad_id: int, rng: jax.Array,
    dp_axis: Optional[str] = None,
    top_k: Optional[int] = None, top_p: Optional[float] = None,
) -> jnp.ndarray:
    """Batched temperature sampling with KV caches (reference caco.py:154-230).

    jit/shard_map-friendly: `lax.while_loop` with on-device termination.
    Inside a mesh axis (`dp_axis`), termination is agreed across devices via
    `lax.psum` like the reference (:166-167).
    """
    _, audio_hidden = get_audio_embedding(
        params, cfg,
        audio_batch["audio_patches"], audio_batch["audio_time_inds"],
        audio_batch["audio_freq_inds"], audio_batch["audio_mask"],
        normalize=False,
    )
    audio_mask = audio_batch["audio_mask"]
    b = audio_hidden.shape[0]

    cross_kv = precompute_cross_kv(params["decoder"]["blocks"], cfg.decoder,
                                   audio_hidden, dtype=cfg.dtype)
    state = DecodeState(
        text_cache=make_kv_cache(cfg.text, b, max_length, dtype=cfg.dtype),
        dec_cache=make_kv_cache(cfg.decoder, b, max_length, dtype=cfg.dtype),
        input_ids=jnp.zeros((b, max_length), jnp.int32).at[:, 0].set(bos_id),
        index=jnp.zeros((), jnp.int32),
        is_generating=jnp.ones((b,), jnp.int32),
    )
    if dp_axis is not None:
        # Inside shard_map the loop carry must have consistent
        # varying-manual-axes types: mark the constant-initialized state as
        # dp-varying up front.
        state = jax.tree_util.tree_map(lambda x: jax.lax.pcast(x, dp_axis, to='varying'), state)

    def cond(s: DecodeState):
        active = jnp.sum(s.is_generating)
        if dp_axis is not None:
            active = jax.lax.psum(active, axis_name=dp_axis)
        return (s.index < max_length - 1) & (active > 0)

    def body(s: DecodeState):
        return decode_step(params, cfg, s, cross_kv, audio_mask,
                           temperature=temperature, eos_id=eos_id,
                           pad_id=pad_id, rng=rng, top_k=top_k, top_p=top_p)

    end = jax.lax.while_loop(cond, body, state)
    return end.input_ids
