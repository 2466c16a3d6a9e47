"""Multi-head attention as a pure function over fused-QKV params.

The reference uses flax's MultiHeadDotProductAttention for audio (mae.py:88)
and a hand-written HF-style attention for text (roberta_text_model.py:132-292).
Both reduce to the same math; here there is ONE implementation with:

- fused QKV projection (one (d, 3d) matmul instead of three (d, d) — better
  MXU utilization at seq≤1536, fewer HBM round-trips)
- additive bias masking (0 / NEG_INF), computed once per call
- optional separate-source cross attention (q from x, kv from memory)
- decode path with a functional KV cache (caller-managed; no mutable state)

Optimized attention kernels (Pallas splash/flash) plug in underneath via the
`attn_weights_fn` seam without changing callers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cacophony_tpu.models.layers import dense, dense_init

# Softmax accumulation dtype for the non-flash path.  True (default) casts
# logits to fp32 before softmax — numerically safest and the parity
# setting.  Trace-time toggle for A/B experiments.
SOFTMAX_FP32 = True


def _softmax(logits):
    if SOFTMAX_FP32:
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jax.nn.softmax(logits, axis=-1)


def attention_init(rng, d_model: int, num_heads: int, stddev=None, cross: bool = False):
    """Params: fused qkv (self) or q + fused kv (cross), plus output proj."""
    ks = jax.random.split(rng, 4)
    if cross:
        return {
            "q": dense_init(ks[0], d_model, d_model, stddev),
            "kv": dense_init(ks[1], d_model, 2 * d_model, stddev),
            "o": dense_init(ks[2], d_model, d_model, stddev),
        }
    return {
        "qkv": dense_init(ks[0], d_model, 3 * d_model, stddev),
        "o": dense_init(ks[1], d_model, d_model, stddev),
    }


def _split_heads(x, num_heads):
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads)


# NOTE: round-1 shipped the generic pallas-ops flash_attention here; it
# lost to XLA's fused einsum chain at these shapes in every same-session
# A/B (block-size sweep 470→707 vs einsum 777 clips/s; re-measured round-2
# with amortized fetches: 538 vs 969).  Deleted in favor of the bespoke
# one-shot VMEM kernel in ops/encoder_attention.py (seq 500 / head_dim 96
# fits on-chip; streaming machinery was pure overhead).


def multi_head_attention(
    params,
    x: jnp.ndarray,                      # (B, S, D) queries source
    *,
    num_heads: int,
    bias: Optional[jnp.ndarray] = None,  # (B, 1, Sq, Sk) or (B,1,1,Sk) additive
    memory: Optional[jnp.ndarray] = None,  # cross-attention kv source
    kv_cache: Optional[dict] = None,     # {'k','v': (B, H, Dh, T)}, decode
    cache_index: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    flash_mask: Optional[jnp.ndarray] = None,  # (B, S): use flash kernel
    causal: bool = False,                       # with flash_mask: j ≤ i masking
    dropout_rate: float = 0.0,                  # attention-prob dropout (train)
    dropout_rng: Optional[jax.Array] = None,
):
    """Returns (out (B,S,D), kv_slice or None).

    Decode mode (kv_cache given): S must be 1; the cache is READ-ONLY here
    (bias must mask positions ≥ the write index — see text._decode_bias);
    the current token's (B, 1, H, Dh) k/v slice is returned for the caller
    to write into the stacked cache once per step.  cache_index is unused
    in this mode (kept for call-site symmetry).
    """
    b, s, d = x.shape
    head_dim = d // num_heads

    if memory is None:
        from cacophony_tpu.ops.encoder_attention import (
            encoder_attention,
            encoder_attention_blocked,
            kernel_plan,
        )

        inside_shard_map = bool(getattr(jax.typeof(x), "vma", None))
        compute_dtype = dtype if dtype is not None else x.dtype
        plan = kernel_plan(s, d, compute_dtype)
        # compiled kernel on TPU only; interpret (plain jax ops) everywhere
        # else — a GPU/METAL backend can't lower pltpu kernels
        interp = jax.default_backend() != "tpu"
        # Bespoke VMEM attention kernel (encoder shapes): no head split,
        # no layout copies, no HBM logits; scaling/masking/softmax
        # in-kernel.  Runs per-shard inside shard_map too (vma is mirrored
        # into the pallas out_shape) — a mesh keeps the kernel win.  The
        # one hole is vma-CHECKED interpret mode: the pallas interpret
        # evaluator mixes varying and invariant operands in dynamic_slice
        # and trips the vma checker, so CPU shard_map callers either get
        # the einsum path here or pass check_vma=False (CacoEngine does).
        use_kernel = (flash_mask is not None and kv_cache is None
                      and dropout_rate == 0.0 and plan is not None
                      and not (inside_shard_map and interp))
        if use_kernel and plan[0] == "one_shot":
            qkv = dense(params["qkv"], x, dtype)
            out = encoder_attention(qkv, flash_mask, num_heads, interp, causal)
            return dense(params["o"], out, dtype), None
        if use_kernel and plan[0] == "blocked" and not causal:
            # long-seq plan wants SEPARATE Q and K|V operands (the fused
            # block double-buffered busts VMEM): split the fused weight —
            # same FLOPs, two matmuls, no activation copies
            pq = params["qkv"]
            q_p = {"w": pq["w"][:, :d], "b": pq["b"][:d]}
            kv_p = {"w": pq["w"][:, d:], "b": pq["b"][d:]}
            q_out = dense(q_p, x, dtype)
            kv_out = dense(kv_p, x, dtype)
            out = encoder_attention_blocked(q_out, kv_out, flash_mask,
                                            num_heads, interp)
            return dense(params["o"], out, dtype), None
        qkv = dense(params["qkv"], x, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = dense(params["q"], x, dtype)
        kv = dense(params["kv"], memory, dtype)
        k, v = jnp.split(kv, 2, axis=-1)

    q = _split_heads(q, num_heads)
    k = _split_heads(k, num_heads)
    v = _split_heads(v, num_heads)

    if kv_cache is not None:
        # READ-ONLY cache decode (S == 1): attend over cached positions
        # (bias must mask positions ≥ the write index) PLUS the current
        # token's fresh k/v, and return that (B, 1, H, Dh) slice for the
        # caller to scatter into the stacked cache ONCE per step.
        # (Round-1 rewrote the full (B, T, H, Dh) cache through the layer
        # scan's outputs every token — at 64 slots that was ~3× the cache
        # size in HBM traffic per step and decode scaled O(B·T); measured
        # 15.8 ms/step at B=64 on v5e.)
        # NOTE (r5 measured REJECTION — don't retry): a bespoke Pallas
        # single-query kernel streaming cached K/V at full 768-lane rows
        # (per-head logits via block-diagonal E1/E2 matmuls) compiled at
        # every serving shape and LOST to this einsum path in a
        # same-session interleaved A/B — 64 streams 12.7k vs 15.8k,
        # 128: 16.6k vs 16.9k, 256: 17.1k vs 17.8k tok/s, with 7.3% token
        # mismatch from the extra bf16 K⊙q rounding.  The E1/E2 trick
        # costs ~10.7× the minimal MACs (Dh-reduce widened to 128 lanes),
        # and XLA's GEMV fusions are NOT the decode wall (confirms the r3
        # block-diagonal finding).  Deleted; history at commit 33b03cc^.
        # Cache layout (static, inferred at trace time from ndim):
        #   3-D (B, T, E) "merged" — each cached token's K/V row is
        #   contiguous across all E = H·Dh lanes, so the per-step read
        #   streams dense (T, 768) tiles and the write is one dense row.
        #   Per-head logits/PV run as block-diagonal-q batched matmuls
        #   (~12× the minimal MACs — noise — with identical bf16 products
        #   and fp32 MXU accumulation).
        #   4-D (B, T, H, Dh) "legacy" — per-head einsums; the (12, 64)
        #   minor dims pad to (16, 128) tiles, a 2.67× HBM over-fetch on
        #   the reads that were ~63% of the r5 256-stream decode step.
        # (A time-last (B, H, Dh, T) layout was also measured r5 and lost
        # 2.5× — the single-column per-step write is lane-sparse; see
        # models/text.py CACHE_LAYOUT.)
        q = q * (1.0 / jnp.sqrt(head_dim).astype(q.dtype))
        ck = kv_cache["k"].astype(q.dtype)
        cv = kv_cache["v"].astype(q.dtype)
        merged = ck.ndim == 3
        if merged:
            eye = jnp.eye(num_heads, dtype=q.dtype)
            qm = jnp.einsum("bqhd,hg->bqhgd", q, eye).reshape(b, s, num_heads, d)
            logits_past = jnp.einsum("bqhe,bte->bhqt", qm, ck)
        else:
            logits_past = jnp.einsum("bqhd,bkhd->bhqk", q, ck)
        if bias is not None:
            logits_past = logits_past + bias.astype(logits_past.dtype)
        logits_self = jnp.einsum("bqhd,bqhd->bhq", q, k)[..., None]
        logits = jnp.concatenate([logits_past, logits_self], axis=-1)
        weights = _softmax(logits)
        w_past, w_self = weights[..., :-1], weights[..., -1]
        if merged:
            full = jnp.einsum("bhqt,bte->bqhe", w_past, cv)
            out = jnp.einsum("bqhhd->bqhd",
                             full.reshape(b, s, num_heads, num_heads, head_dim))
        else:
            out = jnp.einsum("bhqk,bkhd->bqhd", w_past, cv)
        out = out + v * jnp.moveaxis(w_self, 1, 2)[..., None]
        out = out.reshape(b, s, d)
        if merged:
            return (dense(params["o"], out, dtype),
                    {"k": k.reshape(b, s, d), "v": v.reshape(b, s, d)})
        return dense(params["o"], out, dtype), {"k": k, "v": v}

    q = q * (1.0 / jnp.sqrt(head_dim).astype(q.dtype))
    # NOTE: measured on v5e (same-session interleaved A/B, B=128 seq 500
    # bf16): this einsum+fp32-softmax formulation ≈ 795 clips/s vs
    # jax.nn.dot_product_attention ≈ 755 — XLA already fuses this chain;
    # the "fused" primitive is slightly slower here and numerically looser.
    if bias is None and flash_mask is not None:
        # kernel path declined (e.g. attention dropout in training):
        # reconstruct the additive bias from the mask (+ causal triangle)
        allowed = flash_mask[:, None, None, :] > 0
        if causal:
            allowed = allowed & jnp.tril(jnp.ones((s, s), jnp.bool_))
        bias = jnp.where(allowed, 0.0, -1e30)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    # Softmax in fp32 for stability under bf16 compute (SOFTMAX_FP32).
    weights = _softmax(logits)
    if dropout_rate > 0.0 and dropout_rng is not None:
        from cacophony_tpu.models.layers import dropout as _dropout
        # recompute-in-bwd dropout: the (B, H, Sq, Sk) keep mask is the
        # single largest residual the train step stacks across the layer
        # scan — regenerate it from the key in the backward instead
        weights = _dropout(dropout_rng, weights, dropout_rate, False)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, s, d)
    return dense(params["o"], out, dtype), None
