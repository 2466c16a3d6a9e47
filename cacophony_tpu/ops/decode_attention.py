"""Bespoke Pallas single-query (decode) attention over cached K/V.

Why: the r4 xplane of the 256-stream decode loop shows ~70% of every step
in XLA's cached-attention GEMVs — the decoder's cross-attention re-reads
its 500-position K/V at ~280 GB/s effective (fusions emitting half-empty
(…, 12, 64) lanes plus {2,1,0}↔{1,2,0} layout churn), ~5.6 ms/step, and
the text tower's cached self-attention another ~2.5 ms/step.  Single-query
attention is pure bandwidth: the floor is one streaming read of K and V
per step.  This kernel reads them once at full rows (D = H·Dh = 768
contiguous lanes) and does all the per-head math on-chip.

Per stream i (python-unrolled over a block of `bb` streams; grid over B):

    mul    = K_i ⊙ q_i                 (T, D)  VPU, fp32
    logits = mul @ E1                  (T, 128) MXU   E1[d, h] = [d//Dh == h]
    p      = exp(min(logits, kbias))   clamp softmax (encoder_attention
                                       semantics: valid keys carry the +80
                                       ceiling, masked keys −1e30 → exp 0)
    P̃     = p @ E2                    (T, D)  MXU   E2 = E1ᵀ (broadcast
                                       each head's weight across its lanes)
    out_i  = Σ_t (P̃ ⊙ V_i) / Σ_t p    column reduce + in-place norm

The block-diagonal E1/E2 matmuls turn the per-head (1, Dh)·(Dh, T) GEMVs
— 12 M=1 matmuls per stream per layer, which is where XLA dies — into two
well-shaped (T, D)-class MXU ops per stream.  The optional fresh-token
k1/v1 pair (self-attention appends the current token, which is not in the
read-only cache — ops/attention.py decode contract) joins as one extra
logit row computed the same way.

Numerics: fp32 products and accumulation after the bf16 loads (tighter
than the XLA path, which rounds the attention output to bf16); clamp
softmax exact to logit 80, fully-masked rows emit 0 via the 1e-37 rowsum
floor.  Reference semantics: the cached-decode attention of
src/caco/text_models/roberta_text_model.py:219-259 (self) and the
cross-attention branch at :182-201 with precomputed memory K/V.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cacophony_tpu.ops.encoder_attention import NEG_INF, SOFTMAX_CLAMP

# Trace-time toggle (A/B runs need a fresh jitted closure per value —
# see CLAUDE.md on the jit-identity footgun).
DECODE_KERNEL = True

_HEAD_PAD = 128          # logits lane width (H = 12 heads padded to a tile)
_VMEM_BYTES = 80 * 1024 * 1024   # raised scoped-VMEM budget (v5e: 128M)


def _pick_block(batch: int, t: int, d: int, itemsize: int) -> int:
    """Largest stream-block whose double-buffered K+V fits the budget."""
    for bb in (32, 16, 8, 4, 2, 1):
        if batch % bb:
            continue
        if 2 * 2 * bb * t * d * itemsize + 8 * 1024 * 1024 <= _VMEM_BYTES:
            return bb
    return 0


def _kernel(num_heads: int, head_dim: int, bb: int, has_self: bool, *refs):
    if has_self:
        q_ref, k_ref, v_ref, kb_ref, k1_ref, v1_ref, out_ref = refs
    else:
        q_ref, k_ref, v_ref, kb_ref, out_ref = refs
        k1_ref = v1_ref = None
    d = num_heads * head_dim

    # E1 (D, 128): column h selects head h's Dh rows; E2 = E1ᵀ broadcasts
    # each head's scalar across its Dh lanes.  Built per block from iotas
    # (constant folding; TPU needs ≥2D iota).
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, _HEAD_PAD), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, _HEAD_PAD), 1)
    e1 = (rows // head_dim == cols).astype(jnp.float32)
    e2 = e1.T  # (128, D)

    for i in range(bb):
        qi = q_ref[i:i + 1, :].astype(jnp.float32)          # (1, D)
        ki = k_ref[i].astype(jnp.float32)                   # (T, D)
        vi = v_ref[i].astype(jnp.float32)                   # (T, D)
        kb = kb_ref[:, i:i + 1]                             # (T, 1) fp32
        logits = jax.lax.dot_general(                       # (T, 128)
            ki * qi, e1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.minimum(logits, kb))                # masked → 0
        rowsum = jnp.sum(p, axis=0, keepdims=True)          # (1, 128)
        ptil = jax.lax.dot_general(                         # (T, D)
            p, e2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.sum(ptil * vi, axis=0, keepdims=True)       # (1, D)
        if has_self:
            m1 = k1_ref[i:i + 1, :].astype(jnp.float32) * qi
            ls = jax.lax.dot_general(                       # (1, 128)
                m1, e1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ps = jnp.exp(jnp.minimum(ls, jnp.float32(SOFTMAX_CLAMP)))
            rowsum = rowsum + ps
            pstil = jax.lax.dot_general(
                ps, e2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = o + pstil * v1_ref[i:i + 1, :].astype(jnp.float32)
        denom = jax.lax.dot_general(                        # (1, D)
            jnp.maximum(rowsum, 1e-37), e2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[i:i + 1, :] = (o / denom).astype(out_ref.dtype)


def single_query_attention(
    q: jnp.ndarray,          # (B, D) — PRE-SCALED by 1/√Dh
    k: jnp.ndarray,          # (B, T, D) cached keys
    v: jnp.ndarray,          # (B, T, D) cached values
    kbias: jnp.ndarray,      # (B, T) fp32: SOFTMAX_CLAMP valid / NEG_INF not
    k1: jnp.ndarray = None,  # (B, D) fresh current-token key (self-attn)
    v1: jnp.ndarray = None,
    *,
    num_heads: int,
    interpret: bool = False,
):
    """→ (B, D) attention output, or None when no block plan fits."""
    b, t, d = k.shape
    head_dim = d // num_heads
    bb = _pick_block(b, t, d, jnp.dtype(k.dtype).itemsize)
    if bb == 0:
        return None
    has_self = k1 is not None

    vma = getattr(jax.typeof(q), "vma", None)
    out_shape = (jax.ShapeDtypeStruct((b, d), q.dtype, vma=vma)
                 if vma else jax.ShapeDtypeStruct((b, d), q.dtype))

    bd = pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        bd,
        pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        # kbias arrives transposed (T, B) so each stream's column slice is
        # a clean 2D (T, 1) load (a (1, T) row would need an in-kernel
        # transpose to broadcast against the (T, 128) logits)
        pl.BlockSpec((t, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, kbias.astype(jnp.float32).T]
    if has_self:
        in_specs += [bd, bd]
        args += [k1, v1]

    kern = functools.partial(_kernel, num_heads, head_dim, bb, has_self)
    return pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES),
        interpret=interpret,
    )(*args)


def decode_kbias(bias: jnp.ndarray, batch: int, t: int) -> jnp.ndarray:
    """Additive (B|1, 1, 1, T) decode bias → (B, T) clamp-merged kbias."""
    flat = jnp.broadcast_to(bias.reshape(bias.shape[0], t), (batch, t))
    return jnp.where(flat > jnp.float32(-1e29), jnp.float32(SOFTMAX_CLAMP),
                     jnp.float32(NEG_INF))
