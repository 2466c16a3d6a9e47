"""Audio ViT-MAE encoder and reconstruction decoder.

Semantics match the reference Flax modules (src/caco/audio_models/mae.py):
- encoder (mae.py:107-139): Dense patch projection, sin-cos TIME positional
  embedding from explicit time indices, LEARNED frequency embedding table
  gathered by freq indices, N pre-LN ViT blocks (MHA + SiLU MLP, DropPath),
  final LayerNorm.  Position-indexed inputs make the model agnostic to patch
  subsampling/masking.
- decoder (mae.py:144-188): re-projection, same positional scheme, learned
  mask token appended for masked positions with their own positions, N blocks,
  LayerNorm, Dense(patch_size) reconstruction head.

TPU-first deltas vs the reference: layer stacks are `lax.scan` over
leading-axis-stacked params (the reference python-loops 12 separate modules,
mae.py:134 "# TODO scan"); attention is fused-QKV; compute dtype is
configurable (bf16 on the MXU) with fp32 LayerNorm/softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from cacophony_tpu.configs import AudioDecoderConfig, AudioEncoderConfig
from cacophony_tpu.models.layers import (
    act_dense,
    dense,
    dense_init,
    drop_path,
    dropout,
    embed_init,
    layer_norm,
    ln_init,
    mask_to_bias,
    sincos_time_embedding,
    stack_layers,
)
from cacophony_tpu.ops.attention import attention_init, multi_head_attention

LN_EPS = 1e-6  # flax nn.LayerNorm default (reference audio tower uses it)

# Train-time fused kernels: when dropout_rate == drop_path_rate == 0.0 (the
# published configs' values) the train-mode block is mathematically the eval
# block, so the inference Pallas fusions (whole-layer / block) are legal in
# training too — their custom_vjp backward remats the layer in XLA.
# MEASURED AND REJECTED as a default (r3, same-session interleaved, B=16
# bf16 seq-500 stage-2 step): 100.2 vs 87.5 ms/step — the whole-layer
# XLA-remat backward recomputes einsum attention AND takes grads through it,
# losing more than the fused forward saves vs the one-shot kernel fwd +
# flash-style Pallas backward kernel that training uses today.  Kept as a
# flag for re-measurement on future hardware.
FUSED_IN_TRAIN = False

# Selective rematerialization policy for the TRAIN-mode block (trace-time;
# None = save everything, JAX default).  The fwd scan otherwise saves, per
# step at B=16/seq-500, two bf16[12,16,500,3072] MLP intermediates (2.3 GB),
# the QKV projections (850 MB) and fp32 LN normalized values (~600 MB) —
# pure HBM write+read traffic on a bandwidth-bound backward.
#   "dots":     jax.checkpoint policy dots_saveable — keep matmul outputs,
#               recompute elementwise chains (silu, LN normalize) in bwd.
#   "mlp_wide": additionally drop BOTH (S, intermediate) MLP tensors
#               (recomputes the w1 matmul in bwd; biggest traffic cut).
# Measured r4 (alternating fresh processes, B=16 bf16 seq-500 stage-2 step,
# 3×10-iter trials each; co-resident variants inflate ALL steps ~12% via
# HBM pressure, so interleave across processes, not closures):
#   none 86.0/86.4 · dots 84.7/85.9 · mlp_wide 98.0 ms.
# mlp_wide REJECTED: wrapping the block in jax.checkpoint makes the
# attention custom_vjp re-run its forward kernel in bwd, costing far more
# than the 2.3 GB save-traffic cut.  dots ~1 ms ahead but within relay
# drift — default stays None (save everything); knob kept for re-measure.
BLOCK_REMAT_POLICY: Optional[str] = None

# lax.scan unroll factor for the block stack (trace-time; A/B knob —
# unroll>1 trades compile time/code size for fewer loop iterations and
# cross-layer scheduling freedom).  MEASURED AND REJECTED as a default
# (r4, fresh-process interleaved, B=16 bf16 stage-2 step): unroll=2
# 94.8-95.4 ms vs unroll=1 79.8-81.9 — doubling the loop body doubles
# live save-buffer ranges and defeats the memory-space-assignment
# prefetching; keep 1.
SCAN_UNROLL = 1


def _block_remat_policy():
    if BLOCK_REMAT_POLICY == "dots":
        return jax.checkpoint_policies.dots_saveable
    if BLOCK_REMAT_POLICY == "mlp_wide":
        return jax.checkpoint_policies.save_anything_except_these_names(
            "mlp_wide")
    return None


# ------------------------------------------------------------------ init

def _block_init(rng, hidden: int, intermediate: int):
    ks = jax.random.split(rng, 4)
    return {
        "ln1": ln_init(hidden),
        "attn": attention_init(ks[0], hidden, num_heads=1),  # heads set at apply
        "ln2": ln_init(hidden),
        "mlp": {
            "w1": dense_init(ks[1], hidden, intermediate),
            "w2": dense_init(ks[2], intermediate, hidden),
        },
    }


def audio_encoder_init(rng, cfg: AudioEncoderConfig):
    ks = jax.random.split(rng, 4)
    return {
        "patch_proj": dense_init(ks[0], cfg.patch_size, cfg.hidden_size),
        "freq_pos_embed": embed_init(ks[1], cfg.num_freq_patches, cfg.hidden_size),
        "blocks": stack_layers(
            ks[2], cfg.num_layers,
            lambda r: _block_init(r, cfg.hidden_size, cfg.intermediate_size),
        ),
        "ln_f": ln_init(cfg.hidden_size),
    }


def audio_decoder_init(rng, cfg: AudioDecoderConfig, encoder_hidden: int):
    ks = jax.random.split(rng, 5)
    return {
        "in_proj": dense_init(ks[0], encoder_hidden, cfg.hidden_size),
        "freq_pos_embed": embed_init(ks[1], cfg.num_freq_patches, cfg.hidden_size),
        "mask_token": embed_init(ks[2], 1, cfg.hidden_size)[0],
        "blocks": stack_layers(
            ks[3], cfg.num_layers,
            lambda r: _block_init(r, cfg.hidden_size, cfg.intermediate_size),
        ),
        "ln_f": ln_init(cfg.hidden_size),
        "out_proj": dense_init(ks[4], cfg.hidden_size, cfg.patch_size),
    }


# ------------------------------------------------------------------ apply

def _vit_block(p, x, bias, *, num_heads, dropout_rate, drop_path_rate, dtype,
               train=False, rngs=None, flash_mask=None):
    """Pre-LN block: x + DropPath(MHA(LN(x))), x + DropPath(MLP(LN(x)))
    (reference mae.py:72-98; MLP = Dense→SiLU→Dense, mae.py:55-70)."""
    det = not train
    r = (lambda i: jax.random.fold_in(rngs, i)) if rngs is not None else (lambda i: None)

    h = None
    fusable = det or (FUSED_IN_TRAIN
                      and dropout_rate == 0.0 and drop_path_rate == 0.0)
    if flash_mask is not None and fusable:
        # inference fast path, widest fusion first: the ENTIRE layer
        # (LN1 + QKV + attention + o-proj + residual + LN2 + MLP) in one
        # Pallas kernel — the (S, intermediate) activation never touches
        # HBM and the 12-layer stack is 12 kernel calls
        from cacophony_tpu.ops.encoder_attention import (
            try_fused_block_attention,
            try_fused_layer,
            try_fused_ln_attention,
        )

        out = try_fused_layer(p, x, flash_mask, num_heads, LN_EPS, dtype)
        if out is not None:
            return out

        # next: block half in-kernel, MLP matmuls in XLA
        res = try_fused_block_attention(p, x, flash_mask, num_heads,
                                        LN_EPS, dtype)
        if res is not None:
            y, h2 = res
            h2 = dense(p["mlp"]["w1"], h2, dtype)
            h2 = jax.nn.silu(h2)
            h2 = dense(p["mlp"]["w2"], h2, dtype)
            return y + h2

        # narrower fallback: LN1 + QKV + attention only
        h = try_fused_ln_attention(p["ln1"], p["attn"], x, flash_mask,
                                   num_heads, LN_EPS, dtype)
        if h is not None:
            h = dense(p["attn"]["o"], h, dtype)
    if h is None:
        h = layer_norm(p["ln1"], x, LN_EPS)
        h, _ = multi_head_attention(p["attn"], h, num_heads=num_heads, bias=bias,
                                    dtype=dtype, flash_mask=flash_mask,
                                    dropout_rate=0.0 if det else dropout_rate,
                                    dropout_rng=r(5))
    h = dropout(r(0), h, dropout_rate, det)
    x = x + drop_path(r(1), h, drop_path_rate, det)

    h = layer_norm(p["ln2"], x, LN_EPS)
    h = dense(p["mlp"]["w1"], h, dtype)
    if (det or dropout_rate == 0.0) and BLOCK_REMAT_POLICY != "mlp_wide":
        # no dropout between act and w2 → backward-lean fused tail (saves
        # only the pre-activation; recomputes silu + its VJP in bwd)
        h = act_dense(p["mlp"]["w2"], h, jax.nn.silu, dtype)
    else:
        h = checkpoint_name(h, "mlp_wide")
        h = jax.nn.silu(h)
        h = checkpoint_name(h, "mlp_wide")
        h = dropout(r(2), h, dropout_rate, det)
        h = dense(p["mlp"]["w2"], h, dtype)
    h = dropout(r(3), h, dropout_rate, det)
    x = x + drop_path(r(4), h, drop_path_rate, det)
    return x


def _run_blocks(blocks, x, bias, *, num_heads, dropout_rate, drop_path_rate,
                dtype, train, rngs, flash_mask=None):
    block = _vit_block
    policy = _block_remat_policy() if train else None
    if policy is not None:
        def block(p, x, bias, **kw):
            fn = lambda p_, x_, b_, r_: _vit_block(  # noqa: E731
                p_, x_, b_, rngs=r_,
                **{k: v for k, v in kw.items() if k != "rngs"})
            return jax.checkpoint(fn, policy=policy)(p, x, bias, kw.get("rngs"))

    def body(carry, xs):
        x = carry
        if rngs is not None:
            p, layer_rng = xs
        else:
            p, layer_rng = xs, None
        x = block(p, x, bias, num_heads=num_heads, dropout_rate=dropout_rate,
                  drop_path_rate=drop_path_rate, dtype=dtype, train=train,
                  rngs=layer_rng, flash_mask=flash_mask)
        return x, None

    num_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    xs = (blocks, jax.random.split(rngs, num_layers)) if rngs is not None else blocks
    x, _ = jax.lax.scan(body, x, xs, unroll=SCAN_UNROLL)
    return x


def audio_encoder_apply(
    params,
    cfg: AudioEncoderConfig,
    patches: jnp.ndarray,     # (B, S, patch_size)
    time_inds: jnp.ndarray,   # (B, S) int
    freq_inds: jnp.ndarray,   # (B, S) int
    mask: jnp.ndarray,        # (B, S) 1=valid
    *,
    dtype=jnp.float32,
    train: bool = False,
    rngs: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """→ hidden states (B, S, hidden). Reference: mae.py:111-139."""
    x = dense(params["patch_proj"], patches.astype(dtype), dtype)
    x = x + sincos_time_embedding(time_inds, cfg.hidden_size).astype(x.dtype)
    x = x + params["freq_pos_embed"].astype(x.dtype)[freq_inds]
    if cfg.flash_attention:
        bias, flash_mask = None, mask
    else:
        bias, flash_mask = mask_to_bias(mask)[:, None, None, :], None  # key-side
    x = _run_blocks(params["blocks"], x, bias, num_heads=cfg.num_heads,
                    dropout_rate=cfg.dropout_rate, drop_path_rate=cfg.drop_path_rate,
                    dtype=dtype, train=train, rngs=rngs, flash_mask=flash_mask)
    return layer_norm(params["ln_f"], x, LN_EPS)


def audio_decoder_apply(
    params,
    cfg: AudioDecoderConfig,
    hidden: jnp.ndarray,            # (B, S_vis, enc_hidden) encoder output
    mask: jnp.ndarray,              # (B, S_vis)
    time_inds: jnp.ndarray,
    freq_inds: jnp.ndarray,
    restore_time_inds: jnp.ndarray,  # (B, S_masked) positions to reconstruct
    restore_freq_inds: jnp.ndarray,
    restore_mask: jnp.ndarray,
    *,
    dtype=jnp.float32,
    train: bool = False,
    rngs: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """→ reconstructed patches (B, S_vis + S_masked, patch_size).
    Reference: mae.py:148-188."""
    x = dense(params["in_proj"], hidden.astype(dtype), dtype)
    x = x + sincos_time_embedding(time_inds, cfg.hidden_size).astype(x.dtype)
    x = x + params["freq_pos_embed"].astype(x.dtype)[freq_inds]

    xm = params["mask_token"].astype(x.dtype)[None, None, :]
    xm = xm + sincos_time_embedding(restore_time_inds, cfg.hidden_size).astype(x.dtype)
    xm = xm + params["freq_pos_embed"].astype(x.dtype)[restore_freq_inds]

    x = jnp.concatenate([x, xm], axis=1)
    full_mask = jnp.concatenate([mask, restore_mask], axis=1)
    if getattr(cfg, "flash_attention", False):
        bias, flash_mask = None, full_mask
    else:
        bias, flash_mask = mask_to_bias(full_mask)[:, None, None, :], None
    x = _run_blocks(params["blocks"], x, bias, num_heads=cfg.num_heads,
                    dropout_rate=cfg.dropout_rate, drop_path_rate=cfg.drop_path_rate,
                    dtype=dtype, train=train, rngs=rngs, flash_mask=flash_mask)
    x = layer_norm(params["ln_f"], x, LN_EPS)
    return dense(params["out_proj"], x, dtype)


# ------------------------------------------------------------------ AudioMAE

def audiomae_init(rng, enc_cfg: AudioEncoderConfig, dec_cfg: AudioDecoderConfig):
    k1, k2 = jax.random.split(rng)
    return {
        "encoder": audio_encoder_init(k1, enc_cfg),
        "decoder": audio_decoder_init(k2, dec_cfg, enc_cfg.hidden_size),
    }


def audiomae_apply(params, enc_cfg, dec_cfg, patches, mask, time_inds, freq_inds,
                   restore_time_inds, restore_freq_inds, restore_mask, *,
                   dtype=jnp.float32, train=False, rngs=None):
    """Stage-1 reconstruction forward (reference mae.py:190-225)."""
    r1 = r2 = None
    if rngs is not None:
        r1, r2 = jax.random.split(rngs)
    h = audio_encoder_apply(params["encoder"], enc_cfg, patches, time_inds,
                            freq_inds, mask, dtype=dtype, train=train, rngs=r1)
    return audio_decoder_apply(params["decoder"], dec_cfg, h, mask, time_inds,
                               freq_inds, restore_time_inds, restore_freq_inds,
                               restore_mask, dtype=dtype, train=train, rngs=r2)
