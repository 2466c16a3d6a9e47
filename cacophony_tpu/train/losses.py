"""Training objectives for both Cacophony stages.

The reference repo ships NO training code (SURVEY §0: inference only); these
implement the objectives its paper/checkpoints imply, with the scoring rule
pinned by the repo itself (exp(logit_scale)·A@T.T, src/caco_torch/caco.py:208).

Distribution note: under `jit` over a dp-sharded batch, `a @ t.T` on
normalized embeddings is a global matmul — GSPMD inserts the all-gather of
embeddings across the dp axis (the standard distributed-CLIP construction)
without user collective code.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import optax


def clip_contrastive_loss(
    audio_emb: jnp.ndarray,  # (B, D) L2-normalized
    text_emb: jnp.ndarray,   # (B, D) L2-normalized
    logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Symmetric InfoNCE over the global batch."""
    logits = jnp.exp(logit_scale) * (audio_emb @ text_emb.T)
    labels = jnp.arange(logits.shape[0])
    l_at = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    l_ta = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (l_at.mean() + l_ta.mean())


def caption_cross_entropy(
    logits: jnp.ndarray,      # (B, S, V) for positions 0..S-1
    target_ids: jnp.ndarray,  # (B, S) next-token targets
    target_mask: jnp.ndarray,  # (B, S) 1 = real token
) -> jnp.ndarray:
    """Token-level CE, mask-weighted mean."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, target_ids.astype(jnp.int32)
    )
    m = target_mask.astype(ce.dtype)
    return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)


def mae_reconstruction_loss(
    pred_patches: jnp.ndarray,   # (B, S_vis + S_masked, patch)
    true_patches: jnp.ndarray,   # (B, S_vis + S_masked, patch)
    loss_mask: jnp.ndarray,      # (B, S_vis + S_masked) 1 = position to score
    normalize_target: bool = False,
) -> jnp.ndarray:
    """MSE over reconstructed positions (MAE: typically the masked ones)."""
    target = true_patches
    if normalize_target:
        mu = target.mean(-1, keepdims=True)
        var = target.var(-1, keepdims=True)
        target = (target - mu) / jnp.sqrt(var + 1e-6)
    err = jnp.square(pred_patches - target).mean(-1)
    m = loss_mask.astype(err.dtype)
    return (err * m).sum() / jnp.maximum(m.sum(), 1.0)
