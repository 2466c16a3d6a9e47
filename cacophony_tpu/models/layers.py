"""Shared building blocks: params are plain pytrees, modules are functions.

The model core is deliberately framework-free (no flax modules): params are
nested dicts of arrays, layers are pure functions, and layer stacks are
`lax.scan` over leaves stacked on a leading axis.  This gives O(1) compile
time in depth, makes sharding annotations trivial (one PartitionSpec per
leaf), and keeps the checkpoint converter a pure tree-to-tree map.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e10  # mask bias value (matches reference roberta_text_model.py:200)


# ---------------------------------------------------------------- init utils

def dense_init(rng, d_in: int, d_out: int, stddev: Optional[float] = None):
    """Dense params {w: (d_in, d_out), b: (d_out,)}.

    Default matches flax nn.Dense (lecun_normal); pass stddev for the
    normal(0.02) inits the reference uses in the text tower.
    """
    if stddev is None:
        w = jax.random.normal(rng, (d_in, d_out)) * math.sqrt(1.0 / d_in)
        # truncated lecun_normal differences are irrelevant: real use loads
        # converted checkpoints; init only seeds training.
    else:
        w = jax.random.normal(rng, (d_in, d_out)) * stddev
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((d_out,), jnp.float32)}


def ln_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def embed_init(rng, num: int, dim: int, stddev: float = 0.02):
    return jax.random.normal(rng, (num, dim)).astype(jnp.float32) * stddev


def stack_layers(rng, num_layers: int, init_fn):
    """Initialize `num_layers` block param trees and stack leaves on axis 0."""
    trees = [init_fn(jax.random.fold_in(rng, i)) for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


# ------------------------------------------------------------------- kernels

def dense(p, x, dtype=None):
    if "w_q" in p:
        return dense_int8(p, x, dtype)
    w, b = p["w"], p["b"]
    if dtype is not None:
        x, w, b = x.astype(dtype), w.astype(dtype), b.astype(dtype)
    return x @ w + b


def quantize_dense_int8(p):
    """{'w','b'} → {'w_q','s_w','b'}: symmetric per-OUTPUT-channel int8.

    Serving-only transform (ops/quant.quantize_tree applies it across a
    tower); v5e runs int8 matmuls at ~1.5× the bf16 rate (measured 178.7
    vs 120.8 T/s on chained 4096³)."""
    w = jnp.asarray(p["w"], jnp.float32)
    # reduce over the INPUT-feature axis (-2) so scan-stacked layer weights
    # (L, d_in, d_out) keep their leading axis → s_w (L, d_out) / (d_out,)
    s_w = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "s_w": jnp.squeeze(s_w, -2),
            "b": jnp.asarray(p["b"], jnp.float32)}


def dense_int8(p, x, dtype=None):
    """int8 MXU matmul with dynamic per-token activation quantization:
    x_q = round(x / s_x) with s_x = rowwise absmax/127, y = (x_q @ w_q) ·
    s_x · s_w + b.  Output dtype follows `dtype` (fp32 default)."""
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, p["w_q"], (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * s_x * p["s_w"] + p["b"]
    return out.astype(dtype) if dtype is not None else out


def layer_norm(p, x, eps: float):
    """LayerNorm in fp32 (statistics are precision-sensitive).

    Measured on v5e (same-session interleaved A/B): a bf16-throughout LN is
    NOT faster than this — XLA fuses the dtype conversions — so the strict
    fp32-statistics form is kept for both fp32 and bf16 compute.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def gelu_exact(x):
    """erf-based GELU (reference text act: ACT2FN['gelu'], approximate=False)."""
    return jax.nn.gelu(x, approximate=False)


def dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def drop_path(rng, x, rate: float, deterministic: bool):
    """Stochastic depth: drop whole residual branches per sample
    (reference mae.py:35-53)."""
    if deterministic or rate == 0.0:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.uniform(rng, shape) >= rate
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def sincos_time_embedding(position_ids: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sin-cos positional embedding, reference formula (mae.py:100-105):
    angle = pos * 10000^(-2i/dim); concat [sin, cos] over the last axis."""
    assert dim % 2 == 0
    inv_freq = jnp.exp(
        jnp.arange(dim // 2, dtype=jnp.float32) * (-2.0 * math.log(10000.0) / dim)
    )
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean/int mask → additive attention bias (0 valid, NEG_INF masked)."""
    return jnp.where(mask > 0, 0.0, NEG_INF).astype(dtype)
