"""int8 serving quantization for the audio tower.

Quality-gated OPT-IN (CacoEngine(quantize_int8=True)): every dense weight
in the audio encoder + pooler is converted to symmetric per-output-channel
int8 with dynamic per-token activation quantization (layers.dense_int8).
Position/LN/embedding params stay fp32; the attention kernel is unchanged
(it consumes the already-dequantized QKV activations).

v5e int8 MXU rate measured at ~1.5× bf16 (178.7 vs 120.8 T/s chained
4096³ through XLA); the encoder's matmuls are ~75% of pipeline time, so
the ceiling is ~+35%.  Embedding-cosine gate measured on-chip — see
CLAUDE.md / README perf notes.
"""

from __future__ import annotations

from typing import Iterable

import jax

from cacophony_tpu.models.layers import quantize_dense_int8


def _is_dense(node) -> bool:
    return isinstance(node, dict) and set(node) >= {"w", "b"} and "w_q" not in node


def quantize_tree(tree, *, skip_keys: Iterable[str] = ()):
    """Recursively convert every {'w','b'} dense param dict to int8 form.

    skip_keys: dict keys whose SUBTREES stay fp32 (e.g. numerically
    sensitive heads)."""
    skip = set(skip_keys)

    def rec(node):
        if _is_dense(node):
            q = quantize_dense_int8(node)
            # preserve any extra leaves alongside w/b (none today)
            for k, v in node.items():
                if k not in ("w", "b"):
                    q[k] = v
            return q
        if isinstance(node, dict):
            return {k: (v if k in skip else rec(v)) for k, v in node.items()}
        return node

    return rec(tree)


def quantize_caco_audio_tower(params):
    """Quantize the audio encoder + audio pooler of a CACO param tree for
    serving.  Text tower / decoder / projections stay fp32-bf16 (text
    embeddings are cheap relative to audio, and retrieval galleries are
    usually audio-heavy)."""
    out = dict(params)
    out["audio"] = quantize_tree(params["audio"])
    out["audio_pool"] = quantize_tree(params["audio_pool"])
    return out


def dequantize_tree(tree):
    """Inverse of quantize_tree (w ≈ w_q · s_w): for tests/round-trips."""
    import jax.numpy as jnp

    def rec(node):
        if isinstance(node, dict) and "w_q" in node:
            return {"w": node["w_q"].astype(jnp.float32)
                    * node["s_w"][..., None, :],
                    "b": node["b"]}
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(tree)
