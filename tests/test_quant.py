"""int8 serving quantization: error bounds, tree transform, engine gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu import configs
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.models.layers import dense, dense_init, quantize_dense_int8
from cacophony_tpu.ops.quant import (
    dequantize_tree,
    quantize_caco_audio_tower,
    quantize_tree,
)
from cacophony_tpu.runtime.engine import CacoEngine


def test_dense_int8_error_bound():
    rng = jax.random.PRNGKey(0)
    p = dense_init(rng, 64, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 64))
    ref = dense(p, x)
    got = dense(quantize_dense_int8(p), x)
    # int8 symmetric quant: ~1% normalized RMS error on random gaussians
    nrms = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert nrms < 0.02, nrms
    assert got.dtype == jnp.float32
    # dtype plumbs through
    assert dense(quantize_dense_int8(p), x, jnp.bfloat16).dtype == jnp.bfloat16


def test_quantize_tree_and_roundtrip():
    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    q = quantize_tree(params["audio"])
    # every dense got converted, arrays (embeddings/LN) untouched
    assert "w_q" in q["patch_proj"] and "w" not in q["patch_proj"]
    assert q["blocks"]["attn"]["qkv"]["w_q"].dtype == jnp.int8
    assert q["freq_pos_embed"].dtype == jnp.float32

    back = dequantize_tree(q)
    w0 = np.asarray(params["audio"]["patch_proj"]["w"])
    w1 = np.asarray(back["patch_proj"]["w"])
    assert np.abs(w0 - w1).max() <= np.abs(w0).max() / 127 + 1e-6


def test_engine_int8_embedding_cosine():
    """Quality gate at tiny scale: int8 audio tower embeddings stay close
    to fp32 (the 85M-scale on-chip gate is recorded in CLAUDE.md)."""
    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    wavs = [rng.randn(8000).astype(np.float32) * 0.3 for _ in range(6)]

    ref = CacoEngine(cfg, params, buffer_seconds=1.0, batch_size=4)
    q = CacoEngine(cfg, params, buffer_seconds=1.0, batch_size=4,
                   quantize_int8=True)
    e1 = ref.embed_audio(wavs)
    e2 = q.embed_audio(wavs)
    cos = (e1 * e2).sum(-1)
    assert cos.min() > 0.995, cos


def test_engine_int8_mesh_rejected():
    from cacophony_tpu.parallel import make_mesh

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError, match="int8"):
        CacoEngine(cfg, params, mesh=make_mesh(dp=2, tp=1),
                   quantize_int8=True)
