"""Unit tests for the attention op: cache-index variants and cross path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu.ops.attention import attention_init, multi_head_attention


@pytest.fixture()
def params():
    return attention_init(jax.random.PRNGKey(0), 16, num_heads=2)


def test_scalar_and_vector_cache_index_agree(params):
    """Lockstep decode (scalar index) == per-sample indices when all samples
    share the same position."""
    b, t, h, dh = 3, 6, 2, 8
    cache = {"k": jnp.zeros((b, t, h, dh)), "v": jnp.zeros((b, t, h, dh))}
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 1, 16))
    bias = jnp.zeros((1, 1, 1, t))

    out_s, cache_s = multi_head_attention(params, x, num_heads=2, bias=bias,
                                          kv_cache=cache,
                                          cache_index=jnp.int32(2))
    out_v, cache_v = multi_head_attention(params, x, num_heads=2, bias=bias,
                                          kv_cache=cache,
                                          cache_index=jnp.full((b,), 2, jnp.int32))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cache_s["k"]), np.asarray(cache_v["k"]),
                               atol=1e-6)


def test_vector_cache_index_writes_per_sample_positions(params):
    b, t, h, dh = 2, 5, 2, 8
    cache = {"k": jnp.zeros((b, t, h, dh)), "v": jnp.zeros((b, t, h, dh))}
    x = jax.random.normal(jax.random.PRNGKey(2), (b, 1, 16))
    idx = jnp.asarray([1, 3], jnp.int32)
    _, new_cache = multi_head_attention(params, x, num_heads=2,
                                        bias=jnp.zeros((1, 1, 1, t)),
                                        kv_cache=cache, cache_index=idx)
    k = np.asarray(new_cache["k"])
    assert np.abs(k[0, 1]).sum() > 0 and np.abs(k[0, 3]).sum() == 0
    assert np.abs(k[1, 3]).sum() > 0 and np.abs(k[1, 1]).sum() == 0


def test_cross_attention_matches_self_on_same_source():
    """Cross attention with memory == x must equal self-attention when the
    cross params are the (q|kv split of the) self params."""
    d, h = 16, 2
    rng = jax.random.PRNGKey(3)
    self_p = attention_init(rng, d, num_heads=h)
    wq, wk, wv = np.split(np.asarray(self_p["qkv"]["w"]), 3, axis=-1)
    bq, bk, bv = np.split(np.asarray(self_p["qkv"]["b"]), 3)
    cross_p = {
        "q": {"w": jnp.asarray(wq), "b": jnp.asarray(bq)},
        "kv": {"w": jnp.asarray(np.concatenate([wk, wv], -1)),
               "b": jnp.asarray(np.concatenate([bk, bv]))},
        "o": self_p["o"],
    }
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 7, d))
    bias = jnp.zeros((1, 1, 1, 7))
    out_self, _ = multi_head_attention(self_p, x, num_heads=h, bias=bias)
    out_cross, _ = multi_head_attention(cross_p, x, num_heads=h, bias=bias,
                                        memory=x)
    np.testing.assert_allclose(np.asarray(out_self), np.asarray(out_cross),
                               atol=1e-5)
