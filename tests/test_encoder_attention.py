"""Bespoke encoder attention kernel == einsum attention path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu.ops.attention import attention_init, multi_head_attention
from cacophony_tpu.ops.encoder_attention import encoder_attention


def test_kernel_matches_einsum_path():
    d, h, b, s = 48, 4, 3, 40
    rng = jax.random.PRNGKey(0)
    p = attention_init(rng, d, num_heads=h)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    mask = jnp.ones((b, s), jnp.int32)
    mask = mask.at[1, 25:].set(0)  # one padded row
    mask = mask.at[2, 5:].set(0)

    from cacophony_tpu.models.layers import mask_to_bias

    bias = mask_to_bias(mask)[:, None, None, :]
    ref, _ = multi_head_attention(p, x, num_heads=h, bias=bias)
    got, _ = multi_head_attention(p, x, num_heads=h, flash_mask=mask)
    # padded queries' outputs are garbage either way; compare valid rows
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=2e-5)


def test_kernel_bf16_close_to_fp32():
    d, h, b, s = 64, 2, 2, 24
    p = attention_init(jax.random.PRNGKey(2), d, num_heads=h)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, s, d))
    mask = jnp.ones((b, s), jnp.int32)
    ref, _ = multi_head_attention(p, x, num_heads=h,
                                  bias=jnp.zeros((1, 1, 1, s)))
    got, _ = multi_head_attention(p, x, num_heads=h, flash_mask=mask,
                                  dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)


def test_kernel_direct_call_shapes():
    b, s, h, dh = 2, 16, 2, 8
    qkv = jax.random.normal(jax.random.PRNGKey(4), (b, s, 3 * h * dh))
    mask = jnp.ones((b, s), jnp.int32)
    out = encoder_attention(qkv, mask, h, True)
    assert out.shape == (b, s, h * dh)
    assert np.isfinite(np.asarray(out)).all()


def test_training_dropout_falls_back_with_mask():
    """flash_mask + dropout declines the kernel but must still mask keys."""
    d, h, b, s = 32, 2, 2, 10
    p = attention_init(jax.random.PRNGKey(5), d, num_heads=h)
    x = jax.random.normal(jax.random.PRNGKey(6), (b, s, d))
    mask = jnp.ones((b, s), jnp.int32).at[0, 5:].set(0)

    from cacophony_tpu.models.layers import mask_to_bias

    bias = mask_to_bias(mask)[:, None, None, :]
    ref, _ = multi_head_attention(p, x, num_heads=h, bias=bias)
    # dropout_rate > 0 with a None rng means deterministic weights — the
    # fallback path must reproduce the masked result exactly
    got, _ = multi_head_attention(p, x, num_heads=h, flash_mask=mask,
                                  dropout_rate=0.1, dropout_rng=None)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=2e-5)
