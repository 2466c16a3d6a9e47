"""Unit tests for the attention op: cache-index variants and cross path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu.ops.attention import attention_init, multi_head_attention


@pytest.fixture()
def params():
    return attention_init(jax.random.PRNGKey(0), 16, num_heads=2)


def test_decode_attention_appends_current_token(params):
    """Read-only cache decode: output == full self-attention over
    [cached tokens, current token], and the returned slice is the current
    token's k/v."""
    b, t, d = 2, 4, 16
    rng = jax.random.PRNGKey(1)
    seq = jax.random.normal(rng, (b, t + 1, d))

    # reference: full (causal-last-query) attention over the t+1 tokens
    bias_full = jnp.zeros((1, 1, 1, t + 1))
    out_full, _ = multi_head_attention(params, seq, num_heads=2, bias=bias_full)

    # decode: cache holds tokens 0..t-1's k/v (built by a full pass), query
    # token t arrives with a read-only cache and a strict < t bias
    from cacophony_tpu.models.layers import dense

    qkv = dense(params["qkv"], seq[:, :t])
    _, k_c, v_c = jnp.split(qkv, 3, axis=-1)
    # merged cache layout: (B, T, E) rows (see models/text.py CACHE_LAYOUT)
    cache = {"k": k_c, "v": v_c}
    bias_dec = jnp.zeros((1, 1, 1, t))  # all cached positions valid
    out_dec, kv_slice = multi_head_attention(params, seq[:, t:], num_heads=2,
                                             bias=bias_dec, kv_cache=cache,
                                             cache_index=jnp.int32(t))
    np.testing.assert_allclose(np.asarray(out_dec[:, 0]),
                               np.asarray(out_full[:, t]), atol=1e-5)
    # merged-mode slices come back as (B, 1, E) rows for the row write
    assert kv_slice["k"].shape == (b, 1, d)


def test_vector_cache_index_writes_per_sample_positions():
    """The stacked cache write (models.text._run_text_blocks) lands each
    sample's k/v at ITS OWN position when indices differ per sample."""
    from cacophony_tpu.configs import TextConfig
    from cacophony_tpu.models.text import make_kv_cache, text_encoder_apply, text_encoder_init

    cfg = TextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                     intermediate_size=32, max_position_embeddings=16)
    p = text_encoder_init(jax.random.PRNGKey(0), cfg)
    b, t = 2, 5
    cache = make_kv_cache(cfg, b, t)
    cache["index"] = jnp.asarray([1, 3], jnp.int32)
    ids = jnp.asarray([[7], [9]], jnp.int32)
    _, _, new_cache = text_encoder_apply(
        p, cfg, ids, jnp.ones((b, 1)), position_ids=cache["index"][:, None],
        cache=cache, pool=False)
    k = np.asarray(new_cache["k"])  # (L, B, T, E) merged rows
    assert np.abs(k[0, 0, 1]).sum() > 0 and np.abs(k[0, 0, 3]).sum() == 0
    assert np.abs(k[0, 1, 3]).sum() > 0 and np.abs(k[0, 1, 1]).sum() == 0
    np.testing.assert_array_equal(np.asarray(new_cache["index"]), [2, 4])


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


def test_bidirectional_text_tower_option():
    """TextConfig(causal=False): later tokens influence earlier positions
    (impossible under the reference's causal tower, which is the default)."""
    from cacophony_tpu.configs import TextConfig
    from cacophony_tpu.models.text import text_encoder_apply, text_encoder_init

    base = dict(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                intermediate_size=32, max_position_embeddings=16)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    ids2 = ids.at[0, 3].set(9)  # change only the LAST token
    mask = jnp.ones((1, 4))

    for causal in (True, False):
        cfg = TextConfig(causal=causal, **base)
        p = text_encoder_init(jax.random.PRNGKey(0), cfg)
        _, h1, _ = text_encoder_apply(p, cfg, ids, mask)
        _, h2, _ = text_encoder_apply(p, cfg, ids2, mask)
        first_tok_changed = bool(np.abs(np.asarray(h1[0, 0] - h2[0, 0])).max() > 1e-6)
        assert first_tok_changed == (not causal), (causal, first_tok_changed)


def test_aux_embedding_slice_matches_gather():
    """The slice/broadcast position+token-type lookups (default) are
    bit-identical in fwd to the r2 gather forms, and their grads agree —
    the slice forms exist because the gathers' training VJPs are
    scatter-adds (fully colliding for the all-zero token-type ids)."""
    import cacophony_tpu.models.text as text_mod
    from cacophony_tpu.configs import TextConfig
    from cacophony_tpu.models.text import text_encoder_apply, text_encoder_init

    cfg = TextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                     intermediate_size=32, max_position_embeddings=16)
    p = text_encoder_init(jax.random.PRNGKey(3), cfg)
    ids = jnp.asarray([[5, 6, 7, 8], [9, 1, 1, 1]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], jnp.int32)

    def run(flag):
        old = text_mod._AUX_EMBED_GATHER
        text_mod._AUX_EMBED_GATHER = flag
        try:
            def loss(pp):
                _, h, _ = text_encoder_apply(pp, cfg, ids, mask)
                return (h.astype(jnp.float32) ** 2).mean()
            _, h, _ = text_encoder_apply(p, cfg, ids, mask)
            g = jax.grad(loss)(p)
            return np.asarray(h), g
        finally:
            text_mod._AUX_EMBED_GATHER = old

    h_gather, g_gather = run(True)
    h_slice, g_slice = run(False)
    np.testing.assert_array_equal(h_gather, h_slice)
    for key in ("position", "token_type", "word"):
        np.testing.assert_allclose(
            np.asarray(g_gather["embeddings"][key]),
            np.asarray(g_slice["embeddings"][key]), atol=1e-6, err_msg=key)


def test_custom_vjp_layer_norm_and_act_dense_match_plain_ad():
    """layers.layer_norm / layers.act_dense carry custom VJPs that recompute
    elementwise chains in the backward instead of saving fp32 intermediates
    (r4 train-step HBM-traffic cut).  Their grads must match plain AD of the
    same forward math to fp32 rounding."""
    import cacophony_tpu.models.layers as L

    rng = np.random.RandomState(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randn(4, 37, 64), dtype)
        p = {"scale": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
             "bias": jnp.asarray(rng.randn(64), jnp.float32)}

        def loss_new(p, x):
            return jnp.sum(jnp.sin(L.layer_norm(p, x, 1e-6)).astype(jnp.float32))

        def loss_plain(p, x):
            return jnp.sum(jnp.sin(
                L._ln_fwd_math(x, p["scale"], p["bias"], 1e-6)[0]
            ).astype(jnp.float32))

        gn = jax.grad(loss_new, argnums=(0, 1))(p, x)
        gp = jax.grad(loss_plain, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(gn),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-6, atol=2e-6)

        w = {"w": jnp.asarray(rng.randn(64, 32) * 0.1, jnp.float32),
             "b": jnp.asarray(rng.randn(32) * 0.1, jnp.float32)}
        h = jnp.asarray(rng.randn(4, 37, 64), dtype)
        for act in (jax.nn.silu, L.gelu_exact):
            def f_new(w, h):
                return jnp.sum(L.act_dense(w, h, act, dtype).astype(jnp.float32))

            def f_plain(w, h):
                return jnp.sum(L.dense(w, act(h), dtype).astype(jnp.float32))

            gn = jax.grad(f_new, argnums=(0, 1))(w, h)
            gp = jax.grad(f_plain, argnums=(0, 1))(w, h)
            for a, b in zip(jax.tree_util.tree_leaves(gn),
                            jax.tree_util.tree_leaves(gp)):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=2e-6, atol=2e-6)


def test_cache_layout_orders_decode_identically():
    """Merged (L,B,T,E) caches + cross-KV (the r5 dense-lane layout, with
    block-diagonal-q matmuls) must produce the same decoded tokens as the
    legacy (L,B,T,H,Dh) per-head-einsum order — consumers infer the layout
    from leaf shapes at trace time, and the bf16 products are identical."""
    import dataclasses

    import cacophony_tpu.models.text as text_mod
    from cacophony_tpu.configs import caco_tiny
    from cacophony_tpu.models.caco import caco_init, decode
    from cacophony_tpu.frontend.patchify import wav_to_patches
    from cacophony_tpu.configs import FrontendConfig, PatchConfig

    cfg = caco_tiny()
    front, patch = FrontendConfig(), PatchConfig(patches_seq_len=32)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    bufs = jnp.asarray(rng.randn(2, 16_000).astype(np.float32) * 0.1)
    lens = jnp.full((2,), 16_000, jnp.int32)
    batch = jax.vmap(lambda b, n: wav_to_patches(b, n, front, patch))(bufs, lens)

    def run(layout):
        old = text_mod.CACHE_LAYOUT
        text_mod.CACHE_LAYOUT = layout
        try:
            # fresh jit per flag value (trace-time flag)
            fn = jax.jit(lambda p, b: decode(
                p, cfg, b, max_length=8, temperature=0.01,
                bos_id=0, eos_id=2, pad_id=1, rng=jax.random.PRNGKey(7)))
            return np.asarray(fn(params, batch))
        finally:
            text_mod.CACHE_LAYOUT = old

    np.testing.assert_array_equal(run("merged"), run("legacy"))
