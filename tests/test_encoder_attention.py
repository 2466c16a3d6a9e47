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


def test_q_blocked_matches_one_shot():
    """blocked kernel (separate Q / K|V, q-block streaming) == one-shot."""
    from cacophony_tpu.ops.encoder_attention import encoder_attention_blocked

    d, h, b, s = 32, 2, 2, 256
    qkv = jax.random.normal(jax.random.PRNGKey(7), (b, s, 3 * d))
    mask = jnp.ones((b, s), jnp.int32).at[0, 200:].set(0)
    one_shot = encoder_attention(qkv, mask, h, True)

    from cacophony_tpu.ops import encoder_attention as ea

    old = ea.VMEM_BUDGET_BYTES
    try:
        ea.VMEM_BUDGET_BYTES = 500_000  # force a blocked plan for s=256
        plan = ea.kernel_plan(s, d, qkv.dtype)
        assert plan is not None and plan[0] == "blocked", plan
        q, kv = qkv[:, :, :d], qkv[:, :, d:]
        blocked = encoder_attention_blocked(q, kv, mask, h, True)
    finally:
        ea.VMEM_BUDGET_BYTES = old
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(blocked)[m], np.asarray(one_shot)[m],
                               atol=2e-6)


def test_kernel_plan_budgets():
    from cacophony_tpu.ops.encoder_attention import kernel_plan

    # 10 s budget: one-shot in both dtypes
    assert kernel_plan(500, 768, jnp.bfloat16) == ("one_shot", 500, 500)
    assert kernel_plan(500, 768, jnp.float32) == ("one_shot", 500, 500)
    # 30 s budget: padded+q-blocked at bf16 (q-blocks must be 8-divisible
    # and nothing 8-divisible divides 1500); fp32 K|V rows bust the budget
    assert kernel_plan(1500, 768, jnp.bfloat16) == ("blocked", 1536, 256)
    assert kernel_plan(1500, 768, jnp.float32) is None


def test_blocked_grad_matches_reference():
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 32, 2, 1, 512
    qkv = jax.random.normal(jax.random.PRNGKey(11), (b, s, 3 * d))
    mask = jnp.ones((b, s), jnp.int32)
    q, kv = qkv[:, :, :d], qkv[:, :, d:]

    old = ea.VMEM_BUDGET_BYTES
    try:
        ea.VMEM_BUDGET_BYTES = 1_000_000  # force blocked
        assert ea.kernel_plan(s, d, qkv.dtype)[0] == "blocked"
        gq = jax.grad(lambda x: ea.encoder_attention_blocked(
            x, kv, mask, h, True).sum())(q)
    finally:
        ea.VMEM_BUDGET_BYTES = old
    gq_ref = jax.grad(lambda x: ea._xla_attention_split(
        x, kv, mask, h).sum())(q)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref), atol=1e-5)


def test_padded_seq_matches_einsum():
    """A seq that forces pad+q-block (no 8-divisible divisor) matches the
    einsum reference on valid rows."""
    from cacophony_tpu.ops import encoder_attention as ea
    from cacophony_tpu.models.layers import mask_to_bias

    d, h, b, s = 32, 2, 2, 636  # 636: no 8-divisible divisor → pads to 640
    p = attention_init(jax.random.PRNGKey(9), d, num_heads=h)
    x = jax.random.normal(jax.random.PRNGKey(10), (b, s, d))
    mask = jnp.ones((b, s), jnp.int32).at[1, 400:].set(0)

    bias = mask_to_bias(mask)[:, None, None, :]
    ref, _ = multi_head_attention(p, x, num_heads=h, bias=bias)

    old = ea.VMEM_BUDGET_BYTES
    try:
        # 1.1 MB: one-shot logits (636²·4 ≈ 1.6 MB) don't fit; qb=128 over
        # the 640-padded seq does
        ea.VMEM_BUDGET_BYTES = 1_100_000
        plan = ea.kernel_plan(s, d, x.dtype)
        assert plan == ("blocked", 640, 128), plan
        got, _ = multi_head_attention(p, x, num_heads=h, flash_mask=mask)
    finally:
        ea.VMEM_BUDGET_BYTES = old
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=2e-5)


def test_grad_flows_through_kernel():
    """custom_vjp backward (XLA remat) produces finite grads matching the
    reference attention's grads."""
    from cacophony_tpu.ops.encoder_attention import _xla_attention

    d, h, b, s = 32, 2, 2, 16
    qkv = jax.random.normal(jax.random.PRNGKey(8), (b, s, 3 * d))
    mask = jnp.ones((b, s), jnp.int32)

    g_kernel = jax.grad(lambda x: encoder_attention(x, mask, h, True).sum())(qkv)
    g_ref = jax.grad(lambda x: _xla_attention(x, mask, h).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=1e-5)


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


def test_backward_kernel_matches_xla_grads():
    """Pallas backward (recomputed P, five MXU matmuls per head) == XLA
    autodiff grads of the same math, including masked keys."""
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 48, 4, 2, 40
    qkv = jax.random.normal(jax.random.PRNGKey(12), (b, s, 3 * d))
    mask = jnp.ones((b, s), jnp.int32).at[1, 25:].set(0)
    g = jax.random.normal(jax.random.PRNGKey(13), (b, s, d))

    assert ea.bwd_fits_vmem(s, d, qkv.dtype)
    got = ea._pallas_backward(qkv, mask, g, h, True)
    _, vjp = jax.vjp(lambda x: ea._xla_attention(x, mask, h), qkv)
    (ref,) = vjp(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_grad_through_custom_vjp_uses_kernel_path():
    """jax.grad through encoder_attention routes the fitting case through
    the backward kernel and still matches reference grads."""
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 32, 2, 2, 24
    qkv = jax.random.normal(jax.random.PRNGKey(14), (b, s, 3 * d))
    mask = jnp.ones((b, s), jnp.int32)
    g1 = jax.grad(lambda x: encoder_attention(x, mask, h, True).sum())(qkv)
    g2 = jax.grad(lambda x: ea._xla_attention(x, mask, h).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)

    # over-budget seqs fall back to XLA remat (no crash)
    assert not ea.bwd_fits_vmem(3000, 768, jnp.float32)


def test_fused_ln_attention_grads_and_parity():
    """Fused LN+QKV+attention: matches the unfused composition and is
    differentiable (XLA-remat vjp) — review-fix regression guard."""
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 32, 2, 2, 24
    rng = jax.random.PRNGKey(20)
    x = jax.random.normal(rng, (b, s, d))
    mask = jnp.ones((b, s), jnp.int32).at[1, 15:].set(0)
    ln_p = {"scale": jnp.ones((d,)) * 1.1, "bias": jnp.ones((d,)) * 0.1}
    qkv_p = {"w": jax.random.normal(jax.random.PRNGKey(21), (d, 3 * d)) * 0.1,
             "b": jnp.zeros((3 * d,))}

    fused = ea.fused_ln_attention(ln_p, qkv_p, x, mask, h, 1e-6, True)
    ref = ea._xla_ln_attention(ln_p, qkv_p, x, mask, h, 1e-6)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(fused)[m], np.asarray(ref)[m],
                               atol=2e-5)

    gx = jax.grad(lambda xx: ea.fused_ln_attention(
        ln_p, qkv_p, xx, mask, h, 1e-6, True).sum())(x)
    gx_ref = jax.grad(lambda xx: ea._xla_ln_attention(
        ln_p, qkv_p, xx, mask, h, 1e-6).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=2e-5)

    # grad through the full inference-mode encoder path (det + flash) works
    from cacophony_tpu.configs import AudioEncoderConfig
    from cacophony_tpu.models.audio import audio_encoder_apply, audio_encoder_init

    cfg = AudioEncoderConfig(hidden_size=32, num_layers=1, num_heads=2,
                             intermediate_size=64, patch_size=256,
                             num_freq_patches=8)
    p = audio_encoder_init(jax.random.PRNGKey(22), cfg)
    patches = jax.random.normal(jax.random.PRNGKey(23), (1, 8, 256))
    inds = jnp.zeros((1, 8), jnp.int32)
    am = jnp.ones((1, 8), jnp.int32)
    g = jax.grad(lambda pp: audio_encoder_apply(
        p, cfg, pp, inds, inds, am).sum())(patches)
    assert np.isfinite(np.asarray(g)).all()


def test_preferred_seq_len_rounds_blocked_budgets():
    import jax.numpy as jnp
    from cacophony_tpu.ops import encoder_attention as ea

    # one-shot budget: unchanged
    assert ea.preferred_seq_len(500, 768, jnp.bfloat16) == 500
    # 30-s budget: rounded to the blocked plan's padded length
    plan = ea.kernel_plan(1500, 768, jnp.bfloat16)
    assert plan is not None and plan[0] == "blocked"
    got = ea.preferred_seq_len(1500, 768, jnp.bfloat16)
    assert got == plan[1] and got % plan[2] == 0 and got >= 1500
    # rounded budget is a fixed point
    assert ea.preferred_seq_len(got, 768, jnp.bfloat16) == got


@pytest.mark.parametrize("mode", ["max", "clamp", "nomax"])
def test_softmax_modes_match_at_normal_scale(mode):
    """All three softmax numerics modes agree for in-range logits."""
    from cacophony_tpu.ops import encoder_attention as ea

    b, s, h, dh = 2, 24, 2, 8
    qkv = jax.random.normal(jax.random.PRNGKey(11), (b, s, 3 * h * dh))
    mask = jnp.ones((b, s), jnp.int32).at[1, 16:].set(0)
    old = ea.SOFTMAX_MODE
    try:
        ea.SOFTMAX_MODE = "max"
        ref = encoder_attention(qkv, mask, h, True)
        ea.SOFTMAX_MODE = mode
        got = encoder_attention(qkv, mask, h, True)
    finally:
        ea.SOFTMAX_MODE = old
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=2e-6)


def test_clamp_mode_finite_at_extreme_logits():
    """clamp (the default) must stay finite even when logits exceed the
    fp32 exp-overflow point; nomax is the documented-unsafe contrast."""
    from cacophony_tpu.ops import encoder_attention as ea

    b, s, h, dh = 1, 16, 1, 8
    # q·k/√dh ≈ 8·30·30/√8 >> 88: exp overflows without clamp/max
    qkv = jnp.full((b, s, 3 * h * dh), 30.0)
    mask = jnp.ones((b, s), jnp.int32)
    old = ea.SOFTMAX_MODE
    try:
        ea.SOFTMAX_MODE = "clamp"
        out_clamp = np.asarray(encoder_attention(qkv, mask, h, True))
        ea.SOFTMAX_MODE = "max"
        out_max = np.asarray(encoder_attention(qkv, mask, h, True))
    finally:
        ea.SOFTMAX_MODE = old
    assert np.isfinite(out_clamp).all()
    # saturated-but-uniform logits: clamp degrades to the same uniform
    # weighting exact softmax produces, so outputs still agree here
    np.testing.assert_allclose(out_clamp, out_max, atol=1e-5)


def _block_reference(p, x, mask, h, eps):
    """Unfused composition the whole-block kernel must reproduce."""
    from cacophony_tpu.models.layers import layer_norm, mask_to_bias

    bias = mask_to_bias(mask)[:, None, None, :]
    ln1 = layer_norm(p["ln1"], x, eps)
    attn, _ = multi_head_attention(p["attn"], ln1, num_heads=h, bias=bias,
                                   dtype=x.dtype)
    y = x + attn
    return y, layer_norm(p["ln2"], y, eps)


def test_fused_block_one_shot_matches_reference():
    """LN1+QKV+attention+o-proj+residual+LN2 in one kernel == composition."""
    from cacophony_tpu.models.audio import _block_init
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 64, 4, 2, 48
    p = _block_init(jax.random.PRNGKey(0), d, 4 * d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d)) * 0.5
    mask = jnp.ones((b, s), jnp.int32).at[1, 40:].set(0)

    assert ea.kernel_plan(s, d, x.dtype)[0] == "one_shot"
    res = ea.try_fused_block_attention(p, x, mask, h, 1e-6, jnp.float32)
    assert res is not None
    y, ln2y = res
    y_ref, ln2_ref = _block_reference(p, x, mask, h, 1e-6)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(y)[m], np.asarray(y_ref)[m],
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(ln2y)[m], np.asarray(ln2_ref)[m],
                               atol=3e-5)


def test_fused_block_blocked_matches_reference():
    """Blocked (scratch-QKV) whole-block kernel == composition, incl. the
    pad-to-q-block path (s=200 → s_pad 256 with q-block 128)."""
    from cacophony_tpu.models.audio import _block_init
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 32, 2, 2, 200
    p = _block_init(jax.random.PRNGKey(2), d, 4 * d)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, s, d)) * 0.5
    mask = jnp.ones((b, s), jnp.int32).at[0, 150:].set(0)

    old_budget, old_qb = ea.VMEM_BUDGET_BYTES, ea.FUSED_BLOCKED_Q_BLOCK
    try:
        ea.VMEM_BUDGET_BYTES = 500_000  # force a blocked plan at s=200
        ea.FUSED_BLOCKED_Q_BLOCK = 128
        assert ea.kernel_plan(s, d, x.dtype)[0] == "blocked"
        res = ea.try_fused_block_attention(p, x, mask, h, 1e-6, jnp.float32)
    finally:
        ea.VMEM_BUDGET_BYTES, ea.FUSED_BLOCKED_Q_BLOCK = old_budget, old_qb
    assert res is not None
    y, ln2y = res
    assert y.shape == (b, s, d) and ln2y.shape == (b, s, d)
    y_ref, ln2_ref = _block_reference(p, x, mask, h, 1e-6)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(y)[m], np.asarray(y_ref)[m],
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(ln2y)[m], np.asarray(ln2_ref)[m],
                               atol=3e-5)


def _layer_reference(p, x, mask, h, eps):
    """Unfused full-layer composition the whole-layer kernel reproduces."""
    from cacophony_tpu.models.layers import dense

    y, ln2 = _block_reference(p, x, mask, h, eps)
    m = dense(p["mlp"]["w1"], ln2)
    m = jax.nn.silu(m)
    m = dense(p["mlp"]["w2"], m)
    return y + m


def test_fused_layer_one_shot_matches_reference():
    """Whole encoder layer (attn half + MLP) in one kernel == composition."""
    from cacophony_tpu.models.audio import _block_init
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 64, 4, 2, 48
    p = _block_init(jax.random.PRNGKey(4), d, 4 * d)
    x = jax.random.normal(jax.random.PRNGKey(5), (b, s, d)) * 0.5
    mask = jnp.ones((b, s), jnp.int32).at[1, 40:].set(0)

    out = ea.try_fused_layer(p, x, mask, h, 1e-6, jnp.float32)
    assert out is not None
    ref = _layer_reference(p, x, mask, h, 1e-6)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=5e-5)


def test_fused_layer_blocked_matches_reference():
    from cacophony_tpu.models.audio import _block_init
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 32, 2, 2, 200
    p = _block_init(jax.random.PRNGKey(6), d, 4 * d)
    x = jax.random.normal(jax.random.PRNGKey(7), (b, s, d)) * 0.5
    mask = jnp.ones((b, s), jnp.int32).at[0, 150:].set(0)

    old_budget, old_qb = ea.VMEM_BUDGET_BYTES, ea.FUSED_BLOCKED_Q_BLOCK
    try:
        ea.VMEM_BUDGET_BYTES = 500_000  # force a blocked plan at s=200
        ea.FUSED_BLOCKED_Q_BLOCK = 128
        assert ea.kernel_plan(s, d, x.dtype)[0] == "blocked"
        # blocked+MLP is perf-rejected in dispatch (allow_blocked default
        # False) but the kernel math stays pinned here
        out = ea.try_fused_layer(p, x, mask, h, 1e-6, jnp.float32,
                                 allow_blocked=True)
    finally:
        ea.VMEM_BUDGET_BYTES, ea.FUSED_BLOCKED_Q_BLOCK = old_budget, old_qb
    assert out is not None and out.shape == (b, s, d)
    ref = _layer_reference(p, x, mask, h, 1e-6)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=5e-5)


def test_fused_layer_gradients_match_xla():
    """custom_vjp backward (XLA remat) == direct autodiff of the math."""
    from cacophony_tpu.models.audio import _block_init
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 32, 2, 1, 24
    p = _block_init(jax.random.PRNGKey(8), d, 4 * d)
    x = jax.random.normal(jax.random.PRNGKey(9), (b, s, d)) * 0.5
    mask = jnp.ones((b, s), jnp.int32)

    def loss_kernel(pp, xx):
        return jnp.sum(ea.try_fused_layer(pp, xx, mask, h, 1e-6,
                                          jnp.float32) ** 2)

    def loss_ref(pp, xx):
        return jnp.sum(_layer_reference(pp, xx, mask, h, 1e-6) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(p, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    for a, b_ in zip(jax.tree_util.tree_leaves(gk),
                     jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=2e-3)


def test_defer_norm_fully_masked_chunk_no_nan():
    """A batch row whose mask is entirely zero except a sentinel (the
    embed_audio_long tail-chunk shape) must produce finite outputs under
    the deferred clamp normalization — regression for the 0·inf = NaN
    from fusing 2^k/rowsum against the fully-masked rowsum floor."""
    from cacophony_tpu.models.audio import _block_init
    from cacophony_tpu.ops import encoder_attention as ea

    d, h, b, s = 64, 4, 2, 48
    p = _block_init(jax.random.PRNGKey(10), d, 4 * d)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, s, d)) * 0.5
    mask = jnp.ones((b, s), jnp.int32).at[1, 1:].set(0)  # row 1: 1 valid key

    assert ea.ONE_SHOT_DEFER_NORM and ea.SOFTMAX_MODE == "clamp"
    res = ea.try_fused_block_attention(p, x, mask, h, 1e-6, jnp.float32)
    assert res is not None
    y, ln2y = res
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(ln2y)).all()

    out = ea.try_fused_layer(p, x, mask, h, 1e-6, jnp.float32)
    assert out is not None and np.isfinite(np.asarray(out)).all()


def test_head_pipeline_variant_bit_identical():
    """HEAD_PIPELINE reorders head matmul issue only — outputs must be
    bit-identical to the in-order loop (one-shot AND blocked forms)."""
    from cacophony_tpu.ops import encoder_attention as ea
    from cacophony_tpu.ops.encoder_attention import encoder_attention_blocked

    d, h, b, s = 32, 4, 2, 256
    qkv = jax.random.normal(jax.random.PRNGKey(11), (b, s, 3 * d))
    mask = jnp.ones((b, s), jnp.int32).at[1, 200:].set(0)
    q, kv = qkv[:, :, :d], qkv[:, :, d:]

    old_budget, old_pipe = ea.VMEM_BUDGET_BYTES, ea.HEAD_PIPELINE
    try:
        ea.HEAD_PIPELINE = False
        base_one = np.asarray(encoder_attention(qkv, mask, h, True))
        ea.VMEM_BUDGET_BYTES = 500_000  # force a blocked plan for s=256
        base_blk = np.asarray(encoder_attention_blocked(q, kv, mask, h, True))
        ea.VMEM_BUDGET_BYTES = old_budget

        ea.HEAD_PIPELINE = True
        jax.clear_caches()  # flag is read at trace time
        pipe_one = np.asarray(encoder_attention(qkv, mask, h, True))
        ea.VMEM_BUDGET_BYTES = 500_000
        pipe_blk = np.asarray(encoder_attention_blocked(q, kv, mask, h, True))
    finally:
        ea.VMEM_BUDGET_BYTES, ea.HEAD_PIPELINE = old_budget, old_pipe
        jax.clear_caches()

    np.testing.assert_array_equal(pipe_one, base_one)
    np.testing.assert_array_equal(pipe_blk, base_blk)
