"""Training steps + mesh sharding on the 8-virtual-device CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cacophony_tpu import configs
from cacophony_tpu.models.audio import audiomae_init
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.parallel import make_mesh, param_specs, shard_batch, shard_params
from cacophony_tpu.train import (
    TrainConfig,
    make_caco_train_step,
    make_mae_train_step,
    mae_random_masking,
)
from cacophony_tpu.train.train import init_train_state


def _tiny_batch(b=8, s=16, t=8, vocab=128):
    rng = np.random.RandomState(0)
    return {
        "audio_patches": jnp.asarray(rng.randn(b, s, 256), jnp.float32),
        "audio_time_inds": jnp.tile(jnp.arange(s) // 8, (b, 1)),
        "audio_freq_inds": jnp.tile(jnp.arange(s) % 8, (b, 1)),
        "audio_mask": jnp.ones((b, s), jnp.int32),
        "text_input_ids": jnp.asarray(rng.randint(0, vocab, (b, t)), jnp.int32),
        "text_mask": jnp.ones((b, t), jnp.int32),
    }


def test_param_specs_tp_rules():
    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params)
    assert specs["audio"]["blocks"]["attn"]["qkv"]["w"] == P(None, None, "tp")
    assert specs["audio"]["blocks"]["attn"]["o"]["w"] == P(None, "tp", None)
    assert specs["text"]["blocks"]["mlp_in"]["w"] == P(None, None, "tp")
    assert specs["decoder"]["vocab_proj"]["w"] == P(None, "tp")
    assert specs["logit_scale"] == P()
    assert specs["text"]["embeddings"]["word"] == P()


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_caco_train_step_on_mesh(dp, tp):
    assert jax.device_count() >= dp * tp, "conftest must force 8 CPU devices"
    mesh = make_mesh(dp=dp, tp=tp)
    cfg = configs.caco_tiny()
    tc = TrainConfig(warmup_steps=2, total_steps=10)

    with mesh:
        params = shard_params(caco_init(jax.random.PRNGKey(0), cfg), mesh)
        state = init_train_state(params, tc)
        batch = shard_batch(_tiny_batch(), mesh)
        step = make_caco_train_step(cfg, tc)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))

    assert int(state.step) == 2
    for k in ["loss", "contrastive", "caption", "grad_norm"]:
        assert np.isfinite(float(metrics[k])), k


def test_mae_train_step_on_mesh():
    mesh = make_mesh(dp=4, tp=2)
    enc = configs.AudioEncoderConfig(hidden_size=32, num_layers=2, num_heads=2,
                                     intermediate_size=64, num_freq_patches=8)
    dec = configs.AudioDecoderConfig(hidden_size=32, num_layers=2, num_heads=2,
                                     intermediate_size=64, num_freq_patches=8)
    cfg = configs.AudioMAEConfig(encoder=enc, decoder=dec, mask_ratio=0.75)
    tc = TrainConfig(warmup_steps=2, total_steps=10)

    with mesh:
        params = shard_params(audiomae_init(jax.random.PRNGKey(0), enc, dec), mesh)
        state = init_train_state(params, tc)
        batch = shard_batch({k: v for k, v in _tiny_batch().items()
                             if k.startswith("audio")}, mesh)
        step = make_mae_train_step(cfg, tc)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_mae_masking_shapes_and_padding():
    batch = _tiny_batch(b=2, s=16)
    batch["audio_mask"] = batch["audio_mask"].at[0, 10:].set(0)
    m = mae_random_masking(jax.random.PRNGKey(0), batch, mask_ratio=0.5)
    assert m["patches"].shape == (2, 8, 256)
    assert m["restore_time_inds"].shape == (2, 8)
    # sample 0 has 6 padding patches; with 8 kept slots, padding must be
    # pushed to the masked (restore) side
    assert int(m["mask"][0].sum()) == 8
    # loss ignores padded restore positions
    assert int(m["loss_mask"][0].sum()) == int(m["restore_mask"][0].sum())


def test_train_loss_decreases():
    """Five steps on one tiny batch should reduce the loss (sanity that
    gradients flow through every component)."""
    cfg = configs.caco_tiny()
    tc = TrainConfig(learning_rate=3e-4, warmup_steps=0, total_steps=100,
                     remat_encoder=False)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tc)
    batch = _tiny_batch(b=4)
    step = make_caco_train_step(cfg, tc)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_caption_hidden_reuse_matches_separate_pass():
    """The train step feeds the caption decoder hidden[:, :-1] from the
    contrastive tower's FULL-sequence pass (train.py).  That is only valid
    because the text encoder is causal: position t never attends t+1, so
    the sliced hiddens must equal an independent encoder pass over
    ids[:, :-1] up to XLA reduction order (different sequence lengths tile
    the matmul contractions differently; measured 3.6e-7 max abs)."""
    from cacophony_tpu.models.text import text_encoder_apply

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(b=4)
    ids, mask = batch["text_input_ids"], batch["text_mask"]
    _, h_full, _ = text_encoder_apply(params["text"], cfg.text, ids, mask,
                                      pool=False)
    _, h_prefix, _ = text_encoder_apply(params["text"], cfg.text,
                                        ids[:, :-1], mask[:, :-1], pool=False)
    np.testing.assert_allclose(np.asarray(h_full[:, :-1]),
                               np.asarray(h_prefix), atol=2e-6, rtol=2e-5)


def test_fused_in_train_matches_unfused():
    """FUSED_IN_TRAIN routes training through the whole-layer Pallas kernel
    (legal only because dropout == drop_path == 0): losses/grad norms must
    match the unfused path to kernel-numerics tolerance.  The flag is OFF by
    default (measured 13% slower on v5e — XLA-remat backward of the fused
    layer loses to the one-shot Pallas fwd+bwd kernels), but it must stay
    correct for re-measurement on future hardware."""
    from cacophony_tpu.models import audio as audio_mod

    cfg = configs.caco_tiny()
    tc = TrainConfig(warmup_steps=1, total_steps=10)
    batch = _tiny_batch(b=4)

    def one_step(fused):
        old = audio_mod.FUSED_IN_TRAIN
        audio_mod.FUSED_IN_TRAIN = fused
        try:
            params = caco_init(jax.random.PRNGKey(0), cfg)
            state = init_train_state(params, tc)
            # fresh closure per variant: jit caches on function identity
            step = make_caco_train_step(cfg, tc)
            state, m = step(state, batch, jax.random.PRNGKey(1))
        finally:
            audio_mod.FUSED_IN_TRAIN = old
        return {k: float(v) for k, v in m.items()}

    base, fused = one_step(False), one_step(True)
    for k in ["loss", "contrastive", "caption", "grad_norm"]:
        np.testing.assert_allclose(fused[k], base[k], rtol=1e-4, err_msg=k)


def test_adam_mu_bf16_state_dtype_and_finite_loss():
    """adam_mu_dtype='bfloat16' must actually cast the first moment (HBM
    traffic halves only if the buffer dtype changes) and keep training
    stable."""
    cfg = configs.caco_tiny()
    tc = TrainConfig(warmup_steps=1, total_steps=10, adam_mu_dtype="bfloat16")
    params = caco_init(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tc)
    mus = [l.dtype for l in jax.tree_util.tree_leaves(state.opt_state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 leaves in opt state — mu_dtype did not plumb"
    step = make_caco_train_step(cfg, tc)
    state, m = step(state, batch=_tiny_batch(b=4), rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_rbg_rng_impl_trains_and_decreases():
    """rng_impl='rbg' (XLA RngBitGenerator for dropout bulk bits) must
    train: same model/loss program, different Bernoulli stream.  Loss must
    decrease, and repeat-runs must be reproducible for a fixed seed — note
    rbg bits are only deterministic WITHIN one JAX/XLA version, backend,
    and sharding (per the JAX docs), which is all this in-process
    repeat-run asserts."""
    cfg = configs.caco_tiny()
    tc = TrainConfig(learning_rate=3e-4, warmup_steps=0, total_steps=100,
                     rng_impl="rbg")
    batch = _tiny_batch(b=4)

    def run():
        state = init_train_state(caco_init(jax.random.PRNGKey(0), cfg), tc)
        step = make_caco_train_step(cfg, tc)
        losses = []
        for i in range(5):
            state, m = step(state, batch, jax.random.PRNGKey(42))
            losses.append(float(m["loss"]))
        return losses

    a, b = run(), run()
    assert a[-1] < a[0], a
    np.testing.assert_allclose(a, b, rtol=0, atol=0)  # seeded-deterministic


def test_rbg_rng_impl_on_mesh():
    """rbg typed keys must survive jit + mesh sharding (GSPMD) — the knob is
    meant for the real multi-chip train step."""
    mesh = make_mesh(dp=4, tp=2)
    cfg = configs.caco_tiny()
    tc = TrainConfig(warmup_steps=2, total_steps=10, rng_impl="rbg")
    with mesh:
        params = shard_params(caco_init(jax.random.PRNGKey(0), cfg), mesh)
        state = init_train_state(params, tc)
        batch = shard_batch(_tiny_batch(), mesh)
        step = make_caco_train_step(cfg, tc)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_gallery_sharded_scoring_matches_unsharded():
    """Retrieval's full-gallery sim matmul (exp(logit_scale)·A@T.T) sharded
    over the dp axis must equal the single-device result — the BASELINE
    north-star 'gallery-sharded contrastive scoring'."""
    from jax.sharding import NamedSharding
    from cacophony_tpu.models.caco import contrastive_logits

    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.RandomState(0)
    a = rng.randn(64, 32).astype(np.float32)
    t = rng.randn(96, 32).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    params = {"logit_scale": jnp.asarray(2.0)}

    expected = np.asarray(contrastive_logits(params, jnp.asarray(a), jnp.asarray(t)))

    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp")))
    t_sh = jax.device_put(jnp.asarray(t), NamedSharding(mesh, P()))
    with mesh:
        got = jax.jit(contrastive_logits)(params, a_sh, t_sh)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_sharded_inference_matches_single_device():
    """dp-sharded batched audio embedding == single-device embedding."""
    from jax.sharding import NamedSharding
    from cacophony_tpu.models.caco import get_audio_embedding

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(b=8)

    def fwd(p, b):
        emb, _ = get_audio_embedding(p, cfg, b["audio_patches"],
                                     b["audio_time_inds"], b["audio_freq_inds"],
                                     b["audio_mask"])
        return emb

    expected = np.asarray(jax.jit(fwd)(params, batch))

    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        p_sh = shard_params(params, mesh)
        b_sh = shard_batch({k: batch[k] for k in
                            ["audio_patches", "audio_time_inds",
                             "audio_freq_inds", "audio_mask"]}, mesh)
        got = np.asarray(jax.jit(fwd)(p_sh, b_sh))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_decode_under_shard_map_with_psum_termination():
    """decode(dp_axis='dp') inside shard_map: the reference-style psum
    cross-device termination (caco.py:166-167) compiles and matches the
    single-device decode."""
    from jax import shard_map
    from jax.sharding import NamedSharding
    from cacophony_tpu.models.caco import decode

    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    b, s = 4, 16
    rng = np.random.RandomState(0)
    batch = {
        "audio_patches": jnp.asarray(rng.randn(b, s, 256), jnp.float32),
        "audio_time_inds": jnp.tile(jnp.arange(s) // 8, (b, 1)),
        "audio_freq_inds": jnp.tile(jnp.arange(s) % 8, (b, 1)),
        "audio_mask": jnp.ones((b, s), jnp.int32),
    }
    kw = dict(max_length=8, temperature=1e-4, bos_id=0, eos_id=2, pad_id=1,
              rng=jax.random.PRNGKey(7))

    expected = np.asarray(decode(params, cfg, batch, **kw))

    mesh = make_mesh(dp=2, tp=1)
    fn = shard_map(
        lambda p, bt: decode(p, cfg, bt, dp_axis="dp", **kw),
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P("dp"),
    )
    got = np.asarray(jax.jit(fn)(params, batch))
    np.testing.assert_array_equal(got, expected)


def test_dropout_recompute_grads_match_saved_mask_path():
    """DROPOUT_RECOMPUTE regenerates keep masks from the PRNG key in the
    backward (jax.checkpoint) instead of saving them.  Same key ⇒ same
    bits ⇒ the loss AND every gradient leaf must match the save-mask path
    exactly (it is a pure rematerialization, not an approximation)."""
    import cacophony_tpu.models.layers as layers_mod
    from cacophony_tpu.train.train import make_caco_train_step

    cfg = configs.caco_tiny()
    # make dropout actually fire
    cfg = configs.dataclasses.replace(
        cfg,
        audio=configs.dataclasses.replace(
            cfg.audio, dropout_rate=0.1, drop_path_rate=0.1),
        text=configs.dataclasses.replace(cfg.text, hidden_dropout=0.1,
                                         attention_dropout=0.1),
    )
    tc = TrainConfig(learning_rate=1e-4, warmup_steps=0, total_steps=10)
    batch = _tiny_batch(b=4)

    def grads_with(flag):
        old = layers_mod.DROPOUT_RECOMPUTE
        layers_mod.DROPOUT_RECOMPUTE = flag
        jax.clear_caches()
        try:
            params = caco_init(jax.random.PRNGKey(0), cfg)
            state = init_train_state(params, tc)
            step = make_caco_train_step(cfg, tc)
            state, m = step(state, batch, jax.random.PRNGKey(7))
            return float(m["loss"]), float(m["grad_norm"])
        finally:
            layers_mod.DROPOUT_RECOMPUTE = old
            jax.clear_caches()

    loss_on, gn_on = grads_with(True)
    loss_off, gn_off = grads_with(False)
    assert np.isfinite(loss_on)
    np.testing.assert_allclose(loss_on, loss_off, rtol=1e-6)
    np.testing.assert_allclose(gn_on, gn_off, rtol=1e-5)
