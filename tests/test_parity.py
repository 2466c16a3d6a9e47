"""Numerical parity vs the reference implementation.

Strategy: instantiate the reference Flax modules (loaded read-only from
/root/reference, shimmed for the modern flax in tests/ref_loader.py) with
RANDOM weights, push those weights through our checkpoint converter, and
assert our functional model reproduces the reference outputs to fp32
tolerance.  This pins the exact semantics of the released checkpoints —
including the documented quirks (norm(x+eps) normalization, causal text
tower, decoder-over-text-hidden-states) — without any checkpoint files.

Everything is wrapped in jax.jit: besides speed, the reference's EAGER
execution on this CPU stack hits a low-precision kernel path that diverges
from its own jitted output by ~4e-3, so jit is the canonical semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu import configs
from cacophony_tpu.checkpoints.convert import (
    convert_audio_encoder,
    convert_audiomae_params,
    convert_caco_params,
    convert_caption_decoder,
    convert_text_encoder,
)
from cacophony_tpu.models.audio import audio_encoder_apply, audiomae_apply
from cacophony_tpu.models.caco import (
    caption_logits,
    decode,
    get_audio_embedding,
    get_text_embedding,
)
from cacophony_tpu.models.text import caption_decoder_apply, text_encoder_apply

from tests.ref_loader import load_reference

MAE, ROB, CACO = load_reference()

B, S_AUDIO, S_TEXT, VOCAB = 2, 24, 10, 128
HIDDEN, LAYERS, HEADS, INTER = 32, 3, 2, 64

ATOL, RTOL = 5e-5, 1e-4


def _close(a, b, atol=ATOL):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=RTOL)


def _ref_audio_cfg():
    return MAE.AudioTransformerConfig(
        hidden_size=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, patch_size=256, max_time_ind=1000,
        num_freq_patches=8, dropout_rate=0.0, drop_path_rate=0.0,
        dtype=jnp.float32,
    )


def _my_audio_cfg():
    return configs.AudioEncoderConfig(
        hidden_size=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, patch_size=256, num_freq_patches=8,
    )


def _ref_text_cfg(layers=LAYERS):
    return ROB.RobertaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=layers,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64,
    )


def _my_text_cfg(layers=LAYERS, cross=False):
    return configs.TextConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=layers,
        num_heads=HEADS, intermediate_size=INTER, max_position_embeddings=64,
        cross_attention=cross,
    )


@pytest.fixture(scope="module")
def audio_inputs():
    rng = jax.random.PRNGKey(7)
    patches = jax.random.normal(rng, (B, S_AUDIO, 256))
    time_inds = jnp.tile(jnp.arange(S_AUDIO) // 8, (B, 1))
    freq_inds = jnp.tile(jnp.arange(S_AUDIO) % 8, (B, 1))
    mask = jnp.ones((B, S_AUDIO), jnp.int32).at[1, 16:].set(0)
    return patches, time_inds, freq_inds, mask


@pytest.fixture(scope="module")
def text_inputs():
    rng = jax.random.PRNGKey(8)
    ids = jax.random.randint(rng, (B, S_TEXT), 0, VOCAB)
    mask = jnp.ones((B, S_TEXT), jnp.int32).at[0, 6:].set(0)
    return ids, mask


def test_audio_encoder_parity(audio_inputs):
    patches, ti, fi, mask = audio_inputs
    ref_model = MAE.AudioEncoder(_ref_audio_cfg())
    ref_params = jax.jit(lambda: ref_model.init(
        {"params": jax.random.PRNGKey(0)}, patches, ti, fi, mask, deterministic=True
    )["params"])()
    ref_out = jax.jit(lambda p: ref_model.apply(
        {"params": p}, patches, ti, fi, mask, deterministic=True))(ref_params)

    mine = convert_audio_encoder(ref_params)
    out = jax.jit(lambda p: audio_encoder_apply(
        p, _my_audio_cfg(), patches, ti, fi, mask))(mine)
    _close(out, ref_out)


def test_text_encoder_parity(text_inputs):
    ids, mask = text_inputs
    ref_model = ROB.RobertaModel(_ref_text_cfg())
    ref_params = jax.jit(lambda: ref_model.init(
        {"params": jax.random.PRNGKey(1)}, ids, mask, is_train=False)["params"])()
    ref_pooled, ref_hidden = jax.jit(lambda p: ref_model.apply(
        {"params": p}, ids, mask, is_train=False))(ref_params)

    mine = convert_text_encoder(ref_params)
    pooled, hidden, _ = jax.jit(lambda p: text_encoder_apply(
        p, _my_text_cfg(), ids, mask))(mine)
    _close(hidden, ref_hidden)
    _close(pooled, ref_pooled)


def test_caption_decoder_parity(text_inputs):
    ids, mask = text_inputs
    rng = jax.random.PRNGKey(2)
    text_hidden = jax.random.normal(rng, (B, S_TEXT, HIDDEN))
    audio_hidden = jax.random.normal(jax.random.fold_in(rng, 1), (B, S_AUDIO, HIDDEN))
    audio_mask = jnp.ones((B, S_AUDIO), jnp.int32).at[0, 20:].set(0)

    ref_model = ROB.RobertaDecoder(_ref_text_cfg())
    ref_params = jax.jit(lambda: ref_model.init(
        {"params": rng}, text_hidden, mask, audio_hidden, audio_mask,
        is_train=False)["params"])()
    ref_logits = jax.jit(lambda p: ref_model.apply(
        {"params": p}, text_hidden, mask, audio_hidden, audio_mask,
        is_train=False))(ref_params)

    mine = convert_caption_decoder(ref_params)
    logits, _ = jax.jit(lambda p: caption_decoder_apply(
        p, _my_text_cfg(cross=True), text_hidden, mask, audio_hidden,
        audio_mask))(mine)
    _close(logits, ref_logits)


def _build_ref_caco(use_decoder=True):
    caco_cfg = CACO.CACOConfig(
        dtype=jnp.float32, logit_scale_init_value=2.0,
        num_attention_pool_heads=HEADS, use_decoder=use_decoder,
        projection_size=HIDDEN,
    )
    return CACO.CACO(
        caco_config=caco_cfg,
        audio_module=MAE.AudioEncoder(_ref_audio_cfg()),
        text_module=ROB.RobertaModel(_ref_text_cfg()),
        decoder_module=ROB.RobertaDecoder(_ref_text_cfg(layers=2)),
    )


def _my_caco_cfg():
    return configs.CacoConfig(
        audio=_my_audio_cfg(), text=_my_text_cfg(),
        decoder=_my_text_cfg(layers=2, cross=True),
        logit_scale_init=2.0, num_attention_pool_heads=HEADS,
        projection_size=HIDDEN,
    )


@pytest.fixture(scope="module")
def caco_setup(audio_inputs, text_inputs):
    """Reference CACO params assembled from per-method inits, converted."""
    patches, ti, fi, mask = audio_inputs
    ids, tmask = text_inputs
    model = _build_ref_caco()
    rngs = {"params": jax.random.PRNGKey(3)}

    @jax.jit
    def init_all():
        p_audio = model.init(rngs, patches, ti, fi, mask, deterministic=True,
                             method=model.get_audio_embedding)["params"]
        p_text = model.init(rngs, ids, tmask, deterministic=True,
                            method=model.get_text_embedding)["params"]
        audio_hidden = jnp.zeros((B, S_AUDIO, HIDDEN))
        p_dec = model.init(
            rngs, audio_hidden, mask, jnp.ones((B, 8)), jnp.ones((B, 8)),
            jnp.tile(jnp.arange(8), (B, 1)), deterministic=True,
            method=model.get_next_decoder_logits,
        )["params"]
        return p_audio, p_text, p_dec

    p_audio, p_text, p_dec = init_all()
    from flax.core import unfreeze
    merged = {**unfreeze(p_audio), **unfreeze(p_text), **unfreeze(p_dec)}
    return model, merged, convert_caco_params(merged)


def test_caco_audio_embedding_parity(caco_setup, audio_inputs):
    model, ref_params, mine = caco_setup
    patches, ti, fi, mask = audio_inputs
    ref_emb, ref_hidden = jax.jit(lambda p: model.apply(
        {"params": p}, patches, ti, fi, mask, deterministic=True,
        normalize=True, method=model.get_audio_embedding))(ref_params)
    emb, hidden = jax.jit(lambda p: get_audio_embedding(
        p, _my_caco_cfg(), patches, ti, fi, mask))(mine)
    _close(hidden, ref_hidden)
    _close(emb, ref_emb)


def test_caco_text_embedding_parity(caco_setup, text_inputs):
    model, ref_params, mine = caco_setup
    ids, tmask = text_inputs
    ref_emb, _ = jax.jit(lambda p: model.apply(
        {"params": p}, ids, tmask, deterministic=True, normalize=True,
        method=model.get_text_embedding))(ref_params)
    emb, _ = jax.jit(lambda p: get_text_embedding(
        p, _my_caco_cfg(), ids, tmask))(mine)
    _close(emb, ref_emb)


def test_decode_parity(caco_setup, audio_inputs):
    """Full KV-cached AR decode: token-for-token vs the reference while_loop
    (reference caco.py:154-230 under a 1-device pmap for the 'dp' psum)."""
    model, ref_params, mine = caco_setup
    patches, ti, fi, mask = audio_inputs
    max_len, temp = 12, 0.01  # near-greedy to be robust to fp reorderings
    rng = jax.random.PRNGKey(42)

    audio_batch = {
        "audio_patches": patches, "audio_time_inds": ti,
        "audio_freq_inds": fi, "audio_mask": mask,
    }

    def ref_decode(batch, params, key):
        return CACO.decode(model, params, batch, max_length=max_len,
                           temperature=temp, bos_id=0, eos_id=2, pad_id=1, rng=key)

    p_batch = jax.tree_util.tree_map(lambda x: x[None], audio_batch)
    p_params = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], ref_params)
    ref_ids = jax.pmap(ref_decode, axis_name="dp", devices=jax.devices()[:1])(
        p_batch, p_params, rng[None]
    )[0]

    ids = jax.jit(lambda p, b: decode(
        p, _my_caco_cfg(), b, max_length=max_len, temperature=temp,
        bos_id=0, eos_id=2, pad_id=1, rng=rng))(mine, audio_batch)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_caption_teacher_forcing_matches_stepwise_decode_logits(caco_setup, audio_inputs):
    """Our full-sequence caption_logits must agree with our own decode-mode
    single-step path (KV-cache correctness)."""
    model, ref_params, mine = caco_setup
    patches, ti, fi, mask = audio_inputs
    cfg = _my_caco_cfg()
    T = 6
    ids = jnp.array([[0, 5, 9, 3, 7, 2]] * B, jnp.int32)
    tmask = jnp.ones((B, T), jnp.int32)

    from cacophony_tpu.models.caco import get_audio_embedding as gae
    from cacophony_tpu.models.text import make_kv_cache, precompute_cross_kv

    @jax.jit
    def full_logits(p):
        _, audio_hidden = gae(p, cfg, patches, ti, fi, mask, normalize=False)
        return caption_logits(p, cfg, ids, tmask, audio_hidden, mask), audio_hidden

    full, audio_hidden = full_logits(mine)

    cross_kv = jax.jit(lambda p: precompute_cross_kv(
        p["decoder"]["blocks"], cfg.decoder, audio_hidden))(mine)

    @jax.jit
    def step(p, tok, t, text_cache, dec_cache):
        pos = jnp.full((B, 1), t, jnp.int32)
        _, th, tc = text_encoder_apply(p["text"], cfg.text, tok[:, None],
                                       jnp.ones((B, 1)), position_ids=pos,
                                       cache=text_cache, pool=False)
        lg, dc = caption_decoder_apply(p["decoder"], cfg.decoder, th,
                                       jnp.ones((B, 1)), None, mask,
                                       cache=dec_cache, cross_kv=cross_kv)
        return lg[:, 0], tc, dc

    text_cache = make_kv_cache(cfg.text, B, T)
    dec_cache = make_kv_cache(cfg.decoder, B, T)
    stepwise = []
    for t in range(T):
        lg, text_cache, dec_cache = step(mine, ids[:, t], jnp.int32(t),
                                         text_cache, dec_cache)
        stepwise.append(lg)
    stepwise = jnp.stack(stepwise, axis=1)
    # Post-LN layers amplify fp32 reassociation noise (LN divides by small
    # stds); 1e-3 on these O(0.1) logits is numerical, not structural — the
    # cache path is pinned exactly by test_decode_parity.
    _close(stepwise, full, atol=1e-3)


def test_audiomae_parity(audio_inputs):
    patches, ti, fi, mask = audio_inputs
    n_restore = 8
    rng = jax.random.PRNGKey(9)
    rti = jax.random.randint(rng, (B, n_restore), 0, 3)
    rfi = jax.random.randint(jax.random.fold_in(rng, 1), (B, n_restore), 0, 8)
    rmask = jnp.ones((B, n_restore), jnp.int32)

    ref_cfg = MAE.AudioMAEConfig(encoder_config=_ref_audio_cfg(),
                                 decoder_config=_ref_audio_cfg())
    ref_model = MAE.AudioMAE(ref_cfg)
    ref_params = jax.jit(lambda: ref_model.init(
        {"params": rng}, patches, mask, ti, fi, rti, rfi, rmask,
        deterministic=True)["params"])()
    ref_out = jax.jit(lambda p: ref_model.apply(
        {"params": p}, patches, mask, ti, fi, rti, rfi, rmask,
        deterministic=True))(ref_params)

    mine = convert_audiomae_params(ref_params)
    my_dec_cfg = configs.AudioDecoderConfig(
        hidden_size=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
        intermediate_size=INTER, patch_size=256, num_freq_patches=8,
    )
    out = jax.jit(lambda p: audiomae_apply(
        p, _my_audio_cfg(), my_dec_cfg, patches, mask, ti, fi, rti, rfi,
        rmask))(mine)
    _close(out, ref_out)


def test_audio_encoder_parity_real_dims(audio_inputs):
    """Real model dims (hidden 768, 8 heads → head_dim 96) at reduced depth:
    catches head-splitting/merging bugs the 32-dim configs can't."""
    patches, ti, fi, mask = audio_inputs
    ref_cfg = MAE.AudioTransformerConfig(
        hidden_size=768, num_layers=2, num_heads=8, intermediate_size=3072,
        patch_size=256, max_time_ind=1000, num_freq_patches=8,
        dropout_rate=0.0, drop_path_rate=0.0, dtype=jnp.float32)
    my_cfg = configs.AudioEncoderConfig(
        hidden_size=768, num_layers=2, num_heads=8, intermediate_size=3072,
        patch_size=256, num_freq_patches=8)

    ref_model = MAE.AudioEncoder(ref_cfg)
    ref_params = jax.jit(lambda: ref_model.init(
        {"params": jax.random.PRNGKey(5)}, patches, ti, fi, mask,
        deterministic=True)["params"])()
    ref_out = jax.jit(lambda p: ref_model.apply(
        {"params": p}, patches, ti, fi, mask, deterministic=True))(ref_params)
    out = jax.jit(lambda p: audio_encoder_apply(
        p, my_cfg, patches, ti, fi, mask))(convert_audio_encoder(ref_params))
    _close(out, ref_out, atol=2e-4)


def test_text_encoder_parity_real_dims(text_inputs):
    """Real text dims (768, 12 heads → head_dim 64) at depth 2."""
    ids, mask = text_inputs
    ref_cfg = ROB.RobertaConfig(
        vocab_size=VOCAB, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=64)
    my_cfg = configs.TextConfig(
        vocab_size=VOCAB, hidden_size=768, num_layers=2, num_heads=12,
        intermediate_size=3072, max_position_embeddings=64)
    ref_model = ROB.RobertaModel(ref_cfg)
    ref_params = jax.jit(lambda: ref_model.init(
        {"params": jax.random.PRNGKey(6)}, ids, mask, is_train=False)["params"])()
    ref_pooled, ref_hidden = jax.jit(lambda p: ref_model.apply(
        {"params": p}, ids, mask, is_train=False))(ref_params)
    pooled, hidden, _ = jax.jit(lambda p: text_encoder_apply(
        p, my_cfg, ids, mask))(convert_text_encoder(ref_params))
    _close(hidden, ref_hidden, atol=2e-4)
    _close(pooled, ref_pooled, atol=2e-4)


def test_full_published_dims_export_roundtrip_apply(audio_inputs, text_inputs):
    """Round-3 (VERDICT r2 #10): OUR params at the FULL published dims
    (12L/768 audio 8 heads, 12L text, 4L decoder, vocab 50265, pool heads
    8) exported to the reference layout and applied through the REFERENCE
    flax modules — the strongest available stand-in for the still-absent
    released checkpoints.  Covers both towers, the scan-stacked text
    layout, pooler head splitting, text_proj, logit_scale placement, and
    L2 normalization at checkpoint scale."""
    from cacophony_tpu.checkpoints.convert import caco_params_to_reference
    from cacophony_tpu.models.caco import caco_init

    patches, ti, fi, mask = audio_inputs
    ids, tmask = text_inputs
    cfg = configs.caco_base()
    ids = jnp.clip(ids, 0, cfg.text.vocab_size - 1)

    params = jax.jit(lambda: caco_init(jax.random.PRNGKey(11), cfg))()
    ref_tree = caco_params_to_reference(params,
                                        audio_num_heads=cfg.audio.num_heads)

    # reference construction per load_model.py:23-57
    ref_model = CACO.CACO(
        caco_config=CACO.CACOConfig(
            dtype=jnp.float32, logit_scale_init_value=2.0,
            num_attention_pool_heads=cfg.num_attention_pool_heads,
            use_decoder=True, projection_size=cfg.projection_size),
        audio_module=MAE.AudioEncoder(MAE.AudioTransformerConfig(
            hidden_size=768, num_layers=12, num_heads=8,
            intermediate_size=3072, patch_size=256, max_time_ind=10000,
            num_freq_patches=8, dropout_rate=0.0, drop_path_rate=0.0,
            dtype=jnp.float32)),
        text_module=ROB.RobertaModel(ROB.RobertaConfig()),
        decoder_module=ROB.RobertaDecoder(
            ROB.RobertaConfig(num_hidden_layers=4)),
    )

    ref_a_emb, ref_a_hidden = jax.jit(lambda p: ref_model.apply(
        {"params": p}, patches, ti, fi, mask, deterministic=True,
        normalize=True, method=ref_model.get_audio_embedding))(ref_tree)
    a_emb, a_hidden = jax.jit(lambda p: get_audio_embedding(
        p, cfg, patches, ti, fi, mask))(params)
    _close(a_hidden, ref_a_hidden, atol=5e-4)
    _close(a_emb, ref_a_emb, atol=5e-4)

    ref_t_emb, _ = jax.jit(lambda p: ref_model.apply(
        {"params": p}, ids, tmask, deterministic=True, normalize=True,
        method=ref_model.get_text_embedding))(ref_tree)
    t_emb, _ = jax.jit(lambda p: get_text_embedding(
        p, cfg, ids, tmask))(params)
    _close(t_emb, ref_t_emb, atol=5e-4)
