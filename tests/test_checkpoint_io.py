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
