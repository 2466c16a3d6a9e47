"""Examples stay runnable: drive quickstart + serving main() on CPU with a
tiny synthetic checkpoint (guards the documented surfaces from rot)."""

import csv
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.checkpoints.convert import caco_params_to_reference
from cacophony_tpu.models.caco import caco_init

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_example(name):
    path = os.path.join(REPO, "examples", name)
    spec = importlib.util.spec_from_file_location(f"example_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("exfx")
    # tokenizer dir
    tok = root / "tok"
    tok.mkdir()
    specials = ["<s>", "<pad>", "</s>", "<unk>"]
    chars = [chr(c) for c in range(33, 127)] + ["Ġ"]
    (tok / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(specials + chars)}))
    (tok / "merges.txt").write_text("#version: 0.2\n")
    # tiny checkpoint in the released layout
    from flax.training import checkpoints as flax_checkpoints

    cfg = configs.caco_tiny(vocab_size=len(specials) + len(chars))
    params = caco_init(jax.random.PRNGKey(0), cfg)
    ref = caco_params_to_reference(params, audio_num_heads=cfg.audio.num_heads)
    flax_checkpoints.save_checkpoint(str(root / "ckpt"), {"0": {"params": ref}},
                                     step=0, overwrite=True)
    # wavs
    from scipy.io import wavfile

    rng = np.random.RandomState(0)
    wav_paths = []
    for i in range(3):
        p = root / f"clip{i}.wav"
        wav = (rng.randn(8000) * 0.1).astype(np.float32)
        wavfile.write(str(p), 16_000, (wav * 32767).astype(np.int16))
        wav_paths.append(str(p))
    return {"ckpt": str(root / "ckpt"), "tok": str(tok), "wavs": wav_paths,
            "root": root}


def test_quickstart_runs(fixture_dir, monkeypatch, capsys):
    mod = _load_example("quickstart.py")
    monkeypatch.setattr(sys, "argv", [
        "quickstart.py", *fixture_dir["wavs"],
        "--ckpt_path", fixture_dir["ckpt"],
        "--tokenizer", fixture_dir["tok"],
        "--texts", "a dog", "rain",
    ])
    # tiny checkpoint: disable the published-size guard like the CLIs do
    from cacophony_tpu.checkpoints import io as ckpt_io

    orig = ckpt_io.load_caco
    monkeypatch.setattr(
        mod, "load_caco",
        lambda p, **kw: orig(p, **{**kw, "strict_counts": False}))
    mod.main()
    out = capsys.readouterr().out
    assert "best match" in out


def test_serving_example_runs(fixture_dir, monkeypatch, capsys, tmp_path):
    mod = _load_example("serving.py")
    gal = str(tmp_path / "gal.npz")
    monkeypatch.setattr(sys, "argv", [
        "serving.py", *fixture_dir["wavs"],
        "--ckpt_path", fixture_dir["ckpt"],
        "--tokenizer", fixture_dir["tok"],
        "--queries", "dog", "--no_strict_counts",
        "--gallery_path", gal, "--caption",
    ])
    mod.main()
    out = capsys.readouterr().out
    assert "gallery persisted" in out and os.path.exists(gal)
