"""Training data pipeline, patch subsampling, weight transplants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cacophony_tpu import configs
from cacophony_tpu.checkpoints.convert import (
    convert_hf_roberta,
    transplant_audiomae_encoder,
)
from cacophony_tpu.data.pipeline import (
    CacoTrainLoader,
    TrainDataConfig,
    prefetch_to_device,
    subsample_patches,
)
from cacophony_tpu.models.audio import audiomae_init
from cacophony_tpu.models.caco import caco_init

from tests.test_data_engine import _byte_tokenizer


def test_subsample_patches_short_clip_is_first_n():
    """≤ seq_len valid patches → identical to the deterministic eval path."""
    b, s_full, seq = 2, 32, 16
    rng = np.random.RandomState(0)
    batch = {
        "audio_patches": jnp.asarray(rng.randn(b, s_full, 256), jnp.float32),
        "audio_time_inds": jnp.tile(jnp.arange(s_full) // 8, (b, 1)),
        "audio_freq_inds": jnp.tile(jnp.arange(s_full) % 8, (b, 1)),
        "audio_mask": jnp.zeros((b, s_full), jnp.int32).at[:, :10].set(1),
    }
    out = subsample_patches(jax.random.PRNGKey(0), batch, seq)
    np.testing.assert_array_equal(np.asarray(out["audio_mask"][0]),
                                  (np.arange(seq) < 10).astype(np.int32))
    np.testing.assert_allclose(np.asarray(out["audio_patches"][0, :10]),
                               np.asarray(batch["audio_patches"][0, :10]))
    assert np.asarray(out["audio_patches"][0, 10:]).sum() == 0


def test_subsample_patches_long_clip_sorted_random_subset():
    b, s_full, seq = 1, 64, 16
    batch = {
        "audio_patches": jnp.arange(b * s_full * 4, dtype=jnp.float32).reshape(b, s_full, 4),
        "audio_time_inds": jnp.tile(jnp.arange(s_full) // 8, (b, 1)),
        "audio_freq_inds": jnp.tile(jnp.arange(s_full) % 8, (b, 1)),
        "audio_mask": jnp.ones((b, s_full), jnp.int32),
    }
    out1 = subsample_patches(jax.random.PRNGKey(0), batch, seq)
    out2 = subsample_patches(jax.random.PRNGKey(1), batch, seq)
    ti1 = np.asarray(out1["audio_time_inds"][0])
    fi1 = np.asarray(out1["audio_freq_inds"][0])
    flat1 = ti1 * 8 + fi1
    assert (np.diff(flat1) > 0).all()  # sorted, no duplicates
    assert out1["audio_mask"].sum() == seq
    # different seeds give different subsets
    assert not np.array_equal(flat1, np.asarray(out2["audio_time_inds"][0]) * 8
                              + np.asarray(out2["audio_freq_inds"][0]))


def test_train_loader_and_prefetch(tmp_path):
    from scipy.io import wavfile

    paths, caps, syn = [], {}, {}
    for i in range(6):
        p = tmp_path / f"c{i}.wav"
        wav = (np.random.RandomState(i).randn(8000) * 0.1).astype(np.float32)
        wavfile.write(str(p), 16_000, (wav * 32767).astype(np.int16))
        paths.append(str(p))
        caps[f"c{i}"] = [f"caption {i} a", f"caption {i} b"]
        syn[f"c{i}"] = [f"synthetic {i}"]

    cfg = TrainDataConfig(batch_size=2, buffer_seconds=1.0, max_text_len=16,
                          synthetic_prob=1.0, seed=3)
    loader = CacoTrainLoader(paths, caps, _byte_tokenizer(), cfg,
                             synthetic_captions=syn)
    it = prefetch_to_device(loader, size=2)
    batch = next(it)
    assert batch["audio_bufs"].shape == (2, 16_000)
    assert batch["text_input_ids"].shape == (2, 16)
    assert int(batch["audio_lens"][0]) == 8000
    # synthetic_prob=1.0 → all captions replaced by synthetic ones
    tok = _byte_tokenizer()
    text = tok.batch_decode(np.asarray(batch["text_input_ids"]))[0]
    assert text.startswith("synthetic")
    next(it)  # second prefetched batch available


def test_transplant_audiomae_encoder():
    cfg = configs.caco_tiny()
    caco = caco_init(jax.random.PRNGKey(0), cfg)
    enc_cfg = cfg.audio
    dec_cfg = configs.AudioDecoderConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    mae = audiomae_init(jax.random.PRNGKey(1), enc_cfg, dec_cfg)
    out = transplant_audiomae_encoder(caco, mae)
    np.testing.assert_array_equal(
        np.asarray(out["audio"]["patch_proj"]["w"]),
        np.asarray(mae["encoder"]["patch_proj"]["w"]))
    # rest untouched
    np.testing.assert_array_equal(np.asarray(out["text_proj"]["w"]),
                                  np.asarray(caco["text_proj"]["w"]))


def test_convert_hf_roberta_layout():
    """Build an HF-layout tree synthetically (numbered layers) and convert."""
    rng = np.random.RandomState(0)
    d, inter, L = 8, 16, 2

    def dense(i, o):
        return {"kernel": rng.randn(i, o).astype(np.float32),
                "bias": rng.randn(o).astype(np.float32)}

    def ln():
        return {"scale": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)}

    layer = lambda: {
        "attention": {"self": {"query": dense(d, d), "key": dense(d, d),
                               "value": dense(d, d)},
                      "output": {"dense": dense(d, d), "LayerNorm": ln()}},
        "intermediate": {"dense": dense(d, inter)},
        "output": {"dense": dense(inter, d), "LayerNorm": ln()},
    }
    hf = {
        "embeddings": {
            "word_embeddings": {"embedding": rng.randn(32, d).astype(np.float32)},
            "position_embeddings": {"embedding": rng.randn(10, d).astype(np.float32)},
            "token_type_embeddings": {"embedding": rng.randn(1, d).astype(np.float32)},
            "LayerNorm": ln(),
        },
        "encoder": {"layer": {str(i): layer() for i in range(L)}},
    }
    ours = convert_hf_roberta(hf)
    assert ours["blocks"]["attn"]["qkv"]["w"].shape == (L, d, 3 * d)
    np.testing.assert_array_equal(
        ours["blocks"]["attn"]["qkv"]["w"][0, :, :d],
        hf["encoder"]["layer"]["0"]["attention"]["self"]["query"]["kernel"])
    np.testing.assert_array_equal(ours["embeddings"]["word"],
                                  hf["embeddings"]["word_embeddings"]["embedding"])


def test_train_loader_non_16k_full_length(tmp_path):
    """A 1-s 44.1 kHz clip must resample to the FULL 16000 samples (the
    native decode buffer is sized at the source rate; a truncation bug here
    previously cut non-16k clips to buffer/2.75)."""
    from scipy.io import wavfile

    p = tmp_path / "hi.wav"
    wav = (np.random.RandomState(0).randn(44_100) * 0.1).astype(np.float32)
    wavfile.write(str(p), 44_100, (wav * 32767).astype(np.int16))
    caps = {"hi": ["a sound"]}
    cfg = TrainDataConfig(batch_size=1, buffer_seconds=1.0, max_text_len=8)
    loader = CacoTrainLoader([str(p)], caps, _byte_tokenizer(), cfg,
                             shuffle=False)
    batch = next(iter(loader))
    assert int(batch["audio_lens"][0]) == 16_000
    # content matches the host-exact resampler
    from cacophony_tpu.frontend.dsp import resample_fft_host

    int16_wav = ((wav * 32767).astype(np.int16)).astype(np.float32) / 32768.0
    expected = resample_fft_host(int16_wav, 16_000)
    np.testing.assert_allclose(batch["audio_bufs"][0], expected, atol=1e-4)


def test_train_loader_raises_on_corrupt_wav(tmp_path):
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("native decoder unavailable")
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a riff file at all")
    cfg = TrainDataConfig(batch_size=1, buffer_seconds=1.0, max_text_len=8)
    loader = CacoTrainLoader([str(p)], {"bad": ["x"]}, _byte_tokenizer(), cfg,
                             shuffle=False)
    with pytest.raises(ValueError):  # native fails -> per-file fallback also fails
        next(iter(loader))


def test_train_loader_resume_continues_stream(tmp_path):
    """start_batch=k must yield exactly the k-th..(k+n) batches of a fresh
    stream (resumed training must not replay seen data)."""
    from scipy.io import wavfile
    import itertools

    paths, caps = [], {}
    for i in range(8):
        p = tmp_path / f"c{i}.wav"
        wav = (np.random.RandomState(i).randn(4000) * 0.1).astype(np.float32)
        wavfile.write(str(p), 16_000, (wav * 32767).astype(np.int16))
        paths.append(str(p))
        caps[f"c{i}"] = [f"cap {i} a", f"cap {i} b"]

    cfg = TrainDataConfig(batch_size=2, buffer_seconds=0.5, max_text_len=12,
                          seed=5)
    fresh = list(itertools.islice(iter(
        CacoTrainLoader(paths, caps, _byte_tokenizer(), cfg)), 7))

    resumed_loader = CacoTrainLoader(paths, caps, _byte_tokenizer(), cfg)
    resumed_loader.start_batch = 5  # crosses an epoch boundary (4 per epoch)
    resumed = list(itertools.islice(iter(resumed_loader), 2))

    for a, b in zip(resumed, fresh[5:7]):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
