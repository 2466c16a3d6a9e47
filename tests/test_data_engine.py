"""Tokenizer, audio IO, and CacoEngine tests."""

import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.data.audio_io import load_audio, pad_to_buffer, read_wav
from cacophony_tpu.data.tokenizer import ByteLevelBPETokenizer, _bytes_to_unicode
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.runtime import CacoEngine


def _byte_tokenizer(extra_merges=()):
    """Degenerate byte-level BPE: specials + all 256 byte symbols (+ merges).
    A valid tokenizer for any text; vocab size 260+len(merges)."""
    byte_chars = list(_bytes_to_unicode().values())
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for c in byte_chars:
        vocab[c] = len(vocab)
    for a, b in extra_merges:
        vocab[a + b] = len(vocab)
    return ByteLevelBPETokenizer(vocab, list(extra_merges))


def test_tokenizer_roundtrip():
    tok = _byte_tokenizer()
    for text in ["hello world", "A dog barks, loudly!", "café ☕"]:
        enc = tok([text], padding="max_length", max_length=64)
        ids = enc["input_ids"][0]
        assert ids[0] == tok.bos_token_id
        assert tok.eos_token_id in ids
        assert enc["attention_mask"][0].sum() == (ids != tok.pad_token_id).sum()
        assert tok.batch_decode([ids])[0] == text


def test_tokenizer_merges_and_truncation():
    tok = _byte_tokenizer(extra_merges=[("h", "e"), ("he", "l"), ("hel", "l")])
    ids = tok.encode_text("hello")
    # 'hell' merged into one token + 'o'
    assert len(ids) == 2
    enc = tok(["hello hello hello"], max_length=5)
    assert enc["input_ids"].shape == (1, 5)
    assert enc["input_ids"][0, -1] == tok.eos_token_id  # truncation keeps EOS


def test_wav_io_roundtrip(tmp_path, rng):
    from scipy.io import wavfile

    sr = 44_100
    wav = (rng.randn(sr) * 0.1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))

    data, got_sr = read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(data, wav, atol=1e-3)

    out = load_audio(path)  # resampled to 16 k
    assert out.shape[0] == round(sr * 16000 / sr)  # 1 s → 16000 samples

    buf, n = pad_to_buffer(out, 32000)
    assert buf.shape == (32000,) and n == out.shape[0]
    assert buf[n:].sum() == 0


@pytest.fixture(scope="module")
def engine():
    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    return CacoEngine(cfg, params, tokenizer=_byte_tokenizer(),
                      buffer_seconds=1.0, max_text_len=24, batch_size=4)


def test_engine_embed_audio_bucketing(engine, rng):
    # 6 clips with batch_size 4 → two buckets, padded; results sliced to 6
    wavs = [rng.randn(np.random.RandomState(i).randint(4000, 16000)).astype(np.float32)
            for i in range(6)]
    emb = engine.embed_audio(wavs)
    assert emb.shape == (6, engine.cfg.projection_size)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    # bucketing must not change results: same clip alone vs in a batch
    solo = engine.embed_audio([wavs[0]])
    np.testing.assert_allclose(solo[0], emb[0], atol=1e-5)


def test_engine_text_and_score(engine):
    texts = ["a dog barking", "rain on a window", "a trumpet solo"]
    temb = engine.embed_texts(texts)
    assert temb.shape == (3, engine.cfg.projection_size)
    np.testing.assert_allclose(np.linalg.norm(temb, axis=-1), 1.0, atol=1e-5)
    wavs = [np.random.RandomState(0).randn(8000).astype(np.float32)]
    aemb = engine.embed_audio(wavs)
    logits = engine.score(aemb, temb)
    assert logits.shape == (1, 3)
    assert np.isfinite(logits).all()


def test_engine_caption(engine, rng):
    wavs = [rng.randn(8000).astype(np.float32) for _ in range(2)]
    caps = engine.caption(wavs, max_length=8, temperature=1.0, seed=0)
    assert len(caps) == 2
    assert all(isinstance(c, str) for c in caps)


def test_engine_with_mesh_matches_single_device(rng):
    from cacophony_tpu.parallel import make_mesh

    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    wavs = [rng.randn(8000).astype(np.float32) for _ in range(8)]
    plain = CacoEngine(cfg, params, tokenizer=_byte_tokenizer(),
                       buffer_seconds=1.0, batch_size=8)
    expected = plain.embed_audio(wavs)

    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        sharded = CacoEngine(cfg, params, tokenizer=_byte_tokenizer(),
                             buffer_seconds=1.0, batch_size=8, mesh=mesh)
        got = sharded.embed_audio(wavs)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_engine_mesh_keeps_kernels(rng):
    """Round-3 regression for VERDICT §2.5: a mesh must NOT silently
    downgrade the bespoke kernels.  Engine with flash_attention (cfg
    default) AND the fused DSP frontend forced on runs both Pallas kernels
    per-shard inside shard_map on the 8-device CPU mesh, matching the
    single-device kernel path."""
    from cacophony_tpu.parallel import make_mesh

    cfg = configs.caco_tiny(vocab_size=300)
    assert cfg.audio.flash_attention  # kernel path is the default
    params = caco_init(jax.random.PRNGKey(0), cfg)
    wavs = [rng.randn(6000).astype(np.float32) for _ in range(8)]
    plain = CacoEngine(cfg, params, tokenizer=_byte_tokenizer(),
                       buffer_seconds=1.0, batch_size=8, fused_frontend=True)
    expected = plain.embed_audio(wavs)

    mesh = make_mesh(dp=4, tp=2)  # both axes fold into data parallelism
    with mesh:
        sharded = CacoEngine(cfg, params, tokenizer=_byte_tokenizer(),
                             buffer_seconds=1.0, batch_size=8, mesh=mesh,
                             fused_frontend=True)
        assert sharded.fused_frontend  # not flipped off by the mesh
        assert sharded.cfg.audio.flash_attention
        got = sharded.embed_audio(wavs)
        texts = ["a dog", "rain", "a trumpet", "wind"]
        t_plain = plain.embed_texts(texts)
        t_mesh = sharded.embed_texts(texts)
    np.testing.assert_allclose(got, expected, atol=1e-5)
    np.testing.assert_allclose(t_mesh, t_plain, atol=1e-5)


def test_engine_mesh_rejects_indivisible_batch():
    from cacophony_tpu.parallel import make_mesh

    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=8, tp=1)
    with pytest.raises(ValueError, match="divide evenly"):
        CacoEngine(cfg, params, batch_size=6, mesh=mesh)


def test_eval_cli_parser_defaults():
    from cacophony_tpu.eval.cli import build_parser

    args = build_parser().parse_args(["--ckpt_path", "x"])
    assert args.task == "zs" and args.batch_size == 32
    assert args.dtype == "float32" and not args.no_strict_counts
    args = build_parser().parse_args(
        ["--ckpt_path", "x", "--task", "caption", "--dtype", "bfloat16"])
    assert args.task == "caption" and args.dtype == "bfloat16"


def test_embed_audio_long_chunks_and_matches_short(engine, rng):
    short = rng.randn(8000).astype(np.float32)       # < 1 buffer
    long = rng.randn(50_000).astype(np.float32)      # > 3 buffers (16k each)
    out = engine.embed_audio_long([short, long])
    assert out.shape == (2, engine.cfg.projection_size)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # a short clip reduces exactly to embed_audio
    np.testing.assert_allclose(out[0], engine.embed_audio([short])[0], atol=1e-5)
    # the long clip's embedding equals the renormalized mean of its chunks
    chunks = [long[:16000], long[16000:32000], long[32000:48000], long[48000:]]
    chunk_emb = engine.embed_audio(chunks)
    mean = chunk_emb.mean(0)
    np.testing.assert_allclose(out[1], mean / np.linalg.norm(mean), atol=1e-5)


def test_gallery_index_incremental_and_topk(rng):
    from cacophony_tpu.runtime.gallery import GalleryIndex

    dim = 16
    emb = rng.randn(20, dim).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    g = GalleryIndex(dim, logit_scale=2.0, slab=8)
    g.add(emb[:5], labels=[f"a{i}" for i in range(5)])
    g.add(emb[5:], labels=[f"a{i}" for i in range(5, 20)])
    assert g.size == 20 and g.capacity == 32  # doubling growth: 8→16→32

    scores, idx, labels = g.search(emb[:3], k=4)
    assert scores.shape == (3, 4)
    # self-match must rank first with score exp(2)*1
    assert (idx[:, 0] == np.arange(3)).all()
    np.testing.assert_allclose(scores[:, 0], np.exp(2.0), rtol=1e-4)
    assert labels[1][0] == "a1"
    # brute-force agreement
    brute = np.exp(2.0) * emb[:3] @ emb.T
    np.testing.assert_allclose(np.sort(scores[0]),
                               np.sort(np.sort(brute[0])[-4:]), rtol=1e-4)


def test_gallery_index_sharded(rng):
    from cacophony_tpu.parallel import make_mesh
    from cacophony_tpu.runtime.gallery import GalleryIndex

    dim = 8
    emb = rng.randn(32, dim).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        g = GalleryIndex(dim, slab=16, mesh=mesh)
        g.add(emb)
        scores, idx, _ = g.search(emb[:2], k=3)
    assert (idx[:, 0] == np.arange(2)).all()


def test_engine_text_bucketing_identical(engine):
    """Trimming mask-0 pad columns to a bucket must not change embeddings:
    compare against a full-max_text_len engine on the same prompts."""
    texts = ["a dog", "rain on the window all day long"]
    bucketed = engine.embed_texts(texts)
    full = CacoEngine(engine.cfg, engine.params, tokenizer=engine.tokenizer,
                      buffer_seconds=1.0, max_text_len=24, batch_size=4)
    # force the no-bucket path by making every bucket >= max_text_len
    tok = engine.tokenizer(texts, padding="max_length", truncation=True,
                           max_length=24, return_tensors="np")
    ids = np.asarray(tok["input_ids"], np.int32)
    mask = np.asarray(tok["attention_mask"], np.int32)
    n_pad = 4 - len(ids)
    ids = np.concatenate([ids, np.ones((n_pad, 24), np.int32)])
    mask_p = np.concatenate([mask, np.zeros((n_pad, 24), np.int32)])
    mask_p[len(texts):, 0] = 1
    out = np.asarray(full._text_fn(full.params, ids, mask_p))[:len(texts)]
    np.testing.assert_allclose(bucketed, out, atol=2e-5)


def test_tokenizer_differential_vs_transformers(tmp_path):
    """Native BPE == transformers' RobertaTokenizer (the reference's exact
    algorithm, slow pure-python implementation loadable from local files —
    no network) on ids AND decode, including merges, contractions,
    punctuation, unicode, and leading-space handling."""
    transformers = pytest.importorskip("transformers")
    import json

    byte_chars = list(_bytes_to_unicode().values())
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for c in byte_chars:
        vocab[c] = len(vocab)
    merges = [("h", "e"), ("he", "l"), ("hel", "l"), ("Ġ", "d"),
              ("Ġd", "o"), ("Ġdo", "g"), ("o", "r"), ("l", "d"),
              ("w", "or"), ("wor", "ld"), ("'", "s")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vf, mf = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    # trailing newline matters: transformers' parser slices [1:-1] on the
    # split lines, so a file without it silently loses the LAST merge
    mf.write_text("#version: 0.2\n"
                  + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
                  encoding="utf-8")

    ours = ByteLevelBPETokenizer.from_dir(str(tmp_path))
    theirs = transformers.RobertaTokenizer(vocab_file=str(vf),
                                           merges_file=str(mf))

    texts = ["hello world", "the dog's dog", "  two  spaces ",
             "café ☕ naïve", "don't stop, hell-o!",
             "tab\there\nnewline", "1234 567", "'s 's"]
    for t in texts:
        ref = theirs(t, padding="max_length", truncation=True, max_length=32)
        got = ours([t], padding="max_length", truncation=True, max_length=32)
        assert got["input_ids"][0].tolist() == ref["input_ids"], t
        assert got["attention_mask"][0].tolist() == ref["attention_mask"], t
        assert (ours.batch_decode(got["input_ids"])[0]
                == theirs.decode(ref["input_ids"],
                                 skip_special_tokens=True)), t
