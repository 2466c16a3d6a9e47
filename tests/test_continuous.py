"""Continuous-batching captioner vs lockstep batch decode (greedy parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.runtime import CacoEngine
from cacophony_tpu.runtime.continuous import ContinuousCaptioner

from tests.test_data_engine import _byte_tokenizer


def test_continuous_matches_batch_decode():
    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(0), cfg)
    tok = _byte_tokenizer()
    engine = CacoEngine(cfg, params, tokenizer=tok, buffer_seconds=1.0,
                        batch_size=8, max_text_len=16)

    rng = np.random.RandomState(0)
    wavs = [rng.randn(8000).astype(np.float32) * 0.3 for _ in range(5)]

    # near-greedy reference: lockstep batch decode through the engine
    batch_caps = engine.caption(wavs, max_length=10, temperature=1e-4, seed=0)

    # continuous batching with fewer slots than requests (forces refills)
    patch_batch, n = engine.audio_patch_batch(wavs)
    requests = [
        jax.tree_util.tree_map(lambda x: x[i:i + 1], patch_batch) for i in range(n)
    ]
    server = ContinuousCaptioner(cfg, params, tok, num_slots=2, max_length=10,
                                 temperature=1e-4, seed=0)
    cont_caps = server.run(requests)

    assert len(cont_caps) == 5
    assert all(c is not None for c in cont_caps)
    assert cont_caps == [c.strip() for c in batch_caps]


def test_continuous_single_slot_many_requests():
    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(1), cfg)
    tok = _byte_tokenizer()
    engine = CacoEngine(cfg, params, tokenizer=tok, buffer_seconds=1.0,
                        batch_size=4, max_text_len=16)
    rng = np.random.RandomState(1)
    wavs = [rng.randn(6000).astype(np.float32) * 0.3 for _ in range(3)]
    patch_batch, n = engine.audio_patch_batch(wavs)
    requests = [jax.tree_util.tree_map(lambda x: x[i:i + 1], patch_batch)
                for i in range(n)]
    server = ContinuousCaptioner(cfg, params, tok, num_slots=1, max_length=8,
                                 temperature=1e-4)
    caps = server.run(requests)
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)


def test_continuous_mixed_audio_lengths():
    """Requests from different patch budgets are padded into one server
    (mask-0 padding == engine bucket padding), and over-budget requests
    fail loudly."""
    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(2), cfg)
    tok = _byte_tokenizer()
    big = CacoEngine(cfg, params, tokenizer=tok, buffer_seconds=1.0,
                     batch_size=4, max_text_len=16)
    small = CacoEngine(cfg, params, tokenizer=tok, buffer_seconds=0.5,
                       batch_size=4, max_text_len=16)

    rng = np.random.RandomState(2)
    wavs = [rng.randn(6000).astype(np.float32) * 0.3 for _ in range(3)]

    big_batch, n = big.audio_patch_batch(wavs)
    small_batch, _ = small.audio_patch_batch(wavs)
    big_reqs = [jax.tree_util.tree_map(lambda x: x[i:i + 1], big_batch)
                for i in range(n)]
    small_reqs = [jax.tree_util.tree_map(lambda x: x[i:i + 1], small_batch)
                  for i in range(n)]
    assert small_reqs[0]["audio_patches"].shape[1] < big_reqs[0]["audio_patches"].shape[1]

    def serve(reqs, seq_len=None):
        server = ContinuousCaptioner(cfg, params, tok, num_slots=2,
                                     max_length=8, temperature=1e-4, seed=0,
                                     audio_seq_len=seq_len)
        return server.run(reqs)

    seq = big_reqs[0]["audio_patches"].shape[1]
    mixed = [big_reqs[0], small_reqs[1], big_reqs[2]]
    # NOTE: a 0.5 s clip in the 1.0 s budget has MORE valid frames than in
    # the 0.5 s budget only if truncated — here both engines see all 6000
    # samples, so the small request is the big one truncated to fewer
    # patches; captions may differ for it, but the pipeline must run and
    # the big-budget requests must caption identically.
    caps_mixed = serve(mixed, seq_len=seq)
    caps_big = serve(big_reqs, seq_len=seq)
    assert caps_mixed[0] == caps_big[0]
    assert caps_mixed[2] == caps_big[2]

    with pytest.raises(ValueError, match="exceeds the server budget"):
        serve([big_reqs[0]], seq_len=small_reqs[0]["audio_patches"].shape[1])


def test_continuous_drain_window_invariance():
    """Near-greedy captions are identical whether the host drains every
    token or every 8 tokens (the window changes sync cadence, not math)."""
    cfg = configs.caco_tiny(vocab_size=300)
    params = caco_init(jax.random.PRNGKey(3), cfg)
    tok = _byte_tokenizer()
    engine = CacoEngine(cfg, params, tokenizer=tok, buffer_seconds=1.0,
                        batch_size=4, max_text_len=16)
    rng = np.random.RandomState(3)
    wavs = [rng.randn(7000).astype(np.float32) * 0.3 for _ in range(4)]
    patch_batch, n = engine.audio_patch_batch(wavs)
    reqs = [jax.tree_util.tree_map(lambda x: x[i:i + 1], patch_batch)
            for i in range(n)]

    caps = {}
    for k in (1, 8):
        server = ContinuousCaptioner(cfg, params, tok, num_slots=2,
                                     max_length=10, temperature=1e-4,
                                     seed=0, drain_every=k)
        caps[k] = server.run(iter(reqs))  # generator input: lazy pull
    assert caps[1] == caps[8]
    assert len(caps[8]) == 4


def test_sampling_top_k_top_p():
    from cacophony_tpu.models.caco import sample_logits

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]] * 4))
    # top_k=1 → always argmax
    s = sample_logits(jax.random.PRNGKey(0), logits, top_k=1)
    assert (np.asarray(s) == 0).all()
    # top_p=0.6 keeps {0.5, 0.3}; over many draws only ids 0/1 appear
    draws = [int(sample_logits(jax.random.PRNGKey(i), logits[:1], top_p=0.6)[0])
             for i in range(50)]
    assert set(draws) <= {0, 1} and len(set(draws)) == 2
    # top_p=0.4 keeps only the best
    draws = [int(sample_logits(jax.random.PRNGKey(i), logits[:1], top_p=0.4)[0])
             for i in range(20)]
    assert set(draws) == {0}
