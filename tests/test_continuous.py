"""Continuous-batching captioner vs lockstep batch decode (greedy parity)."""

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
