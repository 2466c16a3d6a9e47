"""Streaming dataset evaluation: the engine must consume waveform
generators lazily with bounded live host memory (VERDICT: VGGSound-scale
datasets must not materialize in RAM; reference streams per file,
src/eval/eval_caco.py:195-221)."""

import weakref

import numpy as np
import pytest

import jax

from cacophony_tpu import configs
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.runtime.engine import CacoEngine


@pytest.fixture(scope="module")
def engine():
    cfg = configs.caco_tiny()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    return CacoEngine(cfg, params, buffer_seconds=0.5, batch_size=4)


class LiveCounter:
    """Tracks how many yielded waveforms are simultaneously alive (CPython
    refcounting frees numpy arrays deterministically)."""

    def __init__(self):
        self.live = 0
        self.max_live = 0
        self.yielded = 0

    def make(self, n_samples, seed):
        w = np.random.RandomState(seed).randn(n_samples).astype(np.float32)
        self.live += 1
        self.yielded += 1
        self.max_live = max(self.max_live, self.live)
        weakref.finalize(w, self._dec)
        return w

    def _dec(self):
        self.live -= 1


def test_generator_results_match_list(engine):
    wavs = [np.random.RandomState(i).randn(4000).astype(np.float32)
            for i in range(10)]
    from_list = engine.embed_audio(wavs)
    from_gen = engine.embed_audio(w for w in wavs)
    np.testing.assert_allclose(from_list, from_gen, rtol=0, atol=0)
    assert from_list.shape == (10, engine.cfg.projection_size)


def test_streaming_bounded_live_buffers(engine):
    """600 clips through a generator: peak simultaneously-alive waveforms
    stays at O(dispatch window · batch), nowhere near the dataset size."""
    n_clips = 600
    counter = LiveCounter()

    def gen():
        for i in range(n_clips):
            yield counter.make(4000, i)

    emb = engine.embed_audio(gen())
    assert emb.shape == (n_clips, engine.cfg.projection_size)
    assert counter.yielded == n_clips
    # window(4)+1 buckets in flight + 1 bucket being filled + slack
    bound = engine.batch_size * 8
    assert counter.max_live <= bound, (counter.max_live, bound)


def test_streaming_empty_and_ragged(engine):
    assert engine.embed_audio(iter([])).shape == (0, engine.cfg.projection_size)
    # non-multiple-of-batch count via generator
    wavs = [np.random.RandomState(i).randn(3000 + 500 * i).astype(np.float32)
            for i in range(5)]
    emb = engine.embed_audio(iter(wavs))
    assert emb.shape == (5, engine.cfg.projection_size)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
