"""Gallery at serving scale: O(log N) compiles, device-side growth,
delete masking, persistence (VERDICT round-1 #10)."""

import numpy as np
import pytest

from cacophony_tpu.runtime import gallery as G


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def _normed(rng, n, d):
    e = rng.randn(n, d).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_large_ingest_bounded_compiles(rng):
    """100k rows in 1k-row batches: compiled program count stays O(log N)
    (doubling capacities), nowhere near the 100 insert batches."""
    dim, total, chunk = 32, 100_000, 1_000
    g = G.GalleryIndex(dim, slab=4096)
    emb = _normed(rng, chunk, dim)
    base = (G._write_rows._cache_size() + G._grow._cache_size()
            + G._score_topk._cache_size())
    for i in range(total // chunk):
        g.add(emb)  # same rows re-added; content irrelevant here
    s, idx, _ = g.search(emb[:2], k=5)
    compiles = (G._write_rows._cache_size() + G._grow._cache_size()
                + G._score_topk._cache_size()) - base
    assert g.size == total
    # capacities touched: 4096→8192→...→131072 = 6 growths; each gets a
    # _write_rows + _grow + one _score_topk at the final capacity
    assert compiles <= 20, compiles
    assert s.shape == (2, 5)


def test_delete_masks_rows(rng):
    dim = 16
    emb = _normed(rng, 10, dim)
    g = G.GalleryIndex(dim)
    g.add(emb, labels=[f"r{i}" for i in range(10)])
    scores, idx, labels = g.search(emb[:1], k=1)
    assert idx[0, 0] == 0 and labels[0][0] == "r0"

    g.delete([0])
    scores, idx, labels = g.search(emb[:1], k=10)
    assert 0 not in idx[0]
    assert g.num_deleted == 1
    with pytest.raises(AssertionError):
        g.delete([10])  # out of range


def test_save_load_roundtrip(rng, tmp_path):
    dim = 16
    emb = _normed(rng, 12, dim)
    g = G.GalleryIndex(dim, logit_scale=1.5, slab=8)
    g.add(emb, labels=[f"x{i}" for i in range(12)])
    g.delete([3, 7])
    path = str(tmp_path / "gal.npz")
    g.save(path)

    g2 = G.GalleryIndex.load(path)
    assert g2.size == 12 and g2.logit_scale == 1.5
    s1, i1, l1 = g.search(emb[:4], k=5)
    s2, i2, l2 = g2.search(emb[:4], k=5)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)
    np.testing.assert_array_equal(i1, i2)
    assert l1 == l2
    assert 3 not in i2 and 7 not in i2


def test_growth_preserves_contents(rng):
    """Rows written before several growths still score exactly."""
    dim = 8
    g = G.GalleryIndex(dim, slab=4)
    all_emb = []
    for i in range(6):  # 4 → 8 → 16 → 32 capacity path
        e = _normed(rng, 5, dim)
        all_emb.append(e)
        g.add(e)
    all_emb = np.concatenate(all_emb)
    scores, idx, _ = g.search(all_emb, k=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(30))


def test_delete_idempotent(rng):
    """Re-deleting a row must not corrupt the live-row count (review fix)."""
    dim = 8
    g = G.GalleryIndex(dim)
    g.add(_normed(rng, 2, dim))
    g.delete([0])
    g.delete([0])  # repeat: no double count
    assert g.num_deleted == 1
    s, idx, _ = g.search(_normed(rng, 1, dim), k=5)
    assert idx.shape == (1, 1) and idx[0, 0] == 1
