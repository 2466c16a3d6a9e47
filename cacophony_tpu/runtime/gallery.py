"""Device-resident retrieval gallery with incremental inserts.

The reference recomputes a full similarity matrix per evaluation run
(eval_caco.py:223-225).  For serving, the gallery lives in HBM (optionally
dp-sharded over a mesh), grows by slabs, and answers top-k queries with one
logit-scaled matmul + top_k — no host round-trip of the gallery.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


class GalleryIndex:
    def __init__(self, dim: int, *, logit_scale: float = 0.0,
                 slab: int = 4096, mesh=None):
        """dim: embedding size; logit_scale: log-scale applied to scores
        (pass params['logit_scale'] for reference-equivalent logits);
        slab: capacity growth quantum (static shapes → no recompiles);
        mesh: optional Mesh — the gallery shards its rows over 'dp'."""
        self.dim = dim
        self.logit_scale = float(logit_scale)
        self.slab = slab
        self.mesh = mesh
        self.size = 0
        self._store: Optional[jnp.ndarray] = None  # (capacity, dim)
        self._labels: List = []

        @jax.jit
        def _score(store, queries, scale):
            return jnp.exp(scale) * queries @ store.T

        self._score = _score

    @property
    def capacity(self) -> int:
        return 0 if self._store is None else self._store.shape[0]

    def _place(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is not None:
            return jax.device_put(x, NamedSharding(self.mesh, P("dp")))
        return jnp.asarray(x)

    def add(self, embeddings: np.ndarray, labels: Optional[Sequence] = None):
        """Append L2-normalized embeddings (n, dim) (+ optional labels)."""
        embeddings = np.asarray(embeddings, np.float32)
        n = len(embeddings)
        if labels is not None:
            assert len(labels) == n
            self._labels.extend(labels)
        else:
            self._labels.extend(range(self.size, self.size + n))

        needed = self.size + n
        if needed > self.capacity:
            new_cap = -(-needed // self.slab) * self.slab
            grown = np.zeros((new_cap, self.dim), np.float32)
            if self._store is not None:
                grown[: self.size] = np.asarray(self._store[: self.size])
            grown[self.size: needed] = embeddings
            self._store = self._place(jnp.asarray(grown))
        else:
            store = self._store.at[self.size: needed].set(jnp.asarray(embeddings))
            self._store = self._place(store)
        self.size = needed

    def search(self, queries: np.ndarray, k: int = 10) -> Tuple[np.ndarray, np.ndarray, List]:
        """→ (scores (nq, k), indices (nq, k), labels per row)."""
        assert self.size > 0, "empty gallery"
        q = jnp.asarray(np.asarray(queries, np.float32))
        scores = self._score(self._store, q, jnp.float32(self.logit_scale))
        # mask the unused capacity tail
        valid = jnp.arange(self.capacity) < self.size
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        k = min(k, self.size)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        top_scores = np.asarray(top_scores)
        top_idx = np.asarray(top_idx)
        labels = [[self._labels[j] for j in row] for row in top_idx]
        return top_scores, top_idx, labels
