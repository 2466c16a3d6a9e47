"""Device-resident retrieval gallery with incremental inserts at serving scale.

The reference recomputes a full similarity matrix per evaluation run
(eval_caco.py:223-225).  For serving, the gallery lives in HBM (optionally
dp-sharded over a mesh) and answers top-k queries with one logit-scaled
matmul + top_k — no host round-trip of the gallery.

Scale design (round-2):
- capacity DOUBLES (slab-quantized), so compiled insert/search programs are
  reused across growth: O(log N) compiles for N rows, not one per slab
- growth copies the store on DEVICE via dynamic_update_slice — the old
  round-tripped the whole store through host numpy per slab
- inserts write in-place into reserved capacity (fixed-shape jitted update,
  no recompiles between growths)
- delete(indices) masks rows out of search without compaction
- save/load persist store + labels (npz) for restartable serving
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(store, rows, offset):
    return jax.lax.dynamic_update_slice(store, rows, (offset, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_valid(valid, flags, offset):
    return jax.lax.dynamic_update_slice(valid, flags, (offset,))


@jax.jit
def _grow(old_store, old_valid, new_store, new_valid):
    return (jax.lax.dynamic_update_slice(new_store, old_store, (0, 0)),
            jax.lax.dynamic_update_slice(new_valid, old_valid, (0,)))


@functools.partial(jax.jit, static_argnums=(4,))
def _score_topk(store, valid, queries, scale, k):
    scores = jnp.exp(scale) * queries @ store.T
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


class GalleryIndex:
    def __init__(self, dim: int, *, logit_scale: float = 0.0,
                 slab: int = 4096, mesh=None):
        """dim: embedding size; logit_scale: log-scale applied to scores
        (pass params['logit_scale'] for reference-equivalent logits);
        slab: initial capacity quantum (capacity doubles past it);
        mesh: optional Mesh — the gallery shards its rows over 'dp'."""
        self.dim = dim
        self.logit_scale = float(logit_scale)
        self.slab = slab
        self.mesh = mesh
        self.size = 0
        self.num_deleted = 0
        self._store: Optional[jnp.ndarray] = None  # (capacity, dim)
        self._valid: Optional[jnp.ndarray] = None  # (capacity,) bool
        self._labels: List = []

    @property
    def capacity(self) -> int:
        return 0 if self._store is None else self._store.shape[0]

    @property
    def labels(self) -> List:
        """Row labels in insertion order (read-only view for dedup checks)."""
        return list(self._labels)

    def _place(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is not None:
            spec = P("dp") if x.ndim == 1 else P("dp", None)
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return x

    def _ensure_capacity(self, needed: int):
        if needed <= self.capacity:
            return
        new_cap = max(self.slab, self.capacity)
        while new_cap < needed:
            new_cap *= 2  # doubling → O(log N) distinct compiled shapes
        fresh_store = self._place(jnp.zeros((new_cap, self.dim), jnp.float32))
        fresh_valid = self._place(jnp.zeros((new_cap,), jnp.bool_))
        if self._store is None:
            self._store, self._valid = fresh_store, fresh_valid
        else:
            # device-side copy — the store never round-trips through host
            self._store, self._valid = _grow(self._store, self._valid,
                                             fresh_store, fresh_valid)
            if self.mesh is not None:
                self._store = self._place(self._store)
                self._valid = self._place(self._valid)

    def add(self, embeddings: np.ndarray, labels: Optional[Sequence] = None):
        """Append L2-normalized embeddings (n, dim) (+ optional labels)."""
        embeddings = np.asarray(embeddings, np.float32)
        n = len(embeddings)
        if labels is not None:
            assert len(labels) == n
            self._labels.extend(labels)
        else:
            self._labels.extend(range(self.size, self.size + n))

        self._ensure_capacity(self.size + n)
        self._store = _write_rows(self._store, jnp.asarray(embeddings),
                                  jnp.int32(self.size))
        self._valid = _write_valid(self._valid, jnp.ones((n,), jnp.bool_),
                                   jnp.int32(self.size))
        self.size += n

    def delete(self, indices: Sequence[int]):
        """Mask rows out of every future search (no compaction).
        Idempotent: re-deleting a row doesn't corrupt the live-row count."""
        idx = np.asarray(sorted(set(indices)), np.int32)
        if len(idx) == 0:
            return
        assert (0 <= idx).all() and (idx < self.size).all(), "index out of range"
        was_valid = np.asarray(self._valid[jnp.asarray(idx)])
        self._valid = self._valid.at[jnp.asarray(idx)].set(False)
        self.num_deleted += int(was_valid.sum())

    def search(self, queries: np.ndarray, k: int = 10) -> Tuple[np.ndarray, np.ndarray, List]:
        """→ (scores (nq, k), indices (nq, k), labels per row).
        Deleted rows never surface (their score is -inf)."""
        assert self.size > self.num_deleted, "empty gallery"
        q = jnp.asarray(np.asarray(queries, np.float32))
        k = min(k, self.size - self.num_deleted)  # deleted rows never surface
        top_scores, top_idx = _score_topk(self._store, self._valid, q,
                                          jnp.float32(self.logit_scale), k)
        top_scores = np.asarray(top_scores)
        top_idx = np.asarray(top_idx)
        labels = [[self._labels[j] for j in row] for row in top_idx]
        return top_scores, top_idx, labels

    # ------------------------------------------------------------ persist

    def save(self, path: str):
        """Persist rows + validity + labels (npz; labels via np object)."""
        np.savez(path,
                 store=np.asarray(self._store[: self.size]) if self.size else
                 np.zeros((0, self.dim), np.float32),
                 valid=np.asarray(self._valid[: self.size]) if self.size else
                 np.zeros((0,), np.bool_),
                 labels=np.asarray(self._labels, dtype=object),
                 logit_scale=self.logit_scale, dim=self.dim, slab=self.slab)

    @classmethod
    def load(cls, path: str, *, mesh=None) -> "GalleryIndex":
        data = np.load(path, allow_pickle=True)
        g = cls(int(data["dim"]), logit_scale=float(data["logit_scale"]),
                slab=int(data["slab"]), mesh=mesh)
        store, valid = data["store"], data["valid"]
        if len(store):
            g.add(store, labels=list(data["labels"]))
            dead = np.nonzero(~valid)[0]
            if len(dead):
                g.delete(dead)
        return g
