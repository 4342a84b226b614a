"""Composite wrappers — faiss `IndexIDMap{,2}` (IndexIDMap.{h,cpp}),
`IndexShards` (IndexShards.cpp) and `IndexReplicas` (IndexReplicas.cpp).

IndexShards/IndexReplicas in the reference run one CPU thread per
sub-index (impl/ThreadedIndex-inl.h) and heap-merge results. On TPU the
device-level equivalents are the mesh axes in `tpu_ann.parallel`; these
wrappers keep the composition API (and are how heterogeneous or host-split
deployments are expressed), merging partial top-k with `ops.topk`.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..ops import topk as T
from .base import Index


class IndexIDMap(Index):
    """Arbitrary-id remapping wrapper (faiss IndexIDMap)."""

    def __init__(self, index: Index):
        super().__init__(index.d, index.metric_type)
        self.index = index
        self.id_map: List[int] = []
        self.is_trained = index.is_trained

    def train(self, x) -> None:
        self.index.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        raise RuntimeError("use add_with_ids on IndexIDMap (faiss parity)")

    def add_with_ids(self, x, ids) -> None:
        ids = np.asarray(ids, np.int64)
        self.index.add(x)
        self.id_map.extend(ids.tolist())
        self.ntotal = self.index.ntotal

    def search(self, x, k: int, *, params=None):
        Dv, Iv = self.index.search(x, k, params=params)
        amap = np.asarray(self.id_map, np.int64)
        out = np.where(Iv >= 0, amap[np.clip(Iv, 0, len(amap) - 1)], -1)
        return Dv, out

    def reset(self) -> None:
        self.index.reset()
        self.id_map = []
        self.ntotal = 0

    def reconstruct(self, key: int) -> np.ndarray:
        # IndexIDMap2 semantics: map external -> internal
        pos = self.id_map.index(key)
        return self.index.reconstruct(pos)


IndexIDMap2 = IndexIDMap  # reconstruct() already maps ids (IndexIDMap2.h)


class IndexShards(Index):
    """Database-sharded composite (faiss IndexShards): add distributes
    vectors round-robin (successive_ids), search fans out and merges."""

    def __init__(self, d: int, metric=None, *, threaded: bool = False,
                 successive_ids: bool = True):
        from ..ops.distances import METRIC_L2

        super().__init__(d, METRIC_L2 if metric is None else metric)
        self.shard_indexes: List[Index] = []
        self.successive_ids = successive_ids
        self._id_bases: List[int] = []

    def add_shard(self, index: Index) -> None:
        if index.d != self.d:
            raise ValueError("shard dimension mismatch")
        self.shard_indexes.append(index)
        self._id_bases.append(0)

    @property
    def count(self) -> int:
        return len(self.shard_indexes)

    def train(self, x) -> None:
        for idx in self.shard_indexes:
            idx.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        """Split the batch evenly across shards (IndexShards::add_with_ids
        successive_ids path: shard i gets contiguous id range)."""
        x = self._check_input(x)
        n = len(x)
        ns = self.count
        if ns == 0:
            raise RuntimeError("no shards")
        per = -(-n // ns)
        base = self.ntotal
        for i, idx in enumerate(self.shard_indexes):
            chunk = x[i * per : (i + 1) * per]
            if len(chunk) == 0:
                continue
            self._id_bases[i] = base
            idx.add(chunk)
            base += len(chunk)
        self.ntotal = base

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        parts_d, parts_i = [], []
        for i, idx in enumerate(self.shard_indexes):
            Dv, Iv = idx.search(x, k, params=params)
            if self.successive_ids:
                Iv = np.where(Iv >= 0, Iv + self._id_bases[i], -1)
            parts_d.append(Dv)
            parts_i.append(Iv)
        import jax.numpy as jnp

        Dm, Im = T.merge_topk_axis(
            jnp.asarray(np.stack(parts_d)),
            jnp.asarray(np.stack(parts_i)),
            k, similarity=self.is_similarity,
        )
        return np.asarray(Dm), np.asarray(Im, np.int64)

    def reset(self) -> None:
        for idx in self.shard_indexes:
            idx.reset()
        self.ntotal = 0


class IndexReplicas(Index):
    """Replicated composite (faiss IndexReplicas): every replica holds the
    full database; queries are split across replicas for throughput."""

    def __init__(self, d: int, metric=None):
        from ..ops.distances import METRIC_L2

        super().__init__(d, METRIC_L2 if metric is None else metric)
        self.replicas: List[Index] = []

    def add_replica(self, index: Index) -> None:
        if index.d != self.d:
            raise ValueError("replica dimension mismatch")
        self.replicas.append(index)
        self.ntotal = index.ntotal

    def train(self, x) -> None:
        for idx in self.replicas:
            idx.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        for idx in self.replicas:
            idx.add(x)
        self.ntotal = self.replicas[0].ntotal if self.replicas else 0

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nr = len(self.replicas)
        if nr == 0:
            raise RuntimeError("no replicas")
        per = -(-len(x) // nr)
        outs = []
        for i, idx in enumerate(self.replicas):
            chunk = x[i * per : (i + 1) * per]
            if len(chunk):
                outs.append(idx.search(chunk, k, params=params))
        Dv = np.concatenate([o[0] for o in outs], axis=0)
        Iv = np.concatenate([o[1] for o in outs], axis=0)
        return Dv, Iv

    def reset(self) -> None:
        for idx in self.replicas:
            idx.reset()
        self.ntotal = 0
