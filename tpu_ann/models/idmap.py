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
    """Arbitrary-id remapping wrapper (faiss IndexIDMap,
    faiss/IndexIDMap.{h,cpp}): internal sequential rows carry
    user-supplied external ids. `reconstruct` by external id is NOT
    supported here (faiss parity — that is IndexIDMap2's addition)."""

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

    def _remap(self, Iv):
        amap = np.asarray(self.id_map, np.int64)
        if len(amap) == 0:
            return np.where(np.asarray(Iv) >= 0, -1, -1)
        return np.where(Iv >= 0, amap[np.clip(Iv, 0, len(amap) - 1)], -1)

    def search(self, x, k: int, *, params=None):
        Dv, Iv = self.index.search(x, k, params=params)
        return Dv, self._remap(Iv)

    def range_search(self, x, radius: float):
        """Forwarded range search with labels remapped to external ids
        (faiss IndexIDMap::range_search, IndexIDMap.h:53)."""
        lims, dd, labels = self.index.range_search(x, radius)
        return lims, dd, self._remap(labels)

    def remove_ids(self, sel) -> int:
        """Remove vectors whose EXTERNAL id matches the selector
        (faiss IndexIDMap::remove_ids translates the selector through
        id_map, then compacts both sides in step). Requires the
        sub-index's remove_ids to renumber sequentially & stably (the
        IndexFlatCodes contract), which all flat-storage indexes here
        honor."""
        from .selectors import IDSelectorBatch

        ids = np.asarray(self.id_map, np.int64)
        hit = sel.member_array(ids)
        nremove = int(hit.sum())
        if nremove == 0:
            return 0
        inner = self.index.remove_ids(
            IDSelectorBatch(np.nonzero(hit)[0]))
        if inner != nremove:
            raise RuntimeError(
                f"sub-index removed {inner} rows, selector matched "
                f"{nremove} — sub-index does not renumber stably")
        self.id_map = ids[~hit].tolist()
        self.ntotal = self.index.ntotal
        return nremove

    def reset(self) -> None:
        self.index.reset()
        self.id_map = []
        self.ntotal = 0

    def reconstruct(self, key: int) -> np.ndarray:
        raise RuntimeError(
            "IndexIDMap cannot reconstruct by external id "
            "(faiss parity); use IndexIDMap2")


class IndexIDMap2(IndexIDMap):
    """IndexIDMap + a hashtable reverse map for O(1) `reconstruct` by
    external id (faiss IndexIDMap2, faiss/IndexIDMap.h rev_map)."""

    def __init__(self, index: Index):
        super().__init__(index)
        self.rev_map: dict = {}

    def construct_rev_map(self) -> None:
        """Rebuild external-id -> internal-row (IndexIDMap2Template::
        construct_rev_map) — call after mutating id_map directly."""
        self.rev_map = {int(e): i for i, e in enumerate(self.id_map)}

    def add_with_ids(self, x, ids) -> None:
        base = len(self.id_map)
        super().add_with_ids(x, ids)
        for i, e in enumerate(np.asarray(ids, np.int64).tolist()):
            self.rev_map[int(e)] = base + i

    def remove_ids(self, sel) -> int:
        n = super().remove_ids(sel)
        if n:
            self.construct_rev_map()
        return n

    def reset(self) -> None:
        super().reset()
        self.rev_map = {}

    def reconstruct(self, key: int) -> np.ndarray:
        try:
            pos = self.rev_map[int(key)]
        except KeyError:
            raise KeyError(f"id {key} not found") from None
        return self.index.reconstruct(pos)


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
