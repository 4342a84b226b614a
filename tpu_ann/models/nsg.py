"""Graph-index alternatives — faiss `IndexNSG{,Flat}` (IndexNSG.{h,cpp})
and `IndexNNDescent{,Flat}` (IndexNNDescent.{h,cpp}).

Both wrap flat storage with a single-level graph; search reuses the
batched level-0 beam of `ops.hnsw` seeded at the NSG medoid (or random
entries for the raw NN-descent graph).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import nndescent as ND
from ..ops.hnsw import beam_search_level0
from .base import Index, SearchStats, Timer
from .flat import IndexFlat


class IndexNNDescentFlat(Index):
    """Flat storage + NN-descent K-NN graph (faiss IndexNNDescentFlat)."""

    def __init__(self, d: int, K: int = 32, metric: int = D.METRIC_L2):
        super().__init__(d, metric)
        self.K = int(K)
        self.nnd_iters = 10
        self.efSearch = 16
        self.storage = IndexFlat(d, metric)
        self.graph: Optional[jnp.ndarray] = None

    def add(self, x) -> None:
        x = self._check_input(x)
        self.storage.add(x)
        self.ntotal = self.storage.ntotal
        self.graph, _ = ND.nn_descent(
            self.storage.vectors, self.K, iters=self.nnd_iters,
            verbose=self.verbose,
        )

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        ef = max(getattr(params, "efSearch", 0) or self.efSearch, k)
        # seed with a few fixed entry points (the reference uses random)
        nq = len(x)
        seeds = jnp.broadcast_to(
            jnp.arange(min(4, self.ntotal), dtype=jnp.int32)[None, :],
            (nq, min(4, self.ntotal)))
        Dv, Iv, _ = beam_search_level0(
            self.storage.vectors, self.graph, jnp.asarray(x), seeds,
            ef=ef, k=k, metric=self.metric_type,
        )
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def reset(self) -> None:
        self.storage.reset()
        self.graph = None
        self.ntotal = 0

    def reconstruct(self, key: int) -> np.ndarray:
        return self.storage.reconstruct(key)


class IndexNSGFlat(Index):
    """Flat storage + NSG graph (faiss IndexNSGFlat): NN-descent k-NN
    graph pruned by the MRNG rule, searched from the medoid."""

    def __init__(self, d: int, R: int = 32, metric: int = D.METRIC_L2):
        super().__init__(d, metric)
        self.R = int(R)
        self.GK = max(2 * R, 32)     # k-NN graph degree fed to the pruner
        self.nnd_iters = 10
        self.efSearch = 16
        self.storage = IndexFlat(d, metric)
        self.graph: Optional[jnp.ndarray] = None
        self.medoid = 0

    def add(self, x) -> None:
        x = self._check_input(x)
        self.storage.add(x)
        self.ntotal = self.storage.ntotal
        knn_g, knn_d = ND.nn_descent(
            self.storage.vectors, self.GK, iters=self.nnd_iters,
            verbose=self.verbose,
        )
        self.graph, med = ND.build_nsg(
            self.storage.vectors, knn_g, knn_d, self.R,
            metric=self.metric_type,
        )
        self.medoid = int(med)

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        ef = max(getattr(params, "efSearch", 0) or self.efSearch, k)
        nq = len(x)
        seeds = jnp.full((nq, 1), self.medoid, jnp.int32)
        Dv, Iv, st = beam_search_level0(
            self.storage.vectors, self.graph, jnp.asarray(x), seeds,
            ef=ef, k=k, metric=self.metric_type,
        )
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def reset(self) -> None:
        self.storage.reset()
        self.graph = None
        self.ntotal = 0

    def reconstruct(self, key: int) -> np.ndarray:
        return self.storage.reconstruct(key)
