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


class _IndexNSGCoded(IndexNSGFlat):
    """Shared plumbing for NSG over coded storage (faiss IndexNSG.h:91,104:
    IndexNSGPQ / IndexNSGSQ — a coded index under the NSG graph).

    TPU redesign: the codes are the AUTHORITY (io, reconstruct, memory
    accounting), while graph build and beam search run over the decoded
    reconstructions kept as a dense device array — the batched-beam
    equivalent of the reference's per-hop DistanceComputer decode
    (IndexNSG.cpp storage_distance_computer). Search results are
    identical to decoding on the fly because every distance the
    reference computes is against the same reconstruction.
    """

    def __init__(self, d: int, R: int = 32, metric: int = D.METRIC_L2):
        super().__init__(d, R, metric)
        self.is_trained = False
        self._codes: Optional[np.ndarray] = None

    # codec hooks ----------------------------------------------------------
    def _encode(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _decode(self, codes: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def sa_encode(self, x) -> np.ndarray:
        return np.asarray(self._encode(self._check_input(x)))

    def sa_decode(self, codes) -> np.ndarray:
        return np.asarray(self._decode(np.asarray(codes)), np.float32)

    # index surface --------------------------------------------------------
    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add() (IndexNSG coded)")
        x = self._check_input(x)
        codes = np.asarray(self._encode(x))
        self._codes = (codes if self._codes is None
                       else np.concatenate([self._codes, codes], axis=0))
        # NSG rebuilds the whole graph on add (IndexNSGFlat semantics);
        # storage holds the reconstructions the graph + beam search see
        self.storage.reset()
        self.storage.add(np.asarray(self._decode(self._codes), np.float32))
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

    def reset(self) -> None:
        super().reset()
        self._codes = None

    def reconstruct(self, key: int) -> np.ndarray:
        return np.asarray(
            self._decode(self._codes[key:key + 1])[0], np.float32)


class IndexNSGPQ(_IndexNSGCoded):
    """faiss IndexNSGPQ(d, pq_m, M, pq_nbits) (IndexNSG.h:91-96): PQ codes
    under an NSG graph. `R` is the graph degree (the reference's M)."""

    def __init__(self, d: int, pq_m: int, R: int = 32, nbits: int = 8,
                 metric: int = D.METRIC_L2):
        super().__init__(d, R, metric)
        self.pq_m = int(pq_m)
        self.nbits = int(nbits)
        self.pq = None

    def train(self, x) -> None:
        from ..ops import pq as PQ

        x = self._check_input(x)
        self.pq = PQ.train_pq(x, self.pq_m, self.nbits,
                              verbose=self.verbose)
        self.is_trained = True

    def _encode(self, x):
        from ..ops import pq as PQ

        return PQ.pq_encode_chunked(x, jnp.asarray(self.pq.centroids))

    def _decode(self, codes):
        from ..ops import pq as PQ

        return PQ.pq_decode_chunked(codes, jnp.asarray(self.pq.centroids))

    def sa_code_size(self) -> int:
        return self.pq_m * self.nbits // 8


class IndexNSGSQ(_IndexNSGCoded):
    """faiss IndexNSGSQ(d, qtype, M, metric) (IndexNSG.h:101-110): scalar-
    quantizer codes under an NSG graph."""

    def __init__(self, d: int, qtype: Optional[int] = None, R: int = 32,
                 metric: int = D.METRIC_L2):
        from ..ops import sq as SQ

        super().__init__(d, R, metric)
        self.qtype = SQ.QT_8BIT if qtype is None else int(qtype)
        self.sq = None
        if self.qtype in (SQ.QT_FP16, SQ.QT_BF16, SQ.QT_8BIT_DIRECT,
                          SQ.QT_8BIT_DIRECT_SIGNED):
            self.sq = SQ.SQCodec(qtype=self.qtype, d=d)
            self.is_trained = True

    def train(self, x) -> None:
        from ..ops import sq as SQ

        x = self._check_input(x)
        self.sq = SQ.train_sq(x, self.qtype)
        self.is_trained = True

    def _encode(self, x):
        from ..ops import sq as SQ

        return np.asarray(SQ.sq_encode(jnp.asarray(x), self.sq))

    def _decode(self, codes):
        from ..ops import sq as SQ

        return np.asarray(SQ.sq_decode(jnp.asarray(codes), self.sq),
                          np.float32)

    def sa_code_size(self) -> int:
        return self.sq.code_size
