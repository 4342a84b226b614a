"""Long-tail index types — faiss `IndexLSH` (IndexLSH.{h,cpp}),
`IndexRowwiseMinMax` (IndexRowwiseMinMax.{h,cpp}), `MultiIndexQuantizer`
(MetaIndexes/IndexPQ.h IMI), `Index2Layer` (Index2Layer.{h,cpp}),
`IndexSplitVectors` and `IndexRandom` (MetaIndexes.{h,cpp}).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import hamming as H
from ..ops import pq as PQ
from .base import Index
from .binary import IndexBinaryFlat


class IndexLSH(Index):
    """Random-projection binary hashing (faiss IndexLSH: nbits random
    rotations, optional trained thresholds, Hamming search)."""

    def __init__(self, d: int, nbits: int, rotate_data: bool = True,
                 train_thresholds: bool = False):
        super().__init__(d, D.METRIC_L2)
        if nbits % 8:
            raise ValueError("nbits must be a multiple of 8")
        self.nbits = int(nbits)
        self.rotate_data = rotate_data
        self.train_thresholds = train_thresholds
        rs = np.random.RandomState(1234)
        g = rs.randn(d, d)
        q, _ = np.linalg.qr(g)
        # project to nbits dims (repeat rotations if nbits > d)
        reps = -(-nbits // d)
        cols = []
        for r in range(reps):
            if r > 0:
                g = rs.randn(d, d)
                q, _ = np.linalg.qr(g)
            cols.append(q[:, : min(d, nbits - r * d)])
        self.P = np.concatenate(cols, axis=1).astype(np.float32)  # (d, nbits)
        self.thresholds = np.zeros(nbits, np.float32)
        self._bin = IndexBinaryFlat(nbits)
        self.is_trained = not train_thresholds

    def _project(self, x: np.ndarray) -> np.ndarray:
        y = x @ self.P if self.rotate_data else x[:, : self.nbits]
        return y

    def train(self, x) -> None:
        x = self._check_input(x)
        if self.train_thresholds:
            self.thresholds = np.median(self._project(x), axis=0).astype(
                np.float32)
        self.is_trained = True

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        bits = (self._project(x) > self.thresholds).astype(np.uint8)
        return np.asarray(H.pack_bits(jnp.asarray(bits)))

    def add(self, x) -> None:
        self._bin.add(self.sa_encode(x))
        self.ntotal = self._bin.ntotal

    def search(self, x, k: int, *, params=None):
        codes = self.sa_encode(np.asarray(x, np.float32))
        Dv, Iv = self._bin.search(codes, k)
        return Dv.astype(np.float32), Iv

    def range_search(self, x, radius: float):
        """Hamming-radius range search over the hashed codes (faiss
        IndexLSH inherits IndexFlatCodes::range_search with its
        Hamming-grade code distances; distances returned as float like
        search())."""
        import math

        codes = self.sa_encode(np.asarray(x, np.float32))
        # integer Hamming distances: {ham < r} == {ham < ceil(r)}
        lims, dd, ii = self._bin.range_search(codes, math.ceil(radius))
        return lims, dd.astype(np.float32), ii

    def reset(self) -> None:
        self._bin.reset()
        self.ntotal = 0

    def sa_code_size(self) -> int:
        return self.nbits // 8


class IndexRowwiseMinMax(Index):
    """Per-row min/max normalization wrapper (faiss IndexRowwiseMinMax):
    stores (min, scale) per vector plus the sub-index codes of the
    normalized vector."""

    def __init__(self, index: Index):
        super().__init__(index.d, index.metric_type)
        self.index = index
        self.is_trained = index.is_trained
        self._mins: List[np.ndarray] = []
        self._scales: List[np.ndarray] = []

    @staticmethod
    def _normalize(x: np.ndarray):
        mn = x.min(axis=1, keepdims=True)
        mx = x.max(axis=1, keepdims=True)
        scale = np.maximum(mx - mn, 1e-12)
        return ((x - mn) / scale).astype(np.float32), mn.ravel(), scale.ravel()

    def train(self, x) -> None:
        xn, _, _ = self._normalize(self._check_input(x))
        self.index.train(xn)
        self.is_trained = True

    def add(self, x) -> None:
        xn, mn, sc = self._normalize(self._check_input(x))
        self.index.add(xn)
        self._mins.append(mn)
        self._scales.append(sc)
        self.ntotal = self.index.ntotal

    def search(self, x, k: int, *, params=None):
        xn, _, _ = self._normalize(self._check_input(x))
        return self.index.search(xn, k, params=params)

    def range_search(self, x, radius: float):
        """Normalize then forward (same transform as search(); the
        radius is interpreted in the normalized space, matching the
        IndexRowwiseMinMax search semantics)."""
        xn, _, _ = self._normalize(self._check_input(x))
        return self.index.range_search(xn, radius)

    def reconstruct(self, key: int) -> np.ndarray:
        mins = np.concatenate(self._mins)
        scales = np.concatenate(self._scales)
        return self.index.reconstruct(key) * scales[key] + mins[key]

    def reset(self) -> None:
        self.index.reset()
        self._mins, self._scales = [], []
        self.ntotal = 0


class MultiIndexQuantizer(Index):
    """IMI product-space quantizer (faiss MultiIndexQuantizer in
    IndexPQ.h): 'adds' nothing — its virtual database is the cross
    product of M per-subspace codebooks; search enumerates the best
    combined cells (the multi-sequence algorithm, batched here as
    per-subspace top-T + outer-sum + top-k)."""

    def __init__(self, d: int, M: int = 2, nbits: int = 8):
        super().__init__(d, D.METRIC_L2)
        self.M = int(M)
        self.nbits = int(nbits)
        self.pq: Optional[PQ.PQCodec] = None
        self.is_trained = False

    def train(self, x) -> None:
        x = self._check_input(x)
        self.pq = PQ.train_pq(x, self.M, self.nbits)
        self._cent = jnp.asarray(self.pq.centroids)
        self.ntotal = self.pq.ksub ** self.M
        self.is_trained = True

    def add(self, x) -> None:
        raise RuntimeError("MultiIndexQuantizer has a virtual database "
                           "(faiss: add not implemented)")

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        ksub = self.pq.ksub
        tabs = np.asarray(PQ.query_tables(jnp.asarray(x), self._cent))
        nq = len(x)
        if self.M == 1:
            order = np.argsort(tabs[:, 0], axis=1)[:, :k]
            return (np.take_along_axis(tabs[:, 0], order, axis=1),
                    order.astype(np.int64))
        # per-subspace top-T, outer sum over the first two (faiss IMI is
        # almost always M=2); T chosen so T^2 >= 4k candidates
        T = int(min(ksub, max(4, int(np.ceil(np.sqrt(4 * k))))))
        out_d = np.zeros((nq, k), np.float32)
        out_i = np.zeros((nq, k), np.int64)
        o0 = np.argsort(tabs[:, 0], axis=1)[:, :T]
        o1 = np.argsort(tabs[:, 1], axis=1)[:, :T]
        d0 = np.take_along_axis(tabs[:, 0], o0, axis=1)
        d1 = np.take_along_axis(tabs[:, 1], o1, axis=1)
        comb = d0[:, :, None] + d1[:, None, :]
        rest = 0.0
        if self.M > 2:
            # higher subspaces: greedy best cell only (rare configuration)
            rest_ids = np.argmin(tabs[:, 2:], axis=2)        # (nq, M-2)
            rest = np.take_along_axis(
                tabs[:, 2:], rest_ids[:, :, None], axis=2)[:, :, 0].sum(1)
        flat = comb.reshape(nq, T * T)
        order = np.argsort(flat, axis=1)[:, :k]
        out_d = np.take_along_axis(flat, order, axis=1)
        i0 = np.take_along_axis(o0, order // T, axis=1).astype(np.int64)
        i1 = np.take_along_axis(o1, order % T, axis=1).astype(np.int64)
        out_i = i0 * ksub + i1
        if self.M > 2:
            out_d = out_d + np.asarray(rest)[:, None]
            mult = ksub ** (self.M - 2)
            hi = np.zeros(nq, np.int64)
            for m in range(self.M - 2):
                hi = hi * ksub + rest_ids[:, m]
            out_i = out_i * mult + hi[:, None]
        return out_d, out_i

    def reset(self) -> None:
        pass


class Index2Layer(Index):
    """Coarse-id + PQ-residual stored flat (faiss Index2Layer): no
    invlists; convertible to IVFPQ. Search decodes every stored code
    (the reference's search is also brute-force via sa_decode)."""

    def __init__(self, quantizer: Index, nlist: int, M: int,
                 nbits: int = 8):
        super().__init__(quantizer.d, quantizer.metric_type)
        self.q1 = quantizer
        self.nlist = int(nlist)
        self.M = int(M)
        self.nbits = int(nbits)
        self.pq: Optional[PQ.PQCodec] = None
        self._list_ids: List[np.ndarray] = []
        self._codes: List[np.ndarray] = []
        self.is_trained = False

    def train(self, x) -> None:
        x = self._check_input(x)
        from ..ops.kmeans import ClusteringParameters, kmeans

        if self.q1.ntotal != self.nlist:
            cent, _ = kmeans(x, self.nlist,
                             ClusteringParameters(niter=10))
            self.q1.reset()
            self.q1.add(cent)
        _, a = self.q1.search(x, 1)
        cents = np.asarray(self.q1.vectors)
        resid = x - cents[np.asarray(a)[:, 0]]
        self.pq = PQ.train_pq(resid, self.M, self.nbits)
        self._cent = jnp.asarray(self.pq.centroids)
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        _, a = self.q1.search(x, 1)
        a = np.asarray(a)[:, 0]
        cents = np.asarray(self.q1.vectors)
        codes = PQ.pq_encode_chunked(x - cents[a], self._cent)
        self._list_ids.append(a.astype(np.int32))
        self._codes.append(codes)
        self.ntotal += len(x)

    def _decode_all(self) -> np.ndarray:
        cents = np.asarray(self.q1.vectors)
        a = np.concatenate(self._list_ids)
        codes = np.concatenate(self._codes)
        resid = np.asarray(PQ.pq_decode(jnp.asarray(codes), self._cent))
        return cents[a] + resid

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        xb = self._decode_all()
        Dv, Iv = D.knn(jnp.asarray(x), jnp.asarray(xb), k, self.metric_type)
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def range_search(self, x, radius: float):
        """Exact codec-distance range scan over the two-level
        reconstructions (IndexFlatCodes.h:65 role)."""
        from ..ops.range_search import range_search_decoded

        x = self._check_input(x)
        if self.ntotal == 0:
            return (np.zeros(len(x) + 1, np.int64),
                    np.zeros(0, np.float32), np.zeros(0, np.int64))
        xb = self._decode_all()
        res = range_search_decoded(
            x, lambda i0, i1: xb[i0:i1], self.ntotal, radius,
            self.metric_type)
        return res.lims, res.distances, res.labels

    def sa_code_size(self) -> int:
        return 4 + self.M  # int32 list id + M bytes (reference packs tighter)

    def sa_encode(self, x) -> np.ndarray:
        """[list id: little-endian int32][M residual-PQ bytes]
        (Index2Layer::sa_encode layout, code_size_1 + code_size_2)."""
        x = self._check_input(x)
        _, a = self.q1.search(x, 1)
        a = np.asarray(a)[:, 0].astype(np.int32)
        cents = np.asarray(self.q1.vectors)
        codes = PQ.pq_encode_chunked(x - cents[a], self._cent)
        out = np.empty((len(x), 4 + self.M), np.uint8)
        out[:, :4] = a.astype("<i4").reshape(-1, 1).view(np.uint8)
        out[:, 4:] = codes
        return out

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.asarray(codes, np.uint8)
        a = codes[:, :4].copy().view("<i4")[:, 0]
        sub = codes[:, 4:]
        cents = np.asarray(self.q1.vectors)
        resid = np.asarray(PQ.pq_decode(jnp.asarray(sub), self._cent))
        return (cents[a] + resid).astype(np.float32)

    def reset(self) -> None:
        self._list_ids, self._codes = [], []
        self.ntotal = 0

    def to_ivfpq(self):
        """Convert to IndexIVFPQ (IVFlib Index2Layer -> IVFPQ path)."""
        from .ivf_pq import IndexIVFPQ

        idx = IndexIVFPQ(self.q1, self.d, self.nlist, self.M, self.nbits,
                         self.metric_type)
        idx.pq = self.pq
        idx._pq_cent_dev = self._cent
        idx.is_trained = True
        if self.ntotal:
            xb = self._decode_all()
            idx.add(xb)
        return idx


class IndexSplitVectors(Index):
    """Dimension-split concatenation (faiss IndexSplitVectors): distances
    add across sub-indexes over dimension slices."""

    def __init__(self, d: int, threaded: bool = False):
        super().__init__(d, D.METRIC_L2)
        self.sub_indexes: List[Index] = []
        self._dims: List[int] = []

    def add_sub_index(self, index: Index) -> None:
        self.sub_indexes.append(index)
        self._dims.append(index.d)
        if sum(self._dims) > self.d:
            raise ValueError("sub-index dims exceed d")

    def add(self, x) -> None:
        x = self._check_input(x)
        off = 0
        for idx, dd in zip(self.sub_indexes, self._dims):
            idx.add(x[:, off : off + dd])
            off += dd
        self.ntotal = self.sub_indexes[0].ntotal

    def search(self, x, k: int, *, params=None):
        """Exact-sum search: query each sub-index for a large candidate
        pool then re-sum distances (the reference fans out then merges
        best first-subindex candidates)."""
        x = self._check_input(x)
        kk = min(max(4 * k, k), self.ntotal)
        off = 0
        acc: Optional[np.ndarray] = None
        # gather distance of EVERY db item per slice via k=ntotal on sub 0
        # (practical for the meta-index's typical small use)
        total = np.zeros((len(x), self.ntotal), np.float32)
        for idx, dd in zip(self.sub_indexes, self._dims):
            Dv, Iv = idx.search(x[:, off : off + dd], self.ntotal)
            part = np.zeros_like(total)
            np.put_along_axis(part, Iv.astype(np.int64), Dv, axis=1)
            total += part
            off += dd
        order = np.argsort(total, axis=1)[:, :k]
        return np.take_along_axis(total, order, axis=1), order.astype(np.int64)

    def reset(self) -> None:
        for idx in self.sub_indexes:
            idx.reset()
        self.ntotal = 0


class IndexRandom(Index):
    """Deterministic pseudo-random index (faiss IndexRandom, MetaIndexes):
    returns arbitrary but deterministic results — a benchmarking stub."""

    def __init__(self, d: int, ntotal: int = 0, seed: int = 1234):
        super().__init__(d, D.METRIC_L2)
        self.ntotal = int(ntotal)
        self.seed = seed

    def add(self, x) -> None:
        self.ntotal += len(np.atleast_2d(x))

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        rs = np.random.RandomState(self.seed)
        I = rs.randint(0, max(self.ntotal, 1), size=(len(x), k))
        Dv = np.sort(rs.rand(len(x), k).astype(np.float32), axis=1)
        return Dv, I.astype(np.int64)

    def reset(self) -> None:
        self.ntotal = 0
