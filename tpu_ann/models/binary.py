"""Binary (Hamming-space) index family — faiss `IndexBinary` base
(IndexBinary.{h,cpp}), `IndexBinaryFlat`, `IndexBinaryIVF`,
`IndexBinaryFromFloat`.

`d` counts bits (multiple of 8); codes are uint8 rows of d/8 bytes.
IndexBinaryIVF trains its coarse quantizer like the reference: float
k-means over the unpacked bits, centroids re-binarized by majority
(IndexBinaryIVF.cpp train path), with assignment and scans in Hamming
space via the popcount kernels.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import hamming as H
from ..ops.kmeans import ClusteringParameters, kmeans


_POPCNT_LUT = np.array([bin(v).count("1") for v in range(256)], np.int32)


def _hash_flips(h: int, b: int, nflip: int) -> List[int]:
    """Bucket keys within `nflip` bit flips of h over a b-bit prefix
    (shared by IndexBinaryHash and IndexBinaryMultiHash)."""
    out = [h]
    if nflip >= 1:
        out += [h ^ (1 << i) for i in range(b)]
    if nflip >= 2:
        out += [h ^ (1 << i) ^ (1 << j)
                for i in range(b) for j in range(i + 1, b)]
    return out


def _csr_from_hits(nq, hits_d, hits_i):
    """Compact per-query hit lists into the (lims, D, I) CSR triple
    (faiss RangeSearchResult; distances int32 for binary indexes)."""
    from ..ops.range_search import csr_from_hits

    res = csr_from_hits(nq, hits_d, hits_i, dtype=np.int32)
    return res.lims, res.distances, res.labels


def _check_codes(x, d: int) -> np.ndarray:
    x = np.ascontiguousarray(x, np.uint8)
    if x.ndim == 1:
        x = x[None]
    if x.shape[1] != d // 8:
        raise ValueError(f"expected {d // 8} code bytes, got {x.shape[1]}")
    return x


class IndexBinary:
    """Base (faiss IndexBinary: d bits, code_size = d/8, int32 dists)."""

    def __init__(self, d: int):
        if d % 8:
            raise ValueError("binary d must be a multiple of 8")
        self.d = int(d)
        self.code_size = d // 8
        self.ntotal = 0
        self.is_trained = True
        self.verbose = False

    def train(self, x) -> None:
        pass

    def add(self, x) -> None:
        raise NotImplementedError

    def search(self, x, k: int):
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError


class IndexBinaryFlat(IndexBinary):
    """Exhaustive Hamming search (faiss IndexBinaryFlat)."""

    def __init__(self, d: int):
        super().__init__(d)
        self._codes: Optional[jnp.ndarray] = None

    def add(self, x) -> None:
        x = _check_codes(x, self.d)
        xj = jnp.asarray(x)
        self._codes = (xj if self._codes is None
                       else jnp.concatenate([self._codes, xj], axis=0))
        self.ntotal += len(x)

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        if self.ntotal == 0:
            return (np.full((len(x), k), 32767, np.int32),
                    np.full((len(x), k), -1, np.int64))
        Dv, Iv = H.knn_hamming(jnp.asarray(x), self._codes, k)
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def reconstruct(self, key: int) -> np.ndarray:
        return np.asarray(self._codes[key])

    def range_search(self, x, radius: int):
        """All database codes with Hamming distance < radius
        (IndexBinaryFlat::range_search -> hamming_range_search_*,
        utils/hamming.cpp:307 keeps ``dis < radius``)."""
        x = _check_codes(x, self.d)
        nq = len(x)
        if self.ntotal == 0:
            return (np.zeros(nq + 1, np.int64), np.zeros(0, np.int32),
                    np.zeros(0, np.int64))
        import jax.lax as lax

        hits_d = [[] for _ in range(nq)]
        hits_i = [[] for _ in range(nq)]
        db_block = 131072
        for q0 in range(0, nq, 1024):
            q1 = min(q0 + 1024, nq)
            xq = jnp.asarray(x[q0:q1])
            for b0 in range(0, self.ntotal, db_block):
                b1 = min(b0 + db_block, self.ntotal)
                xor = self._codes[b0:b1][None, :, :] ^ xq[:, None, :]
                dis = np.asarray(jnp.sum(
                    lax.population_count(xor).astype(jnp.int32), axis=-1))
                qi, bi = np.nonzero(dis < radius)
                for row in np.unique(qi):
                    sel = qi == row
                    hits_d[q0 + row].append(dis[row, bi[sel]])
                    hits_i[q0 + row].append(b0 + bi[sel])
        return _csr_from_hits(nq, hits_d, hits_i)

    def remove_ids(self, sel) -> int:
        """Remove matching codes; survivors renumber sequentially
        (IndexBinaryFlat::remove_ids / IndexFlatCodes semantics). `sel`
        is an IDSelector or an array of positions."""
        if self.ntotal == 0:
            return 0
        if hasattr(sel, "make_bitmap"):
            keep = sel.make_bitmap(self.ntotal) == 0
        else:
            keep = np.ones(self.ntotal, bool)
            keep[np.asarray(sel, np.int64)] = False
        codes = np.asarray(self._codes)[keep]
        removed = self.ntotal - len(codes)
        self._codes = jnp.asarray(codes) if len(codes) else None
        self.ntotal = len(codes)
        return removed

    def reset(self) -> None:
        self._codes, self.ntotal = None, 0


class IndexBinaryIVF(IndexBinary):
    """IVF in Hamming space (faiss IndexBinaryIVF)."""

    def __init__(self, quantizer: Optional[IndexBinaryFlat], d: int,
                 nlist: int):
        super().__init__(d)
        self.quantizer = quantizer or IndexBinaryFlat(d)
        self.nlist = int(nlist)
        self.nprobe = 1
        self.is_trained = False
        self.cp = ClusteringParameters(niter=10)
        self._codes_host: List[np.ndarray] = []
        self._ids_host: List[np.ndarray] = []
        self._dirty = False
        self.invlists = None

    def train(self, x) -> None:
        """Float k-means on unpacked bits, centroids binarized by majority
        (IndexBinaryIVF::train -> Clustering over binary_to_real data)."""
        x = _check_codes(x, self.d)
        xf = np.asarray(H.unpack_bits(jnp.asarray(x)))
        cent, _ = kmeans(xf, self.nlist, self.cp)
        cent_codes = np.asarray(H.pack_bits(jnp.asarray(cent > 0.5)))
        self.quantizer.reset()
        self.quantizer.add(cent_codes)
        self.is_trained = True

    def _assign(self, x: np.ndarray) -> np.ndarray:
        _, a = self.quantizer.search(x, 1)
        return np.asarray(a)[:, 0]

    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        x = _check_codes(x, self.d)
        ids = np.arange(self.ntotal, self.ntotal + len(x), dtype=np.int64)
        self._codes_host.append(x)
        self._ids_host.append(ids)
        self.ntotal += len(x)
        self._dirty = True   # repack deferred to the next search (the
        # float IVF's chunked-add contract: O(ntotal) once, not per add)

    def _check_ready(self) -> None:
        self._maybe_repack()
        if getattr(self, "invlists", None) is None:
            raise RuntimeError("empty index")

    def _maybe_repack(self) -> None:
        if getattr(self, "_dirty", False):
            self._repack()
            self._dirty = False

    def _repack(self) -> None:
        from ..ops.ivf_scan import pack_code_invlists

        codes = np.concatenate(self._codes_host, axis=0)
        ids = np.concatenate(self._ids_host, axis=0)
        assign = self._assign(codes)
        self.invlists = pack_code_invlists(
            codes, ids, assign.astype(np.int64), self.nlist, block_size=64
        )

    def _probed_distances(self, x: np.ndarray):
        """Hamming distances over the probed blocks: (nq, P*B) int32
        distances (32767 at padding) and matching ids. Shared by search
        and range_search (role of BinaryInvertedListScanner)."""
        import jax.lax as lax

        self._check_ready()
        _, probes = self.quantizer.search(x, min(self.nprobe, self.nlist))
        probes = np.asarray(probes, np.int64)
        il = self.invlists
        xq = jnp.asarray(x)
        # gather probed blocks, popcount distances (small-scale Hamming
        # scan; block layout shared with the float IVF). -1 probe padding
        # (an HNSW quantizer that reached fewer than nprobe lists) scans
        # zero blocks — same guard as the float scan (ops/ivf_scan.py).
        valid = probes >= 0
        safe = np.where(valid, probes, 0)
        starts = np.asarray(il.list_block_start)[safe]
        nblk = np.where(valid, np.asarray(il.list_nblocks)[safe], 0)
        mnb = il.max_nblocks_per_list
        NB = il.nblocks
        local = np.arange(mnb)[None, None, :]
        blk = np.where(local < nblk[:, :, None], starts[:, :, None] + local,
                       NB).reshape(len(x), -1)
        codes = il.codes[jnp.asarray(blk)]          # (nq, P, B, bytes)
        vids = il.ids[jnp.asarray(blk)]
        nq, P, B, nbytes = codes.shape
        xor = codes ^ xq[:, None, None, :]
        dis = jnp.sum(lax.population_count(xor).astype(jnp.int32), axis=-1)
        dis = jnp.where(vids >= 0, dis, 32767)
        return dis.reshape(nq, P * B), vids.reshape(nq, P * B)

    def search(self, x, k: int):
        import jax.lax as lax

        x = _check_codes(x, self.d)
        dis, vids = self._probed_distances(x)
        nv, pos = lax.top_k(-dis, min(k, dis.shape[1]))
        Dv = -np.asarray(nv)
        Iv = np.asarray(jnp.take_along_axis(vids, pos, axis=1), np.int64)
        Iv[Dv >= 32767] = -1
        return Dv, Iv

    def range_search(self, x, radius: int):
        """Hits with Hamming distance < radius over the probed lists
        (IndexBinaryIVF::range_search)."""
        x = _check_codes(x, self.d)
        nq = len(x)
        dis, vids = (np.asarray(a) for a in self._probed_distances(x))
        vids = np.asarray(vids, np.int64)
        hits_d = [[] for _ in range(nq)]
        hits_i = [[] for _ in range(nq)]
        for i in range(nq):
            m = (dis[i] < radius) & (vids[i] >= 0)
            if m.any():
                hits_d[i].append(dis[i][m])
                hits_i[i].append(vids[i][m])
        return _csr_from_hits(nq, hits_d, hits_i)

    def reset(self) -> None:
        self._codes_host, self._ids_host = [], []
        self.invlists = None
        self.ntotal = 0
        self._dirty = False


class IndexBinaryFromFloat(IndexBinary):
    """Wrap a float index to accept binary codes
    (faiss IndexBinaryFromFloat: unpack bits -> float index)."""

    def __init__(self, float_index):
        super().__init__(float_index.d)
        self.index = float_index
        self.is_trained = float_index.is_trained

    def train(self, x) -> None:
        x = _check_codes(x, self.d)
        self.index.train(np.asarray(H.unpack_bits(jnp.asarray(x))))
        self.is_trained = True

    def add(self, x) -> None:
        x = _check_codes(x, self.d)
        self.index.add(np.asarray(H.unpack_bits(jnp.asarray(x))))
        self.ntotal = self.index.ntotal

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        xf = np.asarray(H.unpack_bits(jnp.asarray(x)))
        Dv, Iv = self.index.search(xf, k)
        # float L2 on 0/1 vectors == Hamming distance
        return np.round(Dv).astype(np.int32), Iv

    def reset(self) -> None:
        self.index.reset()
        self.ntotal = 0


class IndexBinaryHNSW(IndexBinary):
    """HNSW in Hamming space (faiss IndexBinaryHNSW).

    L2 distance on unpacked 0/1 vectors equals Hamming distance exactly,
    so the float HNSW engine (bf16 storage to halve the cost) searches the
    binary space with identical semantics; codes are kept packed for
    reconstruction."""

    def __init__(self, d: int, M: int = 16):
        super().__init__(d)
        from .hnsw import IndexHNSWSQ

        self._codes: List[np.ndarray] = []
        self.index = IndexHNSWSQ(d, "bfloat16", M)

    @property
    def hnsw(self):
        return self.index.hnsw

    def add(self, x) -> None:
        x = _check_codes(x, self.d)
        self._codes.append(x)
        self.index.add(np.asarray(H.unpack_bits(jnp.asarray(x))))
        self.ntotal = self.index.ntotal

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        xf = np.asarray(H.unpack_bits(jnp.asarray(x)))
        Dv, Iv = self.index.search(xf, k)
        return np.round(Dv).astype(np.int32), Iv

    def reconstruct(self, key: int) -> np.ndarray:
        return np.concatenate(self._codes)[key]

    def reset(self) -> None:
        self.index.reset()
        self._codes = []
        self.ntotal = 0


class IndexBinaryHash(IndexBinary):
    """Prefix-hash buckets (faiss IndexBinaryHash): vectors bucketed by
    their first b bits; search enumerates buckets within `nflip` bit
    flips of the query prefix and Hamming-scans their union."""

    def __init__(self, d: int, b: int):
        super().__init__(d)
        if b > 24:
            raise ValueError("hash prefix b too large (max 24)")
        self.b = int(b)
        self.nflip = 1
        self._codes: Optional[np.ndarray] = None
        self._buckets: dict = {}

    def _hash(self, codes: np.ndarray) -> np.ndarray:
        bits = np.asarray(H.unpack_bits(jnp.asarray(codes)))[:, : self.b]
        weights = (1 << np.arange(self.b)).astype(np.int64)
        return (bits.astype(np.int64) * weights[None, :]).sum(1)

    def add(self, x) -> None:
        x = _check_codes(x, self.d)
        base = self.ntotal
        self._codes = (x if self._codes is None
                       else np.concatenate([self._codes, x]))
        for i, h in enumerate(self._hash(x)):
            self._buckets.setdefault(int(h), []).append(base + i)
        self.ntotal += len(x)

    def _candidate_buckets(self, h: int) -> List[int]:
        return _hash_flips(h, self.b, self.nflip)

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        nq = len(x)
        Dv = np.full((nq, k), 32767, np.int32)
        Iv = np.full((nq, k), -1, np.int64)
        hashes = self._hash(x)
        for i in range(nq):
            cand: List[int] = []
            for h in self._candidate_buckets(int(hashes[i])):
                cand.extend(self._buckets.get(h, ()))
            if not cand:
                continue
            cand_a = np.asarray(cand)
            dis = _POPCNT_LUT[np.bitwise_xor(self._codes[cand_a],
                                             x[i][None, :])].sum(1)
            order = np.argsort(dis)[:k]
            Dv[i, : len(order)] = dis[order]
            Iv[i, : len(order)] = cand_a[order]
        return Dv, Iv

    def range_search(self, x, radius: int):
        """Hits with Hamming distance < radius among the candidate
        buckets (IndexBinaryHash::range_search,
        IndexBinaryHash.cpp:204)."""
        x = _check_codes(x, self.d)
        nq = len(x)
        hits_d = [[] for _ in range(nq)]
        hits_i = [[] for _ in range(nq)]
        hashes = self._hash(x)
        for i in range(nq):
            cand: List[int] = []
            for h in self._candidate_buckets(int(hashes[i])):
                cand.extend(self._buckets.get(h, ()))
            if not cand:
                continue
            cand_a = np.asarray(cand)
            dis = _POPCNT_LUT[np.bitwise_xor(self._codes[cand_a],
                                             x[i][None, :])].sum(1)
            m = dis < radius
            if m.any():
                hits_d[i].append(dis[m].astype(np.int32))
                hits_i[i].append(cand_a[m].astype(np.int64))
        return _csr_from_hits(nq, hits_d, hits_i)

    def reset(self) -> None:
        self._codes = None
        self._buckets = {}
        self.ntotal = 0


class IndexBinaryMultiHash(IndexBinary):
    """nhash independent prefix-hash tables over consecutive b-bit slices
    of the code (faiss IndexBinaryMultiHash, IndexBinaryHash.h:83-123):
    each vector is registered in every map; search takes the deduplicated
    union of candidates within `nflip` bit flips per map and Hamming-scans
    it against the flat storage."""

    def __init__(self, d: int, nhash: int, b: int):
        super().__init__(d)
        if b > 24:
            raise ValueError("hash prefix b too large (max 24)")
        if nhash * b > d:
            raise ValueError("nhash * b must be <= d")
        self.nhash = int(nhash)
        self.b = int(b)
        self.nflip = 1
        self.storage = IndexBinaryFlat(d)
        self._maps: List[dict] = [{} for _ in range(self.nhash)]
        # host-side mirror of the storage codes: the bucket scan touches
        # only candidate rows, so pulling the whole device array per
        # query batch would dominate it
        self._codes_np: List[np.ndarray] = []

    def _hashes(self, codes: np.ndarray) -> np.ndarray:
        """(n, nhash) int64: hash h is bits [h*b, (h+1)*b)."""
        bits = np.asarray(H.unpack_bits(jnp.asarray(codes)))
        weights = (1 << np.arange(self.b)).astype(np.int64)
        out = np.empty((len(codes), self.nhash), np.int64)
        for h in range(self.nhash):
            sl = bits[:, h * self.b: (h + 1) * self.b]
            out[:, h] = (sl.astype(np.int64) * weights[None, :]).sum(1)
        return out

    def add(self, x) -> None:
        x = _check_codes(x, self.d)
        base = self.ntotal
        self.storage.add(x)
        self._codes_np.append(x)
        hv = self._hashes(x)
        for i in range(len(x)):
            for h in range(self.nhash):
                self._maps[h].setdefault(int(hv[i, h]), []).append(base + i)
        self.ntotal += len(x)

    def _candidates(self, hv_row: np.ndarray) -> np.ndarray:
        cand: set = set()
        for h in range(self.nhash):
            for hh in _hash_flips(int(hv_row[h]), self.b, self.nflip):
                cand.update(self._maps[h].get(hh, ()))
        return np.fromiter(cand, np.int64, len(cand))

    def _scan(self, x, radius=None, k=None):
        nq = len(x)
        if self.ntotal:
            if len(self._codes_np) > 1:
                self._codes_np = [np.concatenate(self._codes_np)]
            codes = self._codes_np[0]
        else:
            codes = None
        hv = self._hashes(x)
        hits_d = [[] for _ in range(nq)]
        hits_i = [[] for _ in range(nq)]
        for i in range(nq):
            cand_a = self._candidates(hv[i])
            if not len(cand_a):
                continue
            dis = _POPCNT_LUT[np.bitwise_xor(codes[cand_a],
                                             x[i][None, :])].sum(1)
            if radius is not None:
                m = dis < radius
                cand_a, dis = cand_a[m], dis[m]
            else:
                order = np.argsort(dis)[:k]
                cand_a, dis = cand_a[order], dis[order]
            if len(cand_a):
                hits_d[i].append(dis.astype(np.int32))
                hits_i[i].append(cand_a)
        return hits_d, hits_i

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        nq = len(x)
        hits_d, hits_i = self._scan(x, k=k)
        Dv = np.full((nq, k), 32767, np.int32)
        Iv = np.full((nq, k), -1, np.int64)
        for i in range(nq):
            if hits_d[i]:
                n = len(hits_d[i][0])
                Dv[i, :n] = hits_d[i][0]
                Iv[i, :n] = hits_i[i][0]
        return Dv, Iv

    def range_search(self, x, radius: int):
        x = _check_codes(x, self.d)
        return _csr_from_hits(len(x), *self._scan(x, radius=radius))

    def hashtable_size(self) -> int:
        return sum(len(m) for m in self._maps)

    def reset(self) -> None:
        self.storage.reset()
        self._maps = [{} for _ in range(self.nhash)]
        self._codes_np = []
        self.ntotal = 0
