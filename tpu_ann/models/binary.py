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
        # per-list membership kept host-side; scan gathers on device
        self._list_codes: Optional[jnp.ndarray] = None

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
        self._repack()

    def _repack(self) -> None:
        from ..ops.ivf_scan import pack_code_invlists

        codes = np.concatenate(self._codes_host, axis=0)
        ids = np.concatenate(self._ids_host, axis=0)
        assign = self._assign(codes)
        self.invlists = pack_code_invlists(
            codes, ids, assign.astype(np.int64), self.nlist, block_size=64
        )

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        _, probes = self.quantizer.search(x, min(self.nprobe, self.nlist))
        il = self.invlists
        xq = jnp.asarray(x)
        # gather probed blocks, popcount distances, top-k (small-scale
        # Hamming scan; block layout shared with the float IVF)
        starts = np.asarray(il.list_block_start)[probes]
        nblk = np.asarray(il.list_nblocks)[probes]
        mnb = il.max_nblocks_per_list
        NB = il.nblocks
        local = np.arange(mnb)[None, None, :]
        blk = np.where(local < nblk[:, :, None], starts[:, :, None] + local,
                       NB).reshape(len(x), -1)
        codes = il.codes[jnp.asarray(blk)]          # (nq, P, B, bytes)
        vids = il.ids[jnp.asarray(blk)]
        nq, P, B, nbytes = codes.shape
        xor = codes ^ xq[:, None, None, :]
        import jax.lax as lax

        dis = jnp.sum(lax.population_count(xor).astype(jnp.int32), axis=-1)
        dis = jnp.where(vids >= 0, dis, 32767)
        dis = dis.reshape(nq, P * B)
        vids = vids.reshape(nq, P * B)
        nv, pos = lax.top_k(-dis, min(k, dis.shape[1]))
        Dv = -np.asarray(nv)
        Iv = np.asarray(jnp.take_along_axis(vids, pos, axis=1), np.int64)
        Iv[Dv >= 32767] = -1
        return Dv, Iv

    def reset(self) -> None:
        self._codes_host, self._ids_host = [], []
        self.invlists = None
        self.ntotal = 0


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
        out = [h]
        if self.nflip >= 1:
            out += [h ^ (1 << i) for i in range(self.b)]
        if self.nflip >= 2:
            out += [h ^ (1 << i) ^ (1 << j)
                    for i in range(self.b) for j in range(i + 1, self.b)]
        return out

    def search(self, x, k: int):
        x = _check_codes(x, self.d)
        nq = len(x)
        Dv = np.full((nq, k), 32767, np.int32)
        Iv = np.full((nq, k), -1, np.int64)
        hashes = self._hash(x)
        lut = np.array([bin(v).count("1") for v in range(256)], np.int32)
        for i in range(nq):
            cand: List[int] = []
            for h in self._candidate_buckets(int(hashes[i])):
                cand.extend(self._buckets.get(h, ()))
            if not cand:
                continue
            cand_a = np.asarray(cand)
            dis = lut[np.bitwise_xor(self._codes[cand_a],
                                     x[i][None, :])].sum(1)
            order = np.argsort(dis)[:k]
            Dv[i, : len(order)] = dis[order]
            Iv[i, : len(order)] = cand_a[order]
        return Dv, Iv

    def reset(self) -> None:
        self._codes = None
        self._buckets = {}
        self.ntotal = 0
