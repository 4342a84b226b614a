"""Neural-codec indexes — faiss IndexNeuralNetCodec / IndexQINCo
(faiss/IndexNeuralNetCodec.{h,cpp}).

The reference stores bit-packed neural codes in an IndexFlatCodes and
searches by decoding every code (generic IndexFlatCodes::search via
sa_decode). Here decode runs batched on the MXU and search is blockwise
decode + exact GEMM k-NN merge — same asymmetric semantics, device
throughput."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import qinco as Q
from ..ops import topk as T
from .base import Index


class IndexNeuralNetCodec(Index):
    """Flat index over a neural codec with encode/decode hooks
    (IndexNeuralNetCodec.h). Subclasses provide `net_encode`/`net_decode`
    (int32 (n, M) code columns) and `M`, `nbits`."""

    def __init__(self, d: int, M: int, nbits: int,
                 metric: int = D.METRIC_L2):
        super().__init__(d, metric)
        self.M = int(M)
        self.nbits = int(nbits)
        self._codes = np.zeros((0, self.sa_code_size()), np.uint8)
        self.decode_block = 65536

    # --- codec hooks ------------------------------------------------------
    def net_encode(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def net_decode(self, codes: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    # --- codec API --------------------------------------------------------
    def sa_code_size(self) -> int:
        return -(-self.M * self.nbits // 8)

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        return Q.pack_codes(self.net_encode(x), self.nbits)

    def sa_decode(self, codes) -> np.ndarray:
        c = Q.unpack_codes(np.asarray(codes, np.uint8), self.M, self.nbits)
        return self.net_decode(c)

    # --- index API --------------------------------------------------------
    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("codec not ready")
        self._codes = np.concatenate([self._codes, self.sa_encode(x)])
        self.ntotal = len(self._codes)

    def reset(self) -> None:
        self._codes = np.zeros((0, self.sa_code_size()), np.uint8)
        self.ntotal = 0

    def reconstruct_n(self, i0: int, ni: int) -> np.ndarray:
        return self.sa_decode(self._codes[i0:i0 + ni])

    def range_search(self, x, radius: float):
        """Exact codec-distance range scan (IndexFlatCodes.h:65)."""
        from ..ops.range_search import range_search_flatcodes

        return range_search_flatcodes(self, x, radius)

    def reconstruct(self, key: int) -> np.ndarray:
        return self.reconstruct_n(int(key), 1)[0]

    def search(self, x, k: int, *, params: Optional[object] = None):
        """Blockwise decode + exact k-NN merge (IndexFlatCodes::search
        semantics: asymmetric distance to decoded vectors)."""
        x = self._check_input(x)
        if self.ntotal == 0:
            raise RuntimeError("empty index")
        xq = jnp.asarray(x)
        similarity = self.is_similarity
        bad = D.worst_value(self.metric_type)
        nq = len(x)
        bd = jnp.full((nq, k), bad, jnp.float32)
        bi = jnp.full((nq, k), -1, jnp.int32)
        for i0 in range(0, self.ntotal, self.decode_block):
            xb = jnp.asarray(self.sa_decode(self._codes[i0:i0 + self.decode_block]))
            dis, idx = D.knn(xq, xb, min(k, xb.shape[0]),
                             self.metric_type)
            if idx.shape[1] < k:
                pad = k - idx.shape[1]
                dis = jnp.pad(dis, ((0, 0), (0, pad)), constant_values=bad)
                idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
            idx = jnp.where(idx >= 0, idx + i0, -1)
            bd, bi = T.merge_topk(bd, bi, dis, idx, k,
                                  similarity=similarity)
        return np.asarray(bd), np.asarray(bi, np.int64)


class IndexQINCo(IndexNeuralNetCodec):
    """faiss IndexQINCo: QINCo neural residual codec over M-1 refinement
    steps (IndexNeuralNetCodec.h:37-56). `params` is a QINCoParams pytree
    (QINCoParams.random for a deterministic init, .from_arrays to load
    exported PyTorch weights)."""

    def __init__(self, d: int, K: int, L: int, M: int, h: int,
                 metric: int = D.METRIC_L2,
                 params: Optional[Q.QINCoParams] = None):
        nbits = int(np.ceil(np.log2(K)))
        super().__init__(d, M, nbits, metric)
        self.K, self.L, self.h = int(K), int(L), int(h)
        self.qinco = params or Q.QINCoParams.random(d, K, L, M, h)
        self.encode_chunk = 4096

    def net_encode(self, x: np.ndarray) -> np.ndarray:
        return Q.encode_chunked(self.qinco, x, chunk=self.encode_chunk)

    def net_decode(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(Q.qinco_decode(self.qinco,
                                         jnp.asarray(codes, jnp.int32)))
