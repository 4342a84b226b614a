"""Flat codec indexes — faiss `IndexPQ` / `IndexScalarQuantizer`
(IndexPQ.{h,cpp}, IndexScalarQuantizer.{h,cpp}).

Codes live as one device array; search decodes against the query on the
fly: PQ via per-query ADC tables + LUT gather (the role of
`ProductQuantizer::compute_distance_table` + code_distance loops), SQ via
VPU dequantize + MXU GEMM. Both are `IndexFlatCodes` descendants in the
reference; here they share the capacity-padded storage idiom of IndexFlat.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import distances as D
from ..ops import pq as PQ
from ..ops import sq as SQ
from ..ops import topk as T
from .base import Index, next_pow2


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "db_block", "packed4"))
def _lut_knn(lut, codes, k: int, metric: int, valid_n,
             db_block: int = 65536, packed4: bool = False):
    """Blocked LUT-sum k-NN over a flat code array given a per-query
    (M, ksub) table — shared by ADC (query_tables) and SDC
    (sdc_query_tables) searches; packed4 unpacks two 4-bit sub-indices
    per byte in-kernel."""
    nq = lut.shape[0]
    nb = codes.shape[0]
    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)

    block = min(db_block, max(nb, 1))
    nblocks = -(-nb // block)
    pad = nblocks * block - nb
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
    codes_r = codes.reshape(nblocks, block, -1)

    def body(i, carry):
        bd, bi = carry
        raw = codes_r[i]
        if packed4:
            raw = PQ.unpack_codes_4bit(raw)
        dis = PQ.adc_scan_db(lut, raw)                   # (nq, block)
        ids = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
        dis = jnp.where(ids < valid_n, dis, bad)
        ids = jnp.broadcast_to(ids, dis.shape)
        return T.merge_topk(bd, bi, dis, ids, k, similarity=similarity)

    init = (jnp.full((nq, k), bad, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    bd, bi = lax.fori_loop(0, nblocks, body, init)
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)


def _pq_knn(xq, codes, centroids, k: int, metric: int, valid_n,
            db_block: int = 65536, packed4: bool = False):
    """Exact ADC k-NN over a flat code array (IndexPQ::search)."""
    lut = PQ.query_tables(xq, centroids, metric)         # (nq, M, ksub)
    return _lut_knn(lut, codes, k, metric, valid_n, db_block=db_block,
                    packed4=packed4)


class IndexPQ(Index):
    """faiss IndexPQ(d, M, nbits): flat PQ codes + ADC search.

    search_type selects the IndexPQ search strategies (IndexPQ.h
    Search_type_t): ST_PQ (asymmetric ADC, default), ST_polysemous
    (Hamming-on-codes filter with threshold `polysemous_ht` before ADC —
    requires `do_polysemous_training`), ST_SDC (symmetric code-to-code).
    """

    ST_PQ = 0
    ST_POLYSEMOUS = 1
    ST_SDC = 2

    def __init__(self, d: int, M: int, nbits: int = 8,
                 metric: int = D.METRIC_L2):
        super().__init__(d, metric)
        self.M = int(M)
        self.nbits = int(nbits)
        self.pq: Optional[PQ.PQCodec] = None
        self._codes: Optional[jnp.ndarray] = None
        self._capacity = 0
        self.is_trained = False
        self.search_type = self.ST_PQ
        # polysemous knobs (IndexPQ.h: polysemous_ht; PolysemousTraining)
        self.do_polysemous_training = False
        self.polysemous_ht = 0          # 0 = filter off (M*nbits+1, IndexPQ.cpp:330)
        self.polysemous_iters = 20000
        self._sdc: Optional[jnp.ndarray] = None
        # decoded cache — fast 8-bit ADC for the flat scan (same cure as
        # ops.ivf_scan.decode_code_invlists): reconstructions kept as a
        # bf16 row buffer so ST_PQ search is one blocked GEMM knn instead
        # of per-code LUT gathers. Maintained INCREMENTALLY at add time.
        # None = auto (on for ksub > 16 within the byte budget).
        self.use_decoded_cache: Optional[bool] = None
        self.decoded_cache_max_bytes: int = 2 << 30
        self._dec_buf: Optional[jnp.ndarray] = None

    def train(self, x) -> None:
        x = self._check_input(x)
        self.pq = PQ.train_pq(x, self.M, self.nbits, verbose=self.verbose)
        if self.do_polysemous_training:
            from ..ops.polysemous import optimize_pq_for_hamming

            self.pq.centroids = optimize_pq_for_hamming(
                self.pq.centroids, n_iter=self.polysemous_iters)
        self._centroids_dev = jnp.asarray(self.pq.centroids)
        self._sdc = None          # SDC tables belong to the old codebook
        self.is_trained = True

    @property
    def _packed4(self) -> bool:
        return self.nbits == 4

    def _code_width(self) -> int:
        return (self.M + 1) // 2 if self._packed4 else self.M

    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        x = self._check_input(x)
        n = len(x)
        # chunked driver: an unchunked (n, M*ksub) ip matrix OOMs at
        # 10M rows x 32x8-bit (measured on-chip, RESOURCE_EXHAUSTED)
        codes = jnp.asarray(
            PQ.pq_encode_chunked(x, self._centroids_dev))
        if self._packed4:
            codes = PQ.pack_codes_4bit(codes)
        need = self.ntotal + n
        if need > self._capacity:
            cap = max(next_pow2(need), 1024)
            buf = jnp.zeros((cap, self._code_width()), jnp.uint8)
            if self._codes is not None and self.ntotal:
                buf = buf.at[: self.ntotal].set(self._codes[: self.ntotal])
            self._codes, self._capacity = buf, cap
            if self._dec_buf is not None:
                dbuf = jnp.zeros((cap, self.d), jnp.bfloat16)
                dbuf = dbuf.at[: self.ntotal].set(
                    self._dec_buf[: self.ntotal])
                self._dec_buf = dbuf
        if self._cache_enabled():
            self._ensure_dec_buf()
            dec = PQ.pq_decode_chunked(
                PQ.unpack_codes_4bit(codes) if self._packed4 else codes,
                self._centroids_dev, dtype=jnp.bfloat16)
            self._dec_buf = self._dec_buf.at[self.ntotal: need].set(dec)
        self._codes = self._codes.at[self.ntotal : need].set(codes)
        self.ntotal = need

    def _cache_enabled(self) -> bool:
        if self.use_decoded_cache is not None:
            return bool(self.use_decoded_cache)
        if (1 << self.nbits) <= 16:
            return False
        return self._capacity * self.d * 2 <= self.decoded_cache_max_bytes

    def _ensure_dec_buf(self) -> None:
        """(Re)build the decoded row buffer — backfills rows added before
        the cache was enabled, and indexes restored from disk."""
        if self._dec_buf is not None and \
                self._dec_buf.shape[0] == self._capacity:
            return
        self._dec_buf = jnp.zeros((self._capacity, self.d), jnp.bfloat16)
        if self.ntotal:
            old = self._codes[: self.ntotal]
            if self._packed4:
                old = PQ.unpack_codes_4bit(old)
            self._dec_buf = self._dec_buf.at[: self.ntotal].set(
                PQ.pq_decode_chunked(old, self._centroids_dev,
                                     dtype=jnp.bfloat16))

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        if self.ntotal == 0:
            bad = -np.inf if self.is_similarity else np.inf
            return (np.full((len(x), k), bad, np.float32),
                    np.full((len(x), k), -1, np.int64))
        if self.search_type == self.ST_POLYSEMOUS:
            from ..ops.polysemous import polysemous_knn

            # ht=0 disables the filter: IndexPQ.cpp:330 maps 0 to
            # nbits*M + 1 (every code passes)
            ht = self.polysemous_ht or (self.M * self.nbits + 1)
            Dv, Iv, npass = polysemous_knn(
                jnp.asarray(x), self._codes, self._centroids_dev, k,
                int(ht), jnp.int32(self.ntotal))
            # npass is a per-block int32 vector; int64 host sum is exact
            # at any nq*ntotal scale (advisor finding: a single f32
            # accumulator lost exactness past 2^24)
            self.last_hamming_pass = int(
                np.asarray(npass).astype(np.int64).sum())
            return np.asarray(Dv), np.asarray(Iv, np.int64)
        if self.search_type == self.ST_SDC:
            Dv, Iv = self._sdc_knn(jnp.asarray(x), k)
            return np.asarray(Dv), np.asarray(Iv, np.int64)
        if self._cache_enabled():
            # fast 8-bit ADC: one blocked GEMM knn over the decoded rows
            # (identical distances to the LUT sum; reduction order aside)
            self._ensure_dec_buf()
            Dv, Iv = D.knn(jnp.asarray(x), self._dec_buf, k,
                           self.metric_type, compute_dtype="bfloat16",
                           valid_n=jnp.int32(self.ntotal))
            return np.asarray(Dv), np.asarray(Iv, np.int64)
        Dv, Iv = _pq_knn(jnp.asarray(x), self._codes, self._centroids_dev,
                         k, self.metric_type, jnp.int32(self.ntotal),
                         packed4=self._packed4)
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def _sdc_knn(self, xq, k: int):
        """Symmetric search: encode queries, per-query SDC LUT, same
        blocked LUT scan as ADC (IndexPQ ST_SDC)."""
        if self._sdc is None:
            self._sdc = PQ.sdc_tables(self._centroids_dev)
        qcodes = PQ.pq_encode(xq, self._centroids_dev)
        lut = PQ.sdc_query_tables(qcodes, self._sdc)
        return _lut_knn(lut, self._codes, k, self.metric_type,
                        jnp.int32(self.ntotal), packed4=self._packed4)

    def range_search(self, x, radius: float):
        """faiss IndexFlatCodes::range_search (IndexFlatCodes.h:65) —
        exact codec-distance range scan: decode blockwise, keep hits
        within the radius. Returns the (lims, D, I) CSR triple."""
        from ..ops.range_search import range_search_decoded

        x = self._check_input(x)
        if self.ntotal == 0:
            return (np.zeros(len(x) + 1, np.int64),
                    np.zeros(0, np.float32), np.zeros(0, np.int64))

        def decode_block(i0, i1):
            c = self._codes[i0:i1]
            if self._packed4:
                c = PQ.unpack_codes_4bit(c)
            return PQ.pq_decode(c, self._centroids_dev)

        res = range_search_decoded(x, decode_block, self.ntotal, radius,
                                   self.metric_type)
        return res.lims, res.distances, res.labels

    def reset(self) -> None:
        self._codes, self._capacity, self.ntotal = None, 0, 0
        self._sdc = None
        self._dec_buf = None

    # --- codec API --------------------------------------------------------
    def sa_code_size(self) -> int:
        if self.pq is not None:
            return self.pq.code_size
        # known at construction (ProductQuantizer.h code_size)
        return (self.M + 1) // 2 if self.nbits == 4 else self.M

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        codes = jnp.asarray(
            PQ.pq_encode_chunked(x, self._centroids_dev))
        if self._packed4:
            codes = PQ.pack_codes_4bit(codes)
        return np.asarray(codes)

    def sa_decode(self, codes) -> np.ndarray:
        codes = jnp.asarray(np.ascontiguousarray(codes, np.uint8))
        if self._packed4:
            codes = PQ.unpack_codes_4bit(codes)
        return np.asarray(PQ.pq_decode(codes, self._centroids_dev))

    def reconstruct(self, key: int) -> np.ndarray:
        return self.sa_decode(np.asarray(self._codes[key : key + 1]))[0]


class IndexScalarQuantizer(Index):
    """faiss IndexScalarQuantizer(d, qtype): flat SQ codes."""

    def __init__(self, d: int, qtype: int = SQ.QT_8BIT,
                 metric: int = D.METRIC_L2):
        super().__init__(d, metric)
        self.qtype = int(qtype)
        self.sq: Optional[SQ.SQCodec] = None
        self._codes: Optional[jnp.ndarray] = None
        self.is_trained = qtype in (SQ.QT_FP16, SQ.QT_BF16,
                                    SQ.QT_8BIT_DIRECT,
                                    SQ.QT_8BIT_DIRECT_SIGNED)
        if self.is_trained:
            self.sq = SQ.SQCodec(qtype=self.qtype, d=d)

    def train(self, x) -> None:
        x = self._check_input(x)
        self.sq = SQ.train_sq(x, self.qtype)
        self.is_trained = True

    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        x = self._check_input(x)
        codes = SQ.sq_encode(jnp.asarray(x), self.sq)
        if self._codes is None:
            self._codes = codes
        else:
            self._codes = jnp.concatenate([self._codes, codes], axis=0)
        self.ntotal += len(x)

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        if self.ntotal == 0:
            bad = -np.inf if self.is_similarity else np.inf
            return (np.full((len(x), k), bad, np.float32),
                    np.full((len(x), k), -1, np.int64))
        xb = SQ.sq_decode(self._codes, self.sq)
        Dv, Iv = D.knn(jnp.asarray(x), xb, k, self.metric_type)
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def range_search(self, x, radius: float):
        """Exact SQ-codec range scan (IndexFlatCodes.h:65 role)."""
        from ..ops.range_search import range_search_decoded

        x = self._check_input(x)
        if self.ntotal == 0:
            return (np.zeros(len(x) + 1, np.int64),
                    np.zeros(0, np.float32), np.zeros(0, np.int64))

        def decode_block(i0, i1):
            return SQ.sq_decode(self._codes[i0:i1], self.sq)

        res = range_search_decoded(x, decode_block, self.ntotal, radius,
                                   self.metric_type)
        return res.lims, res.distances, res.labels

    def reset(self) -> None:
        self._codes, self.ntotal = None, 0

    def sa_code_size(self) -> int:
        # known at construction (ScalarQuantizer.cpp set_derived_sizes)
        return (self.sq or SQ.SQCodec(qtype=self.qtype, d=self.d)).code_size

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        codes = np.asarray(SQ.sq_encode(jnp.asarray(x), self.sq))
        if codes.dtype != np.uint8:
            # fp16/bf16 code dtypes: sa codes are raw bytes
            codes = np.ascontiguousarray(codes).view(np.uint8)
        return codes

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.asarray(codes)
        if codes.dtype == np.uint8 and self.qtype in (SQ.QT_FP16,
                                                      SQ.QT_BF16):
            codes = np.ascontiguousarray(codes).view(
                np.float16 if self.qtype == SQ.QT_FP16
                else np.dtype(jnp.bfloat16))
        return np.asarray(SQ.sq_decode(jnp.asarray(codes), self.sq))

    def reconstruct(self, key: int) -> np.ndarray:
        return self.sa_decode(np.asarray(self._codes[key : key + 1]))[0]
