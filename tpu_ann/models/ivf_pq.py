"""IVF + codec indexes — faiss `IndexIVFPQ` (IndexIVFPQ.{h,cpp}) and
`IndexIVFScalarQuantizer` (IndexIVFScalarQuantizer in
IndexScalarQuantizer.{h,cpp}).

Invlists store codes in the block-padded layout
(`ops.ivf_scan.PackedCodeInvLists`); the scan decodes in-kernel:
PQ via per-(query, probe) residual ADC tables (the use_precomputed_table=0
path of IndexIVFPQ.cpp) and SQ via VPU dequantize + contraction.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import ivf_scan
from ..ops import pq as PQ
from ..ops import sq as SQ
from . import base
from .base import SearchStats, Timer
from .flat import IndexFlat
from .ivf import IndexIVF, SearchParametersIVF


class IndexIVFPQ(IndexIVF):
    """IVF with PQ-coded residual invlists (faiss IndexIVFPQ)."""

    def __init__(self, quantizer, d: int, nlist: int, M: int,
                 nbits: int = 8, metric: int = D.METRIC_L2,
                 block_size: int = 128):
        super().__init__(quantizer, d, nlist, metric, block_size)
        self.M = int(M)
        self.nbits = int(nbits)
        self.pq: Optional[PQ.PQCodec] = None
        self.by_residual = True
        # Decoded cache — the fast 8-bit ADC (see
        # ops.ivf_scan.decode_code_invlists): reconstructions of the codes
        # kept as a parallel raw-vector invlist so scans run at IVFFlat /
        # fused-kernel speed while computing exactly the ADC distance.
        # None = auto (on for ksub > 16, where the one-hot MXU contraction
        # stops being competitive, when the cache fits the size budget);
        # True/False force it. The cache is derived state: rebuilt lazily
        # after add/load/merge, never serialized.
        self.use_decoded_cache: Optional[bool] = None
        self.decoded_cache_max_bytes: int = 8 << 30
        self.decoded_cache_dtype = "bfloat16"
        self._decoded = None
        self._decoded_for = None

    # --- training ---------------------------------------------------------
    def train_encoder(self, x: np.ndarray) -> None:
        """PQ on residuals (IndexIVFPQ::train_encoder)."""
        if self.by_residual and self.metric_type == D.METRIC_L2:
            assign = self._assign(x)
            cent = np.asarray(self._coarse_centroids())
            xt = x - cent[assign]
        else:
            xt = x
        self.pq = PQ.train_pq(xt, self.M, self.nbits, verbose=self.verbose)
        self._pq_cent_dev = jnp.asarray(self.pq.centroids)

    # --- encoding / packing ----------------------------------------------
    def _coarse_centroids(self) -> jnp.ndarray:
        q = self.quantizer
        if hasattr(q, "vectors"):
            vecs = q.vectors
        elif hasattr(q, "storage"):
            vecs = q.storage.vectors
        else:
            # virtual quantizer (AdditiveCoarseQuantizer): materialize
            # by decoding — bounded by its own enumeration guard
            import numpy as _np

            vecs = q.reconstruct_batch(_np.arange(self.nlist))
        return jnp.asarray(vecs)

    def _encode(self, x: np.ndarray, assign: np.ndarray) -> np.ndarray:
        # chunked: pq_encode materializes an (n, M*ksub) ip matrix, so the
        # chunk must scale with the codebook width — 1M rows at 8-bit
        # (M*ksub = 8192) is a 33 GB buffer on a 16 GB chip
        outs = []
        CH = max(65536, min(1_000_000,
                            (2 << 30) // (self.M * (1 << self.nbits) * 4)))
        for i in range(0, len(x), CH):
            xj = jnp.asarray(x[i:i + CH])
            if self.by_residual and self.metric_type == D.METRIC_L2:
                cent = self._coarse_centroids()
                xj = xj - cent[jnp.asarray(assign[i:i + CH])]
            codes = PQ.pq_encode(xj, self._pq_cent_dev)
            if self.nbits == 4:
                codes = PQ.pack_codes_4bit(codes)
            outs.append(np.asarray(codes))
        return (np.concatenate(outs) if outs
                else np.zeros((0, 0), np.uint8))

    def _pack(self, x, ids, assign):
        self._decoded = self._decoded_for = None   # free stale cache now
        codes = self._encode(x, assign)
        return ivf_scan.pack_code_invlists(codes, ids, assign, self.nlist,
                                           self.block_size)

    # --- decoded cache ----------------------------------------------------
    def _cache_enabled(self) -> bool:
        if self.use_decoded_cache is not None:
            return bool(self.use_decoded_cache)
        if self.invlists is None or (1 << self.nbits) <= 16:
            return False
        isize = (1 if self.decoded_cache_dtype == "sq8"
                 else jnp.dtype(self.decoded_cache_dtype).itemsize)
        nbytes = ((self.invlists.nblocks + 1) * self.block_size
                  * self.d * isize)
        return nbytes <= self.decoded_cache_max_bytes

    def _decoded_cache(self):
        """Lazily (re)build the decoded cache for the current invlists.
        decoded_cache_dtype: float32 / bfloat16 / 'sq8' (uint8 codes +
        per-dim affine — QUARTER the f32 bytes, and the fused kernel
        streams them at half its bf16 byte rate)."""
        if not self._cache_enabled():
            return None
        if self._decoded is not None and self._decoded_for is self.invlists:
            return self._decoded
        cent = (self._coarse_centroids()
                if self.by_residual and self.metric_type == D.METRIC_L2
                else None)
        sq8 = self.decoded_cache_dtype == "sq8"
        dec = ivf_scan.decode_code_invlists(
            self.invlists, self._pq_cent_dev, cent,
            packed4=self.nbits == 4,
            dtype=jnp.bfloat16 if sq8
            else jnp.dtype(self.decoded_cache_dtype))
        if sq8:
            dec = ivf_scan.sq8_requantize_invlists(dec)
        self._decoded = dec
        self._decoded_for = self.invlists
        return self._decoded

    # --- search -----------------------------------------------------------
    def _scan_device(self, xq_dev, probes, cd, k: int, mnb: int,
                     id_mask=None):
        dl = self._decoded_cache()
        if dl is not None:
            # fast 8-bit ADC: scan the decoded cache with the flat-path
            # kernels (fused Pallas stream when it applies)
            if self._use_fused(xq_dev.shape[0], probes.shape[1], mnb,
                               id_mask, invlists=dl):
                from ..ops.ivf_scan_pallas import scan_invlists_fused

                try:
                    return scan_invlists_fused(
                        xq_dev, probes, dl, k, self.metric_type)
                except Exception:
                    if self.scan_mode == "fused":
                        raise
            return ivf_scan.scan_invlists(
                xq_dev, probes, dl, k, self.metric_type,
                max_nblocks=mnb, id_mask=id_mask, approx=self.approx_topk)
        return ivf_scan.scan_invlists_pq(
            xq_dev,
            probes,
            cd.astype(jnp.float32),
            self.invlists,
            self._pq_cent_dev,
            self._coarse_centroids(),
            k,
            self.metric_type,
            by_residual=self.by_residual,
            max_nblocks=mnb,
            id_mask=id_mask,
            packed4=self.nbits == 4,
            approx=self.approx_topk,
        )

    def _search_device(self, xq_dev, k: int, nprobe: int, mnb: int,
                       id_mask=None):
        cd, probes = self._coarse_search_device(xq_dev, nprobe)
        Dv, Iv, _ = self._scan_device(xq_dev, probes.astype(jnp.int32), cd,
                                      k, mnb, id_mask=id_mask)
        return Dv, Iv

    def _scan_probes_device(self, xq_dev, probes, cd, k: int, mnb: int,
                            id_mask=None):
        Dv, Iv, _ = self._scan_device(xq_dev, probes, cd, k, mnb,
                                      id_mask=id_mask)
        return Dv, Iv

    def search_stats(self, x, k: int, *,
                     params: Optional[SearchParametersIVF] = None):
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        import jax

        x = self._check_input(x)
        nprobe, mnb = self._effective_params(params)
        xq_dev = jnp.asarray(x)
        with Timer() as t_q:
            cd, probes = self._coarse_search_device(xq_dev, nprobe)
            probes = probes.astype(jnp.int32)
            # scalar readback: jax.block_until_ready does not
            # reliably block on the axon platform (verify-skill
            # caveat), which mis-attributed the phase split
            # (r5_queue4); a 4-byte download is a real fence
            np.asarray(probes[:1, :1])
        with Timer() as t_s:
            Dv, Iv, ndis = self._scan_device(xq_dev, probes, cd, k, mnb)
            Dv = np.asarray(Dv)
            Iv = self._map_ids(Iv)
        stats = SearchStats(
            nq=len(x), total_us=t_q.us + t_s.us,
            quantization_us=t_q.us, list_scan_us=t_s.us,
            ndis=int(ndis), nlist_visited=len(x) * nprobe,
        )
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats

    def range_search(self, x, radius: float):
        """IVF-PQ range search (faiss IndexIVFFastScan::range_search,
        IndexIVFFastScan.h:140, which 4-bit codes here route through
        too): probed codes are decoded to f32 reconstructions — the
        exact ADC distance (see decode_code_invlists) — and the IVF
        radius scan keeps every hit. Same coarse path as search()."""
        from ..ops.range_search import range_search_ivf

        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        nprobe, mnb = self._effective_params(None)
        _, probes = self._coarse_search_device(jnp.asarray(x), nprobe)
        cent = (self._coarse_centroids()
                if self.by_residual and self.metric_type == D.METRIC_L2
                else None)
        dec = ivf_scan.decode_code_invlists(
            self.invlists, self._pq_cent_dev, cent,
            packed4=self.nbits == 4, dtype=jnp.float32)
        res = range_search_ivf(
            x, np.asarray(probes, np.int32), dec, radius,
            self.metric_type, max_nblocks=mnb)
        return res.lims, res.distances, self._map_ids(res.labels)

    def reconstruct(self, key: int) -> np.ndarray:
        # decode from host copy path (DirectMap role)
        self._maybe_repack()
        for xs, ids in zip(self._xb_host, self._ids_host):
            hit = np.nonzero(ids == key)[0]
            if hit.size:
                return xs[hit[0]]
        raise KeyError(key)

    # --- standalone codec: listno prefix + PQ codes of the (residual)
    #     vector (IndexIVFPQ::encode_vectors / sa_decode) ----------------
    def _sa_payload_size(self) -> int:
        return (self.M + 1) // 2 if self.nbits == 4 else self.M

    def _sa_encode_payload(self, x, assign) -> np.ndarray:
        return self._encode(np.asarray(x, np.float32),
                            np.asarray(assign))

    def _sa_decode_payload(self, payload, listno) -> np.ndarray:
        codes = jnp.asarray(np.ascontiguousarray(payload))
        if self.nbits == 4:
            codes = PQ.unpack_codes_4bit(codes)[:, :self.M]
        x = np.asarray(PQ.pq_decode(codes, self._pq_cent_dev),
                       np.float32)
        if self.by_residual and self.metric_type == D.METRIC_L2:
            cent = np.asarray(self._coarse_centroids())
            x = x + cent[np.asarray(listno)]
        return x


class IndexIVFPQR(IndexIVFPQ):
    """IVFPQ + second-level refinement PQ (faiss IndexIVFPQR,
    faiss/IndexIVFPQ.h / IndexIVFPQR.cpp): a `refine_pq` codes the
    residual left after the first PQ; search fetches k*k_factor
    candidates with the base ADC scan, reconstructs them through both
    codebooks (coarse + pq + refine_pq) and re-ranks exactly.

    TPU layout: refine re-ranking is random-access by row, so base and
    refine codes are ALSO kept as flat row-indexed device arrays
    (bytes-per-row gathers + one (nq, kk, d) decode contraction)."""

    def __init__(self, quantizer, d: int, nlist: int, M: int,
                 nbits: int = 8, M_refine: int = 8, nbits_refine: int = 8,
                 metric: int = D.METRIC_L2, block_size: int = 128):
        super().__init__(quantizer, d, nlist, M, nbits, metric, block_size)
        self.M_refine = int(M_refine)
        self.nbits_refine = int(nbits_refine)
        self.refine_pq: Optional[PQ.PQCodec] = None
        self.k_factor = 4          # faiss IndexIVFPQR::k_factor default
        self._row_codes = None     # (n, M) uint8 device
        self._row_refine = None    # (n, M_refine) uint8 device
        self._row_assign = None    # (n,) int32 device

    def train_encoder(self, x: np.ndarray) -> None:
        super().train_encoder(x)
        assign = self._assign(x)
        xj = jnp.asarray(x)
        if self.by_residual and self.metric_type == D.METRIC_L2:
            xj = xj - self._coarse_centroids()[jnp.asarray(assign)]
        codes = PQ.pq_encode(xj, self._pq_cent_dev)
        r2 = np.asarray(xj - PQ.pq_decode(codes, self._pq_cent_dev))
        self.refine_pq = PQ.train_pq(r2, self.M_refine, self.nbits_refine,
                                     verbose=self.verbose)
        self._refine_cent_dev = jnp.asarray(self.refine_pq.centroids)

    def _pack(self, x, ids, assign):
        self._decoded = self._decoded_for = None
        xj = jnp.asarray(x)
        aj = jnp.asarray(np.asarray(assign, np.int64))
        if self.by_residual and self.metric_type == D.METRIC_L2:
            res = xj - self._coarse_centroids()[aj]
        else:
            res = xj
        codes = PQ.pq_encode(res, self._pq_cent_dev)
        r2 = res - PQ.pq_decode(codes, self._pq_cent_dev)
        refine = PQ.pq_encode(r2, self._refine_cent_dev)
        # flat row-indexed side tables for the re-rank pass
        self._row_codes = codes
        self._row_refine = refine
        self._row_assign = aj.astype(jnp.int32)
        packed = (PQ.pack_codes_4bit(codes) if self.nbits == 4
                  else codes)
        return ivf_scan.pack_code_invlists(np.asarray(packed), ids, assign,
                                           self.nlist, self.block_size)

    def _rerank_device(self, xq_dev, rows, k: int):
        """Reconstruct candidate rows through coarse+pq+refine and re-rank
        exactly (IndexIVFPQR::search_preassigned second pass)."""
        safe = jnp.clip(rows, 0, self._row_codes.shape[0] - 1)
        rec = PQ.pq_decode(self._row_codes[safe].reshape(-1, self.M),
                           self._pq_cent_dev)
        rec = rec + PQ.pq_decode(
            self._row_refine[safe].reshape(-1, self.M_refine),
            self._refine_cent_dev)
        rec = rec.reshape(rows.shape + (self.d,))
        if self.by_residual and self.metric_type == D.METRIC_L2:
            rec = rec + self._coarse_centroids()[self._row_assign[safe]]
        ip = jnp.einsum("qd,qcd->qc", xq_dev.astype(jnp.float32), rec,
                        preferred_element_type=jnp.float32)
        if D.is_similarity_metric(self.metric_type):
            sc = -ip
        else:
            qn = jnp.sum(xq_dev * xq_dev, axis=1, keepdims=True)
            vn = jnp.sum(rec * rec, axis=2)
            sc = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
        import jax.lax as lax

        sc = jnp.where(rows >= 0, sc, jnp.inf)
        neg, pos = lax.top_k(-sc, k)
        out_d = -neg
        out_i = jnp.take_along_axis(rows, pos, axis=1)
        if D.is_similarity_metric(self.metric_type):
            out_d = -out_d
        return out_d, out_i

    def _search_device(self, xq_dev, k: int, nprobe: int, mnb: int,
                       id_mask=None):
        cd, probes = self._coarse_search_device(xq_dev, nprobe)
        kk = min(int(k * max(self.k_factor, 1)),
                 max(int(self.ntotal), k))
        Dv, Iv, _ = self._scan_device(xq_dev, probes.astype(jnp.int32), cd,
                                      kk, mnb, id_mask=id_mask)
        return self._rerank_device(xq_dev, Iv, k)

    def search_stats(self, x, k: int, *,
                     params: Optional[SearchParametersIVF] = None):
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        import jax

        x = self._check_input(x)
        nprobe, mnb = self._effective_params(params)
        xq_dev = jnp.asarray(x)
        with Timer() as t_q:
            cd, probes = self._coarse_search_device(xq_dev, nprobe)
            probes = probes.astype(jnp.int32)
            # scalar readback: jax.block_until_ready does not
            # reliably block on the axon platform (verify-skill
            # caveat), which mis-attributed the phase split
            # (r5_queue4); a 4-byte download is a real fence
            np.asarray(probes[:1, :1])
        kk = min(int(k * max(self.k_factor, 1)),
                 max(int(self.ntotal), k))
        with Timer() as t_s:
            Dv, Iv, ndis = self._scan_device(xq_dev, probes, cd, kk, mnb)
            Dv, Iv = self._rerank_device(xq_dev, Iv, k)
            Dv = np.asarray(Dv)
            Iv = self._map_ids(Iv)
        stats = SearchStats(
            nq=len(x), total_us=t_q.us + t_s.us,
            quantization_us=t_q.us, list_scan_us=t_s.us,
            ndis=int(ndis), nlist_visited=len(x) * nprobe,
        )
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats


class IndexIVFScalarQuantizer(IndexIVF):
    """IVF with SQ-coded invlists (faiss IndexIVFScalarQuantizer)."""

    def __init__(self, quantizer, d: int, nlist: int,
                 qtype: int = SQ.QT_8BIT, metric: int = D.METRIC_L2,
                 block_size: int = 128):
        super().__init__(quantizer, d, nlist, metric, block_size)
        self.qtype = int(qtype)
        self.sq: Optional[SQ.SQCodec] = None
        self._sq8 = None
        self._sq8_for = None

    def train_encoder(self, x: np.ndarray) -> None:
        self.sq = SQ.train_sq(x, self.qtype)

    def _pack(self, x, ids, assign):
        self._sq8 = self._sq8_for = None
        codes = np.asarray(SQ.sq_encode(jnp.asarray(x), self.sq))
        return ivf_scan.pack_code_invlists(codes, ids, assign, self.nlist,
                                           self.block_size)

    def _sq8_view(self):
        """8-bit storages ride the fused Pallas kernel at the uint8 byte
        rate (half bf16): a zero-copy PackedInvListsSQ8 view over the
        packed codes with the codec's dequant affine
        (x = (vmin + 0.5*vdiff/2^8) + code * vdiff/2^8)."""
        if self.qtype not in (SQ.QT_8BIT, SQ.QT_8BIT_UNIFORM,
                              SQ.QT_8BIT_DIRECT,
                              SQ.QT_8BIT_DIRECT_SIGNED):
            return None
        if self.invlists is None:
            return None
        if self._sq8 is not None and self._sq8_for is self.invlists:
            return self._sq8
        if self.qtype == SQ.QT_8BIT_DIRECT:
            bias = jnp.zeros((self.d,), jnp.float32)
            scale = jnp.ones((self.d,), jnp.float32)
        elif self.qtype == SQ.QT_8BIT_DIRECT_SIGNED:
            bias = jnp.full((self.d,), -128.0, jnp.float32)
            scale = jnp.ones((self.d,), jnp.float32)
        else:
            vmin, vdiff = self._sq_params()
            scale = jnp.broadcast_to(vdiff / 256.0, (self.d,))
            bias = jnp.broadcast_to(vmin, (self.d,)) + 0.5 * scale
        self._sq8 = ivf_scan.sq8_view_from_codes(self.invlists, bias,
                                                 scale)
        self._sq8_for = self.invlists
        return self._sq8

    def _sq_params(self):
        d = self.d
        vmin = (jnp.asarray(self.sq.vmin) if self.sq.vmin is not None
                else jnp.zeros((d,), jnp.float32))
        vdiff = (jnp.asarray(self.sq.vdiff) if self.sq.vdiff is not None
                 else jnp.ones((d,), jnp.float32))
        return vmin, vdiff

    # --- standalone codec: listno prefix + SQ codes of the raw vector
    #     (this class stores non-residual codes, see _pack) --------------
    def _codec_or_default(self) -> "SQ.SQCodec":
        return self.sq or SQ.SQCodec(qtype=self.qtype, d=self.d)

    def _sa_payload_size(self) -> int:
        return self._codec_or_default().code_size

    def _sa_encode_payload(self, x, assign) -> np.ndarray:
        codes = np.asarray(SQ.sq_encode(jnp.asarray(x), self.sq))
        if codes.dtype != np.uint8:
            # fp16/bf16 code dtypes: raw bytes on the wire
            codes = np.ascontiguousarray(codes).view(np.uint8)
        return codes.reshape(len(x), -1)

    def _sa_decode_payload(self, payload, listno) -> np.ndarray:
        codec = self._codec_or_default()
        payload = np.ascontiguousarray(payload)
        if codec.qtype == SQ.QT_FP16:
            codes = jnp.asarray(payload.view(np.float16))
        elif codec.qtype == SQ.QT_BF16:
            codes = jnp.asarray(payload.view(np.dtype(jnp.bfloat16)))
        else:
            codes = jnp.asarray(payload)
        return np.asarray(SQ.sq_decode(codes, codec), np.float32)

    def _search_device(self, xq_dev, k: int, nprobe: int, mnb: int,
                       id_mask=None):
        _, probes = self._coarse_search_device(xq_dev, nprobe)
        return self._scan_probes_device(xq_dev, probes.astype(jnp.int32),
                                        None, k, mnb, id_mask=id_mask)

    def _scan_probes_device(self, xq_dev, probes, cd, k: int, mnb: int,
                            id_mask=None):
        sq8 = self._sq8_view()
        if sq8 is not None and self._use_fused(
                xq_dev.shape[0], probes.shape[1], mnb, id_mask,
                invlists=sq8):
            from ..ops.ivf_scan_pallas import scan_invlists_fused

            try:
                Dv, Iv, _ = scan_invlists_fused(
                    xq_dev, probes, sq8, k, self.metric_type)
                return Dv, Iv
            except Exception:
                if self.scan_mode == "fused":
                    raise
        vmin, vdiff = self._sq_params()
        Dv, Iv, _ = ivf_scan.scan_invlists_sq(
            xq_dev, probes, self.invlists,
            vmin, vdiff, k, self.metric_type,
            qtype=self.qtype, max_nblocks=mnb, id_mask=id_mask,
        )
        return Dv, Iv

    def range_search(self, x, radius: float):
        """IVF-SQ range search: probed codes decode through the SQ codec
        (exact codec distance) into the IVF radius scan."""
        from ..ops.range_search import range_search_ivf

        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        nprobe, mnb = self._effective_params(None)
        _, probes = self._coarse_search_device(jnp.asarray(x), nprobe)
        codec = self._codec_or_default()
        # invlists.data keeps the codec's own dtype (_pack stores
        # sq_encode output as-is), so the decode traces directly
        dec = ivf_scan.decode_code_invlists_generic(
            self.invlists, lambda codes: SQ.sq_decode(codes, codec),
            self.d, dtype=jnp.float32)
        res = range_search_ivf(
            x, np.asarray(probes, np.int32), dec, radius,
            self.metric_type, max_nblocks=mnb)
        return res.lims, res.distances, self._map_ids(res.labels)

    def search_stats(self, x, k: int, *,
                     params: Optional[SearchParametersIVF] = None):
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        import jax

        x = self._check_input(x)
        nprobe, mnb = self._effective_params(params)
        xq_dev = jnp.asarray(x)
        with Timer() as t_q:
            _, probes = self._coarse_search_device(xq_dev, nprobe)
            probes = probes.astype(jnp.int32)
            # scalar readback: jax.block_until_ready does not
            # reliably block on the axon platform (verify-skill
            # caveat), which mis-attributed the phase split
            # (r5_queue4); a 4-byte download is a real fence
            np.asarray(probes[:1, :1])
        vmin, vdiff = self._sq_params()
        with Timer() as t_s:
            Dv, Iv, ndis = ivf_scan.scan_invlists_sq(
                xq_dev, probes, self.invlists,
                vmin, vdiff, k, self.metric_type,
                qtype=self.qtype, max_nblocks=mnb,
            )
            Dv = np.asarray(Dv)
            Iv = self._map_ids(Iv)
        stats = SearchStats(
            nq=len(x), total_us=t_q.us + t_s.us,
            quantization_us=t_q.us, list_scan_us=t_s.us,
            ndis=int(ndis), nlist_visited=len(x) * nprobe,
        )
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats


def make_ivf_pq(d: int, nlist: int, M: int, nbits: int = 8,
                metric: int = D.METRIC_L2) -> IndexIVFPQ:
    """factory "IVFx,PQMxN" convenience."""
    return IndexIVFPQ(IndexFlat(d, metric), d, nlist, M, nbits, metric)
