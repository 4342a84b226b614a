"""Additive-quantizer indexes — faiss `IndexAdditiveQuantizer` /
`IndexResidualQuantizer` (IndexAdditiveQuantizer.{h,cpp}) and
`IndexIVFResidualQuantizer` (IndexIVFAdditiveQuantizer.{h,cpp}).

Codes are M stage indices + a stored f32 norm (ST_norm_float); search is
the additive ADC scan of `ops.rq`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import distances as D
from ..ops import rq as RQ
from ..ops import topk as T
from .base import Index
from .flat import IndexFlat
from .ivf import IndexIVF


@functools.partial(jax.jit, static_argnames=("k", "db_block"))
def _rq_knn(xq, codes, norms, codebooks, k: int, valid_n,
            db_block: int = 65536):
    nq = xq.shape[0]
    nb = codes.shape[0]
    xq = xq.astype(jnp.float32)
    lut = RQ.rq_query_tables(xq, codebooks)
    qn = jnp.sum(xq * xq, axis=1)

    block = min(db_block, max(nb, 1))
    nblocks = -(-nb // block)
    pad = nblocks * block - nb
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        norms = jnp.pad(norms, (0, pad))
    codes_r = codes.reshape(nblocks, block, -1)
    norms_r = norms.reshape(nblocks, block)

    def body(i, carry):
        bd, bi = carry
        dis = RQ.rq_adc_scan(lut, codes_r[i], norms_r[i], qn)
        ids = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
        dis = jnp.where(ids < valid_n, dis, jnp.inf)
        v, pos = lax.top_k(-dis, k)
        cd = jnp.concatenate([bd, -v], axis=1)
        ci = jnp.concatenate([bi, pos + i * block], axis=1)
        nv, p2 = lax.top_k(-cd, k)
        return -nv, jnp.take_along_axis(ci, p2, axis=1)

    init = (jnp.full((nq, k), jnp.inf), jnp.full((nq, k), -1, jnp.int32))
    bd, bi = lax.fori_loop(0, nblocks, body, init)
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)


class IndexResidualQuantizer(Index):
    """faiss IndexResidualQuantizer(d, M, nbits): flat RQ codes +
    additive ADC search (ST_norm_float)."""

    def __init__(self, d: int, M: int, nbits: int = 8,
                 metric: int = D.METRIC_L2):
        super().__init__(d, metric)
        if metric != D.METRIC_L2:
            raise ValueError("RQ search implemented for L2 (ST_norm_float)")
        self.M = int(M)
        self.nbits = int(nbits)
        self.beam_size = 5
        self.rq: Optional[RQ.RQCodec] = None
        self._codes: Optional[jnp.ndarray] = None
        self._norms: Optional[jnp.ndarray] = None
        self.is_trained = False

    def _train_codec(self, x: np.ndarray) -> "RQ.RQCodec":
        return RQ.train_rq(x, self.M, self.nbits, verbose=self.verbose)

    def _encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return RQ.rq_encode(x, self._books, beam=self.beam_size)

    def train(self, x) -> None:
        x = self._check_input(x)
        self.rq = self._train_codec(x)
        self.M = self.rq.M  # product AQs expand M to nsplits*Msub stages
        self._books = jnp.asarray(self.rq.codebooks)
        self.is_trained = True

    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        x = self._check_input(x)
        codes = self._encode(jnp.asarray(x))
        recon = RQ.rq_decode(codes, self._books)
        norms = jnp.sum(recon * recon, axis=1)
        if self._codes is None:
            self._codes, self._norms = codes, norms
        else:
            self._codes = jnp.concatenate([self._codes, codes])
            self._norms = jnp.concatenate([self._norms, norms])
        self.ntotal += len(x)

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        if self.ntotal == 0:
            return (np.full((len(x), k), np.inf, np.float32),
                    np.full((len(x), k), -1, np.int64))
        Dv, Iv = _rq_knn(jnp.asarray(x), self._codes, self._norms,
                         self._books, k, jnp.int32(self.ntotal))
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def reset(self) -> None:
        self._codes = self._norms = None
        self.ntotal = 0

    def sa_code_size(self) -> int:
        # M stage bytes + f32 norm (ST_norm_float); known pre-train up to
        # product-AQ stage expansion (train() refreshes self.M)
        return (self.rq.code_size if self.rq is not None
                else self.M + 4)

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        codes = np.asarray(self._encode(jnp.asarray(x)))
        # ST_norm_float: the reconstruction norm rides as 4 trailing
        # bytes so standalone codes match code_size (AdditiveQuantizer's
        # sa layout; the flat index stores codes/norms separately)
        recon = RQ.rq_decode(jnp.asarray(codes), self._books)
        norms = np.asarray(jnp.sum(recon * recon, axis=1), np.float32)
        return np.concatenate([codes, norms[:, None].view(np.uint8)],
                              axis=1)

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.uint8)
        return np.asarray(RQ.rq_decode(
            jnp.asarray(codes[:, :self.M]), self._books))

    def reconstruct(self, key: int) -> np.ndarray:
        return self.sa_decode(np.asarray(self._codes[key : key + 1]))[0]

    def range_search(self, x, radius: float):
        """Exact codec-distance range scan (IndexFlatCodes.h:65)."""
        from ..ops.range_search import range_search_flatcodes

        return range_search_flatcodes(self, x, radius)


IndexAdditiveQuantizer = IndexResidualQuantizer  # family alias


class IndexLocalSearchQuantizer(IndexResidualQuantizer):
    """faiss IndexLocalSearchQuantizer (IndexAdditiveQuantizer.h): additive
    codes encoded by batched ICM with perturbations (ops.lsq), searched
    with the shared additive ADC scan."""

    def __init__(self, d: int, M: int, nbits: int = 8,
                 metric: int = D.METRIC_L2):
        super().__init__(d, M, nbits, metric)
        self.train_iters = 8
        self.icm_iters = 4
        self.nperts = 4
        self.lambd = 1e-2
        self._enc_seed = 0

    def _train_codec(self, x: np.ndarray):
        from ..ops import lsq as LSQ

        return LSQ.train_lsq(
            x, self.M, self.nbits, train_iters=self.train_iters,
            icm_iters=self.icm_iters, nperts=self.nperts,
            lambd=self.lambd, verbose=self.verbose)

    def _encode(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import lsq as LSQ

        self._enc_seed += 1
        return LSQ.lsq_encode(
            x, self._books, jax.random.PRNGKey(self._enc_seed),
            icm_iters=self.icm_iters, nperts=self.nperts)


class IndexProductResidualQuantizer(IndexResidualQuantizer):
    """faiss IndexProductResidualQuantizer: d is split into nsplits
    sub-spaces each coded by an independent RQ
    (impl/ProductAdditiveQuantizer.cpp). Represented as one additive codec
    with block-diagonal codebooks so every scan path is shared."""

    def __init__(self, d: int, nsplits: int, Msub: int, nbits: int = 8,
                 metric: int = D.METRIC_L2):
        super().__init__(d, nsplits * Msub, nbits, metric)
        self.nsplits = int(nsplits)
        self.Msub = int(Msub)

    _paq_kind = "rq"

    def _train_codec(self, x: np.ndarray):
        from ..ops import lsq as LSQ

        return LSQ.train_product_aq(
            x, self.nsplits, self.Msub, self.nbits, kind=self._paq_kind,
            verbose=self.verbose)


class IndexProductLocalSearchQuantizer(IndexProductResidualQuantizer):
    """faiss IndexProductLocalSearchQuantizer: product of LSQs."""

    _paq_kind = "lsq"


class IndexIVFResidualQuantizer(IndexIVF):
    """faiss IndexIVFResidualQuantizer: invlists store RQ codes of the
    residuals + a stored f32 full-vector reconstruction norm
    (ST_norm_float); scan adds the exact <q, c_list> cross term per
    probe (use_precomputed_table=0 style)."""

    def __init__(self, quantizer, d: int, nlist: int, M: int,
                 nbits: int = 8, metric: int = D.METRIC_L2,
                 block_size: int = 128):
        super().__init__(quantizer, d, nlist, metric, block_size)
        self.M = int(M)
        self.nbits = int(nbits)
        self.beam_size = 5
        self.rq: Optional[RQ.RQCodec] = None
        # decoded cache (ops.ivf_scan.decode_code_invlists_generic): the
        # additive LUT gather scan has the same ksub=256 pathology as
        # PQ's; decoding once lets scans run on the flat/fused kernels.
        # None = auto (on when ksub > 16 and it fits the budget).
        self.use_decoded_cache: Optional[bool] = None
        self.decoded_cache_max_bytes: int = 8 << 30
        self.decoded_cache_dtype = "bfloat16"
        self._decoded = None
        self._decoded_for = None

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
        if not self._cache_enabled():
            return None
        if self._decoded is not None and self._decoded_for is self.invlists:
            return self._decoded
        from ..ops.ivf_scan import decode_code_invlists_generic

        M = self.M

        def decode_rows(payload):
            return RQ.rq_decode(payload[:, :M], self._books)

        sq8 = self.decoded_cache_dtype == "sq8"
        dec = decode_code_invlists_generic(
            self.invlists, decode_rows, self.d,
            jnp.asarray(self._centroid_table()),
            dtype=jnp.bfloat16 if sq8
            else jnp.dtype(self.decoded_cache_dtype))
        if sq8:
            from ..ops.ivf_scan import sq8_requantize_invlists

            dec = sq8_requantize_invlists(dec)
        self._decoded = dec
        self._decoded_for = self.invlists
        return self._decoded

    def _train_codec(self, resid: np.ndarray) -> "RQ.RQCodec":
        return RQ.train_rq(resid, self.M, self.nbits, verbose=self.verbose)

    def _encode_residuals(self, resid: jnp.ndarray) -> jnp.ndarray:
        return RQ.rq_encode(resid, self._books, beam=self.beam_size)

    def train_encoder(self, x: np.ndarray) -> None:
        assign = self._assign(x)
        cent = np.asarray(self._centroid_table())
        resid = x - cent[assign]
        self.rq = self._train_codec(resid)
        self.M = self.rq.M
        self._books = jnp.asarray(self.rq.codebooks)

    def _pack(self, x, ids, assign):
        from ..ops.ivf_scan import pack_code_invlists

        self._decoded = self._decoded_for = None
        cent = np.asarray(self._centroid_table())
        resid = jnp.asarray(x - cent[assign])
        codes = self._encode_residuals(resid)
        # full-vector reconstruction norm, stored as 4 extra code bytes
        recon = RQ.rq_decode(codes, self._books) + jnp.asarray(cent[assign])
        norms = np.asarray(jnp.sum(recon * recon, axis=1), np.float32)
        payload = np.concatenate(
            [np.asarray(codes), norms[:, None].view(np.uint8)], axis=1)
        return pack_code_invlists(payload, ids, assign, self.nlist,
                                  self.block_size)

    # --- standalone codec: listno prefix + the invlist payload (AQ
    #     stage bytes of the residual + f32 reconstruction norm) ---------
    def _sa_payload_size(self) -> int:
        return (self.rq.code_size if self.rq is not None
                else self.M + 4)

    def _sa_encode_payload(self, x, assign) -> np.ndarray:
        cent = np.asarray(self._centroid_table())
        resid = jnp.asarray(np.asarray(x, np.float32) - cent[assign])
        codes = self._encode_residuals(resid)
        recon = (RQ.rq_decode(codes, self._books)
                 + jnp.asarray(cent[assign]))
        norms = np.asarray(jnp.sum(recon * recon, axis=1), np.float32)
        return np.concatenate(
            [np.asarray(codes), norms[:, None].view(np.uint8)], axis=1)

    def _sa_decode_payload(self, payload, listno) -> np.ndarray:
        cent = np.asarray(self._centroid_table())
        resid = np.asarray(RQ.rq_decode(
            jnp.asarray(np.ascontiguousarray(payload[:, :self.M])),
            self._books))
        return (resid + cent[np.asarray(listno)]).astype(np.float32)

    def search(self, x, k: int, *, params=None):
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        nprobe, mnb = self._effective_params(params)
        xq = jnp.asarray(x)
        _, probes = self._coarse_search_device(xq, nprobe)
        probes = probes.astype(jnp.int32)
        dl = self._decoded_cache()
        if dl is not None:
            # fast additive ADC: flat-path kernels over the decoded cache
            from ..ops import ivf_scan
            from ..ops.ivf_scan_pallas import scan_invlists_fused

            if self._use_fused(xq.shape[0], nprobe, mnb, None,
                               invlists=dl):
                try:
                    Dv, Iv, _ = scan_invlists_fused(
                        xq, probes, dl, k, self.metric_type)
                    return np.asarray(Dv), self._map_ids(Iv)
                except Exception:
                    if self.scan_mode == "fused":
                        raise
            Dv, Iv, _ = ivf_scan.scan_invlists(
                xq, probes, dl, k, self.metric_type, max_nblocks=mnb,
                approx=self.approx_topk)
            return np.asarray(Dv), self._map_ids(Iv)
        Dv, Iv = _ivf_rq_search(
            xq, probes, self.invlists.codes,
            self.invlists.ids,
            self.invlists.list_block_start, self.invlists.list_nblocks,
            self.invlists.nblocks, self._books,
            jnp.asarray(self._centroid_table()),
            k, self.M, max_nblocks=mnb,
        )
        return np.asarray(Dv), self._map_ids(Iv)

    def reconstruct(self, key: int) -> np.ndarray:
        self._maybe_repack()
        for xs, ids in zip(self._xb_host, self._ids_host):
            hit = np.nonzero(ids == key)[0]
            if hit.size:
                return xs[hit[0]]
        raise KeyError(key)


class IndexIVFLocalSearchQuantizer(IndexIVFResidualQuantizer):
    """faiss IndexIVFLocalSearchQuantizer: IVF + ICM-encoded additive
    residual codes (IndexIVFAdditiveQuantizer.h)."""

    def __init__(self, quantizer, d: int, nlist: int, M: int,
                 nbits: int = 8, metric: int = D.METRIC_L2,
                 block_size: int = 128):
        super().__init__(quantizer, d, nlist, M, nbits, metric, block_size)
        self.train_iters = 8
        self.icm_iters = 4
        self.nperts = 4
        self.lambd = 1e-2
        self._enc_seed = 0

    def _train_codec(self, resid: np.ndarray):
        from ..ops import lsq as LSQ

        return LSQ.train_lsq(
            resid, self.M, self.nbits, train_iters=self.train_iters,
            icm_iters=self.icm_iters, nperts=self.nperts,
            lambd=self.lambd, verbose=self.verbose)

    def _encode_residuals(self, resid: jnp.ndarray) -> jnp.ndarray:
        from ..ops import lsq as LSQ

        self._enc_seed += 1
        return LSQ.lsq_encode(
            resid, self._books, jax.random.PRNGKey(self._enc_seed),
            icm_iters=self.icm_iters, nperts=self.nperts)


class IndexIVFProductResidualQuantizer(IndexIVFResidualQuantizer):
    """faiss IndexIVFProductResidualQuantizer (block-diagonal additive
    codec over d/nsplits slices; scan shared with IVF-RQ)."""

    _paq_kind = "rq"

    def __init__(self, quantizer, d: int, nlist: int, nsplits: int,
                 Msub: int, nbits: int = 8, metric: int = D.METRIC_L2,
                 block_size: int = 128):
        super().__init__(quantizer, d, nlist, nsplits * Msub, nbits,
                         metric, block_size)
        self.nsplits = int(nsplits)
        self.Msub = int(Msub)

    def _train_codec(self, resid: np.ndarray):
        from ..ops import lsq as LSQ

        return LSQ.train_product_aq(
            resid, self.nsplits, self.Msub, self.nbits,
            kind=self._paq_kind, verbose=self.verbose)


class IndexIVFProductLocalSearchQuantizer(IndexIVFProductResidualQuantizer):
    """faiss IndexIVFProductLocalSearchQuantizer."""

    _paq_kind = "lsq"


@functools.partial(
    jax.jit,
    static_argnames=("k", "M", "max_nblocks"),
)
def _ivf_rq_search(xq, probes, codes_t, ids_t, lbs, lnb, NB, books, cent,
                   k: int, M: int, *, max_nblocks: int):
    """Probe-major IVF-RQ scan: LUT over residual codebooks + exact
    <q, c_list> per probe (both MXU contractions)."""
    nq, d = xq.shape
    nprobe = probes.shape[1]
    xq = xq.astype(jnp.float32)
    qn = jnp.sum(xq * xq, axis=1)
    lut = RQ.rq_query_tables(xq, books)                  # (nq, M, ksub)
    ksub = books.shape[1]
    q_cent_ip = jnp.dot(xq, cent.T,
                        preferred_element_type=jnp.float32)  # (nq, nlist)

    starts = lbs[probes]
    nblk = jnp.minimum(lnb[probes], max_nblocks)

    bd = jnp.full((nq, k), jnp.inf, jnp.float32)
    bi = jnp.full((nq, k), -1, jnp.int32)
    flat_lut = lut.reshape(nq, M * ksub)

    def probe_body(p, carry):
        bd, bi = carry
        pl = probes[:, p]
        qc = jnp.take_along_axis(q_cent_ip, pl[:, None], axis=1)[:, 0]

        def block_body(o, carry2):
            bd2, bi2 = carry2
            bids = jnp.where(o < nblk[:, p], starts[:, p] + o, NB)
            payload = codes_t[bids]                      # (nq, B, M+4)
            stage = payload[..., :M]
            # (nq, B, 4) uint8 -> (nq, B) f32
            nf = lax.bitcast_convert_type(
                payload[..., M : M + 4], jnp.float32)
            vids = ids_t[bids]                           # (nq, B)
            B = stage.shape[1]
            idx = (stage.astype(jnp.int32)
                   + (jnp.arange(M, dtype=jnp.int32) * ksub)[None, None, :])
            g = jnp.take_along_axis(flat_lut, idx.reshape(nq, B * M),
                                    axis=1)
            ip_res = g.reshape(nq, B, M).sum(axis=2)
            ip_full = ip_res + qc[:, None]
            dis = qn[:, None] + nf - 2.0 * ip_full
            dis = jnp.where(vids >= 0, dis, jnp.inf)
            nbd, nbi = T.merge_topk(bd2, bi2, dis, vids, k)
            return nbd, nbi

        return lax.fori_loop(0, max_nblocks, block_body, (bd, bi))

    bd, bi = lax.fori_loop(0, nprobe, probe_body, (bd, bi))
    return bd, bi


class AdditiveCoarseQuantizer(Index):
    """An additive quantizer used as a coarse quantizer: the "database"
    is the implicit set of all ksub^M codebook combinations
    (IndexAdditiveQuantizer.h:150-193 ``AdditiveCoarseQuantizer``); no
    vectors are ever added. ntotal = ksub^M after train; search returns
    composite centroid ids (mixed-radix over the stage codes);
    reconstruct decodes an id back into its centroid. Lets an IVF reach
    huge nlist (2^24+) with a quantizer whose memory is M codebooks."""

    def __init__(self, d: int, M: int, nbits: int,
                 metric: int = D.METRIC_L2):
        if metric != D.METRIC_L2:
            raise ValueError("additive coarse quantizers are L2-only")
        super().__init__(d, metric)
        self.M, self.nbits = int(M), int(nbits)
        self.ksub = 1 << self.nbits
        self.beam_factor: float = 4.0
        self.rq = None
        self._books: Optional[jnp.ndarray] = None
        self.is_trained = False

    # --- training -----------------------------------------------------
    def _train_codec(self, x):
        raise NotImplementedError

    def train(self, x) -> None:
        x = self._check_input(x)
        self.rq = self._train_codec(x)
        self._books = jnp.asarray(self.rq.codebooks)
        self.ntotal = self.ksub ** self.M
        self.is_trained = True

    # --- id <-> stage codes (mixed radix, stage 0 most significant) ----
    def _codes_to_ids(self, codes: np.ndarray) -> np.ndarray:
        ids = np.zeros(codes.shape[:-1], np.int64)
        for m in range(self.M):
            ids = ids * self.ksub + codes[..., m].astype(np.int64)
        return ids

    def _ids_to_codes(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, np.int64)
        codes = np.zeros(ids.shape + (self.M,), np.uint8)
        for m in range(self.M - 1, -1, -1):
            codes[..., m] = (ids % self.ksub).astype(np.uint8)
            ids = ids // self.ksub
        return codes

    def add(self, x) -> None:
        raise RuntimeError(
            "AdditiveCoarseQuantizer is a virtual database — nothing to "
            "add (reconstruct/search only)")

    def reset(self) -> None:
        pass

    def reconstruct(self, key: int) -> np.ndarray:
        return self.reconstruct_batch(np.array([key]))[0]

    def reconstruct_batch(self, keys) -> np.ndarray:
        codes = self._ids_to_codes(np.asarray(keys, np.int64).reshape(-1))
        return np.asarray(RQ.rq_decode(jnp.asarray(codes), self._books))

    def _all_centroids(self) -> jnp.ndarray:
        if self.ntotal > (1 << 22):
            raise ValueError(
                f"exact centroid enumeration of {self.ntotal} is too "
                "large; use beam search (beam_factor >= 0)")
        return jnp.asarray(
            RQ.rq_decode(jnp.asarray(self._ids_to_codes(
                np.arange(self.ntotal))), self._books))

    def search(self, x, k: int, *, params=None):
        """k nearest implicit centroids. beam_factor < 0 -> exact
        (enumerate + GEMM knn, small vocabularies only); else residual
        beam search with beam = max(beam_factor * k, k)
        (ResidualCoarseQuantizer::search semantics)."""
        x = self._check_input(x)
        if not self.is_trained:
            raise RuntimeError("train() first")
        if self.beam_factor < 0:
            Dv, Iv = D.knn(jnp.asarray(x), self._all_centroids(), k)
            return np.asarray(Dv), np.asarray(Iv, np.int64)
        beam = max(int(self.beam_factor * k), k)
        errs, codes = RQ.rq_encode_topk(jnp.asarray(x), self._books, k,
                                        beam)
        Dv = np.maximum(np.asarray(errs), 0.0)
        Iv = self._codes_to_ids(np.asarray(codes))
        if Dv.shape[1] < k:   # beam narrower than k (tiny codebooks)
            padn = k - Dv.shape[1]
            Dv = np.pad(Dv, ((0, 0), (0, padn)), constant_values=np.inf)
            Iv = np.pad(Iv, ((0, 0), (0, padn)), constant_values=-1)
        return Dv, Iv

    def set_beam_factor(self, bf: float) -> None:
        self.beam_factor = float(bf)


class ResidualCoarseQuantizer(AdditiveCoarseQuantizer):
    """RQ-trained coarse quantizer (IndexAdditiveQuantizer.h:198
    ``ResidualCoarseQuantizer``)."""

    def _train_codec(self, x):
        return RQ.train_rq(x, self.M, self.nbits, verbose=self.verbose)


class LocalSearchCoarseQuantizer(AdditiveCoarseQuantizer):
    """LSQ-trained coarse quantizer (IndexAdditiveQuantizer.h:241
    ``LocalSearchCoarseQuantizer``). LSQ codebooks are not residual-
    hierarchical, so search defaults to exact centroid enumeration."""

    def __init__(self, d: int, M: int, nbits: int,
                 metric: int = D.METRIC_L2):
        super().__init__(d, M, nbits, metric)
        self.beam_factor = -1.0   # exact by default

    def _train_codec(self, x):
        from ..ops import lsq as LSQ

        return LSQ.train_lsq(x, self.M, self.nbits, verbose=self.verbose)
