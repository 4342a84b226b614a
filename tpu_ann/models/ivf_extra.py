"""IVF variants with non-standard coarse/fine couplings:

* IndexIVFSpectralHash (faiss/IndexIVFSpectralHash.{h,cpp}) — invlist
  codes are periodic binarizations of a linear projection; search is a
  Hamming scan with per-list thresholds.
* IndexIVFIndependentQuantizer (faiss/IndexIVFIndependentQuantizer.{h,cpp})
  — the coarse quantizer sees the RAW vectors while the payload index
  encodes a transformed (e.g. PCA-reduced) view; assignment and encoding
  are decoupled.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import ivf_scan
from . import base
from .base import Index, SearchStats, Timer
from .flat import IndexFlat
from .ivf import IndexIVF, SearchParametersIVF
from .transforms import RandomRotationMatrix, VectorTransform

THRESH_GLOBAL = "global"
THRESH_CENTROID = "centroid"
THRESH_CENTROID_HALF = "centroid_half"
THRESH_MEDIAN = "median"


class IndexIVFSpectralHash(IndexIVF):
    """IVF over spectral-hash binary codes (faiss IndexIVFSpectralHash).

    encode: bit i = floor((vt(x)_i - c_i) * 2/period) & 1 where c depends
    on threshold_type (binarize_with_freq, IndexIVFSpectralHash.cpp:144);
    search: Hamming between the query binarized against each probed
    list's thresholds and the stored codes (ops.ivf_scan.scan_invlists_hash
    — one MXU contraction per block instead of XOR+popcount lanes)."""

    def __init__(self, quantizer, d: int, nlist: int, nbit: int,
                 period: float = 10.0, metric: int = D.METRIC_L2,
                 block_size: int = 128):
        super().__init__(quantizer, d, nlist, metric, block_size)
        if nbit % 8:
            raise ValueError("nbit must be a multiple of 8")
        self.nbit = int(nbit)
        self.period = float(period)
        self.threshold_type = THRESH_GLOBAL
        self.vt: VectorTransform = RandomRotationMatrix(d, nbit)
        self.trained: Optional[np.ndarray] = None   # (nlist, nbit)
        self.by_residual = False

    def replace_vt(self, vt: VectorTransform) -> None:
        """faiss IndexIVFSpectralHash::replace_vt."""
        if vt.d_out != self.nbit or vt.d_in != self.d:
            raise ValueError("vt shape mismatch")
        self.vt = vt

    def train_encoder(self, x: np.ndarray) -> None:
        if not self.vt.is_trained:
            self.vt.train(x)
        tt = self.threshold_type
        if tt == THRESH_GLOBAL:
            self.trained = np.zeros((self.nlist, self.nbit), np.float32)
            return
        cent = np.asarray(self._centroid_table())
        if tt in (THRESH_CENTROID, THRESH_CENTROID_HALF):
            tr = self.vt.apply(cent).astype(np.float32)
            if tt == THRESH_CENTROID_HALF:
                tr = tr - 0.25 * self.period
            self.trained = tr
            return
        if tt != THRESH_MEDIAN:
            raise ValueError(f"bad threshold_type {tt!r}")
        assign = self._assign(x)
        z = self.vt.apply(x).astype(np.float32)
        tr = np.zeros((self.nlist, self.nbit), np.float32)
        order = np.argsort(assign, kind="stable")
        a_s, z_s = assign[order], z[order]
        starts = np.searchsorted(a_s, np.arange(self.nlist))
        ends = np.searchsorted(a_s, np.arange(self.nlist) + 1)
        for l in range(self.nlist):
            if ends[l] > starts[l]:
                tr[l] = np.median(z_s[starts[l] : ends[l]], axis=0)
        self.trained = tr

    def _binarize(self, z: np.ndarray, assign: np.ndarray) -> np.ndarray:
        c = self.trained[np.asarray(assign, np.int64)]
        xi = np.floor((z - c) * (2.0 / self.period)).astype(np.int64)
        bits = (xi & 1).astype(np.uint8)
        from ..ops.hamming import pack_bits

        return np.asarray(pack_bits(jnp.asarray(bits)))

    def _pack(self, x, ids, assign):
        z = self.vt.apply(np.asarray(x)).astype(np.float32)
        codes = self._binarize(z, assign)
        return ivf_scan.pack_code_invlists(codes, ids, assign, self.nlist,
                                           self.block_size)

    # standalone codec: encode = listno + binarized code (the reference's
    # encode_vectors(include_listnos)); the binarization is lossy and
    # non-invertible, so decode is unsupported there too
    def _sa_payload_size(self) -> int:
        return (self.nbit + 7) // 8

    def _sa_encode_payload(self, x, assign) -> np.ndarray:
        z = self.vt.apply(np.asarray(x)).astype(np.float32)
        return self._binarize(z, np.asarray(assign))

    def _sa_decode_payload(self, payload, listno) -> np.ndarray:
        raise NotImplementedError(
            "IndexIVFSpectralHash codes cannot be decoded")

    def _search_device(self, xq_dev, k: int, nprobe: int, mnb: int,
                       id_mask=None):
        _, probes = self._coarse_search_device(xq_dev, nprobe)
        return self._scan_probes_device(xq_dev, probes.astype(jnp.int32),
                                        None, k, mnb, id_mask=id_mask)

    def _scan_probes_device(self, xq_dev, probes, cd, k: int, mnb: int,
                            id_mask=None):
        zq = jnp.asarray(self.vt.apply(np.asarray(xq_dev)))
        Dv, Iv, _ = ivf_scan.scan_invlists_hash(
            zq, probes, self.invlists,
            jnp.asarray(self.trained), self.period, k,
            nbit=self.nbit, max_nblocks=mnb, id_mask=id_mask,
        )
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
            _, probes = self._coarse_search_device(xq_dev, nprobe)
            probes = probes.astype(jnp.int32)
            # scalar readback: jax.block_until_ready does not
            # reliably block on the axon platform (verify-skill
            # caveat), which mis-attributed the phase split
            # (r5_queue4); a 4-byte download is a real fence
            np.asarray(probes[:1, :1])
        with Timer() as t_s:
            zq = jnp.asarray(self.vt.apply(x))
            Dv, Iv, ndis = ivf_scan.scan_invlists_hash(
                zq, probes, self.invlists, jnp.asarray(self.trained),
                self.period, k, nbit=self.nbit, max_nblocks=mnb,
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


class IndexIVFIndependentQuantizer(Index):
    """Coarse quantization on RAW vectors + payload IVF on transformed
    vectors (faiss IndexIVFIndependentQuantizer): assignment quality is
    decoupled from code compactness — e.g. assign in the full d, encode a
    PCA-reduced view."""

    def __init__(self, quantizer: Index, index_ivf: IndexIVF,
                 vt: Optional[VectorTransform] = None):
        super().__init__(quantizer.d, index_ivf.metric_type)
        if vt is not None and (vt.d_in != quantizer.d
                               or vt.d_out != index_ivf.d):
            raise ValueError("vt dimensions inconsistent")
        if vt is None and quantizer.d != index_ivf.d:
            raise ValueError("need a vt when dimensions differ")
        self.quantizer = quantizer
        self.index_ivf = index_ivf
        self.vt = vt
        self.is_trained = False

    @property
    def nprobe(self) -> int:
        return self.index_ivf.nprobe

    @nprobe.setter
    def nprobe(self, v: int) -> None:
        self.index_ivf.nprobe = v

    def _transform(self, x: np.ndarray) -> np.ndarray:
        return self.vt.apply(x).astype(np.float32) if self.vt is not None \
            else x

    def train(self, x) -> None:
        x = self._check_input(x)
        # quantizer trains on the raw view (IndexIVFIndependentQuantizer::
        # train: quantizer kmeans first, then vt, then the encoder on the
        # transformed residual-free view)
        self.index_ivf.quantizer_trains_alone = 1
        if self.quantizer.ntotal == 0:
            from ..ops.kmeans import kmeans

            cents, _ = kmeans(x, self.index_ivf.nlist, self.index_ivf.cp,
                              self.metric_type)
            self.quantizer.train(cents)
            self.quantizer.add(cents)
        if self.vt is not None and not self.vt.is_trained:
            self.vt.train(x)
        xt = self._transform(x)
        # payload IVF shares the assignment space only through preassigned
        # adds; give it a placeholder quantizer over the transformed view
        self.index_ivf.quantizer.reset()
        if hasattr(self.index_ivf.quantizer, "add"):
            from ..ops.kmeans import kmeans as _km

            c2, _ = _km(xt, self.index_ivf.nlist,
                        self.index_ivf.cp, self.metric_type)
            self.index_ivf.quantizer.train(c2)
            self.index_ivf.quantizer.add(c2)
        self.index_ivf.train_encoder(xt)
        self.index_ivf.is_trained = True
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        _, a = self.quantizer.search(x, 1)
        from ..utils.contrib import add_preassigned

        xt = self._transform(x)
        add_preassigned(self.index_ivf, xt, np.asarray(a)[:, 0])
        self.ntotal = self.index_ivf.ntotal

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nprobe = self.index_ivf.nprobe
        _, probes = self.quantizer.search(x, nprobe)
        xt = self._transform(x)
        return self.index_ivf.search_preassigned(xt, k,
                                                 np.asarray(probes))

    def reset(self) -> None:
        self.index_ivf.reset()
        self.ntotal = 0
