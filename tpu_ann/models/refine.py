"""IndexRefine — re-rank base-index candidates with a finer codec
(faiss/IndexRefine.{h,cpp}): search k*k_factor on the base index, then
re-score those candidates exactly (IndexRefineFlat keeps raw vectors).

On TPU the re-rank is one gather + batched distance contraction + k-select
— no per-candidate DistanceComputer loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import distances as D
from ..ops import topk as T
from .base import Index
from .flat import IndexFlat


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _rerank(xq, cand_ids, xb, k: int, metric: int):
    """Re-score candidate ids exactly against stored vectors."""
    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)
    valid = cand_ids >= 0
    vecs = xb[jnp.where(valid, cand_ids, 0)]            # (nq, kk, d)
    ip = jnp.einsum("qd,qcd->qc", xq.astype(jnp.float32), vecs,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    if similarity:
        dis = ip
    else:
        qn = jnp.sum(xq * xq, axis=1)[:, None]
        vn = jnp.sum(vecs * vecs, axis=2)
        dis = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
    dis = jnp.where(valid, dis, bad)
    return T.topk_with_ids(dis, cand_ids, k, similarity=similarity)


class IndexRefine(Index):
    """Generic refine wrapper (faiss IndexRefine: base + refine_index)."""

    def __init__(self, base_index: Index, refine_index: Index):
        super().__init__(base_index.d, base_index.metric_type)
        self.base_index = base_index
        self.refine_index = refine_index
        self.k_factor = 4  # faiss default is 1; harnesses usually sweep it
        self.is_trained = base_index.is_trained and refine_index.is_trained

    def train(self, x) -> None:
        self.base_index.train(x)
        self.refine_index.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        self.base_index.add(x)
        self.refine_index.add(x)
        self.ntotal = self.base_index.ntotal

    def reset(self) -> None:
        self.base_index.reset()
        self.refine_index.reset()
        self.ntotal = 0

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        kk = max(int(k * self.k_factor), k)
        kk = min(kk, max(self.ntotal, 1))
        _, I = self.base_index.search(x, kk, params=params)
        return self._refine(x, I, k)

    def _refine(self, x, cand_ids, k):
        # generic path: reconstruct candidates through the refine codec
        nq, kk = cand_ids.shape
        out_d = np.zeros((nq, k), np.float32)
        out_i = np.full((nq, k), -1, np.int64)
        for i in range(nq):
            ids = cand_ids[i][cand_ids[i] >= 0]
            if ids.size == 0:
                continue
            vecs = np.stack([self.refine_index.reconstruct(int(j))
                             for j in ids])
            dif = vecs - x[i][None]
            dis = (dif * dif).sum(1)
            if self.is_similarity:
                dis = (vecs * x[i][None]).sum(1)
                order = np.argsort(-dis)[:k]
            else:
                order = np.argsort(dis)[:k]
            out_d[i, : len(order)] = dis[order]
            out_i[i, : len(order)] = ids[order]
        return out_d, out_i

    def range_search(self, x, radius: float):
        """faiss IndexRefine::range_search (IndexRefine.h:57): the base
        index proposes hits within the radius; every hit is re-scored
        through the refine codec and re-filtered, so returned distances
        are refine-grade. Base-index misses stay missed (same contract
        as the reference: the base's range recall bounds the result)."""
        x = self._check_input(x)
        lims, _, labels = self.base_index.range_search(x, radius)
        vecs_src = getattr(self.refine_index, "vectors", None)
        keep_gt = self.is_similarity
        out_d, out_i = [], []
        new_lims = np.zeros(len(x) + 1, np.int64)
        for q in range(len(x)):
            ids = labels[lims[q]:lims[q + 1]]
            if len(ids) == 0:
                new_lims[q + 1] = new_lims[q]
                continue
            if vecs_src is not None:
                vecs = np.asarray(vecs_src)[ids]
            else:
                vecs = self.refine_index.reconstruct_batch(ids)
            if keep_gt:
                dis = vecs @ x[q]
                ok = dis > radius
            else:
                dif = vecs - x[q][None]
                dis = (dif * dif).sum(1)
                ok = dis < radius
            out_d.append(dis[ok].astype(np.float32))
            out_i.append(ids[ok])
            new_lims[q + 1] = new_lims[q] + int(ok.sum())
        dd = (np.concatenate(out_d) if out_d
              else np.zeros(0, np.float32))
        ii = (np.concatenate(out_i) if out_i else np.zeros(0, np.int64))
        return new_lims, dd, ii

    def reconstruct(self, key: int) -> np.ndarray:
        return self.refine_index.reconstruct(key)


class IndexRefineFlat(IndexRefine):
    """faiss IndexRefineFlat: exact re-rank against raw stored vectors —
    the fast vectorized path."""

    def __init__(self, base_index: Index,
                 refine_index: Optional[IndexFlat] = None):
        refine = refine_index or IndexFlat(base_index.d,
                                           base_index.metric_type)
        super().__init__(base_index, refine)

    def _refine(self, x, cand_ids, k):
        Dv, Iv = _rerank(
            jnp.asarray(x), jnp.asarray(cand_ids, jnp.int32),
            self.refine_index.vectors, k, self.metric_type,
        )
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def search_device(self, xq_dev, k: int):
        """Device-in/device-out refine search (see IndexIVF.search_device):
        base candidates and the exact re-rank both stay un-materialized so
        callers can pipeline batches. Requires a base index exposing
        search_device; base rows and refine-storage rows coincide because
        IndexRefine.add appends to both sides in the same order."""
        kk = max(int(k * self.k_factor), k)
        kk = min(kk, max(self.ntotal, 1))
        _, Ib = self.base_index.search_device(xq_dev, kk)
        return _rerank(xq_dev, Ib.astype(jnp.int32),
                       self.refine_index.vectors, k, self.metric_type)


@functools.partial(jax.jit, static_argnames=("k", "metric", "tier_meta"))
def _rerank_tier(xq, cand_ids, tier_lines, vmin, vdiff, k: int,
                 metric: int, tier_meta):
    """_rerank against an AlignedByteTier of SQ8 codes. tier_lines is
    passed as an ARGUMENT (closing over it would bake ~10 GB into the
    remote compile request); tier_meta = (n, row_bytes) is static."""
    from ..ops import sq as SQ

    n, rb = tier_meta
    tier = SQ.AlignedByteTier(tier_lines, n, rb)
    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)
    valid = cand_ids >= 0
    codes = tier.gather(jnp.where(valid, cand_ids, 0))
    vecs = SQ.sq_dequant_codes(codes, SQ.QT_8BIT, rb, vmin, vdiff)
    ip = jnp.einsum("qd,qcd->qc", xq.astype(jnp.float32), vecs,
                    preferred_element_type=jnp.float32)
    if similarity:
        dis = ip
    else:
        qn = jnp.sum(xq.astype(jnp.float32) ** 2, axis=1)[:, None]
        vn = jnp.sum(vecs * vecs, axis=2)
        dis = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
    dis = jnp.where(valid, dis, bad)
    return T.topk_with_ids(dis, cand_ids, k, similarity=similarity)


class IndexRefineSQ8Tier(Index):
    """Capacity-scale refine: base-index candidates re-scored against a
    chip-resident SQ8 tier in the relayout-free AlignedByteTier layout
    (ops/sq.AlignedByteTier — see its docstring for why the naive
    u8[n,d] device array OOMs at 100M via XLA's in-program relayout
    copy). At 100M x 96-d the tier is 9.6 GB and coexists with 2.1 GB
    of packed PQ4 codes on one 16 GB chip — the configuration measured
    in benchs/logs/r5_queue10.jsonl / r5_queue11.jsonl.

    Role parity: faiss IndexRefine with a ScalarQuantizer refine index
    (faiss/IndexRefine.h:22, refine codec choice discussed in
    demos/offline_ivf) — here the refine side is a device tier, not an
    Index, so the re-rank is one relayout-free gather + VPU decode +
    MXU contraction + k-select per batch.
    """

    def __init__(self, base_index: Index):
        super().__init__(base_index.d, base_index.metric_type)
        self.base_index = base_index
        self.k_factor = 4
        self.codec = None
        self._host_codes: list = []
        self._tier = None
        self.is_trained = False

    def train(self, x) -> None:
        from ..ops import sq as SQ

        x = self._check_input(x)
        self.base_index.train(x)
        self.codec = SQ.train_sq(x, SQ.QT_8BIT)
        self.is_trained = True

    def add(self, x) -> None:
        from ..ops import sq as SQ

        x = self._check_input(x)
        self.base_index.add(x)
        self._host_codes.append(
            np.asarray(SQ.sq_encode(jnp.asarray(x), self.codec)))
        self._tier = None
        self.ntotal = self.base_index.ntotal

    def reset(self) -> None:
        self.base_index.reset()
        self._host_codes = []
        self._tier = None
        self.ntotal = 0

    def _ensure_tier(self):
        from ..ops import sq as SQ

        if self._tier is None:
            codes = (self._host_codes[0] if len(self._host_codes) == 1
                     else np.concatenate(self._host_codes))
            self._tier = SQ.AlignedByteTier.from_host(codes)
        return self._tier

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        tier = self._ensure_tier()
        kk = max(int(k * self.k_factor), k)
        kk = min(kk, max(self.ntotal, 1))
        _, I = self.base_index.search(x, kk, params=params)
        Dv, Iv = _rerank_tier(
            jnp.asarray(x), jnp.asarray(I, jnp.int32), tier.lines,
            jnp.asarray(self.codec.vmin, jnp.float32),
            jnp.asarray(self.codec.vdiff, jnp.float32),
            k, self.metric_type, (tier.n, tier.row_bytes))
        return np.asarray(Dv), np.asarray(Iv, np.int64)

    def reconstruct(self, key: int) -> np.ndarray:
        tier = self._ensure_tier()
        rec = self._tier.reconstruct(
            jnp.asarray([key], jnp.int32), self.codec)
        return np.asarray(rec)[0]
