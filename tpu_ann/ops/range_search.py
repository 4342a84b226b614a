"""Range search — faiss `Index::range_search` + `RangeSearchResult`
(impl/AuxIndexStructures.h:30-131).

The reference accumulates variable-length per-query result buffers
(BufferList) under OMP. Here each database block's distance matrix is
masked on device and compacted host-side into the same (lims, D, I) CSR
triple the reference returns. L2: keep dis < radius; IP: keep dis > radius
(faiss convention)."""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from . import distances as D


@dataclasses.dataclass
class RangeSearchResult:
    """CSR result triple (faiss RangeSearchResult: lims/labels/distances)."""

    lims: np.ndarray       # (nq+1,) int64
    distances: np.ndarray  # (lims[-1],) float32
    labels: np.ndarray     # (lims[-1],) int64

    @property
    def nq(self) -> int:
        return len(self.lims) - 1


def csr_from_hits(nq: int, hits_d, hits_i,
                  dtype=np.float32) -> RangeSearchResult:
    """Compact per-query hit lists into the (lims, D, I) CSR triple —
    the BufferList→RangeSearchResult step, shared by every range-search
    producer (float blocked/IVF scans, binary scans, blockwise GT)."""
    lims = np.zeros(nq + 1, np.int64)
    for i in range(nq):
        lims[i + 1] = lims[i] + sum(len(h) for h in hits_d[i])
    dd = np.zeros(lims[-1], dtype)
    ii = np.zeros(lims[-1], np.int64)
    for i in range(nq):
        if lims[i + 1] > lims[i]:
            dd[lims[i]: lims[i + 1]] = np.concatenate(hits_d[i])
            ii[lims[i]: lims[i + 1]] = np.concatenate(hits_i[i])
    return RangeSearchResult(lims=lims, distances=dd, labels=ii)


def range_search_blocked(
    xq: np.ndarray,
    xb_dev: jnp.ndarray,
    radius: float,
    metric: int = D.METRIC_L2,
    *,
    valid_n: int,
    db_block: int = 65536,
    q_block: int = 4096,
) -> RangeSearchResult:
    """Blocked exact range search against a device-resident database."""
    nq = len(xq)
    keep_gt = D.is_similarity_metric(metric)
    hits_d: List[List[np.ndarray]] = [[] for _ in range(nq)]
    hits_i: List[List[np.ndarray]] = [[] for _ in range(nq)]

    for q0 in range(0, nq, q_block):
        q1 = min(q0 + q_block, nq)
        xq_dev = jnp.asarray(xq[q0:q1])
        for b0 in range(0, valid_n, db_block):
            b1 = min(b0 + db_block, valid_n)
            dis = D.pairwise_distances(xq_dev, xb_dev[b0:b1], metric)
            dis = np.asarray(dis)
            mask = dis > radius if keep_gt else dis < radius
            qi, bi = np.nonzero(mask)
            for row in np.unique(qi):
                sel = qi == row
                hits_d[q0 + row].append(dis[row, bi[sel]])
                hits_i[q0 + row].append(b0 + bi[sel])

    return csr_from_hits(nq, hits_d, hits_i)


def range_search_decoded(
    xq: np.ndarray,
    decode_block,
    n: int,
    radius: float,
    metric: int = D.METRIC_L2,
    *,
    db_block: int = 65536,
    q_block: int = 4096,
) -> RangeSearchResult:
    """Blocked range search over a coded database — the
    `IndexFlatCodes::range_search` role (faiss/IndexFlatCodes.h:65, which
    drives the codec's DistanceComputer over every stored code).

    `decode_block(i0, i1)` returns the decoded f32 rows [i0, i1) — coded
    flat indexes (PQ/SQ/...) decode blockwise on device, and the exact
    distance against the decoded rows equals the reference's asymmetric
    codec distance."""
    nq = len(xq)
    keep_gt = D.is_similarity_metric(metric)
    hits_d: List[List[np.ndarray]] = [[] for _ in range(nq)]
    hits_i: List[List[np.ndarray]] = [[] for _ in range(nq)]

    for b0 in range(0, n, db_block):
        b1 = min(b0 + db_block, n)
        xb_dev = jnp.asarray(decode_block(b0, b1))
        for q0 in range(0, nq, q_block):
            q1 = min(q0 + q_block, nq)
            dis = np.asarray(D.pairwise_distances(
                jnp.asarray(xq[q0:q1]), xb_dev, metric))
            mask = dis > radius if keep_gt else dis < radius
            qi, bi = np.nonzero(mask)
            for row in np.unique(qi):
                sel = qi == row
                hits_d[q0 + row].append(dis[row, bi[sel]])
                hits_i[q0 + row].append(b0 + bi[sel])

    return csr_from_hits(nq, hits_d, hits_i)


def range_search_flatcodes(index, x, radius: float,
                           codes=None) -> tuple:
    """Generic coded-flat range search for any index exposing
    `sa_decode` over stored codes — the default every IndexFlatCodes
    descendant inherits in the reference (faiss/IndexFlatCodes.h:65).
    Returns the (lims, D, I) tuple directly."""
    x = index._check_input(x)
    if index.ntotal == 0:
        return (np.zeros(len(x) + 1, np.int64), np.zeros(0, np.float32),
                np.zeros(0, np.int64))
    if codes is None:
        codes = index._codes
    codes = np.asarray(codes)

    def decode_block(i0, i1):
        return index.sa_decode(codes[i0:i1])

    res = range_search_decoded(x, decode_block, index.ntotal, radius,
                               index.metric_type)
    return res.lims, res.distances, res.labels


def range_search_ivf(
    xq: np.ndarray,
    probes: np.ndarray,
    invlists,
    radius: float,
    metric: int = D.METRIC_L2,
    *,
    max_nblocks: int,
    chunk_blocks: int = 16,
) -> RangeSearchResult:
    """IVF range search (IndexIVF::range_search): scan probed lists and keep
    every hit within the radius. Distances come off the device in block
    chunks; compaction to the CSR triple happens host-side (BufferList
    role)."""
    from .ivf_scan import _compact_block_table

    nq, d = xq.shape
    keep_gt = D.is_similarity_metric(metric)
    NB = invlists.nblocks
    buffer, total = _compact_block_table(
        jnp.asarray(probes, jnp.int32), invlists.list_block_start,
        invlists.list_nblocks, max_nblocks, NB)
    buffer = np.asarray(buffer)
    W = buffer.shape[1]
    xq_dev = jnp.asarray(xq)
    qn = np.asarray(jnp.sum(xq_dev * xq_dev, axis=1))

    hits_d: List[List[np.ndarray]] = [[] for _ in range(nq)]
    hits_i: List[List[np.ndarray]] = [[] for _ in range(nq)]
    maxw = int(np.asarray(total).max(initial=0))
    for c0 in range(0, min(maxw, W), chunk_blocks):
        c1 = min(c0 + chunk_blocks, W)
        bids = jnp.asarray(buffer[:, c0:c1])
        vecs = invlists.data[bids]
        vids = np.asarray(invlists.ids[bids])
        ip = np.asarray(jnp.einsum(
            "qd,qcbd->qcb", xq_dev, vecs,
            preferred_element_type=jnp.float32))
        if keep_gt:
            dis = ip
        else:
            vnorm = np.asarray(invlists.norms[bids])
            dis = np.maximum(qn[:, None, None] + vnorm - 2.0 * ip, 0.0)
        valid = vids >= 0
        mask = valid & (dis > radius if keep_gt else dis < radius)
        qi, ci, bi = np.nonzero(mask)
        for row in np.unique(qi):
            sel = qi == row
            hits_d[row].append(dis[row, ci[sel], bi[sel]])
            hits_i[row].append(vids[row, ci[sel], bi[sel]])

    return csr_from_hits(nq, hits_d, hits_i)
