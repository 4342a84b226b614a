"""L0 distance substrate — TPU-native replacement for faiss `utils/distances.{h,cpp}`.

The reference computes exact k-NN either with a sequential SIMD scan
(`exhaustive_L2sqr_seq`, utils/distances.cpp:170) or a BLAS-tiled path
(`exhaustive_L2sqr_blas`, utils/distances.cpp:259-345) using the
``||x||^2 + ||y||^2 - 2<x,y>`` expansion, feeding per-block results into heap
ResultHandlers.  On TPU the same decomposition maps directly onto the MXU:
one GEMM per (query-tile x database-block) plus a fused top-k merge, so there
is a single code path instead of a SIMD/BLAS dispatch
(cf. utils/distances.cpp:885 `knn_L2sqr`).

Everything here is shape-static and jit-friendly; blocking over the database
bounds the live distance matrix exactly like the reference's
``distance_compute_blas_database_bs`` tiling (utils/distances.cpp:272).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# Metric identifiers (subset of faiss MetricType, faiss/MetricType.h).
METRIC_INNER_PRODUCT = 0
METRIC_L2 = 1

_METRICS = (METRIC_INNER_PRODUCT, METRIC_L2)


def _check_metric(metric: int) -> None:
    if metric not in _METRICS:
        raise ValueError(f"unsupported metric {metric!r}")


def l2_norms(x: jnp.ndarray, *, precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Row-wise squared L2 norms (= faiss `fvec_norms_L2sqr`)."""
    x = x.astype(jnp.float32)
    return jnp.einsum("nd,nd->n", x, x, precision=precision)


def pairwise_inner_product(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    *,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(nq, nb) inner products on the MXU."""
    return jnp.dot(
        xq.astype(jnp.float32),
        xb.astype(jnp.float32).T,
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def pairwise_l2sqr(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    *,
    xb_norms: Optional[jnp.ndarray] = None,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(nq, nb) squared L2 distances via the norm expansion.

    Equivalent of faiss `pairwise_L2sqr` (utils/distances.cpp). ``xb_norms``
    plays the role of IndexFlatL2's `cached_l2norms` (faiss/IndexFlat.h:108).
    """
    ip = pairwise_inner_product(xq, xb, precision=precision)
    qn = l2_norms(xq, precision=precision)
    bn = l2_norms(xb, precision=precision) if xb_norms is None else xb_norms
    d = qn[:, None] + bn[None, :] - 2.0 * ip
    return jnp.maximum(d, 0.0)


def pairwise_distances(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    metric: int = METRIC_L2,
    *,
    xb_norms: Optional[jnp.ndarray] = None,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Pairwise distance matrix. For IP the returned values are *similarities*
    (bigger is better), matching faiss conventions."""
    _check_metric(metric)
    if metric == METRIC_L2:
        return pairwise_l2sqr(xq, xb, xb_norms=xb_norms, precision=precision)
    return pairwise_inner_product(xq, xb, precision=precision)


def is_similarity_metric(metric: int) -> bool:
    return metric == METRIC_INNER_PRODUCT


def worst_value(metric: int) -> float:
    """Sentinel 'infinitely bad' distance for the metric."""
    return -jnp.inf if is_similarity_metric(metric) else jnp.inf


def _topk_best(dis: jnp.ndarray, k: int, metric: int):
    """Per-row best-k of a distance block. Returns (vals, idx) best-first."""
    if is_similarity_metric(metric):
        v, i = lax.top_k(dis, k)
        return v, i
    v, i = lax.top_k(-dis, k)
    return -v, i


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "db_block", "q_block", "precision",
                     "compute_dtype", "approx", "refine_factor"),
)
def knn(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    k: int,
    metric: int = METRIC_L2,
    *,
    xb_norms: Optional[jnp.ndarray] = None,
    valid_n: Optional[jnp.ndarray] = None,
    id_mask: Optional[jnp.ndarray] = None,
    db_block: int = 131072,
    q_block: int = 16384,
    precision=lax.Precision.HIGHEST,
    compute_dtype: str = "float32",
    approx: bool = False,
    refine_factor: int = 1,
):
    """Exact k-NN: blocked MXU GEMM + top-k merge.

    TPU analog of faiss `knn_L2sqr` / `knn_inner_product`
    (utils/distances.cpp:885,1061): the database is processed in blocks of
    ``db_block`` rows and queries in tiles of ``q_block`` (the role of the
    reference's bs_x x bs_y sgemm tiling, utils/distances.cpp:272-273), so
    the live distance matrix is bounded at q_block x db_block; each block's
    distances are one GEMM merged into a running per-query top-k (the role
    of HeapBlockResultHandler, impl/ResultHandler.h).

    Args:
      xq: (nq, d) queries.
      xb: (nb, d) database; may be capacity-padded, see ``valid_n``.
      k: neighbors to return.
      valid_n: optional scalar count of valid database rows; rows >= valid_n
        are masked to the metric's worst value (supports capacity-padded
        device storage).
      id_mask: optional (nb,) uint8/bool allow-mask (IDSelector lowered to
        a bitmap, faiss impl/IDSelector.h); masked-out rows get the worst
        value.
      compute_dtype: "float32" (exact) or "bfloat16" — bf16 runs the GEMM
        at the MXU's native rate (norm corrections stay f32); measured
        top-10 overlap with f32 is ~1.0 on SIFT-like data.
      approx: use `lax.approx_max_k` (the TPU-native partial-reduction
        top-k) per block instead of exact `lax.top_k` — ~10x faster at
        ~0.997 top-10 recall; the cross-block merge stays exact.
      refine_factor: >1 selects refine_factor*k candidates with the fast
        (bf16/approx) pass, then re-scores them exactly in f32 and keeps
        the true top-k — the IndexRefineFlat trick fused into the kernel;
        recovers near-exact recall at bf16/approx speed.
    Returns:
      (D, I): (nq, k) distances (L2: ascending; IP: descending similarities)
      and int32 ids; invalid slots get id -1.
    """
    _check_metric(metric)
    nq, d = xq.shape

    if nq > q_block:
        ntiles = -(-nq // q_block)
        # balance tiles to minimize padding waste (10000 queries at
        # q_block=8192 would otherwise pad to 16384 rows of GEMM)
        tile_n = ((-(-nq // ntiles)) + 255) // 256 * 256
        qpad = ntiles * tile_n - nq
        xq_t = jnp.pad(xq, ((0, qpad), (0, 0))).reshape(ntiles, tile_n, d)

        def tile(xq_i):
            return knn(
                xq_i, xb, k, metric, xb_norms=xb_norms, valid_n=valid_n,
                id_mask=id_mask, db_block=db_block, q_block=q_block,
                precision=precision, compute_dtype=compute_dtype,
                approx=approx, refine_factor=refine_factor,
            )

        Dt, It = lax.map(tile, xq_t)
        return (Dt.reshape(ntiles * tile_n, k)[:nq],
                It.reshape(ntiles * tile_n, k)[:nq])
    nb = xb.shape[0]
    xq = xq.astype(jnp.float32)

    block = min(db_block, max(nb, 1))
    nblocks = -(-nb // block)
    pad = nblocks * block - nb
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
        if xb_norms is not None:
            xb_norms = jnp.pad(xb_norms, (0, pad))
        if id_mask is not None:
            id_mask = jnp.pad(id_mask, (0, pad))
    if valid_n is None:
        valid_n = jnp.int32(nb)
    else:
        valid_n = jnp.asarray(valid_n, jnp.int32)

    bad = worst_value(metric)
    qn = l2_norms(xq, precision=precision) if metric == METRIC_L2 else None
    bf16 = compute_dtype == "bfloat16"
    xq_c = xq.astype(jnp.bfloat16) if bf16 else xq

    def block_scores(yb, bn, bmask, base):
        """Block distance matrix. Two fusion rules, both measured on-chip:
        (1) ids are NEVER materialized — the local column index IS the id,
        callers derive global ids from top-k positions; (2) validity /
        selector masking happens on the (block,)-sized norm/bias VECTOR,
        never on the (nq, block) matrix — matrix-level where/clamp breaks
        the GEMM->top-k epilogue fusion and costs 2-3x in HBM traffic.
        Distances may come out slightly negative (no clamp), same as the
        reference's sgemm decomposition."""
        blockn = yb.shape[0]
        yb_c = yb.astype(jnp.bfloat16) if bf16 else yb
        ip = jnp.dot(
            xq_c, yb_c.T,
            precision=lax.Precision.DEFAULT if bf16 else precision,
            preferred_element_type=jnp.float32,
        )
        col = base + jnp.arange(blockn, dtype=jnp.int32)
        ok = col < valid_n
        if bmask is not None:
            ok = ok & (bmask != 0)
        if metric == METRIC_L2:
            if bn is None:
                bn = l2_norms(yb, precision=precision)
            bn_m = jnp.where(ok, bn, jnp.inf)
            dis = qn[:, None] + (bn_m[None, :] - 2.0 * ip)
        else:
            bias = jnp.where(ok, 0.0, -jnp.inf)
            dis = ip + bias[None, :]
        return dis

    def block_best(dis, kk):
        """Per-block best-kk: exact top_k or TPU approx_max_k."""
        if not approx:
            return _topk_best(dis, kk, metric)
        if is_similarity_metric(metric):
            return lax.approx_max_k(dis, kk)
        v, pos = lax.approx_max_k(-dis, kk)
        return -v, pos

    # candidate width: refine_factor*k fast-pass candidates are re-scored
    # exactly at the end (the IndexRefineFlat trick, fused)
    ksel = k if refine_factor <= 1 else min(refine_factor * k,
                                            nblocks * block)

    if nblocks == 1:
        dis = block_scores(xb, xb_norms, id_mask, jnp.int32(0))
        best_d, best_i = block_best(dis, min(ksel, dis.shape[1]))
    else:
        xb_r = xb.reshape(nblocks, block, d)
        norms_r = None if xb_norms is None else xb_norms.reshape(nblocks, block)
        mask_r = None if id_mask is None else id_mask.reshape(nblocks, block)
        kk = min(ksel, block)

        def body(i, carry):
            bd, bi = carry
            yb = xb_r[i]
            bn = None if norms_r is None else norms_r[i]
            bm = None if mask_r is None else mask_r[i]
            dis = block_scores(yb, bn, bm, i * block)
            # per-block best-k first, then an exact 2k-wide merge — the
            # k-wide merge is what keeps exact lax.top_k off the (nq,
            # block)-wide score matrix (10x the GEMM cost on TPU)
            bv, bpos = block_best(dis, kk)
            cd = jnp.concatenate([bd, bv], axis=1)
            ci = jnp.concatenate([bi, bpos + i * block], axis=1)
            nd, pos = _topk_best(cd, ksel, metric)
            return nd, jnp.take_along_axis(ci, pos, axis=1)

        init_d = jnp.full((nq, ksel), bad, jnp.float32)
        init_i = jnp.full((nq, ksel), -1, jnp.int32)
        best_d, best_i = lax.fori_loop(0, nblocks, body, (init_d, init_i))

    if ksel > k:
        # exact f32 re-scoring of the fast-pass candidates
        ok = jnp.isfinite(best_d) & (best_i >= 0)
        safe = jnp.where(ok, best_i, 0)
        vecs = xb[safe]                                  # (nq, ksel, d) f32
        ip = jnp.einsum("qd,qcd->qc", xq, vecs,
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        if metric == METRIC_L2:
            vn = jnp.sum(vecs * vecs, axis=2)
            rdis = jnp.maximum(qn[:, None] + vn - 2.0 * ip, 0.0)
        else:
            rdis = ip
        rdis = jnp.where(ok, rdis, bad)
        best_d, pos = _topk_best(rdis, k, metric)
        best_i = jnp.take_along_axis(best_i, pos, axis=1)

    if best_d.shape[1] < k:  # k > nb: pad with sentinels
        extra = k - best_d.shape[1]
        best_d = jnp.pad(best_d, ((0, 0), (0, extra)), constant_values=bad)
        best_i = jnp.pad(best_i, ((0, 0), (0, extra)), constant_values=-1)

    if metric == METRIC_L2:
        # the norm decomposition can yield tiny negatives; clamp only the
        # final (nq, k) values (the reference clamps too) — clamping the
        # full matrix would break the GEMM epilogue fusion
        best_d = jnp.maximum(best_d, 0.0)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i


def knn_l2sqr(xq, xb, k, **kw):
    return knn(xq, xb, k, METRIC_L2, **kw)


def knn_inner_product(xq, xb, k, **kw):
    return knn(xq, xb, k, METRIC_INNER_PRODUCT, **kw)
