"""Extra metrics beyond L2/IP — faiss `utils/extra_distances.{h,cpp}` +
`extra_distances-inl.h` (L1, Linf, Lp, Canberra, BrayCurtis,
JensenShannon, Jaccard, NaNEuclidean, ABS_INNER_PRODUCT).

These have no GEMM decomposition, so — exactly like the reference's
scalar loops — they run as blocked broadcast reductions on the VPU:
each (q_block, db_block) tile materializes |x - y| style terms in
registers/VMEM and reduces over d. Distances (lower better) use a
running min-k merge; similarity metrics (Jaccard) a max-k merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# numeric values match faiss MetricType.h:23-40
METRIC_L1 = 2
METRIC_Linf = 3
METRIC_Lp = 4
METRIC_Canberra = 20
METRIC_BrayCurtis = 21
METRIC_JensenShannon = 22
METRIC_Jaccard = 23
METRIC_NaNEuclidean = 24
METRIC_ABS_INNER_PRODUCT = 25

EXTRA_METRICS = (METRIC_L1, METRIC_Linf, METRIC_Lp, METRIC_Canberra,
                 METRIC_BrayCurtis, METRIC_JensenShannon, METRIC_Jaccard,
                 METRIC_NaNEuclidean, METRIC_ABS_INNER_PRODUCT)


def is_similarity_extra(metric: int) -> bool:
    """Jaccard is the one extra similarity metric
    (MetricType.h:49 is_similarity_metric)."""
    return metric == METRIC_Jaccard


def _tile_distances(xq, xb, metric: int, metric_arg: float):
    """(nq, d) x (nb, d) -> (nq, nb) for one tile; formulas are the
    reference's extra_distances-inl.h specializations."""
    x = xq[:, None, :]
    y = xb[None, :, :]
    if metric == METRIC_L1:
        return jnp.sum(jnp.abs(x - y), axis=-1)
    if metric == METRIC_Linf:
        return jnp.max(jnp.abs(x - y), axis=-1)
    if metric == METRIC_Lp:
        return jnp.sum(jnp.abs(x - y) ** metric_arg, axis=-1)
    if metric == METRIC_Canberra:
        den = jnp.abs(x) + jnp.abs(y)
        return jnp.sum(jnp.where(den > 0, jnp.abs(x - y)
                                 / jnp.maximum(den, 1e-38), 0.0), axis=-1)
    if metric == METRIC_BrayCurtis:
        num = jnp.sum(jnp.abs(x - y), axis=-1)
        den = jnp.sum(jnp.abs(x + y), axis=-1)
        return num / jnp.maximum(den, 1e-38)
    if metric == METRIC_JensenShannon:
        m = 0.5 * (x + y)
        kl1 = jnp.where(x > 0, -x * jnp.log(jnp.maximum(m, 1e-38)
                                            / jnp.maximum(x, 1e-38)), 0.0)
        kl2 = jnp.where(y > 0, -y * jnp.log(jnp.maximum(m, 1e-38)
                                            / jnp.maximum(y, 1e-38)), 0.0)
        return 0.5 * jnp.sum(kl1 + kl2, axis=-1)
    if metric == METRIC_Jaccard:
        # positive inputs only, like the reference
        num = jnp.sum(jnp.minimum(x, y), axis=-1)
        den = jnp.sum(jnp.maximum(x, y), axis=-1)
        return num / jnp.maximum(den, 1e-38)
    if metric == METRIC_NaNEuclidean:
        ok = ~(jnp.isnan(x) | jnp.isnan(y))
        diff = jnp.where(ok, x - y, 0.0)
        accu = jnp.sum(diff * diff, axis=-1)
        present = jnp.sum(ok, axis=-1)
        d = xq.shape[1]
        return jnp.where(present > 0,
                         d / jnp.maximum(present, 1) * accu, jnp.nan)
    if metric == METRIC_ABS_INNER_PRODUCT:
        return jnp.sum(jnp.abs(x * y), axis=-1)
    raise ValueError(f"unknown extra metric {metric}")


@functools.partial(jax.jit, static_argnames=("metric",))
def _pairwise_jit(xq, xb, metric: int, metric_arg):
    return _tile_distances(xq, xb, metric, metric_arg)


def pairwise_extra_distances(xq, xb, metric: int, metric_arg: float = 0.0,
                             q_block: int = 1024, db_block: int = 4096):
    """(nq, nb) distance/similarity matrix
    (utils/extra_distances.h pairwise_extra_distances)."""
    xq = np.ascontiguousarray(xq, np.float32)
    xb = np.ascontiguousarray(xb, np.float32)
    nq, nb = len(xq), len(xb)
    out = np.empty((nq, nb), np.float32)
    for q0 in range(0, nq, q_block):
        q1 = min(q0 + q_block, nq)
        xq_d = jnp.asarray(xq[q0:q1])
        for b0 in range(0, nb, db_block):
            b1 = min(b0 + db_block, nb)
            out[q0:q1, b0:b1] = np.asarray(_pairwise_jit(
                xq_d, jnp.asarray(xb[b0:b1]), metric,
                jnp.float32(metric_arg)))
    return out


@functools.partial(jax.jit, static_argnames=("k", "metric", "db_block"))
def knn_extra_metrics(xq, xb, k: int, metric: int,
                      metric_arg=0.0, *, valid_n=None,
                      db_block: int = 4096):
    """Exact k-NN under an extra metric (utils/extra_distances.h
    knn_extra_metrics): blocked tile scan + running k merge. Returns
    (D, I); D ascending for distances, descending for Jaccard."""
    sim = is_similarity_extra(metric)
    nq = xq.shape[0]
    nb = xb.shape[0]
    if valid_n is None:
        valid_n = jnp.int32(nb)
    BAD = jnp.float32(-np.inf if sim else np.inf)

    block = min(db_block, max(nb, 1))
    nblocks = -(-nb // block)
    pad = nblocks * block - nb
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
    xb_r = xb.reshape(nblocks, block, xq.shape[1])

    def body(i, carry):
        bd, bi = carry
        dis = _tile_distances(xq, xb_r[i], metric, metric_arg)
        ids = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
        dis = jnp.where(ids < valid_n, dis, BAD)
        ids = jnp.broadcast_to(ids, dis.shape)
        cd = jnp.concatenate([bd, dis], axis=1)
        ci = jnp.concatenate([bi, ids], axis=1)
        nv, pos = lax.top_k(cd if sim else -cd, k)
        return (nv if sim else -nv,
                jnp.take_along_axis(ci, pos, axis=1))

    init = (jnp.full((nq, k), BAD, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    bd, bi = lax.fori_loop(0, nblocks, body, init)
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)
