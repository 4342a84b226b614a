"""On-chip Lloyd's k-means — TPU counterpart of faiss `Clustering`
(faiss/Clustering.{h,cpp}).

The reference's `Clustering::train_encoded` (Clustering.cpp:283-568) runs
`niter` rounds of {assign via index.search, compute_centroids (OMP reduce),
split_clusters}. Here assignment is the blocked MXU k-NN from
`ops.distances.knn`, the centroid update is a segment-sum on device, and the
empty-cluster fix follows Clustering.cpp:232 `split_clusters`: every empty
cluster steals a large cluster's centroid with a symmetric ±epsilon
perturbation. Sub-sampling of the training set follows
`max_points_per_centroid` (ClusteringParameters defaults,
faiss/Clustering.h:21-60).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import distances as D


@dataclasses.dataclass
class ClusteringParameters:
    """Defaults mirror faiss/Clustering.h:21-60 (niter=25; IVF training uses
    niter=10 per IndexIVF.cpp:55)."""

    niter: int = 25
    nredo: int = 1
    verbose: bool = False
    spherical: bool = False
    int_centroids: bool = False
    min_points_per_centroid: int = 39
    max_points_per_centroid: int = 256
    seed: int = 1234
    # Stop Lloyd's early once the relative objective improvement drops
    # below this (0 = run all niter iterations, the faiss behavior —
    # Clustering.cpp has no early stop; this is a build-throughput knob
    # for internal callers like the HNSW knn-candidates phase, which
    # only needs assignment-quality clusters, not converged ones).
    early_stop_tol: float = 0.0


@dataclasses.dataclass
class ClusteringIterationStats:
    """Per-iteration stats (faiss/Clustering.h:62-68)."""

    obj: float
    imbalance_factor: float
    nsplit: int


def imbalance_factor(counts: np.ndarray) -> float:
    """Faiss utils::imbalance_factor: n * sum(c^2) / (sum c)^2."""
    counts = np.asarray(counts, np.float64)
    tot = counts.sum()
    if tot == 0:
        return 0.0
    return float(len(counts) * (counts**2).sum() / (tot * tot))


def segment_sums(x, assign, k: int, chunk: int = 16384):
    """Per-segment (sums (k, d), counts (k,)) as a chunked one-hot GEMM
    (compute_centroids, Clustering.cpp:151). A scatter-add here costs
    ~44 s/iteration at 500k x 3906 on v5e (XLA serializes TPU scatters);
    onehot^T @ x is one MXU contraction at assignment cost. One-hot
    entries are exact in bf16; accumulation is f32."""
    n, d = x.shape
    nch = -(-n // chunk)
    npad = nch * chunk
    xp = jnp.pad(x, ((0, npad - n), (0, 0))).reshape(nch, chunk, d)
    ap = jnp.pad(assign, (0, npad - n),
                 constant_values=-1).reshape(nch, chunk)
    kiota = lax.broadcasted_iota(jnp.int32, (chunk, k), 1)

    def body(i, carry):
        sums, counts = carry
        # f32 one-hot: XLA's multi-pass f32 MXU path keeps the update
        # exact enough for equivalence-to-serial oracles
        oh = (ap[i][:, None] == kiota).astype(jnp.float32)    # (CH, k)
        sums = sums + jax.lax.dot_general(
            oh, xp[i],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (k, d)
        counts = counts + jnp.sum(oh, axis=0, dtype=jnp.float32)
        return sums, counts

    return lax.fori_loop(
        0, nch, body,
        (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)))


@functools.partial(jax.jit, static_argnames=("k", "metric", "spherical"))
def _kmeans_iter(x, centroids, key, k: int, metric: int, spherical: bool):
    """One Lloyd iteration: assign, segment-sum update, split empties.

    Returns (new_centroids, assign, obj, nsplit)."""
    n, d = x.shape
    dis, assign = D.knn(x, centroids, 1, metric,
                        precision=lax.Precision.DEFAULT)
    assign = assign[:, 0]
    obj = jnp.sum(dis[:, 0])

    sums, counts = segment_sums(x, assign, k)
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    # imbalance on device (Clustering.cpp imbalance_factor) so the host
    # driver needs ONE small download per iteration, not three
    tot = jnp.maximum(jnp.sum(counts), 1.0)
    imb = k * jnp.sum(counts * counts) / (tot * tot)

    # split_clusters (Clustering.cpp:232): empty cluster <- biggest cluster's
    # centroid +- epsilon. Deterministic ranking stands in for the
    # probabilistic choice; epsilon = 1/1024 relative symmetric perturbation.
    empty = counts == 0
    nsplit = jnp.sum(empty.astype(jnp.int32))
    order = jnp.argsort(-counts)  # big clusters first
    rank_among_empty = jnp.cumsum(empty.astype(jnp.int32)) - 1
    donor = order[jnp.clip(rank_among_empty, 0, k - 1) % k]
    eps = 1.0 / 1024.0
    sign = jax.random.rademacher(key, (k, d), jnp.float32)
    donated = new_c[donor] * (1.0 + eps * sign)
    new_c = jnp.where(empty[:, None], donated, new_c)

    if spherical:
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        new_c = new_c / jnp.maximum(norms, 1e-12)
    stats_vec = jnp.stack([obj, imb, nsplit.astype(jnp.float32)])
    return new_c, stats_vec


def subsample_training_set(
    x: np.ndarray, k: int, max_ppc: int, seed: int, verbose: bool = False
) -> np.ndarray:
    """Clustering.cpp:330 — cap training points at k * max_points_per_centroid
    with a seeded random permutation."""
    n = len(x)
    cap = k * max_ppc
    if n <= cap:
        return x
    rs = np.random.RandomState(seed)
    perm = rs.choice(n, size=cap, replace=False)
    return x[perm]


def kmeans(
    x,
    k: int,
    params: Optional[ClusteringParameters] = None,
    metric: int = D.METRIC_L2,
    init_centroids: Optional[np.ndarray] = None,
    checkpoint: Optional[str] = None,
) -> Tuple[np.ndarray, list]:
    """Train k-means; returns (centroids (k, d) float32, iteration_stats).

    Equivalent of faiss `kmeans_clustering()` + `Clustering::train`. nredo
    restarts keep the run with the best final objective
    (Clustering.cpp train loop). `checkpoint` persists centroids after
    every iteration and resumes a killed run
    (contrib/clustering.py kmeans(checkpoint=), clustering.py:346)."""
    cp = params or ClusteringParameters()
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    if n < k:
        raise ValueError(f"nx={n} < k={k}: not enough training points")
    xt = subsample_training_set(x, k, cp.max_points_per_centroid, cp.seed,
                                cp.verbose)
    if cp.verbose and len(xt) < len(x):
        print(f"kmeans: subsampled {len(x)} -> {len(xt)} points")
    if len(xt) < k * cp.min_points_per_centroid and cp.verbose:
        print(f"WARNING kmeans: only {len(xt)} points for {k} centroids")

    xt_dev = jnp.asarray(xt)
    best = None
    for redo in range(max(cp.nredo, 1)):
        rs = np.random.RandomState(cp.seed + redo)
        if init_centroids is not None and redo == 0:
            cent = jnp.asarray(init_centroids, dtype=jnp.float32)
            assert cent.shape == (k, d)
        else:
            perm = rs.choice(len(xt), size=k, replace=False)
            cent = xt_dev[jnp.asarray(perm)]
        if cp.spherical:
            cent = cent / jnp.maximum(
                jnp.linalg.norm(cent, axis=1, keepdims=True), 1e-12
            )
        key = jax.random.PRNGKey(cp.seed + 31 * redo)
        stats = []
        obj = np.inf
        it0 = 0
        if checkpoint is not None and redo == 0:
            import os
            import pickle

            if os.path.exists(checkpoint):
                with open(checkpoint, "rb") as f:
                    st = pickle.load(f)
                cent = jnp.asarray(st["centroids"])
                it0 = int(st["iter"]) + 1
                # fresh key stream for the resumed segment (deterministic
                # given seed + resume point)
                key = jax.random.PRNGKey(cp.seed + 1000 + it0)
                if cp.verbose:
                    print(f"kmeans: resuming at iter {it0}")
        for it in range(it0, cp.niter):
            from ..utils.interrupt import InterruptCallback

            InterruptCallback.check()
            key, sub = jax.random.split(key)
            cent, stats_vec = _kmeans_iter(
                xt_dev, cent, sub, k, metric, cp.spherical
            )
            sv = np.asarray(stats_vec)        # one sync per iteration
            obj = float(sv[0])
            st = ClusteringIterationStats(
                obj=obj,
                imbalance_factor=float(sv[1]),
                nsplit=int(sv[2]),
            )
            stats.append(st)
            if checkpoint is not None and redo == 0:
                import pickle

                tmp = checkpoint + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump({"centroids": np.asarray(cent),
                                 "iter": it, "key": None}, f)
                import os

                os.replace(tmp, checkpoint)
            if cp.verbose:
                print(
                    f"  iter {it}: obj={st.obj:.4g} "
                    f"imbalance={st.imbalance_factor:.3f} nsplit={st.nsplit}"
                )
            if (cp.early_stop_tol > 0 and len(stats) >= 2
                    and np.isfinite(stats[-2].obj) and stats[-2].obj != 0):
                rel = abs(stats[-2].obj - obj) / abs(stats[-2].obj)
                if rel < cp.early_stop_tol:
                    if cp.verbose:
                        print(f"  early stop at iter {it}: "
                              f"rel improvement {rel:.2e}")
                    break
        # inner-product / spherical objective is a summed similarity:
        # higher is better, so nredo keeps the max (Clustering.cpp keeps
        # min for L2, max for IP)
        better = (obj > best[0] if D.is_similarity_metric(metric)
                  else obj < best[0]) if best is not None else True
        if better:
            best = (obj, np.asarray(cent), stats)
    return best[1], best[2]


def progressive_dim_clustering(
    x,
    k: int,
    params: Optional[ClusteringParameters] = None,
    metric: int = D.METRIC_L2,
    levels: int = 4,
) -> Tuple[np.ndarray, list]:
    """ProgressiveDimClustering (faiss/Clustering.h:174): run k-means on a
    nested sequence of dimension prefixes (after a PCA rotation the data
    is sorted by variance), warm-starting each level with the previous
    centroids zero-padded to the wider prefix. Good for PQ sub-training.
    """
    cp = params or ClusteringParameters()
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    # PCA rotation so prefixes carry the most variance
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / n
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w)
    rot = v[:, order].astype(np.float32)
    xr = xc @ rot
    dims = [max(1, d >> (levels - 1 - i)) for i in range(levels)]
    dims[-1] = d
    cent: Optional[np.ndarray] = None
    stats: list = []
    for dd in dims:
        sub = np.ascontiguousarray(xr[:, :dd])
        init = None
        if cent is not None:
            init = np.zeros((k, dd), np.float32)
            init[:, : cent.shape[1]] = cent
        cent, st = kmeans(sub, k, cp, metric, init_centroids=init)
        stats.extend(st)
    # rotate back to the input space
    full = cent @ rot.T + mean
    return full.astype(np.float32), stats


class Kmeans:
    """Object wrapper matching faiss.Kmeans (python/extra_wrappers.py:443)."""

    def __init__(self, d: int, k: int, **kwargs):
        self.d, self.k = d, k
        gpu = kwargs.pop("gpu", None)  # accepted for API parity, ignored
        del gpu
        metric = kwargs.pop("metric", D.METRIC_L2)
        self.metric = metric
        self.cp = ClusteringParameters(
            **{f.name: kwargs.pop(f.name) for f in
               dataclasses.fields(ClusteringParameters) if f.name in kwargs}
        )
        if kwargs:
            raise TypeError(f"unknown Kmeans args: {sorted(kwargs)}")
        self.centroids: Optional[np.ndarray] = None
        self.obj: Optional[np.ndarray] = None
        self.iteration_stats: list = []

    def train(self, x, init_centroids=None) -> float:
        self.centroids, self.iteration_stats = kmeans(
            x, self.k, self.cp, self.metric, init_centroids=init_centroids
        )
        self.obj = np.array([s.obj for s in self.iteration_stats])
        return float(self.obj[-1]) if len(self.obj) else 0.0

    def assign(self, x):
        dis, ids = D.knn(jnp.asarray(np.ascontiguousarray(x, np.float32)),
                         jnp.asarray(self.centroids), 1, self.metric)
        return np.asarray(dis)[:, 0], np.asarray(ids)[:, 0]


def kmeans1d(x: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact 1-D k-means by dynamic programming over the sorted values
    (faiss impl/kmeans1d.{h,cpp} smawk-based Clustering1D; this is the
    O(n*k) DP with prefix sums — exact, same optimum).

    Returns (centroids (k,), assignment (n,))."""
    x = np.asarray(x, np.float64).ravel()
    n = len(x)
    if n < k:
        raise ValueError(f"n={n} < k={k}")
    order = np.argsort(x)
    xs = x[order]
    ps = np.concatenate([[0.0], np.cumsum(xs)])
    ps2 = np.concatenate([[0.0], np.cumsum(xs * xs)])

    def seg_cost(i, j):
        # cost of cluster covering xs[i:j] (j exclusive)
        cnt = j - i
        s = ps[j] - ps[i]
        s2 = ps2[j] - ps2[i]
        return s2 - s * s / cnt

    INF = np.inf
    dp = np.full((k + 1, n + 1), INF)
    arg = np.zeros((k + 1, n + 1), np.int64)
    dp[0, 0] = 0.0
    for c in range(1, k + 1):
        for j in range(c, n - (k - c) + 1):
            best, bi = INF, c - 1
            for i in range(c - 1, j):
                v = dp[c - 1, i] + seg_cost(i, j)
                if v < best:
                    best, bi = v, i
            dp[c, j] = best
            arg[c, j] = bi
    # backtrack boundaries
    bounds = [n]
    j = n
    for c in range(k, 0, -1):
        j = int(arg[c, j])
        bounds.append(j)
    bounds = bounds[::-1]
    cent = np.zeros(k, np.float32)
    assign_sorted = np.zeros(n, np.int64)
    for c in range(k):
        i, j = bounds[c], bounds[c + 1]
        cent[c] = xs[i:j].mean()
        assign_sorted[i:j] = c
    assign = np.zeros(n, np.int64)
    assign[order] = assign_sorted
    return cent, assign
