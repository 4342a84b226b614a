"""Contrib tooling — counterparts of faiss `contrib/exhaustive_search.py`,
`contrib/big_batch_search.py`, `contrib/ivf_tools.py`, `contrib/ondisk.py`,
and `faiss/MatrixStats`.

- `knn_ground_truth`: blocked exact GT over an iterator of database chunks
  (contrib/exhaustive_search.py:24-80) — the database never has to fit in
  device memory at once.
- `big_batch_search`: batch-pipelined search with optional
  checkpoint/resume (contrib/big_batch_search.py:154-515) — partial result
  heaps are persisted so a killed job restarts where it stopped.
- `add_preassigned` / `search_preassigned`: IVF surgery
  (contrib/ivf_tools.py).
- `merge_indexes`: offline shard merging (contrib/ondisk.py merge_ondisk /
  IndexIVF::merge_from).
- `MatrixStats`: training-data diagnostics (faiss/MatrixStats.{h,cpp}).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from collections import deque
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np

from ..ops import distances as D
from ..ops import topk as T


def knn_ground_truth(
    xq: np.ndarray,
    db_iterator: Iterable[np.ndarray],
    k: int,
    metric: int = D.METRIC_L2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN over a streamed database (gt for recall tests)."""
    import jax.numpy as jnp

    nq = len(xq)
    xq_dev = jnp.asarray(np.ascontiguousarray(xq, np.float32))
    bad = D.worst_value(metric)
    bd = np.full((nq, k), bad, np.float32)
    bi = np.full((nq, k), -1, np.int64)
    base = 0
    similarity = D.is_similarity_metric(metric)
    for chunk in db_iterator:
        chunk = np.ascontiguousarray(chunk, np.float32)
        Dv, Iv = D.knn(xq_dev, jnp.asarray(chunk), min(k, len(chunk)), metric)
        Dv = np.asarray(Dv)
        Iv = np.asarray(Iv, np.int64)
        Iv = np.where(Iv >= 0, Iv + base, -1)
        if Dv.shape[1] < k:
            pad = k - Dv.shape[1]
            Dv = np.pad(Dv, ((0, 0), (0, pad)), constant_values=bad)
            Iv = np.pad(Iv, ((0, 0), (0, pad)), constant_values=-1)
        cd = np.concatenate([bd, Dv], axis=1)
        ci = np.concatenate([bi, Iv], axis=1)
        order = np.argsort(-cd if similarity else cd, axis=1)[:, :k]
        bd = np.take_along_axis(cd, order, axis=1)
        bi = np.take_along_axis(ci, order, axis=1)
        base += len(chunk)
    return bd, bi


def big_batch_search(
    index,
    xq: np.ndarray,
    k: int,
    *,
    batch_size: int = 8192,
    pipeline_depth: int = 3,
    checkpoint_path: Optional[str] = None,
    checkpoint_freq: int = 8,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Search a huge query set in batches with optional checkpoint/resume
    (contrib/big_batch_search.py semantics: on restart, completed batches
    are skipped)."""
    nq = len(xq)
    nbatch = -(-nq // batch_size)
    done = np.zeros(nbatch, bool)
    Dout = np.zeros((nq, k), np.float32)
    Iout = np.full((nq, k), -1, np.int64)

    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path, "rb") as f:
            st = pickle.load(f)
        done, Dout, Iout = st["done"], st["D"], st["I"]
        if verbose:
            print(f"big_batch_search: resuming, {done.sum()}/{nbatch} done")

    from .interrupt import InterruptCallback

    # Pipelined path (the reference's prepare/compute/finalize thread
    # pipeline, contrib/big_batch_search.py:234-515, recast for an async
    # device runtime): dispatching batch b's upload+compute is async, so
    # while the device works the host finalizes earlier batches
    # (device->host copy, id mapping, checkpoint pickle). `pipeline_depth`
    # batches stay in flight — depth>1 keeps the device queue non-empty
    # across the D2H stall of each finalize (measured on the v5e tunnel:
    # depth 2 is 1.35x depth 1), while bounding inflight device memory.
    search_device = getattr(index, "search_device", None)
    map_ids = getattr(index, "_map_ids", None)

    def finalize(entry):
        b, Dv, Iv = entry
        i0, i1 = b * batch_size, min((b + 1) * batch_size, nq)
        Dh, Ih = np.asarray(Dv)[:i1 - i0], np.asarray(Iv)[:i1 - i0]
        Dout[i0:i1] = Dh
        Iout[i0:i1] = map_ids(Ih) if map_ids is not None else Ih
        done[b] = True
        if checkpoint_path and (b % checkpoint_freq == 0 or b == nbatch - 1):
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"done": done, "D": Dout, "I": Iout}, f)
            os.replace(tmp, checkpoint_path)
        if verbose:
            print(f"big_batch_search: batch {b + 1}/{nbatch}")

    inflight: deque = deque()
    depth = max(1, int(pipeline_depth))
    for b in range(nbatch):
        InterruptCallback.check()
        if done[b]:
            continue
        i0, i1 = b * batch_size, min((b + 1) * batch_size, nq)
        if search_device is not None:
            import jax.numpy as jnp

            xh = (index._check_input(xq[i0:i1])
                  if hasattr(index, "_check_input") else
                  np.ascontiguousarray(xq[i0:i1], np.float32))
            if i1 - i0 < batch_size:
                # keep every dispatch shape-stable: a ragged final batch
                # would trigger a fresh XLA compile mid-stream (minutes on
                # a remote-compile tunnel); pad with row 0 and let
                # finalize() slice the real rows back out
                xh = np.concatenate(
                    [xh, np.broadcast_to(xh[:1],
                                         (batch_size - (i1 - i0),
                                          xh.shape[1]))])
            xq_dev = jnp.asarray(xh)
            inflight.append((b, *search_device(xq_dev, k)))  # async dispatch
            if len(inflight) > depth:
                finalize(inflight.popleft())    # overlaps with compute
        else:
            Dv, Iv = index.search(xq[i0:i1], k)
            finalize((b, Dv, Iv))
    while inflight:
        finalize(inflight.popleft())
    return Dout, Iout


def add_preassigned(index_ivf, x: np.ndarray, a: np.ndarray,
                    ids: Optional[np.ndarray] = None) -> None:
    """Add with precomputed coarse assignment (contrib/ivf_tools.py:
    add_preassigned) — skips the quantizer search."""
    x = np.ascontiguousarray(x, np.float32)
    a = np.asarray(a, np.int64)
    if ids is None:
        ids = np.arange(index_ivf.ntotal, index_ivf.ntotal + len(x),
                        dtype=np.int64)
    # O(chunk): the given assignment is cached with the chunk; existing
    # chunks keep their cached assignments through the repack
    index_ivf._append_chunk(x.copy(), np.asarray(ids, np.int64).copy(), a)
    index_ivf._repack()


def merge_indexes(dst, srcs) -> None:
    """Merge IVF shards into dst (IndexIVF::merge_from /
    contrib.ondisk.merge_ondisk): all must share the trained quantizer."""
    for src in srcs:
        if src.nlist != dst.nlist or src.d != dst.d:
            raise ValueError("incompatible shard")
        src._maybe_repack()
        # shards share the trained quantizer (contract above), so cached
        # assignments remain valid in dst
        for xs, ids, a in zip(src._xb_host, src._ids_host,
                              src._assign_host):
            dst._append_chunk(xs, ids, a)
    dst._repack()


@dataclasses.dataclass
class MatrixStats:
    """Training-set diagnostics (faiss/MatrixStats.{h,cpp})."""

    n: int
    d: int
    n_nan: int
    n_inf: int
    n_zero_rows: int
    n_dup_rows: int
    n_constant_dims: int
    min_norm2: float
    max_norm2: float
    comments: str

    @classmethod
    def compute(cls, x: np.ndarray) -> "MatrixStats":
        x = np.asarray(x, np.float32)
        n, d = x.shape
        n_nan = int(np.isnan(x).sum())
        n_inf = int(np.isinf(x).sum())
        norms = np.where(np.isfinite(x), x, 0).astype(np.float64)
        norms = (norms ** 2).sum(1)
        n_zero = int((norms == 0).sum())
        const_dims = int((x.max(0) == x.min(0)).sum()) if n else 0
        # duplicate rows via byte-level hashing (MatrixStats.cpp's
        # occurrence-count hashtable)
        if n:
            _, counts = np.unique(
                x.view(np.uint8).reshape(n, -1), axis=0,
                return_counts=True)
            n_dup = int((counts - 1).sum())
        else:
            n_dup = 0
        comments = []
        if n_nan:
            comments.append(f"{n_nan} NaN values")
        if n_inf:
            comments.append(f"{n_inf} non-finite values")
        if n_zero:
            comments.append(f"{n_zero} zero rows")
        if n_dup:
            comments.append(f"{n_dup} duplicate rows")
        if const_dims:
            comments.append(f"{const_dims} constant dimensions")
        if not comments:
            comments.append("no obvious problems")
        return cls(n=n, d=d, n_nan=n_nan, n_inf=n_inf,
                   n_zero_rows=n_zero, n_dup_rows=n_dup,
                   n_constant_dims=const_dims,
                   min_norm2=float(norms.min(initial=0)),
                   max_norm2=float(norms.max(initial=0)),
                   comments="; ".join(comments))


# ---------------------------------------------------------------------------
# inspect tools (contrib/inspect_tools.py)
# ---------------------------------------------------------------------------

def get_invlist(index_ivf, l: int) -> Tuple[np.ndarray, np.ndarray]:
    """ids and vectors/codes of one inverted list."""
    index_ivf._maybe_repack()
    il = index_ivf.invlists
    starts = np.asarray(il.list_block_start)
    nblk = np.asarray(il.list_nblocks)
    if nblk[l] == 0:
        width = (il.data.shape[2] if hasattr(il, "data")
                 else il.codes.shape[2])
        return np.zeros(0, np.int64), np.zeros((0, width))
    b0 = starts[l]
    ids = np.asarray(il.ids[b0 : b0 + nblk[l]]).reshape(-1)
    payload = (np.asarray(il.data[b0 : b0 + nblk[l]])
               if hasattr(il, "data")
               else np.asarray(il.codes[b0 : b0 + nblk[l]]))
    payload = payload.reshape(-1, payload.shape[-1])
    keep = ids >= 0
    return index_ivf._map_ids(ids[keep]), payload[keep]


def get_invlist_sizes(index_ivf) -> np.ndarray:
    return index_ivf.list_sizes


def get_pq_centroids(index) -> np.ndarray:
    """(M, ksub, dsub) PQ codebook of a PQ-bearing index
    (inspect_tools.get_pq_centroids)."""
    pq = getattr(index, "pq", None)
    if pq is None:
        raise ValueError(f"{type(index).__name__} has no PQ codec")
    return np.asarray(pq.centroids)


def get_linear_transform(vt) -> Tuple[np.ndarray, np.ndarray]:
    """(A, b) of a LinearTransform so y = x @ A.T + b
    (inspect_tools.get_LinearTransform_matrix)."""
    A = np.asarray(vt.A, np.float32)
    b = getattr(vt, "b", None)
    b = (np.zeros(A.shape[0], np.float32) if b is None
         else np.asarray(b, np.float32))
    return A, b


def range_search_max_results(
    index,
    xq: np.ndarray,
    radius: float,
    *,
    max_results: int,
    min_results: Optional[int] = None,
    batch_size: int = 4096,
):
    """Range search whose radius auto-tightens so the result table stays
    under `max_results` (contrib/exhaustive_search.py:
    range_search_max_results semantics). Processes queries in batches;
    whenever the accumulated result count would exceed max_results, the
    threshold shrinks to the distance quantile that keeps ~min_results
    rows and already-collected results are re-filtered.

    Returns (radius, lims, D, I)."""
    if min_results is None:
        min_results = int(0.8 * max_results)
    similarity = bool(getattr(index, "is_similarity", False))
    # similarity metrics keep results with D >= radius; distance metrics
    # keep D <= radius — one sign flip unifies the bookkeeping
    sgn = -1.0 if similarity else 1.0

    chunks = []   # list of (lims_local, D, I) per batch, post-filter
    total = 0
    cur_radius = float(radius)
    nq = len(xq)
    for i0 in range(0, nq, batch_size):
        lims, Dv, Iv = index.range_search(xq[i0:i0 + batch_size],
                                          cur_radius)
        chunks.append([np.asarray(lims), np.asarray(Dv), np.asarray(Iv)])
        total += len(Dv)
        if total > max_results:
            # new threshold: the min_results-th smallest signed distance
            # over everything collected so far
            alld = np.concatenate([c[1] * sgn for c in chunks])
            kth = min(min_results, len(alld) - 1)
            new_r = np.partition(alld, kth)[kth]
            cur_radius = float(new_r * sgn)
            total = 0
            for c in chunks:
                lims_c, Dc, Ic = c
                nb_q = len(lims_c) - 1
                qid = np.repeat(np.arange(nb_q), np.diff(lims_c))
                keep = Dc * sgn <= new_r
                l2 = np.zeros(nb_q + 1, np.int64)
                l2[1:] = np.cumsum(np.bincount(qid[keep],
                                               minlength=nb_q))
                c[0], c[1], c[2] = l2, Dc[keep], Ic[keep]
                total += len(c[1])

    lims = np.zeros(nq + 1, np.int64)
    pos = 0
    Dout, Iout = [], []
    for bi, (lc, Dv, Iv) in enumerate(chunks):
        i0 = bi * batch_size
        nb_q = len(lc) - 1
        lims[i0 + 1 : i0 + nb_q + 1] = pos + lc[1:]
        Dout.append(Dv)
        Iout.append(Iv)
        pos += len(Dv)
    return (cur_radius, lims,
            np.concatenate(Dout) if Dout else np.zeros(0, np.float32),
            np.concatenate(Iout) if Iout else np.zeros(0, np.int64))


# ---------------------------------------------------------------------------
# small array utilities (python/extra_wrappers.py: kmin/kmax, bucket_sort,
# rand_smooth_vectors) — device top-k with a numpy fallback.
# ---------------------------------------------------------------------------

def kmin(D: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row k smallest values and their indices, ascending
    (extra_wrappers.py ``kmin``)."""
    import jax.lax as lax
    import jax.numpy as jnp

    vals, idx = lax.top_k(-jnp.asarray(D), k)
    return np.asarray(-vals), np.asarray(idx, np.int64)


def kmax(D: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row k largest values and their indices, descending
    (extra_wrappers.py ``kmax``)."""
    import jax.lax as lax
    import jax.numpy as jnp

    vals, idx = lax.top_k(jnp.asarray(D), k)
    return np.asarray(vals), np.asarray(idx, np.int64)


def bucket_sort(tab: np.ndarray, nbucket: Optional[int] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Counting sort (extra_wrappers.py ``bucket_sort``): returns
    (lims (nbucket+1,), perm) with perm[lims[i]:lims[i+1]] = the positions
    j where tab[j] == i, in increasing j order."""
    tab = np.asarray(tab).ravel()
    if nbucket is None:
        nbucket = int(tab.max(initial=-1)) + 1
    if len(tab) and (tab.min() < 0 or tab.max() >= nbucket):
        raise ValueError(
            f"bucket_sort: values must be in [0, {nbucket}); got "
            f"[{tab.min()}, {tab.max()}]")
    counts = np.bincount(tab, minlength=nbucket)
    lims = np.zeros(nbucket + 1, np.int64)
    np.cumsum(counts[:nbucket], out=lims[1:])
    perm = np.argsort(tab, kind="stable").astype(np.int64)
    return lims, perm


def rand_smooth_vectors(n: int, d: int, seed: int = 1234) -> np.ndarray:
    """Random vectors with smooth (low-frequency) structure along the
    dimension axis, L2-normalized (extra_wrappers.py
    ``rand_smooth_vectors`` role: more realistic than iid gaussian for
    recall tests)."""
    rs = np.random.RandomState(seed)
    x = np.cumsum(rs.randn(n, d).astype(np.float32), axis=1)
    x -= x.mean(axis=1, keepdims=True)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x


# ---------------------------------------------------------------------------
# two-level clustering (contrib/clustering.py:24-127): train a big-nlist
# coarse quantizer as sqrt(nlist) first-level clusters, then sub-cluster
# each first-level cell. Much cheaper than flat k-means at nlist >= 64k
# because each Lloyd iteration assigns against nc1 + ~nc2/nc1 centroids
# instead of nc2.
# ---------------------------------------------------------------------------

def two_level_clustering(xt: np.ndarray, nc1: int, nc2: int, *,
                         rebalance: bool = True, clustering_niter: int = 25,
                         cp=None, verbose: bool = False,
                         batched: bool = False) -> np.ndarray:
    """Returns (nc2, d) float32 centroids. `rebalance` sizes each cell's
    sub-cluster budget by its first-level population (the reference's
    cumulative-share split); otherwise budgets are equal.

    `batched=True` (requires equal budgets, i.e. rebalance=False and
    nc1 | nc2) runs all nc1 second-level k-means as one vmapped device
    program — on a remote-attached TPU the sequential per-cell loop pays
    a dispatch round-trip per cell, which dominates its wall time."""
    from ..ops.kmeans import ClusteringParameters, kmeans
    from ..ops import distances as D

    xt = np.ascontiguousarray(xt, np.float32)
    cp1 = ClusteringParameters(niter=clustering_niter,
                               max_points_per_centroid=2000)
    if verbose:
        print(f"2-level clustering {xt.shape}: nc1={nc1} total nc2={nc2}")
    centroids1, _ = kmeans(xt, nc1, cp1)

    # assign the full training set to the first level (exact GEMM knn)
    _, assign1 = D.knn(xt, centroids1, 1)
    assign1 = np.asarray(assign1)[:, 0]
    bc = np.bincount(assign1, minlength=nc1)
    order = np.argsort(assign1, kind="stable")

    if rebalance:
        # cumulative-share split: cell budgets proportional to population
        bc_sum = np.cumsum(bc)
        all_nc2 = bc_sum * nc2 // max(int(bc_sum[-1]), 1)
        all_nc2[1:] -= all_nc2[:-1]
    else:
        cc = np.arange(nc1 + 1) * nc2 // nc1
        all_nc2 = cc[1:] - cc[:-1]
    assert int(all_nc2.sum()) == nc2

    cp2 = cp or ClusteringParameters(niter=10)
    if batched:
        if rebalance or nc2 % nc1:
            raise ValueError("batched two-level clustering needs equal "
                             "cell budgets (rebalance=False, nc1 | nc2)")
        lims = np.zeros(nc1 + 1, np.int64)
        np.cumsum(bc, out=lims[1:])
        return _batched_subkmeans(xt, order, lims, nc2 // nc1,
                                  cp2.niter, cp2.seed)
    out: list = []
    short = 0
    i0 = 0
    for c1 in range(nc1):
        i1 = i0 + int(bc[c1])
        sub = xt[order[i0:i1]]
        i0 = i1
        k = int(all_nc2[c1])
        if k == 0:
            continue
        if len(sub) <= k:
            # degenerate cell: every point is a centroid; make up the
            # shortfall from the global pool afterwards
            out.append(sub)
            short += k - len(sub)
            continue
        c, _ = kmeans(sub, k, cp2)
        out.append(c)
        if verbose and c1 % max(1, nc1 // 10) == 0:
            print(f"  sub-cluster {c1}/{nc1} (k={k}, n={len(sub)})")
    if short:
        rs = np.random.RandomState(cp2.seed)
        out.append(xt[rs.choice(len(xt), short, replace=False)])
    centroids = np.vstack(out).astype(np.float32)
    assert len(centroids) == nc2, (len(centroids), nc2)
    return centroids


def train_ivf_index_with_2level(index, xt, **kw) -> None:
    """Train an IVF index's coarse quantizer with two_level_clustering
    (contrib/clustering.py:95 ``train_ivf_index_with_2level``); handles
    IndexPreTransform chains."""
    from ..models.transforms import IndexPreTransform

    xt = np.ascontiguousarray(xt, np.float32)
    if isinstance(index, IndexPreTransform):
        for vt in index.chain:
            vt.train(xt)
            xt = vt.apply(xt)
        train_ivf_index_with_2level(index.index, xt, **kw)
        index.is_trained = True
        return
    nc1 = kw.pop("nc1", None) or int(np.sqrt(index.nlist))
    centroids = two_level_clustering(xt, nc1, index.nlist, **kw)
    index.quantizer.reset()
    index.quantizer.train(centroids)
    index.quantizer.add(centroids)
    index.quantizer_trains_alone = 1
    index.train(xt)


# ---------------------------------------------------------------------------
# invlist surgery (contrib/ivf_tools.py:60-148): preassigned range search,
# list permutation, size-sorted relayout.
# ---------------------------------------------------------------------------

def range_search_preassigned(index_ivf, x, radius, list_nos):
    """IVF range search with caller-provided probe lists
    (ivf_tools.py:60 ``range_search_preassigned``)."""
    from ..ops.range_search import range_search_ivf

    index_ivf._maybe_repack()
    x = index_ivf._check_input(x)
    list_nos = np.ascontiguousarray(list_nos, np.int32)
    assert list_nos.shape[0] == len(x)
    _, mnb = index_ivf._effective_params(None)
    res = range_search_ivf(
        x, list_nos, index_ivf.invlists, radius,
        index_ivf.metric_type, max_nblocks=mnb,
    )
    return res.lims, res.distances, index_ivf._map_ids(res.labels)


def permute_invlists(index_ivf, perm) -> None:
    """Renumber inverted lists: new list i holds old list perm[i], and
    the quantizer's centroid i moves with it (ivf_tools.py:122
    ``permute_invlists``; search results are invariant)."""
    perm = np.ascontiguousarray(perm, np.int64)
    nlist = index_ivf.nlist
    assert perm.shape == (nlist,)
    assert (np.bincount(perm, minlength=nlist) == 1).all(), \
        "perm is not a permutation"
    cent = index_ivf.quantizer.reconstruct_n(0, nlist)[perm]
    q = index_ivf.quantizer
    q.reset()
    q.train(cent)
    q.add(cent)
    # remap cached assignments old->new; chunks without a cached
    # assignment are recomputed against the permuted quantizer, which
    # yields the same (remapped) lists
    inv = np.empty(nlist, np.int64)
    inv[perm] = np.arange(nlist)
    for j, a in enumerate(index_ivf._assign_host):
        if a is not None:
            index_ivf._assign_host[j] = inv[a]
    index_ivf._repack()


def sort_invlists_by_size(index_ivf) -> np.ndarray:
    """Relayout lists in increasing size order (ivf_tools.py:145);
    returns the applied permutation."""
    perm = np.argsort(get_invlist_sizes(index_ivf), kind="stable")
    permute_invlists(index_ivf, perm)
    return perm


# ---------------------------------------------------------------------------
# inspect tools (contrib/inspect_tools.py remainder): raw data/codes/
# codebook/graph extraction as numpy, plus a field printer.
# ---------------------------------------------------------------------------

def get_flat_data(index_flat) -> np.ndarray:
    """(ntotal, d) float32 stored vectors (inspect_tools.py:95)."""
    return np.asarray(index_flat.vectors, np.float32)


def get_flat_codes(index_flat_codes) -> np.ndarray:
    """(ntotal, code_size) raw codes of a flat-codec index
    (inspect_tools.py:101)."""
    return np.asarray(index_flat_codes._codes[: index_flat_codes.ntotal])


def get_additive_quantizer_codebooks(index_aq) -> np.ndarray:
    """(M, ksub, d) codebooks of an RQ/LSQ index
    (inspect_tools.py:85)."""
    codec = getattr(index_aq, "codec", None) or getattr(index_aq, "rq", None)
    return np.asarray(codec.codebooks, np.float32)


def get_NSG_neighbors(index_nsg) -> np.ndarray:
    """(ntotal, R) neighbor table, -1 padded (inspect_tools.py:107)."""
    return np.asarray(index_nsg.graph, np.int64)


def make_LinearTransform_matrix(A: np.ndarray, b: Optional[np.ndarray] = None):
    """Build a LinearTransform from an explicit (d_out, d_in) matrix and
    optional bias (inspect_tools.py:71)."""
    from ..models.transforms import LinearTransform

    A = np.ascontiguousarray(A, np.float32)
    d_out, d_in = A.shape
    vt = LinearTransform(d_in, d_out)
    vt.A = A
    vt.b = (np.zeros(d_out, np.float32) if b is None
            else np.ascontiguousarray(b, np.float32))
    vt.is_trained = True
    return vt


def print_object_fields(obj) -> None:
    """Print the public scalar fields of an index/quantizer
    (inspect_tools.py:49)."""
    for name in sorted(vars(obj)):
        if name.startswith("_"):
            continue
        v = getattr(obj, name)
        if isinstance(v, (int, float, bool, str, type(None))):
            print(f"{name} = {v!r}")
        else:
            print(f"{name} = <{type(v).__name__}>")


def range_ground_truth(xq, db_iterator, threshold: float,
                       metric_type: int = 1) -> Tuple[np.ndarray, ...]:
    """Exact range-search ground truth computed blockwise over a database
    iterator (contrib/exhaustive_search.py:152 ``range_ground_truth``):
    returns the (lims, D, I) CSR triple with global ids."""
    import jax.numpy as jnp

    from ..ops import distances as D
    from ..ops.range_search import range_search_blocked

    nq = len(xq)
    hits_d = [[] for _ in range(nq)]
    hits_i = [[] for _ in range(nq)]
    i0 = 0
    for block in db_iterator:
        block = np.ascontiguousarray(block, np.float32)
        res = range_search_blocked(
            xq, jnp.asarray(block), threshold, metric_type,
            valid_n=len(block))
        for q in range(nq):
            s = slice(res.lims[q], res.lims[q + 1])
            if res.lims[q + 1] > res.lims[q]:
                hits_d[q].append(res.distances[s])
                hits_i[q].append(res.labels[s] + i0)
        i0 += len(block)
    from ..ops.range_search import csr_from_hits

    res = csr_from_hits(nq, hits_d, hits_i)
    return res.lims, res.distances, res.labels


def exponential_query_iterator(xq, start_bs: int = 32,
                               max_bs: int = 20000):
    """Yield query batches of exponentially growing size
    (contrib/exhaustive_search.py:355): small batches first so early
    results come back fast, then large ones for throughput."""
    i0, bs = 0, start_bs
    while i0 < len(xq):
        yield xq[i0: i0 + bs]
        i0 += bs
        bs = min(bs * 2, max_bs)


# ---------------------------------------------------------------------------
# DatasetAssign + pure-Python k-means driver (contrib/clustering.py:130-283,
# 346): the pluggable-assignment abstraction behind the reference's
# distributed k-means. TPU redesign: assignment is a device GEMM knn and
# the per-centroid sums are a one-hot MXU contraction (segment_sums), not
# an np.add.at scatter.
# ---------------------------------------------------------------------------

class DatasetAssign:
    """Training data behind the minimal k-means interface: count/dim/
    get_subset/assign_to. Subclass to put the data elsewhere (another
    process over rpc, a different device, a sparse matrix)."""

    def __init__(self, x):
        self.x = np.ascontiguousarray(x, np.float32)

    def count(self) -> int:
        return self.x.shape[0]

    def dim(self) -> int:
        return self.x.shape[1]

    def get_subset(self, indices) -> np.ndarray:
        return self.x[np.asarray(indices)]

    def assign_to(self, centroids, weights=None):
        """Returns (assign (n,), distances (n,), sum_per_centroid (k, d))."""
        import jax.numpy as jnp

        from ..ops import distances as D
        from ..ops.kmeans import segment_sums

        xd = jnp.asarray(self.x)
        dis, idx = D.knn(xd, jnp.asarray(centroids, jnp.float32), 1)
        a = idx[:, 0]
        xw = xd if weights is None else xd * jnp.asarray(
            weights, jnp.float32)[:, None]
        sums, _ = segment_sums(xw, a, len(centroids))
        return (np.asarray(a, np.int64), np.asarray(dis[:, 0]),
                np.asarray(sums, np.float32))


class DatasetAssignDispatch:
    """Fan a DatasetAssign over several sub-assigners and sum their
    partial results (the client half of the reference's distributed
    k-means: contrib/clustering.py DatasetAssign servers +
    benchs/distributed_ondisk/distributed_kmeans.py)."""

    def __init__(self, assigners):
        self.assigners = list(assigners)

    def count(self) -> int:
        return sum(a.count() for a in self.assigners)

    def dim(self) -> int:
        return self.assigners[0].dim()

    def get_subset(self, indices) -> np.ndarray:
        indices = np.asarray(indices)
        sizes = np.cumsum([0] + [a.count() for a in self.assigners])
        out = np.empty((len(indices), self.dim()), np.float32)
        for j, a in enumerate(self.assigners):
            m = (indices >= sizes[j]) & (indices < sizes[j + 1])
            if m.any():
                out[m] = a.get_subset(indices[m] - sizes[j])
        return out

    def assign_to(self, centroids, weights=None):
        if weights is None:
            wslices = [None] * len(self.assigners)
        else:
            weights = np.asarray(weights, np.float32)
            lims = np.cumsum([0] + [a.count() for a in self.assigners])
            wslices = [weights[lims[j]: lims[j + 1]]
                       for j in range(len(self.assigners))]
        parts = [a.assign_to(centroids, w)
                 for a, w in zip(self.assigners, wslices)]
        assign = np.concatenate([p[0] for p in parts])
        dis = np.concatenate([p[1] for p in parts])
        sums = np.sum([p[2] for p in parts], axis=0)
        return assign, dis, sums


def kmeans_assign(k: int, data: DatasetAssign, niter: int = 25,
                  seed: int = 1234, verbose: bool = False,
                  return_stats: bool = False):
    """k-means over a DatasetAssign (contrib/clustering.py:346
    ``kmeans``): Lloyd's with empty-cluster splitting, data access only
    through the abstraction so the vectors may live anywhere."""
    n, d = data.count(), data.dim()
    rs = np.random.RandomState(seed)
    centroids = data.get_subset(rs.choice(n, size=k, replace=False))
    stats = []
    for it in range(niter):
        t0 = time.time()
        assign, dis, sums = data.assign_to(centroids)
        counts = np.bincount(assign, minlength=k)
        obj = float(dis.sum())
        # centroid update; empty clusters split the largest ones
        # (Clustering.cpp split_clusters semantics)
        nonempty = counts > 0
        centroids = np.where(nonempty[:, None],
                             sums / np.maximum(counts, 1)[:, None],
                             centroids)
        for ce in np.nonzero(~nonempty)[0]:
            big = int(np.argmax(counts))
            eps = 1.0 / 1024
            centroids[ce] = centroids[big] * (1 + eps)
            centroids[big] *= (1 - eps)
            counts[ce] = counts[big] // 2
            counts[big] -= counts[ce]
        stats.append({"obj": obj, "time": time.time() - t0,
                      "imbalance": float((counts.astype(np.float64) ** 2
                                          ).sum() * k / max(n, 1) ** 2)})
        if verbose:
            print(f"kmeans iter {it}: obj {obj:.4g}")
    if return_stats:
        return centroids, stats
    return centroids


class DatasetAssignSparse(DatasetAssign):
    """DatasetAssign over a scipy CSR matrix (contrib/clustering.py:249
    ``DatasetAssignSparse``): k-means on sparse training data without
    densifying — distances via the sparse-dense product
    ||x||² - 2 x·cᵀ + ||c||², per-centroid sums via a one-hot CSR
    product."""

    def __init__(self, x_csr):
        import scipy.sparse as sp

        if not sp.issparse(x_csr):
            raise TypeError("DatasetAssignSparse needs a scipy sparse "
                            "matrix (use DatasetAssign for dense)")
        self.x = x_csr.tocsr().astype(np.float32)
        self._sq_norms = np.asarray(
            self.x.multiply(self.x).sum(axis=1)).ravel()

    def count(self) -> int:
        return self.x.shape[0]

    def dim(self) -> int:
        return self.x.shape[1]

    def get_subset(self, indices) -> np.ndarray:
        return np.asarray(self.x[np.asarray(indices)].todense(),
                          np.float32)

    def assign_to(self, centroids, weights=None):
        import scipy.sparse as sp

        centroids = np.ascontiguousarray(centroids, np.float32)
        ip = np.asarray(self.x @ centroids.T)             # (n, k) dense
        cn = (centroids * centroids).sum(axis=1)
        dis = self._sq_norms[:, None] - 2.0 * ip + cn[None, :]
        a = np.argmin(dis, axis=1)
        dmin = np.maximum(dis[np.arange(len(a)), a], 0.0)
        n, k = self.x.shape[0], len(centroids)
        w = (np.ones(n, np.float32) if weights is None
             else np.asarray(weights, np.float32))
        onehot = sp.csr_matrix((w, (a, np.arange(n))), shape=(k, n))
        sums = np.asarray((onehot @ self.x).todense(), np.float32)
        return a.astype(np.int64), dmin.astype(np.float32), sums


def _batched_subkmeans(xt: np.ndarray, order: np.ndarray,
                       lims: np.ndarray, k2: int, niter: int,
                       seed: int) -> np.ndarray:
    """All second-level k-means of two_level_clustering as ONE device
    program: cells padded to the max population, a vmapped masked Lloyd
    iterates every cell simultaneously (nc1 einsum contractions instead
    of nc1 sequential kmeans dispatches — the sequential loop pays one
    host->device round trip per cell, which dominates on a
    remote-attached TPU). Empty sub-clusters keep their previous
    centroid (the sequential path's split step matters only for
    pathological cells). Returns (nc1 * k2, d) float32."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    nc1 = len(lims) - 1
    d = xt.shape[1]
    sizes = np.diff(lims)
    Pmax = max(int(sizes.max()), k2)
    X = np.zeros((nc1, Pmax, d), np.float32)
    M = np.zeros((nc1, Pmax), np.float32)
    for c in range(nc1):
        s = int(sizes[c])
        X[c, :s] = xt[order[lims[c]: lims[c + 1]]]
        M[c, :s] = 1.0

    X_d = jnp.asarray(X)
    M_d = jnp.asarray(M)
    # seeded init: k2 distinct valid rows per cell (random keys, invalid
    # rows pushed to +inf, k2 smallest win)
    keys = jax.random.uniform(jax.random.PRNGKey(seed), (nc1, Pmax))
    keys = jnp.where(M_d > 0, keys, jnp.inf)
    _, pick = lax.top_k(-keys, k2)                     # (nc1, k2)
    cent0 = jnp.take_along_axis(X_d, pick[:, :, None], axis=1)

    def body(_, cent):
        # (nc1, Pmax, k2) cell-local squared distances
        ip = jnp.einsum("cpd,ckd->cpk", X_d, cent,
                        preferred_element_type=jnp.float32)
        cn = jnp.sum(cent * cent, axis=2)              # (nc1, k2)
        dis = cn[:, None, :] - 2.0 * ip
        a = jnp.argmin(dis, axis=2)                    # (nc1, Pmax)
        onehot = (jax.nn.one_hot(a, k2, dtype=jnp.float32)
                  * M_d[:, :, None])                   # (nc1, Pmax, k2)
        sums = jnp.einsum("cpk,cpd->ckd", onehot, X_d,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=1)               # (nc1, k2)
        return jnp.where(counts[:, :, None] > 0,
                         sums / jnp.maximum(counts, 1.0)[:, :, None],
                         cent)

    cent = lax.fori_loop(0, niter, body, cent0)
    return np.asarray(cent, np.float32).reshape(nc1 * k2, d)
