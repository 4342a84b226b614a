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
