"""Tile-granular HNSW traversal — the TPU execution strategy for graph
search at scale.

The reference's level-0 search (`search_from_candidates`,
faiss/impl/HNSW.cpp:605-741) pops one node at a time and random-accesses
its neighbors' vectors — a pointer-chasing loop that CPUs hide behind
caches. Round-1 measurements showed the straight batched translation
(ops/hnsw.py beam_search_level0) is gather-bound on TPU: every hop
gathers (nq, expand*M0) isolated d-sized rows from HBM, and XLA lowers
each row to its own descriptor-limited DMA.

This module keeps the algorithm (exact-distance best-first beam over the
per-node HNSW graph, same check_relative_distance stop rule) and changes
only the MEMORY granularity:

* vectors are stored in SPATIAL ORDER (k-means cells of ~tile size) and
  grouped into fixed tiles of `b` consecutive rows;
* "visit node u" becomes "scan u's whole tile": one contiguous (b, d)
  bf16 DMA plus one MXU contraction scores all b members — the tile-mates
  are spatially relevant, so the extra candidates are free recall, and
  the visited set shrinks to one bit per tile;
* each hop expands the top `expand` scanned-but-unexpanded VECTORS (their
  exact distances are known — routing precision is identical to the
  reference), gathers their neighbor rows, maps them to tiles, and scans
  up to `scan_tiles` not-yet-visited tiles (discovery order = parent
  rank; overflow tiles stay unvisited and can be rediscovered);
* entry points come from a top-S tile-centroid k-NN (one GEMM over T
  centroids — the role of the upper levels / greedy descent,
  HNSW.cpp:852-925).

All internal scores are CANONICAL (ascending-best; inner product
negated), matching ops/hnsw.py; public entry points flip similarities
back.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import distances as D
from .hnsw import _bitset_words


def spatial_order(x: np.ndarray, b: int,
                  *, assign: Optional[np.ndarray] = None,
                  seed: int = 1234) -> np.ndarray:
    """Node ordering that makes consecutive b-sized tiles spatially tight.
    Clusters with k-means (cells of roughly tile size) — or reuses an
    existing coarse assignment — and orders by (cluster, dist-to-centroid)."""
    from . import kmeans as K

    x = np.ascontiguousarray(np.asarray(x), np.float32)
    n, d = x.shape
    if assign is None:
        nlist = int(np.clip(n // b, 16, 65536))
        if n < 2 * nlist:
            return np.arange(n, dtype=np.int64)
        cp = K.ClusteringParameters(niter=6, seed=seed,
                                    max_points_per_centroid=64)
        cents, _ = K.kmeans(x, nlist, params=cp)
        dis, idx = D.knn(jnp.asarray(x), jnp.asarray(cents), 1,
                         compute_dtype="bfloat16", approx=nlist > 4096)
        assign = np.asarray(idx[:, 0], np.int64)
        cdis = np.asarray(dis[:, 0])
    else:
        assign = np.asarray(assign, np.int64)
        cdis = np.zeros(n, np.float32)
    return np.lexsort((cdis, assign)).astype(np.int64)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TileGraph:
    """Tiled vector storage + position-space adjacency derived from an
    HNSW level-0 graph. Positions are the spatially-reordered row
    indices; `orig_ids` maps them back to the builder's node ids."""

    vtiles: jnp.ndarray     # (T, b, d) bf16 vectors in position order
    vnorms: jnp.ndarray     # (T, b) f32 squared norms (inf on padding)
    nbr_pos: jnp.ndarray    # (T*b, M0) int32 neighbor POSITIONS (-1 pad)
    cent: jnp.ndarray       # (T, d) f32 tile centroids (entry seeding)
    orig_ids: jnp.ndarray   # (T*b,) int32 position -> node id (-1 pad)
    n: int = 0              # static: real vector count

    def tree_flatten(self):
        return (
            (self.vtiles, self.vnorms, self.nbr_pos, self.cent,
             self.orig_ids),
            self.n,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n=aux)

    @property
    def ntiles(self) -> int:
        return self.vtiles.shape[0]

    @property
    def b(self) -> int:
        return self.vtiles.shape[1]

    def hbm_bytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in self.tree_flatten()[0])


def build_tiles(
    x: np.ndarray,
    neighbors0: np.ndarray,
    *,
    order: Optional[np.ndarray] = None,
    b: int = 32,
) -> TileGraph:
    """Derive the tile layout from vectors and a level-0 graph.

    Args:
      x: (n, d) float32 vectors in node-id order.
      neighbors0: (n, M0) int32 level-0 adjacency (-1 padded).
      order: (n,) spatial ordering (see `spatial_order`). None = id order.
      b: tile size (rows per contiguous gather block).
    """
    x = np.ascontiguousarray(np.asarray(x), np.float32)
    n, d = x.shape
    if order is None:
        order = np.arange(n, dtype=np.int64)
    order = np.asarray(order, np.int64)
    pos_of = np.empty(n, np.int64)
    pos_of[order] = np.arange(n)
    T = max(-(-n // b), 1)
    pad = T * b - n

    xs = x[order]
    if pad:
        xs = np.concatenate([xs, np.zeros((pad, d), np.float32)])
    vnorms = (xs.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    if pad:
        vnorms[n:] = np.inf
    vtiles = xs.reshape(T, b, d)

    nb = np.asarray(neighbors0, np.int64)
    m0 = nb.shape[1]
    nbr = np.full((T * b, m0), -1, np.int32)
    ok = nb >= 0
    mapped = np.where(ok, pos_of[np.where(ok, nb, 0)], -1).astype(np.int32)
    nbr[: n] = mapped[order]

    cnt = np.full((T, 1), b, np.float32)
    if pad:
        cnt[-1, 0] = b - pad
    cent = (vtiles.sum(axis=1) / np.maximum(cnt, 1.0)).astype(np.float32)

    orig_ids = np.full(T * b, -1, np.int32)
    orig_ids[: n] = order.astype(np.int32)

    return TileGraph(
        vtiles=jnp.asarray(vtiles, jnp.bfloat16),
        vnorms=jnp.asarray(vnorms.reshape(T, b)),
        nbr_pos=jnp.asarray(nbr),
        cent=jnp.asarray(cent),
        orig_ids=jnp.asarray(orig_ids),
        n=n,
    )


# --- tile-level visited bitset (test and set split so that overflow
# discoveries stay unvisited and can be rediscovered) ----------------------

def _row_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 0)


def _visited_test(visited, ids, valid):
    """fresh = valid & bit not set & first occurrence within the batch."""
    nq, c = ids.shape
    safe = jnp.where(valid, ids, 0)
    word = safe >> 5
    bit = jnp.uint32(1) << (safe & 31).astype(jnp.uint32)
    cur = visited[_row_iota((nq, c)), word]
    seen = (cur & bit) != 0
    # dedupe sentinel OUT of the id range (0 collides with tile 0)
    dedup_key = jnp.where(valid, ids, jnp.int32(2 ** 30))
    order = jnp.argsort(dedup_key, axis=1)
    s = jnp.take_along_axis(dedup_key, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
    dup = jnp.zeros((nq, c), bool).at[_row_iota((nq, c)), order].set(
        dup_sorted)
    return valid & ~seen & ~dup


def _visited_set(visited, ids, mask):
    """Set bits for (distinct, previously unset) masked ids."""
    nq, c = ids.shape
    safe = jnp.where(mask, ids, 0)
    word = safe >> 5
    bit = jnp.uint32(1) << (safe & 31).astype(jnp.uint32)
    return visited.at[_row_iota((nq, c)), word].add(
        jnp.where(mask, bit, jnp.uint32(0)))


def _scan_tiles(tg: TileGraph, xqb, qn, tids, tvalid, similarity: bool):
    """Score all members of the selected tiles. tids: (nq, F) tile ids,
    tvalid: (nq, F) scan mask. Returns (scores (nq, F*b) canonical asc,
    positions (nq, F*b) int32, nscanned)."""
    nq, F = tids.shape
    T, b, d = tg.vtiles.shape
    n = tg.n
    safe = jnp.where(tvalid, tids, 0)
    tiles = tg.vtiles[safe]                          # (nq, F, b, d) bf16
    ip = jnp.einsum("qd,qfbd->qfb", xqb, tiles,
                    preferred_element_type=jnp.float32)
    if similarity:
        sc = -ip
    else:
        sc = qn[:, None, None] + tg.vnorms[safe] - 2.0 * ip
    pos = safe[:, :, None] * b + lax.broadcasted_iota(
        jnp.int32, (nq, F, b), 2)
    valid = (pos < n) & tvalid[:, :, None]
    sc = jnp.where(valid, sc, jnp.inf).reshape(nq, F * b)
    pos = jnp.where(valid, pos, -1).reshape(nq, F * b)
    return sc, pos, jnp.sum(valid.astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("ef", "expand", "scan_tiles", "max_hops", "metric",
                     "stop_frac"),
)
def _tile_beam(
    tg: TileGraph,
    xq: jnp.ndarray,
    seed_tiles: jnp.ndarray,
    *,
    ef: int,
    expand: int,
    scan_tiles: int,
    max_hops: int,
    metric: int,
    stop_frac: float,
):
    """Lockstep best-first beam: vector-precision routing, tile-granular
    scans. Returns (scores (nq, ef) canonical asc, positions (nq, ef)
    int32, stats)."""
    nq, d = xq.shape
    T, b, _ = tg.vtiles.shape
    m0 = tg.nbr_pos.shape[1]
    F = scan_tiles
    C = expand * m0
    similarity = D.is_similarity_metric(metric)
    nwords = _bitset_words(T)

    xq = xq.astype(jnp.float32)
    xqb = xq.astype(jnp.bfloat16)
    qn = jnp.sum(xq * xq, axis=1)

    # seed: scan the seed tiles, init buffer + visited
    s_valid = seed_tiles >= 0
    visited = jnp.zeros((nq, nwords), jnp.uint32)
    sfresh = _visited_test(visited, seed_tiles, s_valid)
    visited = _visited_set(visited, seed_tiles, sfresh)
    sc, pos, ns = _scan_tiles(tg, xqb, qn, seed_tiles, sfresh, similarity)
    order = jnp.argsort(sc, axis=1)
    width = sc.shape[1]
    if width < ef:
        sc = jnp.pad(sc, ((0, 0), (0, ef - width)), constant_values=jnp.inf)
        pos = jnp.pad(pos, ((0, 0), (0, ef - width)), constant_values=-1)
        order = jnp.argsort(sc, axis=1)
    bd = jnp.take_along_axis(sc, order, axis=1)[:, :ef]
    bi = jnp.take_along_axis(pos, order, axis=1)[:, :ef]
    bexp = ~jnp.isfinite(bd)

    def cond(state):
        done, hops = state[-3], state[-2]
        return jnp.logical_and(~jnp.all(done), hops < max_hops)

    def body(state):
        bd, bi, bexp, visited, done, hops, ndis = state
        # 1) expand the best unexpanded vectors (exact distances)
        cand = jnp.where(bexp, jnp.inf, bd)
        neg, ppos = lax.top_k(-cand, expand)
        sel_d = -neg
        sel_ok = jnp.isfinite(sel_d)
        # 2) stop rule: check_relative_distance (HNSW.cpp:645) + slack
        thresh = bd[:, ef - 1]
        slack = stop_frac * jnp.abs(thresh)
        newly_done = jnp.logical_or(~sel_ok[:, 0],
                                    sel_d[:, 0] > thresh + slack)
        live = ~done
        do_exp = sel_ok & live[:, None]
        row = _row_iota((nq, expand))
        bexp2 = bexp.at[row, ppos].max(do_exp)
        sel_pos = jnp.take_along_axis(bi, ppos, axis=1)
        # 3) neighbor rows -> candidate tiles
        rows = tg.nbr_pos[jnp.where(do_exp, sel_pos, 0)]   # (nq, e, m0)
        rows = rows.reshape(nq, C)
        nvalid = (rows >= 0) & jnp.repeat(do_exp, m0, axis=1)
        tids = jnp.where(nvalid, rows // b, 0)
        fresh = _visited_test(visited, tids, nvalid)
        # 4) keep the first `scan_tiles` fresh tiles (parent-rank order);
        # overflow stays unvisited for rediscovery
        forder = jnp.argsort(~fresh, axis=1, stable=True)[:, :F]
        sel_t = jnp.take_along_axis(tids, forder, axis=1)
        sel_f = jnp.take_along_axis(fresh, forder, axis=1)
        visited2 = _visited_set(visited, sel_t, sel_f)
        # 5) scan
        sc, pos, ns = _scan_tiles(tg, xqb, qn, sel_t, sel_f, similarity)
        ndis = ndis + ns
        # 6) merge into the ef buffer
        md = jnp.concatenate([bd, sc], axis=1)
        mi = jnp.concatenate([bi, pos], axis=1)
        me = jnp.concatenate([bexp2, ~jnp.isfinite(sc)], axis=1)
        mo = jnp.argsort(md, axis=1)
        bd2 = jnp.take_along_axis(md, mo, axis=1)[:, :ef]
        bi2 = jnp.take_along_axis(mi, mo, axis=1)[:, :ef]
        be2 = jnp.take_along_axis(me, mo, axis=1)[:, :ef]
        return (bd2, bi2, be2, visited2, done | newly_done, hops + 1, ndis)

    done0 = jnp.zeros(nq, bool)
    state = (bd, bi, bexp, visited, done0, jnp.int32(0),
             jnp.int32(ns))
    state = lax.while_loop(cond, body, state)
    bd, bi, hops, ndis = state[0], state[1], state[-2], state[-1]
    return bd, bi, {"nhops": hops, "ndis": ndis}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FusedTileGraph:
    """Tile layout for the Pallas fused scan path: tiles as packed
    invlists (one list per tile, f32 storage for the exact refine),
    centroids for hop-0 routing, and a position-space level-0 adjacency
    for the graph hops."""

    il: object               # PackedInvLists (lists = tiles)
    cent: jnp.ndarray        # (T, d) f32 tile centroids
    nbr_pos: jnp.ndarray     # (T*b, M0) int32 neighbor POSITIONS (-1 pad)
    orig_ids: jnp.ndarray    # (T*b,) int32 position -> node id (-1 pad)
    b: int = 32              # static: tile size
    n: int = 0               # static: real vector count

    def tree_flatten(self):
        return ((self.il, self.cent, self.nbr_pos, self.orig_ids),
                (self.b, self.n))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, b=aux[0], n=aux[1])


def build_tiles_fused(
    x: np.ndarray,
    neighbors0: np.ndarray,
    *,
    order: Optional[np.ndarray] = None,
    b: int = 128,
    verbose: bool = False,
) -> FusedTileGraph:
    """FusedTileGraph from vectors (node-id order) + level-0 graph.
    Same spatial layout as build_tiles; storage goes through
    pack_invlists so the fused kernel's stream/refine machinery applies
    unchanged (tile i == list i, position == packed row)."""
    from .ivf_scan import pack_invlists

    import time as _time

    t0 = _time.time()
    x = np.ascontiguousarray(np.asarray(x), np.float32)
    n, d = x.shape
    if order is None:
        order = np.arange(n, dtype=np.int64)
    order = np.asarray(order, np.int64)
    pos_of = np.empty(n, np.int64)
    pos_of[order] = np.arange(n)
    T = max(-(-n // b), 1)

    # tile of position p is p // b
    assign = np.arange(n, dtype=np.int64) // b          # in position order
    xs = x[order]
    il = pack_invlists(xs, np.arange(n, dtype=np.int64), assign, T,
                       block_size=b)
    if verbose:
        print(f"build_tiles: pack+upload {_time.time()-t0:.1f}s",
              flush=True)
        t0 = _time.time()

    # tiles are contiguous position ranges: centroid = padded reshape-sum
    # (np.add.at is a serialized scatter — ~2 min at 1M)
    pad_rows = T * b - n
    xs_p = np.concatenate([xs, np.zeros((pad_rows, d), np.float32)]) \
        if pad_rows else xs
    cnt = np.full(T, b, np.float32)
    if pad_rows:
        cnt[-1] = b - pad_rows
    cent = (xs_p.reshape(T, b, d).sum(axis=1, dtype=np.float64)
            / np.maximum(cnt, 1.0)[:, None]).astype(np.float32)

    nb = np.asarray(neighbors0, np.int64)
    m0 = nb.shape[1]
    nbr = np.full((T * b, m0), -1, np.int32)
    ok = nb >= 0
    mapped = np.where(ok, pos_of[np.where(ok, nb, 0)], -1).astype(np.int32)
    nbr[:n] = mapped[order]

    orig_ids = np.full(T * b, -1, np.int32)
    orig_ids[:n] = order.astype(np.int32)
    if verbose:
        print(f"build_tiles: centroids+adjacency {_time.time()-t0:.1f}s",
              flush=True)

    return FusedTileGraph(
        il=il,
        cent=jnp.asarray(cent),
        nbr_pos=jnp.asarray(nbr),
        orig_ids=jnp.asarray(orig_ids),
        b=b,
        n=n,
    )


def _dedupe_first(tids, valid):
    """first-occurrence mask within each row (sort-based, stable)."""
    nq, c = tids.shape
    safe = jnp.where(valid, tids, jnp.int32(2 ** 30))
    order = jnp.argsort(safe, axis=1)
    s = jnp.take_along_axis(safe, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
    dup = jnp.zeros((nq, c), bool).at[_row_iota((nq, c)), order].set(
        dup_sorted)
    return valid & ~dup


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe0", "hops", "expand", "F", "kp", "rk",
                     "metric", "interpret"),
)
def tile_search_fused(
    ftg: FusedTileGraph,
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe0: int = 16,
    hops: int = 2,
    expand: int = 8,
    F: int = 8,
    kp: int = 8,
    rk: int = 32,
    metric: int = D.METRIC_L2,
    interpret: bool = False,
):
    """Graph-accelerated tile search built on the fused list-major scan.

    Hop 0 routes with one MXU GEMM over the T tile centroids (the role of
    HNSW's upper levels — at T ~ n/b the full centroid score matrix costs
    microseconds, so greedy descent is pointless on TPU) and scans the
    top-nprobe0 tiles with the Pallas kernel. Each graph hop then expands
    the current best `expand` VECTORS through the level-0 adjacency —
    recovering true neighbors in tiles the centroid routing missed, which
    is precisely what the graph adds over pure IVF — and fused-scans up
    to F fresh tiles. All scans re-rank in exact f32 (refine inside the
    kernel wrapper).

    Returns (dists (nq, k), positions (nq, k) int32, ids (nq, k) int32).
    """
    from .ivf_scan_pallas import scan_invlists_fused
    from . import topk as TK

    # metric-generic like the reference's NegativeDistanceComputer route
    # (impl/DistanceComputer.h): the fused scan orders by similarity
    # internally; only the merges here need the direction flag
    similarity = D.is_similarity_metric(metric)
    nq, d = xq.shape
    b = ftg.b
    T = ftg.il.nlist
    xq = xq.astype(jnp.float32)

    _, seeds = D.knn(xq, ftg.cent, min(nprobe0, T), metric,
                     compute_dtype="bfloat16", approx=T > 4096)
    seeds = seeds.astype(jnp.int32)
    bd, bpos, _ = scan_invlists_fused(
        xq, seeds, ftg.il, min(rk, nprobe0 * kp), metric, kp=kp,
        refine=4, interpret=interpret)
    # positions come back through the ids channel (ids == positions)
    hist = seeds
    for _ in range(hops):
        top_pos = bpos[:, :expand]                        # (nq, E)
        okp = top_pos >= 0
        nbrs = ftg.nbr_pos[jnp.where(okp, top_pos, 0)]    # (nq, E, m0)
        cand = nbrs.reshape(nq, -1)
        cvalid = (cand >= 0) & jnp.repeat(okp, nbrs.shape[2], axis=1)
        ctiles = jnp.where(cvalid, cand // b, -1)
        fresh = _dedupe_first(ctiles, cvalid)
        # not already scanned (history membership)
        seen = jnp.any(
            ctiles[:, :, None] == hist[:, None, :], axis=2)
        fresh = fresh & ~seen
        # first F fresh in parent-rank order
        forder = jnp.argsort(~fresh, axis=1, stable=True)[:, :F]
        sel_t = jnp.take_along_axis(ctiles, forder, axis=1)
        sel_f = jnp.take_along_axis(fresh, forder, axis=1)
        probes_h = jnp.where(sel_f, sel_t, -1).astype(jnp.int32)
        hist = jnp.concatenate([hist, probes_h], axis=1)
        hd, hpos, _ = scan_invlists_fused(
            xq, probes_h, ftg.il, min(rk, F * kp), metric, kp=kp,
            refine=4, interpret=interpret)
        bd, bpos = TK.merge_topk(bd, bpos, hd, hpos, rk,
                                 similarity=similarity)
    out_d = bd[:, :k]
    out_p = bpos[:, :k]
    out_i = jnp.where(
        out_p >= 0,
        ftg.orig_ids[jnp.clip(out_p, 0, ftg.orig_ids.shape[0] - 1)], -1)
    return out_d, out_p, out_i


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PQTileGraph:
    """Tile layout with PQ-coded storage (IndexHNSWPQ's memory model:
    M bytes/vector instead of 2d). Scans are ADC over code tiles."""

    il: object               # PackedCodeInvLists (lists = tiles)
    cent: jnp.ndarray        # (T, d) f32 tile centroids (from raw x)
    nbr_pos: jnp.ndarray     # (T*b, M0) int32 neighbor POSITIONS
    orig_ids: jnp.ndarray    # (T*b,) int32 position -> node id
    pq_centroids: jnp.ndarray  # (M, ksub, dsub) f32
    b: int = 128
    n: int = 0

    def tree_flatten(self):
        return ((self.il, self.cent, self.nbr_pos, self.orig_ids,
                 self.pq_centroids), (self.b, self.n))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, b=aux[0], n=aux[1])


def build_tiles_pq(
    x: np.ndarray,
    codes: np.ndarray,
    pq_centroids,
    neighbors0: np.ndarray,
    *,
    order: Optional[np.ndarray] = None,
    b: int = 128,
) -> PQTileGraph:
    """PQTileGraph from raw vectors (used only for routing centroids and
    the spatial order — NOT stored), their PQ codes, and the level-0
    graph."""
    from .ivf_scan import pack_code_invlists

    x = np.ascontiguousarray(np.asarray(x), np.float32)
    codes = np.ascontiguousarray(np.asarray(codes))
    n, d = x.shape
    if order is None:
        order = np.arange(n, dtype=np.int64)
    order = np.asarray(order, np.int64)
    pos_of = np.empty(n, np.int64)
    pos_of[order] = np.arange(n)
    T = max(-(-n // b), 1)

    assign = np.arange(n, dtype=np.int64) // b
    # one extra EMPTY list (id T) as the target for invalid hop probes
    il = pack_code_invlists(codes[order], np.arange(n, dtype=np.int64),
                            assign, T + 1, block_size=b)

    xs = x[order]
    # tiles are contiguous position ranges: centroid = padded reshape-sum
    # (np.add.at is a serialized scatter — ~2 min at 1M)
    pad_rows = T * b - n
    xs_p = np.concatenate([xs, np.zeros((pad_rows, d), np.float32)]) \
        if pad_rows else xs
    cnt = np.full(T, b, np.float32)
    if pad_rows:
        cnt[-1] = b - pad_rows
    cent = (xs_p.reshape(T, b, d).sum(axis=1, dtype=np.float64)
            / np.maximum(cnt, 1.0)[:, None]).astype(np.float32)

    nb = np.asarray(neighbors0, np.int64)
    m0 = nb.shape[1]
    nbr = np.full((T * b, m0), -1, np.int32)
    ok = nb >= 0
    mapped = np.where(ok, pos_of[np.where(ok, nb, 0)], -1).astype(np.int32)
    nbr[:n] = mapped[order]
    orig_ids = np.full(T * b, -1, np.int32)
    orig_ids[:n] = order.astype(np.int32)

    return PQTileGraph(
        il=il,
        cent=jnp.asarray(cent),
        nbr_pos=jnp.asarray(nbr),
        orig_ids=jnp.asarray(orig_ids),
        pq_centroids=jnp.asarray(pq_centroids),
        b=b,
        n=n,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe0", "hops", "expand", "F", "rk", "metric"),
)
def tile_search_pq(
    ptg: PQTileGraph,
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe0: int = 16,
    hops: int = 2,
    expand: int = 8,
    F: int = 4,
    rk: int = 32,
    metric: int = D.METRIC_L2,
):
    """tile_search_fused's control flow over PQ-coded tiles: hop-0
    centroid route, ADC scans (scan_invlists_pq, by_residual=False),
    graph-hop expansion through the level-0 adjacency. Distances are ADC
    approximations, as in the reference's IndexHNSWPQ (storage distance
    == PQ codec distance)."""
    from .ivf_scan import scan_invlists_pq
    from . import topk as TK

    nq, d = xq.shape
    b = ptg.b
    T = ptg.il.nlist - 1          # last list is the empty invalid target
    xq = xq.astype(jnp.float32)
    mnb = ptg.il.max_nblocks_per_list

    def scan(probes):
        cd = jnp.zeros(probes.shape, jnp.float32)
        return scan_invlists_pq(
            xq, probes, cd, ptg.il, ptg.pq_centroids,
            ptg.cent, min(rk, probes.shape[1] * b), metric,
            by_residual=False, max_nblocks=mnb)

    _, seeds = D.knn(xq, ptg.cent, min(nprobe0, T), metric,
                     compute_dtype="bfloat16", approx=T > 4096)
    seeds = seeds.astype(jnp.int32)
    bd, bpos, _ = scan(seeds)
    similarity = D.is_similarity_metric(metric)
    hist = seeds
    for _ in range(hops):
        top_pos = bpos[:, :expand]
        okp = top_pos >= 0
        nbrs = ptg.nbr_pos[jnp.where(okp, top_pos, 0)]
        cand = nbrs.reshape(nq, -1)
        cvalid = (cand >= 0) & jnp.repeat(okp, nbrs.shape[2], axis=1)
        ctiles = jnp.where(cvalid, cand // b, -1)
        fresh = _dedupe_first(ctiles, cvalid)
        seen = jnp.any(ctiles[:, :, None] == hist[:, None, :], axis=2)
        fresh = fresh & ~seen
        forder = jnp.argsort(~fresh, axis=1, stable=True)[:, :F]
        sel_t = jnp.take_along_axis(ctiles, forder, axis=1)
        sel_f = jnp.take_along_axis(fresh, forder, axis=1)
        # invalid hop probes target the extra EMPTY list (id T)
        probes_h = jnp.where(sel_f, sel_t, T).astype(jnp.int32)
        hd, hpos, _ = scan(probes_h)
        hist = jnp.concatenate(
            [hist, jnp.where(sel_f, sel_t, -1).astype(jnp.int32)], axis=1)
        bd, bpos = TK.merge_topk(bd, bpos, hd, hpos, rk,
                                 similarity=similarity)
    out_d = bd[:, :k]
    out_p = bpos[:, :k]
    out_i = jnp.where(
        out_p >= 0,
        ptg.orig_ids[jnp.clip(out_p, 0, ptg.orig_ids.shape[0] - 1)], -1)
    return out_d, out_p, out_i


def tile_search(
    tg: TileGraph,
    xq: jnp.ndarray,
    k: int,
    *,
    ef: int = 0,
    expand: int = 4,
    scan_tiles: int = 0,
    max_hops: int = 0,
    seed_count: int = 0,
    metric: int = D.METRIC_L2,
    stop_frac: float = 0.15,
    refine_vectors: Optional[jnp.ndarray] = None,
):
    """Search the tile graph. Returns (dists (nq, k) user-facing,
    ids (nq, k) int32 node ids, stats {nhops, ndis}).

    `ef` sizes the result/candidate buffer (efSearch role); `expand`
    vectors are expanded per hop; up to `scan_tiles` fresh tiles are
    scanned per hop; `seed_count` entry tiles come from a centroid k-NN.
    `refine_vectors` (node-id order, f32) re-scores the ef candidates
    exactly before the final top-k (IndexRefineFlat fused at the tail —
    recovers f32 accuracy from the bf16 scan)."""
    similarity = D.is_similarity_metric(metric)
    ef = max(ef, k)
    T = tg.ntiles
    expand = max(1, expand)
    if scan_tiles <= 0:
        scan_tiles = 2 * expand
    scan_tiles = min(scan_tiles, T)
    if seed_count <= 0:
        seed_count = min(max(2 * expand, 8), T)
    if max_hops <= 0:
        max_hops = max(12, ef // expand + 12)

    xq = jnp.asarray(xq, jnp.float32)
    _, sids = D.knn(xq, tg.cent, seed_count, metric,
                    compute_dtype="bfloat16", approx=T > 4096)
    rd, ri, stats = _tile_beam(
        tg, xq, sids.astype(jnp.int32),
        ef=ef, expand=expand, scan_tiles=scan_tiles,
        max_hops=max_hops, metric=metric, stop_frac=float(stop_frac),
    )
    ids = jnp.where(
        ri >= 0, tg.orig_ids[jnp.clip(ri, 0, tg.orig_ids.shape[0] - 1)], -1)
    if refine_vectors is not None:
        xqf = xq
        vecs = refine_vectors[jnp.where(ids >= 0, ids, 0)].astype(jnp.float32)
        ip = jnp.einsum("qd,qcd->qc", xqf, vecs,
                        preferred_element_type=jnp.float32)
        if similarity:
            sc = -ip
        else:
            qn = jnp.sum(xqf * xqf, axis=1, keepdims=True)
            vn = jnp.sum(vecs * vecs, axis=2)
            sc = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
        sc = jnp.where(ids >= 0, sc, jnp.inf)
        neg, pos = lax.top_k(-sc, k)
        out_d = -neg
        out_i = jnp.take_along_axis(ids, pos, axis=1)
    else:
        out_d = rd[:, :k]
        out_i = ids[:, :k]
    if similarity:
        out_d = -out_d
    return out_d, out_i, stats
