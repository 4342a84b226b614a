"""HNSW as batched frontier expansion — TPU rebuild of faiss `impl/HNSW.{h,cpp}`.

The reference stores the multilevel graph as flat arrays
(neighbors/offsets/levels, faiss/impl/HNSW.h:109-128) and searches by
pointer-chasing: greedy descent on upper levels (HNSW.cpp:852-925) then a
bounded best-first beam at level 0 (`search_from_candidates`,
HNSW.cpp:605-741) with a per-query VisitedTable and MinimaxHeap. Build
inserts points one at a time under per-node omp locks
(`add_with_locks`, HNSW.cpp:542-591).

The TPU formulation keeps the flat fixed-degree tables but replaces both
loops with batched, shape-static device programs:

* search — all queries advance in lockstep. One hop = top-`expand`
  unexpanded buffer entries per query -> gather their neighbor rows ->
  bitset visited filter -> one (nq, expand*M, d) distance contraction ->
  sort-merge into an ef-sized sorted buffer. Termination is the
  reference's `check_relative_distance` condition (HNSW.cpp:645-651)
  evaluated per query as a mask inside `lax.while_loop`.
* build — wave-based insertion (level-bucketed high->low like
  `hnsw_add_vertices`, IndexHNSW.cpp:68-224): each wave beam-searches the
  pre-wave graph, picks forward links with the diversity heuristic
  (`shrink_neighbor_list`, HNSW.cpp:245-299) via a masked pairwise-distance
  scan, and applies reverse links with distance-ranked pruning. Waves
  change the insertion order semantics vs the sequential reference, so
  parity is validated on recall, not graph equality (the reference's own
  tests do the same, tests/test_hnsw.cpp).

Levels are drawn host-side with the same geometric law as
`HNSW::random_level` (mult = 1/ln(M)). Level-0 degree is 2M, upper-level
degree is M (faiss `set_default_probas`, HNSW.cpp:58-76).
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

# numpy scalar, not jnp: a module-scope jnp constant would
# initialize the JAX backend at import time, which breaks
# jax.distributed.initialize for multi-host bring-up
INVALID = np.int32(-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HNSWGraph:
    """Flat fixed-degree multilevel graph (device arrays, -1 padded).

    Nodes with level >= 1 are compacted into `upper_ids` (sorted) with
    their per-level neighbor rows in `upper_neighbors[row, l-1]` — the
    dense analog of faiss's cum_nneighbor_per_level offsets.
    """

    neighbors0: jnp.ndarray       # (N, M0) int32, level-0 links
    upper_ids: jnp.ndarray        # (U,) int32 sorted; U >= 1 (padded)
    upper_neighbors: jnp.ndarray  # (U, Lmax, M) int32
    levels: jnp.ndarray           # (N,) int32 max level per node
    entry: jnp.ndarray            # () int32 entry point id
    max_level: int = 0            # static

    def tree_flatten(self):
        return (
            (self.neighbors0, self.upper_ids, self.upper_neighbors,
             self.levels, self.entry),
            self.max_level,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, max_level=aux)

    @property
    def n(self) -> int:
        return self.neighbors0.shape[0]

    @property
    def m0(self) -> int:
        return self.neighbors0.shape[1]

    @property
    def m(self) -> int:
        return self.upper_neighbors.shape[2]


def random_levels(n: int, m: int, seed: int = 1234,
                  offset: int = 0) -> np.ndarray:
    """Draw per-node max levels: geometric with mult = 1/ln(M)
    (faiss HNSW::random_level / set_default_probas)."""
    rs = np.random.RandomState(seed + offset)
    u = rs.rand(n)
    mult = 1.0 / np.log(max(m, 2))
    levels = np.floor(-np.log(np.maximum(u, 1e-12)) * mult).astype(np.int32)
    return levels


# ---------------------------------------------------------------------------
# visited bitset helpers: (nq, nwords) uint32; exact, one bit per node
# ---------------------------------------------------------------------------

def _bitset_words(n: int) -> int:
    return max((n + 31) // 32, 1)


def _visited_test_and_set(visited, ids, valid):
    """Check+set bits for a (nq, c) batch of ids. Returns (new_visited,
    fresh_mask) where fresh = valid & not previously visited & first
    occurrence within the batch (later duplicates are masked)."""
    nq, c = ids.shape
    safe = jnp.where(valid, ids, 0)
    word = safe >> 5
    bit = jnp.uint32(1) << (safe & 31).astype(jnp.uint32)
    row = lax.broadcasted_iota(jnp.int32, (nq, c), 0)
    cur = visited[row, word]
    seen = (cur & bit) != 0
    # in-batch dedupe: order ids per row, mark later equal occurrences.
    # Sentinel must be OUT of the id range: 0 would mark a genuine id-0
    # candidate as a duplicate of masked slots.
    dedup_key = jnp.where(valid, ids, jnp.int32(2 ** 30))
    order = jnp.argsort(dedup_key, axis=1)
    sorted_ids = jnp.take_along_axis(dedup_key, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((nq, 1), bool),
         sorted_ids[:, 1:] == sorted_ids[:, :-1]], axis=1
    )
    dup = jnp.zeros((nq, c), bool).at[row, order].set(dup_sorted)
    fresh = valid & ~seen & ~dup
    # scatter-add == scatter-or here: `fresh` guarantees each bit is added
    # at most once ever (already-set bits are never fresh again, and
    # in-batch duplicates are masked)
    new_visited = visited.at[row, word].add(
        jnp.where(fresh, bit, jnp.uint32(0))
    )
    return new_visited, fresh


def _seed_visited(nq: int, nwords: int, ids, valid):
    visited = jnp.zeros((nq, nwords), jnp.uint32)
    return _visited_test_and_set(visited, ids, valid)


# ---------------------------------------------------------------------------
# greedy descent on one upper level (HNSW.cpp:852 greedy_update_nearest)
# ---------------------------------------------------------------------------

def _upper_row(graph: HNSWGraph, node):
    """Row of `node` in the upper tables (nodes guaranteed level>=1)."""
    return jnp.searchsorted(graph.upper_ids, node).astype(jnp.int32)


def _greedy_level(vectors, graph: HNSWGraph, xq, level: int, cur, cur_d,
                  max_hops: int = 64, metric: int = D.METRIC_L2):
    """Batched greedy walk at `level` (>=1): move to the nearest neighbor
    until no improvement. cur/cur_d: (nq,) current node and CANONICAL
    distance (must match the metric passed here — IP is negated)."""
    m = graph.m

    def cond(state):
        cur, cur_d, improved, hops = state
        return jnp.logical_and(jnp.any(improved), hops < max_hops)

    def body(state):
        cur, cur_d, improved, hops = state
        rows = _upper_row(graph, cur)
        nbrs = graph.upper_neighbors[rows, level - 1]      # (nq, m)
        valid = nbrs >= 0
        vecs = vectors[jnp.where(valid, nbrs, 0)]          # (nq, m, d)
        dis = _batch_dists(xq, vecs, metric)
        dis = jnp.where(valid, dis, jnp.inf)
        best = jnp.min(dis, axis=1)
        arg = jnp.argmin(dis, axis=1)
        better = best < cur_d
        new_cur = jnp.where(better & improved,
                            jnp.take_along_axis(nbrs, arg[:, None],
                                                axis=1)[:, 0], cur)
        new_d = jnp.where(better & improved, best, cur_d)
        return new_cur, new_d, better & improved, hops + 1

    improved = jnp.ones(cur.shape[0], bool)
    cur, cur_d, _, _ = lax.while_loop(cond, body,
                                      (cur, cur_d, improved, 0))
    return cur, cur_d


def _batch_dists(xq, vecs, metric: int = D.METRIC_L2):
    """(nq, d) x (nq, c, d) -> (nq, c) CANONICAL scores: ascending-best for
    every metric (inner product is negated), so all beam/heuristic sorts in
    this module share one ordering. Public entry points flip the sign back
    for similarity metrics."""
    ip = jnp.einsum("qd,qcd->qc", xq, vecs,
                    precision=lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    if D.is_similarity_metric(metric):
        return -ip
    qn = jnp.sum(xq * xq, axis=1, keepdims=True)
    vn = jnp.sum(vecs * vecs, axis=2)
    return jnp.maximum(qn + vn - 2.0 * ip, 0.0)


# ---------------------------------------------------------------------------
# level-0 beam search (HNSW.cpp:605 search_from_candidates, batched)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("ef", "k", "expand", "max_hops", "metric", "raw"),
)
def beam_search_level0(
    vectors: jnp.ndarray,
    neighbors0: jnp.ndarray,
    xq: jnp.ndarray,
    entry_ids: jnp.ndarray,
    *,
    ef: int,
    k: int,
    expand: int = 2,
    max_hops: int = 0,
    metric: int = D.METRIC_L2,
    raw: bool = False,
):
    """Bounded best-first search over the level-0 graph, all queries in
    lockstep.

    Args:
      vectors: (N, d) storage (the DistanceComputer's backing store).
      neighbors0: (N, M0) int32 adjacency, -1 padded.
      xq: (nq, d) queries.
      entry_ids: (nq, E) int32 starting points per query (E>=1; -1 padded) —
        a single greedy-descent result for plain HNSW search, or nprobe
        seeds for `search_level_0`-style use (HNSW.cpp:1005).
      ef: beam width (faiss efSearch); buffer keeps ef entries.
      k: results returned (k <= ef enforced by caller).
      expand: nodes expanded per hop per query (batched amortization of the
        one-pop-per-iteration reference loop).
      max_hops: hop cap; 0 -> default 2*ef/expand + 16.

    Returns:
      (dists (nq,k), ids (nq,k), stats dict with nhops/ndis) best-first.
    """
    nq, d = xq.shape
    n, m0 = neighbors0.shape
    xq = xq.astype(jnp.float32)
    if max_hops <= 0:
        max_hops = 2 * ef // max(expand, 1) + 16
    nwords = _bitset_words(n)
    B = ef
    C = expand * m0

    e_valid = entry_ids >= 0
    visited, fresh = _seed_visited(nq, nwords, entry_ids, e_valid)
    e_vecs = vectors[jnp.where(e_valid, entry_ids, 0)]
    e_dis = jnp.where(fresh, _batch_dists(xq, e_vecs, metric), jnp.inf)

    # initial buffer: sorted entry seeds padded to B
    E = entry_ids.shape[1]
    pad = max(B - E, 0)
    bd = jnp.pad(e_dis, ((0, 0), (0, pad)), constant_values=jnp.inf)
    bi = jnp.pad(jnp.where(fresh, entry_ids, -1), ((0, 0), (0, pad)),
                 constant_values=-1)
    bexp = bd == jnp.inf  # padding counts as expanded
    order = jnp.argsort(bd, axis=1)
    bd = jnp.take_along_axis(bd, order, axis=1)[:, :B]
    bi = jnp.take_along_axis(bi, order, axis=1)[:, :B]
    bexp = jnp.take_along_axis(bexp, order, axis=1)[:, :B]

    def cond(state):
        _, _, _, _, done, hops, _ = state
        return jnp.logical_and(~jnp.all(done), hops < max_hops)

    def body(state):
        bd, bi, bexp, visited, done, hops, ndis = state
        # 1) pick top-`expand` unexpanded entries
        cand_score = jnp.where(bexp, jnp.inf, bd)
        neg, pos = lax.top_k(-cand_score, expand)       # (nq, expand)
        sel_d = -neg
        sel_ok = jnp.isfinite(sel_d)
        # termination (check_relative_distance, HNSW.cpp:645): stop when the
        # best unexpanded candidate is worse than the ef-th result
        frontier_best = sel_d[:, 0]
        thresh = bd[:, B - 1]
        newly_done = jnp.logical_or(~sel_ok[:, 0],
                                    frontier_best > thresh)
        live = ~done
        do_expand = sel_ok & live[:, None]
        # 2) mark selected as expanded
        row = lax.broadcasted_iota(jnp.int32, (nq, expand), 0)
        bexp2 = bexp.at[row, pos].max(do_expand)
        # 3) gather neighbors of selected
        sel_ids = jnp.take_along_axis(bi, pos, axis=1)   # (nq, expand)
        src = jnp.where(do_expand, sel_ids, 0)
        nbrs = neighbors0[src].reshape(nq, C)
        valid = (nbrs >= 0) & jnp.repeat(do_expand, m0, axis=1)
        # 4) visited filter + mark
        visited2, fresh = _visited_test_and_set(visited, nbrs, valid)
        # 5) distances
        vecs = vectors[jnp.where(fresh, nbrs, 0)]
        dis = jnp.where(fresh, _batch_dists(xq, vecs, metric), jnp.inf)
        ndis = ndis + jnp.sum(fresh.astype(jnp.int32))
        # 6) sort-merge into buffer
        cd = jnp.concatenate([bd, dis], axis=1)
        ci = jnp.concatenate([bi, jnp.where(fresh, nbrs, -1)], axis=1)
        ce = jnp.concatenate([bexp2, ~fresh], axis=1)
        morder = jnp.argsort(cd, axis=1)
        bd = jnp.take_along_axis(cd, morder, axis=1)[:, :B]
        bi = jnp.take_along_axis(ci, morder, axis=1)[:, :B]
        bexp3 = jnp.take_along_axis(ce, morder, axis=1)[:, :B]
        return (bd, bi, bexp3, visited2, done | newly_done, hops + 1, ndis)

    done0 = jnp.zeros(nq, bool)
    bd, bi, bexp, visited, done, hops, ndis = lax.while_loop(
        cond, body, (bd, bi, bexp, visited, done0, 0, jnp.int32(0))
    )
    out_d = bd[:, :k]
    if D.is_similarity_metric(metric) and not raw:
        out_d = -out_d   # canonical -> user-facing similarity
    return out_d, bi[:, :k], {"nhops": hops, "ndis": ndis}


@functools.partial(
    jax.jit,
    static_argnames=("ef", "k", "expand", "metric"),
)
def hnsw_search(
    vectors: jnp.ndarray,
    graph: HNSWGraph,
    xq: jnp.ndarray,
    *,
    ef: int,
    k: int,
    expand: int = 2,
    metric: int = D.METRIC_L2,
):
    """Full HNSW search: greedy descent through upper levels then level-0
    beam (HNSW::search, HNSW.cpp:943-1000)."""
    nq = xq.shape[0]
    xq = xq.astype(jnp.float32)
    cur = jnp.broadcast_to(graph.entry, (nq,)).astype(jnp.int32)
    cur_d = _batch_dists(xq, vectors[cur][:, None, :], metric)[:, 0]
    for level in range(graph.max_level, 0, -1):
        cur, cur_d = _greedy_level(vectors, graph, xq, level, cur, cur_d,
                                   metric=metric)
    return beam_search_level0(
        vectors, graph.neighbors0, xq, cur[:, None],
        ef=ef, k=k, expand=expand, metric=metric,
    )


# ---------------------------------------------------------------------------
# neighbor selection: the HNSW diversity heuristic
# (shrink_neighbor_list, HNSW.cpp:245-299), batched over a wave
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("m", "metric", "return_dis"))
def _select_neighbors_heuristic(q_vecs, cand_ids, cand_dis, vectors, m: int,
                                metric: int = D.METRIC_L2,
                                return_dis: bool = False):
    """For each wave point: scan candidates in distance order, keep c only
    if dist(q, c) < dist(c, kept_j) for all kept j. Returns (W, m) ids
    (plus the kept candidates' distances when `return_dis`).

    Vectorized: pairwise candidate-candidate distances once, then a scan
    over candidate rank with a kept-mask carry.
    """
    W, C = cand_ids.shape
    order = jnp.argsort(cand_dis, axis=1)
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    cand_dis = jnp.take_along_axis(cand_dis, order, axis=1)
    valid = cand_ids >= 0
    cvecs = vectors[jnp.where(valid, cand_ids, 0)]       # (W, C, d)
    # pairwise CANONICAL scores among candidates (cand_dis must also be
    # canonical: ascending-best, IP negated — see _batch_dists)
    ip = jnp.einsum("wcd,wed->wce", cvecs, cvecs,
                    precision=lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    if D.is_similarity_metric(metric):
        pair = -ip
    else:
        nrm = jnp.einsum("wcd,wcd->wc", cvecs, cvecs,
                         precision=lax.Precision.DEFAULT)
        pair = jnp.maximum(nrm[:, :, None] + nrm[:, None, :] - 2.0 * ip, 0.0)

    def scan_body(carry, i):
        kept, nkept = carry   # kept: (W, C) bool mask over candidate rank
        # dist from candidate i to all kept candidates
        di = pair[:, i, :]                               # (W, C)
        conflict = jnp.any(kept & (di < cand_dis[:, i][:, None]),
                           axis=1)
        take = valid[:, i] & ~conflict & (nkept < m)
        kept = kept.at[:, i].set(take)
        return (kept, nkept + take.astype(jnp.int32)), None

    kept0 = jnp.zeros((W, C), bool)
    (kept, _), _ = lax.scan(scan_body, (kept0, jnp.zeros(W, jnp.int32)),
                            jnp.arange(C))
    # compact kept ids to the first m slots, -1 padded (candidate count C
    # may be below the degree m when efConstruction < degree)
    score = jnp.where(kept, cand_dis, jnp.inf)
    take = min(m, C)
    sorder = jnp.argsort(score, axis=1)[:, :take]
    out = jnp.take_along_axis(jnp.where(kept, cand_ids, -1), sorder, axis=1)
    out_d = jnp.take_along_axis(score, sorder, axis=1)
    if take < m:
        out = jnp.pad(out, ((0, 0), (0, m - take)), constant_values=-1)
        out_d = jnp.pad(out_d, ((0, 0), (0, m - take)),
                        constant_values=jnp.inf)
    if return_dis:
        return out, out_d
    return out


# ---------------------------------------------------------------------------
# wave insertion
# ---------------------------------------------------------------------------

def _apply_reverse_links(vectors, neighbors_l, fwd_ids, wave_ids,
                         metric: int = D.METRIC_L2):
    """Add reverse edges target <- wave point, pruning each touched
    target's list back to degree with the diversity heuristic (faiss
    add_link's shrink on overflow, HNSW.cpp:520-535 — distance-rank
    pruning here was measured to erode old nodes' long-range links over
    repeated waves, degrading recall of already-inserted points).

    neighbors_l: (N, deg). fwd_ids: (W, m) forward targets (-1 pad).
    wave_ids: (W,) new node ids.
    Returns updated neighbors_l.
    """
    N, deg = neighbors_l.shape
    W, m = fwd_ids.shape
    R = W * m
    tgt = fwd_ids.reshape(R)
    src = jnp.repeat(wave_ids, m)
    ok = tgt >= 0
    tgt_s = jnp.where(ok, tgt, N)       # sort invalid to the end
    order = jnp.argsort(tgt_s)
    tgt_s = tgt_s[order]
    src_s = src[order]
    ok_s = ok[order]

    # additions for each request row: contiguous run of equal targets
    start = jnp.searchsorted(tgt_s, tgt_s)               # first occurrence
    A = min(deg, 16)                                     # cap adds per target
    offs = lax.broadcasted_iota(jnp.int32, (R, A), 1)
    add_pos = start[:, None] + offs
    in_run = (add_pos < R) & (tgt_s[jnp.clip(add_pos, 0, R - 1)]
                              == tgt_s[:, None])
    add_ids = jnp.where(in_run, src_s[jnp.clip(add_pos, 0, R - 1)], -1)

    # merged list per request row: old neighbors + additions, top-deg by dist
    t_safe = jnp.where(ok_s, tgt_s, 0)
    old = neighbors_l[t_safe]                            # (R, deg)
    cand = jnp.concatenate([old, add_ids], axis=1)       # (R, deg+A)
    cvalid = cand >= 0
    tvec = vectors[t_safe]                               # (R, d)
    cvecs = vectors[jnp.where(cvalid, cand, 0)]
    dis = _batch_dists(tvec, cvecs, metric)
    dis = jnp.where(cvalid, dis, jnp.inf)
    # dedupe (an addition may already be a neighbor): mask later duplicates
    sids = jnp.argsort(jnp.where(cvalid, cand, jnp.int32(2**30)), axis=1)
    cs = jnp.take_along_axis(cand, sids, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((R, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
    row = lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    dup = jnp.zeros(cand.shape, bool).at[row, sids].set(dup_sorted)
    dis = jnp.where(dup, jnp.inf, dis)
    cand = jnp.where(jnp.isfinite(dis), cand, -1)
    new_list = _select_neighbors_heuristic(tvec, cand, dis, vectors, deg,
                                           metric)
    # duplicate valid rows write identical values (idempotent scatter);
    # invalid rows are routed to a dummy row N that is sliced off
    t_write = jnp.where(ok_s, tgt_s, N)
    padded = jnp.concatenate(
        [neighbors_l, jnp.full((1, deg), -1, neighbors_l.dtype)], axis=0)
    return padded.at[t_write].set(new_list)[:N]


@functools.partial(
    jax.jit, static_argnames=("m_fwd", "ef_construction", "metric"))
def _insert_wave_level(vectors, neighbors_l, xq_wave, wave_ids, entry_ids,
                       n_valid,
                       *, m_fwd: int, ef_construction: int,
                       metric: int = D.METRIC_L2):
    """Insert one wave at one level: beam-search the pre-wave graph for
    candidates, heuristic-select forward links, apply forward + reverse.

    `vectors`/`neighbors_l`/ids may live in a compacted row space (upper
    levels) — the caller maps global<->row ids. Rows with
    wave_ids >= n_valid are shape-padding (the build driver pads every
    wave to one static size so the whole build compiles once per level):
    they take no links and emit no reverse edges.

    Returns (new_neighbors_l, nearest_ids (W, e) for seeding next level).
    """
    efc = ef_construction
    cd, ci, _ = beam_search_level0(
        vectors, neighbors_l, xq_wave, entry_ids,
        ef=efc, k=efc, expand=2, metric=metric, raw=True,
    )
    # never link a point to itself (its own row is already in `vectors`)
    self_hit = ci == wave_ids[:, None]
    cd = jnp.where(self_hit, jnp.inf, cd)
    ci = jnp.where(self_hit, -1, ci)
    fwd = _select_neighbors_heuristic(xq_wave, ci, cd, vectors,
                                      m_fwd, metric)
    row_ok = wave_ids < n_valid
    fwd = jnp.where(row_ok[:, None], fwd, -1)
    neighbors_l = neighbors_l.at[wave_ids].set(fwd)
    neighbors_l = _apply_reverse_links(vectors, neighbors_l, fwd, wave_ids,
                                       metric)
    seeds = jnp.where(jnp.isfinite(cd[:, :8]), ci[:, :8], -1)
    return neighbors_l, seeds


# ---------------------------------------------------------------------------
# build driver (host-orchestrated waves; hnsw_add_vertices analog)
# ---------------------------------------------------------------------------

def build_graph(
    vectors: jnp.ndarray,
    m: int,
    ef_construction: int,
    *,
    levels: Optional[np.ndarray] = None,
    seed: int = 1234,
    wave_size: int = 1024,
    metric: int = D.METRIC_L2,
    verbose: bool = False,
) -> HNSWGraph:
    """Build the multilevel graph by level-bucketed wave insertion.

    Mirrors `hnsw_add_vertices` (IndexHNSW.cpp:68-224): points bucketed by
    level, processed high->low; within a bucket, waves replace the omp-for
    over points. Each wave searches the pre-wave graph (so intra-wave
    points cannot link each other — recall parity is the validation
    criterion, not graph equality).
    """
    n, d = vectors.shape
    m0 = 2 * m
    if levels is None:
        levels = random_levels(n, m, seed)
    levels = np.asarray(levels, np.int32)
    max_level = int(levels.max(initial=0))

    upper_ids_np = np.nonzero(levels >= 1)[0].astype(np.int32)
    if len(upper_ids_np) == 0:
        upper_ids_np = np.array([0], np.int32)  # pad row; never linked
        lmax_tab = 1
    else:
        lmax_tab = max_level
    u = len(upper_ids_np)
    # row lookup for upper tables; levels of upper nodes
    upper_levels = levels[upper_ids_np]

    # one extra dummy row per table absorbs the writes of shape-padded
    # wave slots (sliced off at the end)
    neighbors0 = jnp.full((n + 1, m0), -1, jnp.int32)
    upper_neighbors = jnp.full((u + 1, max(lmax_tab, 1), m), -1, jnp.int32)
    vectors = jnp.asarray(vectors, jnp.float32)
    vectors_u = vectors[jnp.asarray(upper_ids_np)]
    upper_ids_dev = jnp.asarray(upper_ids_np)

    # per-upper-level row adjacency (row space) — filled as we insert
    # entry point: first point of the highest bucket
    order = np.argsort(-levels, kind="stable")
    entry = int(order[0])
    graph_entry = jnp.int32(entry)

    # bucket points by level, high -> low (skip the entry point itself at
    # its own bucket head: it is inserted first with no links)
    inserted = np.zeros(n, bool)
    inserted[entry] = True
    n_done = 1

    def rows_of(ids_np):
        return np.searchsorted(upper_ids_np, ids_np).astype(np.int32)

    for pt_level in range(max_level, -1, -1):
        bucket = order[levels[order] == pt_level]
        bucket = bucket[bucket != entry]
        if len(bucket) == 0:
            continue
        i0 = 0
        # ramp-up so early points see a connected graph; every wave is
        # PADDED to `wave_size` (dummy ids -> dummy table rows) so the
        # whole build reuses one compiled program per level
        w = 32
        while i0 < len(bucket):
            from ..utils.interrupt import InterruptCallback

            InterruptCallback.check()
            w = min(w * 2, wave_size)
            wave = bucket[i0 : i0 + w]
            i0 += len(wave)
            nw = len(wave)
            wave_pad = np.full(wave_size, n, np.int64)   # dummy = row n
            wave_pad[:nw] = wave
            xw = jnp.asarray(
                np.concatenate([np.asarray(vectors[jnp.asarray(wave)]),
                                np.zeros((wave_size - nw, d), np.float32)])
                if nw < wave_size else
                np.asarray(vectors[jnp.asarray(wave)]))
            # greedy descent from entry through levels > pt_level
            cur = jnp.full((wave_size,), entry, jnp.int32)
            cur_d = _batch_dists(xw, vectors[cur][:, None, :], metric)[:, 0]
            tmp_graph = HNSWGraph(
                neighbors0=neighbors0[:n], upper_ids=upper_ids_dev,
                upper_neighbors=upper_neighbors[:u],
                levels=jnp.asarray(levels), entry=graph_entry,
                max_level=max_level,
            )
            for lev in range(max_level, pt_level, -1):
                cur, cur_d = _greedy_level(vectors, tmp_graph, xw, lev,
                                           cur, cur_d, metric=metric)
            seeds = cur[:, None]
            # insert at levels pt_level..1 in upper row space
            for lev in range(min(pt_level, max_level), 0, -1):
                adj_g = upper_neighbors[:, lev - 1]        # global ids
                adj_rows = jnp.where(
                    adj_g >= 0,
                    jnp.searchsorted(upper_ids_dev, adj_g).astype(jnp.int32),
                    -1,
                )
                wave_rows_np = np.full(wave_size, u, np.int32)  # dummy = u
                wave_rows_np[:nw] = rows_of(wave)
                wave_rows = jnp.asarray(wave_rows_np)
                seed_rows = jnp.where(
                    seeds >= 0,
                    jnp.searchsorted(upper_ids_dev,
                                     jnp.where(seeds >= 0, seeds, 0)
                                     ).astype(jnp.int32),
                    -1,
                )
                # seeds must be upper nodes at level >= lev: require an
                # exact id match (searchsorted of an absent id returns an
                # arbitrary insertion point) and a sufficient level
                rclip = jnp.clip(seed_rows, 0, u - 1)
                exact = upper_ids_dev[rclip] == jnp.where(seeds >= 0, seeds, -2)
                seed_lv = jnp.asarray(upper_levels)[rclip]
                seed_rows = jnp.where(exact & (seed_lv >= lev), rclip, -1)
                new_adj, seed_out = _insert_wave_level(
                    vectors_u, adj_rows, xw, wave_rows, seed_rows,
                    jnp.int32(u),
                    m_fwd=m, ef_construction=ef_construction, metric=metric,
                )
                # rows -> global ids for storage
                upper_neighbors = upper_neighbors.at[:, lev - 1].set(
                    jnp.where(new_adj >= 0,
                              upper_ids_dev[jnp.clip(new_adj, 0, u - 1)],
                              -1)
                )
                seeds = jnp.where(seed_out >= 0,
                                  upper_ids_dev[jnp.clip(seed_out, 0, u - 1)],
                                  -1)
            # level 0
            neighbors0, _ = _insert_wave_level(
                vectors, neighbors0, xw, jnp.asarray(wave_pad), seeds,
                jnp.int32(n),
                m_fwd=m0, ef_construction=ef_construction, metric=metric,
            )
            inserted[wave] = True
            n_done += len(wave)
            if verbose:
                print(f"hnsw build: level {pt_level}, {n_done}/{n}")

    return HNSWGraph(
        neighbors0=neighbors0[:n],
        upper_ids=upper_ids_dev,
        upper_neighbors=upper_neighbors[:u],
        levels=jnp.asarray(levels),
        entry=graph_entry,
        max_level=max_level,
    )


# ---------------------------------------------------------------------------
# GEMM-based graph construction (TPU-first alternative to wave insertion)
#
# The reference builds HNSW by sequential insertion (`add_with_locks`,
# HNSW.cpp:542-591): each point beam-searches the partial graph for
# efConstruction candidates, keeps a diverse subset (shrink heuristic) and
# adds capped reverse links. That is a pointer-chasing workload. The batch
# reformulation below computes the same three ingredients with dense
# MXU-friendly kernels over the FINAL point set:
#   1. candidates  = approximate kNN of every point (blocked GEMM for small
#      n; kmeans route + packed-invlist scan for large n — the same trick
#      faiss' NNDescent/NSG path uses a kNN graph for),
#   2. forward links = the shrink_neighbor_list diversity heuristic
#      (HNSW.cpp:245-299) batched over all nodes,
#   3. reverse links = capped run-length scatter + a second diversity prune
#      (the overflow shrink in add_link, HNSW.cpp:501-537).
# Insertion order no longer exists, so parity is validated on recall, like
# the reference's own tests (tests/test_hnsw.cpp checks stats/recall).
# ---------------------------------------------------------------------------


def _knn_candidates(x: np.ndarray, C: int, metric: int, seed: int,
                    verbose: bool = False):
    """Approximate (or exact, small n) kNN table used as link candidates.

    Returns (dis (n, C) f32 ascending-best, ids (n, C) int32, assign (n,)
    int64 coarse assignment for spatial reordering — or None when the exact
    path ran)."""
    from . import ivf_scan as IV
    from . import kmeans as K

    n, d = x.shape
    C = min(C, n - 1)
    if n <= 32768:
        dis, ids = D.knn(
            jnp.asarray(x), jnp.asarray(x), min(C + 1, n), metric,
            compute_dtype="bfloat16", approx=n > 8192, refine_factor=2,
        )
        return dis, ids.astype(jnp.int32), None

    nlist = int(min(16384, max(256, n // 256)))
    # build-time budget: 6 Lloyd iterations on a 96/centroid subsample
    # and 6 probes are within ~0.1% recall of 8/128/8 at 1M (the
    # diversity prune downstream absorbs candidate noise)
    # build-time budget: niter=6 is a cap; early_stop_tol cuts Lloyd
    # short once the objective moves <0.5%/iter (the diversity prune
    # downstream only needs assignment-quality clusters)
    cp = K.ClusteringParameters(niter=6, seed=seed, verbose=verbose,
                                max_points_per_centroid=96,
                                early_stop_tol=5e-3)
    centroids, _ = K.kmeans(x, nlist, params=cp, metric=metric)
    nprobe = 6
    # one upload of x, reused for probing, the device-side invlist pack,
    # and as chunked scan queries — everything downstream stays on
    # device (per-chunk H2D/D2H round trips dominated this phase through
    # the remote tunnel: 133 s measured vs ~30 s of actual device work
    # at 1M; the host pack_invlists additionally permuted + re-uploaded
    # the full (n, d) matrix)
    x_dev = jnp.asarray(x)
    _, probes_dev = D.knn(x_dev, jnp.asarray(centroids), nprobe, metric,
                          compute_dtype="bfloat16", approx=True)
    probes_dev = probes_dev.astype(jnp.int32)
    assign = np.asarray(probes_dev[:, 0]).astype(np.int64)
    pil = IV.pack_invlists_device(x_dev, np.arange(n, dtype=np.int64),
                                  assign, nlist)
    chunk = 65536
    pend = []
    for i0 in range(0, n, chunk):
        dc, ic, _ = IV.scan_invlists(
            x_dev[i0 : i0 + chunk],
            probes_dev[i0 : i0 + chunk],
            pil, C + 1, metric,
            max_nblocks=pil._max_nblocks, approx=True,
        )
        pend.append((dc, ic))
        if verbose:
            print(f"hnsw knn-candidates: {min(i0 + chunk, n)}/{n}")
    out_d = jnp.concatenate([p[0] for p in pend])
    out_i = jnp.concatenate([p[1] for p in pend]).astype(jnp.int32)
    return out_d, out_i, assign


def _drop_self(dis: np.ndarray, ids: np.ndarray, C: int,
               row_ids: Optional[np.ndarray] = None):
    """Remove each row's own id from its CANONICAL (ascending-best)
    candidate list, keep C best."""
    n = ids.shape[0]
    own = row_ids if row_ids is not None else np.arange(n, dtype=ids.dtype)
    self_m = ids == own[:, None]
    bad = (ids < 0) | self_m
    dis = np.where(bad, np.inf, dis)
    ids = np.where(bad, -1, ids)
    order = np.argsort(dis, axis=1, kind="stable")
    dis = np.take_along_axis(dis, order, axis=1)[:, :C]
    ids = np.take_along_axis(ids, order, axis=1)[:, :C]
    return dis, ids


@functools.partial(jax.jit, static_argnames=("C",))
def _drop_self_device(dis: jnp.ndarray, ids: jnp.ndarray, C: int):
    """Device `_drop_self` (row ids == position): the (n, C+1) table
    never leaves HBM."""
    own = jnp.arange(dis.shape[0], dtype=ids.dtype)[:, None]
    bad = (ids < 0) | (ids == own)
    dis = jnp.where(bad, jnp.inf, dis)
    ids = jnp.where(bad, -1, ids)
    order = jnp.argsort(dis, axis=1)[:, :C]
    return (jnp.take_along_axis(dis, order, axis=1),
            jnp.take_along_axis(ids, order, axis=1))


def _prune_all(vectors, cand_ids: np.ndarray, cand_dis: np.ndarray, m: int,
               metric: int, chunk: int = 65536, verbose: bool = False,
               tag: str = ""):
    """Batched shrink_neighbor_list over every node (chunked on rows).
    Returns (ids (n, m) int32, dis (n, m) f32 — inf for empty slots).

    All chunks are DISPATCHED before any is materialized: each
    np.asarray is a host sync (a full tunnel round trip here), so the
    old dispatch-then-wait-per-chunk loop serialized device work with
    transfer latency."""
    n = cand_ids.shape[0]
    cand_ids = jnp.asarray(cand_ids)
    cand_dis = jnp.asarray(cand_dis)
    pend = []
    for i0 in range(0, n, chunk):
        sel, seld = _select_neighbors_heuristic(
            None,
            cand_ids[i0 : i0 + chunk],
            cand_dis[i0 : i0 + chunk],
            vectors, m, metric, return_dis=True,
        )
        pend.append((sel, seld))
        if verbose and (i0 // chunk) % 16 == 0:
            print(f"hnsw prune{tag}: {min(i0 + chunk, n)}/{n}")
    # outputs stay on device: callers that need host copies pay the
    # (small) download themselves; the big tables never leave HBM
    return (jnp.concatenate([p[0] for p in pend]),
            jnp.concatenate([p[1] for p in pend]))


def _reverse_candidates(fwd: np.ndarray, fwd_dis: np.ndarray, cap: int):
    """For each node v, up to `cap` nodes u with v in fwd[u] (the reverse
    edges that sequential insertion would have tried to add), with their
    (symmetric-metric) edge distances."""
    n, m = fwd.shape
    from ..utils.native import reverse_edges_native

    nat = reverse_edges_native(fwd, fwd_dis, cap)
    if nat is not None:
        return nat
    src = np.repeat(np.arange(n, dtype=np.int32), m)
    dst = fwd.reshape(-1)
    dd = fwd_dis.reshape(-1)
    ok = dst >= 0
    src, dst, dd = src[ok], dst[ok], dd[ok]
    order = np.argsort(dst, kind="stable")
    src, dst, dd = src[order], dst[order], dd[order]
    start = np.searchsorted(dst, dst)          # first index of each run
    pos = np.arange(len(dst)) - start
    keep = pos < cap
    rev_ids = np.full((n, cap), -1, np.int32)
    rev_dis = np.full((n, cap), np.inf, np.float32)
    rev_ids[dst[keep], pos[keep]] = src[keep]
    rev_dis[dst[keep], pos[keep]] = dd[keep]
    return rev_ids, rev_dis


def _reverse_candidates_auto(fwd, fwd_dis, cap: int):
    """Route the reverse-edge build: host (native counting scatter, or
    the numpy sort fallback) for large edge sets, device for small ones.

    Measured on v5e (2026-08-18): the device sort program WEDGES at 1M
    nodes x 32 edges — >29 min with the runtime blocked on the execute
    RPC (three ~50M-element sorts in one XLA program; the round-2 builds
    that recorded 314 s total used the host path). The host path pays
    one (n, m) table download + (n, cap) upload — seconds on a PCIe
    host — and its compute is a parallel counting scatter
    (native/tpu_ann_native.cpp reverse_edges)."""
    E = int(fwd.shape[0]) * int(fwd.shape[1])
    if E <= (1 << 22):
        return _reverse_candidates_device(fwd, fwd_dis, cap)
    rev_ids, rev_dis = _reverse_candidates(
        np.asarray(fwd, np.int32), np.asarray(fwd_dis, np.float32), cap)
    return jnp.asarray(rev_ids), jnp.asarray(rev_dis)


@functools.partial(jax.jit, static_argnames=("cap",))
def _reverse_candidates_device(fwd: jnp.ndarray, fwd_dis: jnp.ndarray,
                               cap: int):
    """Device-resident reverse-edge builder — same contract as
    `_reverse_candidates`, no host round trip (the (n, m) table download
    costs ~40 s through this environment's ~6 MB/s tunnel; scatters
    serialize on TPU, so the build is sort-based).

    Construction: sort edges by destination; rank-within-run via a
    running max of run starts; then produce the dense (n, cap) table
    WITHOUT a scatter by appending one filler entry per output slot and
    stable-argsorting (real entries win ties) — the classic
    inverse-permutation-gather trade. Three O(E + n*cap) sorts replace
    16M serialized scatter updates."""
    n, m = fwd.shape
    E = n * m
    S = n * cap
    dst = fwd.reshape(E)
    src = (jnp.arange(E, dtype=jnp.int32) // m).astype(jnp.int32)
    dd = fwd_dis.reshape(E)

    # rank of each edge within its destination's run
    order = jnp.argsort(jnp.where(dst >= 0, dst, jnp.int32(2**30)))
    ds = dst[order]
    ss = src[order]
    dds = dd[order]
    idx = jnp.arange(E, dtype=jnp.int32)
    runstart = jnp.where(
        jnp.concatenate([jnp.array([True]), ds[1:] != ds[:-1]]), idx, 0)
    start = jax.lax.associative_scan(jnp.maximum, runstart)
    pos = idx - start
    keep = (ds >= 0) & (pos < cap)

    # output slot key; real entries sort before their slot's filler.
    # int32 key budget: 2*(2S + 1 + E) must stay below 2^31 (holds to
    # ~8M nodes at m=32, cap=16; larger builds go through extend_graph)
    assert 2 * (2 * S + 1 + E) < 2**31, "reverse key space overflow"
    okey = jnp.where(keep, ds * cap + pos, 2 * S + 1 + idx)
    comb_key = jnp.concatenate([
        okey * 2, jnp.arange(S, dtype=jnp.int32) * 2 + 1])
    comb_src = jnp.concatenate([ss, jnp.full((S,), -1, ss.dtype)])
    comb_dis = jnp.concatenate([dds, jnp.full((S,), jnp.inf, dds.dtype)])
    order2 = jnp.argsort(comb_key)
    ks = comb_key[order2] >> 1
    vs = comb_src[order2]
    vd = comb_dis[order2]
    first = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]])
    # stable argsort of ~first: the S first-occurrence positions, in slot
    # order (every slot key exists thanks to the fillers)
    fp = jnp.argsort(~first, stable=True)[:S]
    rev_ids = vs[fp].reshape(n, cap)
    rev_dis = vd[fp].reshape(n, cap)
    return rev_ids, rev_dis


def _merge_prune(vectors, fwd, fwd_dis, rev_ids, rev_dis, m: int,
                 metric: int, verbose: bool, tag: str) -> np.ndarray:
    """Final per-node list: diversity prune of forward ∪ reverse candidates
    (duplicates masked). All scores canonical ascending-best. Device
    in/out (host numpy inputs are accepted and promoted)."""
    cand = jnp.concatenate([jnp.asarray(fwd), jnp.asarray(rev_ids)], axis=1)
    cdis = jnp.concatenate([jnp.asarray(fwd_dis), jnp.asarray(rev_dis)],
                           axis=1)
    # mask duplicate ids per row (a reverse edge may already be forward)
    sorder = jnp.argsort(jnp.where(cand >= 0, cand, jnp.int32(2**30)),
                         axis=1, stable=True)
    cs = jnp.take_along_axis(cand, sorder, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((len(cand), 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
    inv = jnp.argsort(sorder, axis=1)
    dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
    cdis = jnp.where(dup | (cand < 0), jnp.inf, cdis)
    cand = jnp.where(dup, -1, cand)
    return _prune_all(vectors, cand, cdis, m, metric,
                      verbose=verbose, tag=tag)[0]


def build_graph_knn(
    vectors: jnp.ndarray,
    m: int,
    ef_construction: int,
    *,
    levels: Optional[np.ndarray] = None,
    seed: int = 1234,
    metric: int = D.METRIC_L2,
    verbose: bool = False,
    prune_mode: str = "single",
    reverse_cap: int = 0,
) -> Tuple[HNSWGraph, Optional[np.ndarray]]:
    """Build an HNSW-compatible graph from a batch kNN table (see module
    section comment). Returns (graph, coarse_assign or None) — the coarse
    assignment doubles as the spatial reordering key for the tile-granular
    search layout (ops/hnsw_tiles.py).

    `ef_construction` plays its reference role as the candidate-pool size
    feeding the diversity heuristic (search_neighbors_to_add beam width,
    HNSW.cpp:375). prune_mode 'double' runs the diversity heuristic on
    the forward candidates AND on the forward∪reverse merge (closest to
    sequential insertion); 'single' (default) rank-truncates forward
    links and applies the heuristic only at the merge — one prune pass
    instead of two. Measured at 1M/v5e: single = 499 s vs double =
    729 s at a 0.0003 recall@10 delta (0.9977 vs 0.9980 at the fused
    search knee)."""
    x = np.ascontiguousarray(np.asarray(vectors), np.float32)
    n, d = x.shape
    m0 = 2 * m
    similarity = D.is_similarity_metric(metric)
    if levels is None:
        levels = random_levels(n, m, seed)
    levels = np.asarray(levels, np.int32)
    max_level = int(levels.max(initial=0))

    # phase profiling (verbose only): forcing a sync at each boundary
    # serializes phases that would otherwise overlap, so the prints are
    # a *profile*, not the production build time
    import time as _time
    _t = [_time.time()]

    def _mark(tag, force=None):
        if not verbose:
            return
        if force is not None:
            np.asarray(force[:1, :1] if force.ndim == 2 else force[:1])
        now = _time.time()
        print(f"hnsw build phase: {tag} {now - _t[0]:.1f}s", flush=True)
        _t[0] = now

    C = int(min(max(m0 + 16, ef_construction), max(n - 1, 1)))
    dis, ids, assign = _knn_candidates(x, C, metric, seed, verbose)
    _mark("knn-candidates", dis)
    if similarity:
        dis = -dis   # canonical ascending-best
    dis, ids = _drop_self_device(dis, ids, C)

    vec_dev = jnp.asarray(x, jnp.bfloat16)
    if prune_mode == "single":
        fwd, fwd_dis = ids[:, :m0], dis[:, :m0]
    else:
        fwd, fwd_dis = _prune_all(vec_dev, ids, dis, m0, metric,
                                  verbose=verbose, tag="/fwd")
    _mark("forward-links", fwd_dis)
    # reverse-edge cap m (not m0): measured at 1M/v5e, cap=m builds in
    # 314 s vs 402 s at cap=m0 with recall@10 unchanged (0.9976 vs
    # 0.9977) — the merge prune keeps the same diverse subset either way
    rcap = int(reverse_cap) if reverse_cap else m
    rev_ids, rev_dis = _reverse_candidates_auto(fwd, fwd_dis, rcap)
    _mark("reverse-candidates", rev_dis)
    neighbors0 = _merge_prune(vec_dev, fwd, fwd_dis, rev_ids, rev_dis, m0,
                              metric, verbose, "/lvl0")
    _mark("merge-prune", neighbors0)

    upper_ids_np, upper_neighbors = _link_upper_levels(
        x, levels, m, metric, similarity, verbose)
    _mark("upper-levels")

    entry = int(np.argmax(levels))
    graph = HNSWGraph(
        neighbors0=jnp.asarray(neighbors0),
        upper_ids=jnp.asarray(upper_ids_np),
        upper_neighbors=jnp.asarray(upper_neighbors),
        levels=jnp.asarray(levels),
        entry=jnp.int32(entry),
        max_level=max_level,
    )
    return graph, assign


def _link_upper_levels(x: np.ndarray, levels: np.ndarray, m: int,
                       metric: int, similarity: bool, verbose: bool):
    """Link every upper level by exact kNN + diversity prune within the
    level's node subset (subsets shrink geometrically — 1/M per level —
    so exact MXU kNN is cheap). Returns (upper_ids (U,), upper_neighbors
    (U, Lmax, m) with global-id values).

    Levels run at pow2-padded shapes (4096 floor on big builds, so the
    deep tiny levels share one shape): the per-level subsets shrink
    geometrically, but compiling a fresh knn/prune/merge chain per raw
    (ns,) shape costs far more than the padding's wasted FLOPs — the
    round-3 profile attributed most of the 46-62 s upper-levels phase to
    per-shape remote compiles, while a 64k x 64k bf16 GEMM is ~15 ms
    (measured: 62.6 s -> 23.1 s warm at 1M). Pow2 padding also makes the
    shapes reproducible across builds, so rebuilds hit the compile
    cache."""
    max_level = int(levels.max(initial=0))
    upper_ids_np = np.nonzero(levels >= 1)[0].astype(np.int32)
    if len(upper_ids_np) == 0:
        upper_ids_np = np.array([0], np.int32)
        lmax_tab = 1
    else:
        lmax_tab = max(max_level, 1)
    u = len(upper_ids_np)
    d = x.shape[1]
    upper_neighbors = np.full((u, lmax_tab, m), -1, np.int32)
    n1 = int((levels >= 1).sum())
    if n1 <= 1 or max_level < 1:
        return upper_ids_np, upper_neighbors
    for lev in range(1, max_level + 1):
        sub = np.nonzero(levels >= lev)[0].astype(np.int32)
        ns = len(sub)
        if ns <= 1:
            continue
        # pow2 pad, with a 4096 floor on big builds so the deep (tiny)
        # levels share one shape — 2-3 chains per build instead of one
        # per level, without padding a 10M build's level 4 to the
        # level-1 size (a 512 MB upload per level through the tunnel)
        floor = 12 if n1 > 8192 else 7
        P = 1 << max(int(np.ceil(np.log2(max(ns, 2)))), floor)
        cu = int(min(max(m + 8, 32), P - 1))
        xp = np.zeros((P, d), np.float32)
        xp[:ns] = x[sub]
        xp_dev = jnp.asarray(xp)
        sd, si = D.knn(
            xp_dev, xp_dev, min(cu + 1, P), metric,
            valid_n=jnp.int32(ns), compute_dtype="bfloat16",
            approx=P > 8192, refine_factor=2,
        )
        sd = np.asarray(sd)
        if similarity:
            sd = -sd
        sd, si = _drop_self(sd, np.asarray(si, np.int32), cu)
        # rows >= ns are zero-vector pads whose finite candidates would
        # otherwise leak reverse edges into real nodes; candidates with
        # non-finite distance are valid_n-masked db rows
        si = np.where(np.isfinite(sd), si, -1)
        sfwd, sdis = _prune_all(xp_dev, si, sd, m, metric, verbose=False)
        # upper subsets are small (n/M per level): host copies are cheap
        sfwd = np.array(sfwd, np.int32)     # np.asarray of a jax array
        sdis = np.array(sdis, np.float32)   # is read-only; copy to edit
        sfwd[ns:] = -1
        sdis[ns:] = np.inf
        srev, srd = _reverse_candidates(sfwd, sdis, m)
        slinks = np.asarray(_merge_prune(xp_dev, sfwd, sdis, srev, srd,
                                         m, metric, False, "/upper"))[:ns]
        # subset rows -> global ids; store at the upper-table rows
        glob = np.where(slinks >= 0, sub[np.clip(slinks, 0, ns - 1)], -1)
        rows = np.searchsorted(upper_ids_np, sub)
        upper_neighbors[rows, lev - 1] = glob
        if verbose:
            print(f"hnsw upper level {lev}: {ns} nodes linked")
    return upper_ids_np, upper_neighbors


def extend_graph(
    vectors: jnp.ndarray,
    graph: HNSWGraph,
    n_old: int,
    *,
    m: int,
    ef_construction: int,
    levels_new: Optional[np.ndarray] = None,
    seed: int = 1234,
    wave_size: int = 1024,
    metric: int = D.METRIC_L2,
    verbose: bool = False,
) -> HNSWGraph:
    """Incrementally insert nodes n_old..n-1 into an existing graph — the
    batch counterpart of `hnsw_add_vertices` on a non-empty index
    (faiss/IndexHNSW.cpp:68-224): new points beam-search the EXISTING
    level-0 graph in waves and link with the diversity heuristic; upper
    levels are relinked over the merged (small) upper subsets.

    Level draws for the new points use the same geometric law with an
    offset seed, so repeated adds stay deterministic."""
    x = np.ascontiguousarray(np.asarray(vectors), np.float32)
    n, d = x.shape
    n_new = n - n_old
    if n_new <= 0:
        return graph
    m0 = graph.m0
    similarity = D.is_similarity_metric(metric)
    if levels_new is None:
        levels_new = random_levels(n_new, m, seed, offset=n_old)
    levels = np.concatenate([np.asarray(graph.levels, np.int32),
                             np.asarray(levels_new, np.int32)])
    max_level = int(levels.max(initial=0))

    # level 0: wave insertion of the new nodes over the existing table.
    # Descents run on the OLD upper graph + entry (every node reachable
    # there is level-0-linked); upper levels are relinked at the end.
    vectors_dev = jnp.asarray(x)
    neighbors0 = jnp.concatenate([
        jnp.asarray(graph.neighbors0),
        jnp.full((n_new + 1, m0), -1, jnp.int32),
    ])
    old_entry = int(graph.entry)
    new_ids = np.arange(n_old, n, dtype=np.int64)
    for i0 in range(0, n_new, wave_size):
        from ..utils.interrupt import InterruptCallback

        InterruptCallback.check()
        wave = new_ids[i0 : i0 + wave_size]
        nw = len(wave)
        wave_pad = np.full(wave_size, n, np.int64)
        wave_pad[:nw] = wave
        xw = np.zeros((wave_size, d), np.float32)
        xw[:nw] = x[wave]
        xw = jnp.asarray(xw)
        cur = jnp.full((wave_size,), old_entry, jnp.int32)
        cur_d = _batch_dists(xw, vectors_dev[cur][:, None, :], metric)[:, 0]
        for lev in range(graph.max_level, 0, -1):
            cur, cur_d = _greedy_level(vectors_dev, graph, xw, lev,
                                       cur, cur_d, metric=metric)
        neighbors0, _ = _insert_wave_level(
            vectors_dev, neighbors0, xw, jnp.asarray(wave_pad),
            cur[:, None], jnp.int32(n),
            m_fwd=m0, ef_construction=ef_construction, metric=metric,
        )
        if verbose:
            print(f"hnsw extend: {min(i0 + wave_size, n_new)}/{n_new}")

    # upper levels: relink merged subsets (geometrically small)
    upper_ids_np, upper_neighbors = _link_upper_levels(
        x, levels, m, metric, similarity, verbose)
    entry = int(np.argmax(levels))
    return HNSWGraph(
        neighbors0=neighbors0[:n],
        upper_ids=jnp.asarray(upper_ids_np),
        upper_neighbors=jnp.asarray(upper_neighbors),
        levels=jnp.asarray(levels),
        entry=jnp.int32(entry),
        max_level=max_level,
    )
