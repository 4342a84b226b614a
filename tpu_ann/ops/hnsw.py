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

INVALID = jnp.int32(-1)


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
    # in-batch dedupe: order ids per row, mark later equal occurrences
    order = jnp.argsort(safe, axis=1)
    sorted_ids = jnp.take_along_axis(safe, order, axis=1)
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
                  max_hops: int = 64):
    """Batched greedy walk at `level` (>=1): move to the nearest neighbor
    until no improvement. cur/cur_d: (nq,) current node and distance."""
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
        dis = _batch_dists(xq, vecs)
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
    """(nq, d) x (nq, c, d) -> (nq, c) distances."""
    ip = jnp.einsum("qd,qcd->qc", xq, vecs,
                    precision=lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    if D.is_similarity_metric(metric):
        return ip
    qn = jnp.sum(xq * xq, axis=1, keepdims=True)
    vn = jnp.sum(vecs * vecs, axis=2)
    return jnp.maximum(qn + vn - 2.0 * ip, 0.0)


# ---------------------------------------------------------------------------
# level-0 beam search (HNSW.cpp:605 search_from_candidates, batched)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("ef", "k", "expand", "max_hops", "metric"),
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
    return bd[:, :k], bi[:, :k], {"nhops": hops, "ndis": ndis}


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
        cur, cur_d = _greedy_level(vectors, graph, xq, level, cur, cur_d)
    return beam_search_level0(
        vectors, graph.neighbors0, xq, cur[:, None],
        ef=ef, k=k, expand=expand, metric=metric,
    )


# ---------------------------------------------------------------------------
# neighbor selection: the HNSW diversity heuristic
# (shrink_neighbor_list, HNSW.cpp:245-299), batched over a wave
# ---------------------------------------------------------------------------

def _select_neighbors_heuristic(q_vecs, cand_ids, cand_dis, vectors, m: int,
                                metric: int = D.METRIC_L2):
    """For each wave point: scan candidates in distance order, keep c only
    if dist(q, c) < dist(c, kept_j) for all kept j. Returns (W, m) ids.

    Vectorized: pairwise candidate-candidate distances once, then a scan
    over candidate rank with a kept-mask carry.
    """
    W, C = cand_ids.shape
    order = jnp.argsort(cand_dis, axis=1)
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    cand_dis = jnp.take_along_axis(cand_dis, order, axis=1)
    valid = cand_ids >= 0
    cvecs = vectors[jnp.where(valid, cand_ids, 0)]       # (W, C, d)
    # pairwise distances among candidates
    ip = jnp.einsum("wcd,wed->wce", cvecs, cvecs,
                    precision=lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    if D.is_similarity_metric(metric):
        pair = ip
        better = lambda a, b: a > b   # noqa: E731
    else:
        nrm = jnp.einsum("wcd,wcd->wc", cvecs, cvecs,
                         precision=lax.Precision.DEFAULT)
        pair = jnp.maximum(nrm[:, :, None] + nrm[:, None, :] - 2.0 * ip, 0.0)
        better = lambda a, b: a < b   # noqa: E731

    def scan_body(carry, i):
        kept, nkept = carry   # kept: (W, C) bool mask over candidate rank
        # dist from candidate i to all kept candidates
        di = pair[:, i, :]                               # (W, C)
        conflict = jnp.any(kept & better(di, cand_dis[:, i][:, None]),
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
    if take < m:
        out = jnp.pad(out, ((0, 0), (0, m - take)), constant_values=-1)
    return out


# ---------------------------------------------------------------------------
# wave insertion
# ---------------------------------------------------------------------------

def _apply_reverse_links(vectors, neighbors_l, fwd_ids, wave_ids,
                         metric: int = D.METRIC_L2):
    """Add reverse edges target <- wave point, pruning each touched target's
    list back to degree by distance rank (cheap variant of faiss
    add_link's shrink; forward links use the full heuristic).

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
    keep = jnp.argsort(dis, axis=1)[:, :deg]
    new_list = jnp.take_along_axis(
        jnp.where(jnp.isfinite(dis), cand, -1), keep, axis=1)
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
        ef=efc, k=efc, expand=2, metric=metric,
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
                                           cur, cur_d)
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
