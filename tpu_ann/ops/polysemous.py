"""Polysemous PQ training + Hamming-filtered search — TPU counterpart of
faiss `impl/PolysemousTraining.{h,cpp}` and IndexPQ's
`search_core_polysemous` (IndexPQ.cpp).

Polysemous codes: a permutation of each sub-quantizer's centroid ids is
optimized so that the HAMMING distance between two codes correlates with
the true distance between their reconstructions. Search then uses the
bit-level Hamming distance between the query's own code and the database
codes as a cheap filter before the precise ADC evaluation.

Training (ReproduceDistancesObjective + SimulatedAnnealingOptimizer,
PolysemousTraining.cpp): per sub-quantizer, simulated annealing over
permutations minimizing sum_ij (w_ij * (d(c_i, c_j) - ham(i, j))^2) with
random transpositions and Metropolis acceptance. Runs host-side in numpy
(256x256 tables; the reference is likewise host-only training).

Search (TPU redesign of the per-vector early-abort loop): the reference
walks codes one by one skipping ADC when ham > ht. Branches are worthless
on the VPU, so phase 1 computes ALL Hamming distances as one XOR+popcount
sweep, phase 2 evaluates ADC only where ham <= ht and the result keeps the
reference's semantics (candidates over the threshold are excluded). The
measured win is the ndis-style reduction in LUT gathers when combined with
candidate compaction at low ht (IndexPQ stats ham/ADC split).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import pq as PQ


def _hamming_table(nbits: int) -> np.ndarray:
    """(ksub, ksub) bit-Hamming distances between sub-code ids."""
    ksub = 1 << nbits
    ids = np.arange(ksub)
    x = ids[:, None] ^ ids[None, :]
    return np.vectorize(lambda v: bin(v).count("1"))(x).astype(np.float64)


def optimize_pq_for_hamming(
    centroids: np.ndarray,
    *,
    n_iter: int = 20000,
    t0: float = 0.7,
    t_decay: float = 0.9995,
    seed: int = 123,
    dis_weight_factor: float = 0.6931471805599453,  # ln(2), reference dflt
) -> np.ndarray:
    """Per-subspace simulated annealing over centroid permutations
    (PolysemousTraining::optimize_pq_for_hamming). Returns reordered
    centroids (M, ksub, dsub); codes produced with them are polysemous."""
    M, ksub, dsub = centroids.shape
    nbits = int(np.log2(ksub))
    ham = _hamming_table(nbits)
    out = centroids.copy()
    rs = np.random.RandomState(seed)
    for m in range(M):
        c = centroids[m].astype(np.float64)
        d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        # normalize real distances to the Hamming scale (objective weights
        # near neighbors more, ReproduceDistancesObjective::dis_weight)
        d2 = d2 / max(d2.mean(), 1e-12) * ham.mean()
        w = np.exp(-dis_weight_factor * ham)
        perm = np.arange(ksub)
        # cost(perm) = sum_ij w_ij (d2[perm_i, perm_j] - ham_ij)^2
        dp = d2[np.ix_(perm, perm)]
        cost = (w * (dp - ham) ** 2).sum()
        T = t0 * cost / (ksub * ksub)
        for it in range(n_iter):
            i, j = rs.randint(ksub), rs.randint(ksub)
            if i == j:
                continue
            np2 = perm.copy()
            np2[i], np2[j] = perm[j], perm[i]
            # delta: only rows/cols i and j change
            rows = np.array([i, j])
            old = (w[rows] * (d2[np.ix_(perm[rows], perm)] - ham[rows]) ** 2
                   ).sum() + (w[:, rows] * (
                       d2[np.ix_(perm, perm[rows])] - ham[:, rows]) ** 2
                   ).sum()
            new = (w[rows] * (d2[np.ix_(np2[rows], np2)] - ham[rows]) ** 2
                   ).sum() + (w[:, rows] * (
                       d2[np.ix_(np2, np2[rows])] - ham[:, rows]) ** 2
                   ).sum()
            delta = new - old
            if delta < 0 or rs.rand() < np.exp(-delta / max(T, 1e-12)):
                perm = np2
                cost += delta
            T *= t_decay
        # centroid with code perm.index(k) ... we need inverse: code k
        # should denote centroid originally at position with perm[k]
        out[m] = centroids[m][perm]
    return out


@functools.partial(jax.jit, static_argnames=("nbits",))
def code_hamming(qcodes: jnp.ndarray, dbcodes: jnp.ndarray,
                 nbits: int = 8) -> jnp.ndarray:
    """(nq, M) x (C, M) -> (nq, C) bit-Hamming between code words
    (the HammingComputer sweep of search_core_polysemous, vectorized)."""
    x = qcodes[:, None, :] ^ dbcodes[None, :, :]
    return jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "db_block"))
def polysemous_knn(
    xq: jnp.ndarray,
    codes: jnp.ndarray,
    centroids: jnp.ndarray,
    k: int,
    ht,  # dynamic: only feeds `ham <= ht`, so an ht sweep reuses one compile
    valid_n,
    db_block: int = 32768,
):
    """Two-phase polysemous search: Hamming filter (XOR+popcount) then ADC
    restricted to candidates with ham <= ht. Exact among the survivors;
    returns (D, I, n_pass) with n_pass = candidates that passed the filter
    (IndexPQStats n_hamming_pass analog)."""
    from . import topk as T

    from . import hamming as H

    nq, d = xq.shape
    nb = codes.shape[0]
    lut = PQ.query_tables(xq, centroids)
    qcodes = PQ.pq_encode(xq, centroids)

    # Hamming as a +-1 bit GEMM: ham(a,b) = (nbit_total - a_pm . b_pm)/2.
    # Pad bits beyond `nbits` are 0 on BOTH sides, so they contribute
    # exactly nbit_pad to the dot and cancel — the result stays exact.
    # The XOR+popcount route (code_hamming) materializes an (nq, block, M)
    # intermediate whose minor M dim tile-pads 8x on TPU (84 GB at nq=5k,
    # block=32k); the GEMM keeps block in the lane dim and rides the MXU.
    nbit_total = codes.shape[1] * 8
    qbits = (1.0 - 2.0 * H.unpack_bits(qcodes)).astype(jnp.bfloat16)
    dbits = (1.0 - 2.0 * H.unpack_bits(codes)).astype(jnp.bfloat16)

    block = min(db_block, max(nb, 1))
    nblocks = -(-nb // block)
    pad = nblocks * block - nb
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        dbits = jnp.pad(dbits, ((0, pad), (0, 0)))
    codes_r = codes.reshape(nblocks, block, -1)
    dbits_r = dbits.reshape(nblocks, block, -1)

    def body(i, carry):
        bd, bi, npass = carry
        blk = codes_r[i]
        dot = lax.dot_general(
            qbits, dbits_r[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (nq, block)
        ham = ((nbit_total - dot) * 0.5).astype(jnp.int32)
        ids = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
        ok = (ham <= ht) & (ids < valid_n)
        # exact per-block int32 count (nq*block < 2^31 always holds for
        # practical shapes); blocks are reduced in int64 on the HOST below
        # — a single f32/int32 device accumulator would lose exactness or
        # overflow at nq*ntotal > 2^24 / 2^31
        npass = npass.at[i].set(
            jnp.sum(ok.astype(jnp.int32), dtype=jnp.int32))
        dis = PQ.adc_scan_db(lut, blk)
        dis = jnp.where(ok, dis, jnp.inf)
        idb = jnp.broadcast_to(ids, dis.shape)
        bd, bi = T.merge_topk(bd, bi, dis, idb, k, similarity=False)
        return bd, bi, npass

    init = (jnp.full((nq, k), jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32),
            jnp.zeros((nblocks,), jnp.int32))
    bd, bi, npass = lax.fori_loop(0, nblocks, body, init)
    # npass is the exact per-block (nblocks,) int32 count vector; callers
    # reduce it host-side in int64 (see models/pq.py) for an exact total
    return bd, jnp.where(jnp.isfinite(bd), bi, -1), npass
