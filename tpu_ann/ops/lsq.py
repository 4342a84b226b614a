"""Local-search (additive) quantization — TPU counterpart of faiss
`impl/LocalSearchQuantizer.{h,cpp}` (846 LoC: ICM encode with simulated
annealing + least-squares codebook refinement).

An LSQ code is, like RQ, a sum of M codebook entries — but instead of
greedy/beam stage-wise encoding it minimizes the quantization error by
iterated conditional modes (ICM): fixing all stages but one, the best code
for that stage is an argmin over precomputed unary/binary terms
(LocalSearchQuantizer.cpp icm_encode_step). The reference runs ICM per
vector under OMP; here one ICM sweep is a single batched gather+argmin
over ALL n vectors at once — the per-stage cost tensor is

    cost[n, k] = unary[n, m, k] + sum_{m' != m} binary[m, m', k, codes[n, m']]

which is M gathers of (ksub, ksub) tables plus one argmin on the VPU.

Perturbation (the reference's simulated-annealing `perturb_codes`,
LocalSearchQuantizer.h:59 nperts) keeps ICM out of local minima: random
stages get random codes, and the perturbed code is kept only where it
improves the true quantization error.

Training (LocalSearchQuantizer::train) alternates ICM encoding with a
ridge-regularized least-squares codebook update over the one-hot
indicator system (update_codebooks, lambd regularization
LocalSearchQuantizer.h:54).

The trained codec is an `rq.RQCodec` — decode / query LUTs / IVF scans
are shared with the RQ family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import distances as D
from .rq import RQCodec, rq_decode, rq_encode, train_rq


def _binary_terms(books: jnp.ndarray) -> jnp.ndarray:
    """(M, M, ksub, ksub) cross terms 2<c_mk, c_m'k'> (compute_binary_terms).
    Diagonal blocks are unused (masked by the ICM sweep)."""
    return 2.0 * jnp.einsum("mkd,nld->mnkl", books, books,
                            preferred_element_type=jnp.float32)


def _unary_terms(x: jnp.ndarray, books: jnp.ndarray) -> jnp.ndarray:
    """(n, M, ksub): ||c_mk||^2 - 2<x, c_mk> (compute_unary_terms)."""
    ip = jnp.einsum("nd,mkd->nmk", x, books,
                    preferred_element_type=jnp.float32)
    cn = jnp.sum(books * books, axis=2)
    return cn[None, :, :] - 2.0 * ip


def _recon_err(x, codes, books):
    recon = rq_decode(codes, books)
    diff = x - recon
    return jnp.sum(diff * diff, axis=1)


@functools.partial(jax.jit, static_argnames=("icm_iters", "nperts"))
def lsq_encode(
    x: jnp.ndarray,
    books: jnp.ndarray,
    key: jnp.ndarray,
    icm_iters: int = 4,
    nperts: int = 4,
) -> jnp.ndarray:
    """Batched ICM encode (icm_encode_impl): all n vectors sweep stages
    together. Returns (n, M) uint8 codes."""
    x = x.astype(jnp.float32)
    n, d = x.shape
    M, ksub, _ = books.shape
    nperts = min(nperts, M)

    unary = _unary_terms(x, books)               # (n, M, ksub)
    binary = _binary_terms(books)                # (M, M, ksub, ksub)

    # init from the stage-wise beam encode (the reference inits randomly
    # and relies on many ICM sweeps; a beam start means ICM can only
    # improve on the RQ encoding — keep-if-better below guarantees it)
    codes = rq_encode(x, books, beam=4).astype(jnp.int32)    # (n, M)
    best_err = _recon_err(x, codes.astype(jnp.uint8), books)
    best_codes = codes

    def icm_sweep(codes):
        def stage(m, codes):
            # cost of putting code k at stage m given other stages' codes
            cost = unary[:, m, :]                            # (n, ksub)
            for mp in range(M):
                if mp == m:
                    continue
                # binary[m, mp] is (ksub, ksub); column = codes[:, mp]
                cost = cost + binary[m, mp][:, codes[:, mp]].T
            return codes.at[:, m].set(jnp.argmin(cost, axis=1))

        for m in range(M):
            codes = stage(m, codes)
        return codes

    for it in range(icm_iters):
        codes = icm_sweep(codes)
        err = _recon_err(x, codes.astype(jnp.uint8), books)
        better = err < best_err
        best_codes = jnp.where(better[:, None], codes, best_codes)
        best_err = jnp.minimum(err, best_err)
        if it + 1 < icm_iters and nperts:
            # perturb_codes: nperts random stages get random codewords;
            # next sweep runs from the perturbed point, keep-if-better
            key, k1, k2 = jax.random.split(key, 3)
            pert_m = jax.random.randint(k1, (n, nperts), 0, M)
            pert_k = jax.random.randint(k2, (n, nperts), 0, ksub)
            rows = jnp.arange(n)[:, None]
            codes = best_codes.at[rows, pert_m].set(pert_k)
    return best_codes.astype(jnp.uint8)


def _update_codebooks(x: np.ndarray, codes: np.ndarray, M: int, ksub: int,
                      lambd: float) -> np.ndarray:
    """Ridge least-squares codebook refit (update_codebooks):
    minimize ||X - B C||^2 + lambd ||C||^2 over the stacked codebooks C,
    where B is the (n, M*ksub) one-hot indicator of the codes."""
    n, d = x.shape
    cols = codes.astype(np.int64) + np.arange(M, dtype=np.int64) * ksub
    # B^T B via co-occurrence counts; B^T X via scatter-add
    btb = np.zeros((M * ksub, M * ksub), np.float64)
    btx = np.zeros((M * ksub, d), np.float64)
    for m in range(M):
        np.add.at(btx, cols[:, m], x)
        for mp in range(M):
            np.add.at(btb, (cols[:, m], cols[:, mp]), 1.0)
    btb[np.arange(M * ksub), np.arange(M * ksub)] += lambd
    sol = np.linalg.solve(btb, btx)
    return sol.reshape(M, ksub, d).astype(np.float32)


def train_lsq(
    x: np.ndarray,
    M: int,
    nbits: int = 8,
    *,
    train_iters: int = 8,
    icm_iters: int = 4,
    nperts: int = 4,
    lambd: float = 1e-2,
    seed: int = 1234,
    verbose: bool = False,
) -> RQCodec:
    """LocalSearchQuantizer::train — RQ warm start, then alternate batched
    ICM encoding with the least-squares codebook update. Reference defaults:
    train_iters=25, icm_iters=4, nperts=4, lambd=1e-2
    (LocalSearchQuantizer.h:48-59); fewer train_iters by default since the
    RQ warm start replaces the reference's random init."""
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    ksub = 1 << nbits
    rq0 = train_rq(x, M, nbits, seed=seed)
    books = jnp.asarray(rq0.codebooks)
    x_dev = jnp.asarray(x)
    key = jax.random.PRNGKey(seed)
    last = None
    for it in range(train_iters):
        key, sub = jax.random.split(key)
        codes = np.asarray(lsq_encode(x_dev, books, sub,
                                      icm_iters=icm_iters, nperts=nperts))
        books_h = _update_codebooks(x, codes, M, ksub, lambd)
        books = jnp.asarray(books_h)
        if verbose:
            err = float(jnp.mean(_recon_err(
                x_dev, jnp.asarray(codes), books)))
            print(f"lsq train iter {it + 1}/{train_iters}: mse {err:.5g}")
            last = err
    return RQCodec(codebooks=np.asarray(books), d=d, M=M, nbits=nbits)


def train_product_aq(
    x: np.ndarray,
    nsplits: int,
    Msub: int,
    nbits: int = 8,
    *,
    kind: str = "rq",
    seed: int = 1234,
    verbose: bool = False,
) -> RQCodec:
    """Product additive quantizer (impl/ProductAdditiveQuantizer.cpp:
    PRQ = product of RQs, PLSQ = product of LSQs over d/nsplits slices).

    Returned as ONE additive codec with M = nsplits*Msub block-diagonal
    full-d codebooks (zero outside each split's dim slice), so decode,
    query LUTs, flat and IVF ADC scans are shared verbatim with RQ/LSQ.
    """
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    if d % nsplits:
        raise ValueError(f"d={d} not divisible by nsplits={nsplits}")
    dsub = d // nsplits
    ksub = 1 << nbits
    books = np.zeros((nsplits * Msub, ksub, d), np.float32)
    for s in range(nsplits):
        xs = np.ascontiguousarray(x[:, s * dsub : (s + 1) * dsub])
        if kind == "rq":
            sub = train_rq(xs, Msub, nbits, seed=seed + s, verbose=verbose)
        elif kind == "lsq":
            sub = train_lsq(xs, Msub, nbits, seed=seed + s,
                            verbose=verbose)
        else:
            raise ValueError(kind)
        books[s * Msub : (s + 1) * Msub, :, s * dsub : (s + 1) * dsub] = \
            sub.codebooks
    return RQCodec(codebooks=books, d=d, M=nsplits * Msub, nbits=nbits)
