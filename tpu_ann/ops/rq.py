"""Residual (additive) quantization — TPU counterpart of faiss
`impl/AdditiveQuantizer.{h,cpp}` + `impl/ResidualQuantizer.{h,cpp}` +
`impl/residual_quantizer_encode_steps.cpp`.

A vector is coded as a SUM of M codebook entries (one per stage), unlike
PQ's concatenation. Training is stage-wise k-means on the running
residuals; encoding is the reference's beam search
(`beam_size` candidates carried across stages, encode_steps) — here one
batched (n, beam, ksub) distance contraction per stage instead of
per-vector heaps.

Search uses the reference's ST_norm_float strategy: the inner product
against the query decomposes over stages into LUT sums, and stored
per-vector norms complete the L2 distance (AdditiveQuantizer.h
search_type).
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
from .kmeans import ClusteringParameters, kmeans


@dataclasses.dataclass
class RQCodec:
    """Trained residual quantizer: codebooks (M, ksub, d) float32
    (full-dimensional, unlike PQ's subspaces)."""

    codebooks: np.ndarray
    d: int
    M: int
    nbits: int

    @property
    def ksub(self) -> int:
        return 1 << self.nbits

    @property
    def code_size(self) -> int:
        return self.M + 4  # M uint8 stage codes + f32 norm (ST_norm_float)


def train_rq(
    x: np.ndarray,
    M: int,
    nbits: int = 8,
    *,
    niter: int = 15,
    seed: int = 1234,
    verbose: bool = False,
) -> RQCodec:
    """Stage-wise residual k-means (ResidualQuantizer::train)."""
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    ksub = 1 << nbits
    if n < ksub:
        raise ValueError(f"need >= {ksub} training points, got {n}")
    cp = ClusteringParameters(niter=niter, seed=seed,
                              max_points_per_centroid=256)
    books = np.zeros((M, ksub, d), np.float32)
    resid = x.copy()
    for m in range(M):
        books[m], _ = kmeans(resid, ksub, cp)
        _, a = D.knn(jnp.asarray(resid), jnp.asarray(books[m]), 1)
        resid = resid - books[m][np.asarray(a)[:, 0]]
        if verbose:
            print(f"rq train stage {m + 1}/{M}: "
                  f"residual var {resid.var():.4g}")
    return RQCodec(codebooks=books, d=d, M=M, nbits=nbits)


@functools.partial(jax.jit, static_argnames=("beam",))
def rq_encode(x: jnp.ndarray, codebooks: jnp.ndarray,
              beam: int = 5) -> jnp.ndarray:
    """Beam-search encode (ResidualQuantizer beam_search_encode_step):
    carry `beam` candidate partial codes; per stage score every
    (candidate, codeword) extension by residual energy. Returns (n, M)
    uint8."""
    n, d = x.shape
    M, ksub, _ = codebooks.shape
    x = x.astype(jnp.float32)

    # state: residuals (n, beam, d), codes (n, beam, M), errs (n, beam)
    resid = jnp.broadcast_to(x[:, None, :], (n, 1, d))
    codes = jnp.zeros((n, 1, M), jnp.uint8)
    for m in range(M):
        cb = codebooks[m]                                # (ksub, d)
        ip = jnp.einsum("nbd,kd->nbk", resid, cb,
                        precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        cn = jnp.sum(cb * cb, axis=1)
        # new residual energy = ||r||^2 - 2<r,c> + ||c||^2; ||r||^2 is a
        # per-(n,b) constant that matters across beams:
        rn = jnp.sum(resid * resid, axis=2)              # (n, b)
        err = rn[:, :, None] - 2.0 * ip + cn[None, None, :]
        b = err.shape[1]
        flat = err.reshape(n, b * ksub)
        keep = min(beam, b * ksub)
        nv, pos = lax.top_k(-flat, keep)
        src_b = pos // ksub                              # (n, keep)
        src_k = (pos % ksub).astype(jnp.uint8)
        rows = jnp.arange(n)[:, None]
        resid = resid[rows, src_b] - cb[src_k.astype(jnp.int32)]
        codes = codes[rows, src_b]
        codes = codes.at[:, :, m].set(src_k)
    return codes[:, 0, :]                                # best beam


def rq_encode_topk(x: jnp.ndarray, codebooks: jnp.ndarray, k: int,
                   beam: int) -> tuple:
    """Beam-search to the k nearest *implicit centroids* (the
    ResidualCoarseQuantizer search primitive,
    IndexAdditiveQuantizer.h:195-239): same stage loop as rq_encode but
    returns the k best final candidates as
    (errs (n, k) residual energies == exact L2² to the centroid,
    codes (n, k, M) uint8). beam >= k."""
    n, d = x.shape
    M, ksub, _ = codebooks.shape
    x = x.astype(jnp.float32)
    beam = max(int(beam), int(k))

    resid = jnp.broadcast_to(x[:, None, :], (n, 1, d))
    codes = jnp.zeros((n, 1, M), jnp.uint8)
    errs = None
    for m in range(M):
        cb = codebooks[m]
        ip = jnp.einsum("nbd,kd->nbk", resid, cb,
                        precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        cn = jnp.sum(cb * cb, axis=1)
        rn = jnp.sum(resid * resid, axis=2)
        err = rn[:, :, None] - 2.0 * ip + cn[None, None, :]
        b = err.shape[1]
        flat = err.reshape(n, b * ksub)
        keep = min(beam, b * ksub)
        nv, pos = lax.top_k(-flat, keep)
        src_b = pos // ksub
        src_k = (pos % ksub).astype(jnp.uint8)
        rows = jnp.arange(n)[:, None]
        resid = resid[rows, src_b] - cb[src_k.astype(jnp.int32)]
        codes = codes[rows, src_b]
        codes = codes.at[:, :, m].set(src_k)
        errs = -nv
    kk = min(k, codes.shape[1])
    return errs[:, :kk], codes[:, :kk, :]


@jax.jit
def rq_decode(codes: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """(n, M) -> (n, d): sum of per-stage codewords."""
    M, ksub, d = codebooks.shape
    out = jnp.zeros((codes.shape[0], d), jnp.float32)
    for m in range(M):
        out = out + codebooks[m][codes[:, m].astype(jnp.int32)]
    return out


def rq_query_tables(xq: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """(nq, M, ksub) inner products <q, c_mk> — the additive ADC table."""
    return jnp.einsum("qd,mkd->qmk", xq.astype(jnp.float32), codebooks,
                      precision=lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)


def rq_adc_scan(lut: jnp.ndarray, codes: jnp.ndarray,
                norms: jnp.ndarray, qn: jnp.ndarray) -> jnp.ndarray:
    """L2 distances via the ST_norm_float decomposition:
    ||q - y||^2 = ||q||^2 + ||y||^2 - 2 sum_m <q, c_{m,code_m}>.
    lut (nq, M, ksub), codes (C, M), norms (C,), qn (nq,) -> (nq, C)."""
    nq, M, ksub = lut.shape
    C = codes.shape[0]
    flat = lut.reshape(nq, M * ksub)
    idx = (codes.astype(jnp.int32)
           + (jnp.arange(M, dtype=jnp.int32) * ksub)[None, :])  # (C, M)
    g = jnp.take_along_axis(
        flat, jnp.broadcast_to(idx.reshape(1, C * M), (nq, C * M)), axis=1)
    ip = g.reshape(nq, C, M).sum(axis=2)
    return qn[:, None] + norms[None, :] - 2.0 * ip
