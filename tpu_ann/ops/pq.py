"""Product quantization — TPU counterpart of faiss `impl/ProductQuantizer.
{h,cpp}` and the ADC scan kernels (`impl/pq4_fast_scan*`, code_distance/).

The reference trains M per-subspace codebooks with k-means, encodes each
vector as M sub-indices, and searches with ADC: a per-query (M, ksub)
distance look-up table, summed over sub-codes per database point — on CPU
via in-register shuffle LUTs (pq4), on GPU via PQScanMultiPass kernels.

Here training is `ops.kmeans` vmapped over subspaces on the MXU, encoding
is a batched sub-assignment, and the ADC scan is a gather over a per-query
flattened LUT — the shape XLA fuses well; the Pallas fused variant slots
in behind the same API.

IVFPQ residual path (IndexIVFPQ.cpp `precompute_table`): with
d(q, c_l + y) = ||q - c_l||^2 + (||y||^2 + 2<c_l, y>) - 2<q, y>,
term 2 is a (nlist, M, ksub) table independent of the query, term 3 a
(M, ksub) per-query table, term 1 the coarse distance the IVF search
already has. `precomputed_tables` + `query_tables_ip` implement that
decomposition.
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
class PQCodec:
    """Trained product quantizer: centroids (M, ksub, dsub) float32."""

    centroids: np.ndarray
    d: int
    M: int
    nbits: int

    @property
    def ksub(self) -> int:
        return 1 << self.nbits

    @property
    def dsub(self) -> int:
        return self.d // self.M

    @property
    def code_size(self) -> int:
        """Stored bytes per vector: nbits=4 packs two sub-indices per byte
        (the pq4 fast-scan layout, impl/pq4_fast_scan.h), nbits<=8 one."""
        if self.nbits == 4:
            return (self.M + 1) // 2
        return self.M


@functools.partial(jax.jit, static_argnames=("niter",))
def _pq_lloyd_vmapped(xs: jnp.ndarray, cents0: jnp.ndarray, niter: int):
    """All M subspaces' Lloyd iterations as ONE fused device loop.

    The per-subspace-sequential path costs M*niter dispatches (an 8-bit
    M=32 train is 800 host syncs — ~20 min through this environment's
    remote tunnel); this is one compile + one sync. Assignment is a
    batched (M, n, ksub) contraction; centroid updates are one-hot-GEMM
    segment sums (TPU scatters serialize, ops/kmeans.py lesson); empty
    cells re-seed from a perturbed copy of the largest cell's centroid
    (the split policy of Clustering::train_encoded, vectorized)."""
    M, n, dsub = xs.shape
    ksub = cents0.shape[1]
    kiota = lax.broadcasted_iota(jnp.int32, (1, 1, ksub), 2)

    def body(_, cents):
        ip = jnp.einsum("mnd,mkd->mnk", xs, cents,
                        precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        cn = jnp.sum(cents * cents, axis=2)
        a = jnp.argmin(cn[:, None, :] - 2.0 * ip, axis=2)   # (M, n)
        oh = (a[:, :, None] == kiota).astype(jnp.bfloat16)  # (M, n, ksub)
        sums = jnp.einsum("mnk,mnd->mkd", oh, xs.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(oh.astype(jnp.float32), axis=1)    # (M, ksub)
        newc = sums / jnp.maximum(counts[:, :, None], 1.0)
        big = jnp.argmax(counts, axis=1)
        bigc = jnp.take_along_axis(newc, big[:, None, None], axis=1)
        eps = 1e-3 * (1.0 + lax.broadcasted_iota(
            jnp.float32, (1, ksub, 1), 1) / ksub)
        repl = bigc * eps + bigc
        return jnp.where(counts[:, :, None] == 0, repl, newc)

    return lax.fori_loop(0, niter, body, cents0)


def train_pq(
    x: np.ndarray,
    M: int,
    nbits: int = 8,
    *,
    niter: int = 25,
    seed: int = 1234,
    verbose: bool = False,
) -> PQCodec:
    """Train per-subspace codebooks (ProductQuantizer::train: independent
    k-means per subspace, impl/ProductQuantizer.cpp) — all subspaces
    vmapped into one fused device loop (see _pq_lloyd_vmapped)."""
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    if d % M:
        raise ValueError(f"d={d} not divisible by M={M}")
    dsub = d // M
    ksub = 1 << nbits
    if n < ksub:
        raise ValueError(f"need >= {ksub} training points, got {n}")
    rs = np.random.RandomState(seed)
    cap = 256 * ksub                      # max_train_points_per_PQ policy
    if n > cap:
        sel = rs.choice(n, cap, replace=False)
        x = x[sel]
        n = cap
    xs = np.transpose(x.reshape(n, M, dsub), (1, 0, 2))     # (M, n, dsub)
    init = rs.choice(n, ksub, replace=False)
    cents0 = jnp.asarray(xs[:, init, :])
    cents = _pq_lloyd_vmapped(jnp.asarray(xs), cents0, niter)
    if verbose:
        print(f"pq train: {M} subspaces x {niter} iters (fused)")
    return PQCodec(centroids=np.asarray(cents), d=d, M=M, nbits=nbits)


@functools.partial(jax.jit, static_argnames=())
def _block_diag_codebook(centroids: jnp.ndarray) -> jnp.ndarray:
    """(M, ksub, dsub) -> block-diagonal (d, M*ksub) so per-subspace
    inner products are ONE dense GEMM. A (n, M, dsub) intermediate pads
    its tiny trailing dim to 128 lanes on TPU — 42x memory inflation at
    dsub=3 (a 1.5M-point OPQ train OOM'd a 16 GiB chip on exactly
    that)."""
    import jax.scipy.linalg as jsl

    M = centroids.shape[0]
    return jsl.block_diag(*[centroids[m].T for m in range(M)])


def pq_encode(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(n, d) -> (n, M) uint8 sub-indices (compute_codes)."""
    n, d = x.shape
    M, ksub, dsub = centroids.shape
    W = _block_diag_codebook(centroids)                  # (d, M*ksub)
    ip = jnp.dot(x.astype(jnp.float32), W,
                 precision=lax.Precision.HIGHEST)        # (n, M*ksub)
    cn = jnp.sum(centroids * centroids, axis=2)          # (M, ksub)
    dis = cn.reshape(1, M * ksub) - 2.0 * ip             # + ||x||^2 const
    return jnp.argmin(dis.reshape(n, M, ksub), axis=2).astype(jnp.uint8)


def pq_encode_chunked(x, centroids, chunk: int = 0) -> np.ndarray:
    """Host driver bounding pq_encode's (chunk, M*ksub) ip matrix
    (33 GB at 1M rows x 32x8-bit). chunk=0 sizes it to a ~2 GB buffer."""
    import numpy as _np

    M, ksub, _ = centroids.shape
    if not chunk:
        chunk = max(65536, min(1_000_000, (2 << 30) // (M * ksub * 4)))
    x = _np.asarray(x)
    if len(x) <= chunk:
        return _np.asarray(pq_encode(jnp.asarray(x), centroids))
    outs = []
    for i in range(0, len(x), chunk):
        outs.append(_np.asarray(
            pq_encode(jnp.asarray(x[i:i + chunk]), centroids)))
    return _np.concatenate(outs)


def pq_decode(codes: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(n, M) uint8 -> (n, d) reconstruction (decode). One-hot GEMM for
    the same tiny-trailing-dim reason as pq_encode."""
    M, ksub, dsub = centroids.shape
    n = codes.shape[0]
    kiota = jnp.arange(ksub, dtype=jnp.int32)
    oh = (codes.astype(jnp.int32)[..., None] == kiota).astype(
        jnp.float32).reshape(n, M * ksub)
    W = _block_diag_codebook(centroids)                  # (d, M*ksub)
    return jnp.dot(oh, W.T, precision=lax.Precision.HIGHEST)


def pq_decode_chunked(codes, centroids, chunk: int = 0,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Host driver bounding pq_decode's (chunk, M*ksub) one-hot (16 GB
    at 1M rows x 16x8-bit — measured RESOURCE_EXHAUSTED on-chip).
    chunk=0 sizes the one-hot to a ~2 GB buffer."""
    M, ksub, _ = centroids.shape
    if not chunk:
        chunk = max(65536, min(1_000_000, (2 << 30) // (M * ksub * 4)))
    n = codes.shape[0]
    if n <= chunk:
        return pq_decode(jnp.asarray(codes), centroids).astype(dtype)
    outs = []
    for i in range(0, n, chunk):
        outs.append(pq_decode(jnp.asarray(codes[i:i + chunk]),
                              centroids).astype(dtype))
    return jnp.concatenate(outs)


@functools.partial(jax.jit, static_argnames=("metric",))
def query_tables(xq: jnp.ndarray, centroids: jnp.ndarray,
                 metric: int = D.METRIC_L2) -> jnp.ndarray:
    """Per-query ADC tables (compute_distance_table): (nq, M, ksub) —
    L2: ||q_m - y_mj||^2; IP: <q_m, y_mj>."""
    nq, d = xq.shape
    M, ksub, dsub = centroids.shape
    xs = xq.astype(jnp.float32).reshape(nq, M, dsub)
    ip = jnp.einsum("nmd,mkd->nmk", xs, centroids,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    if D.is_similarity_metric(metric):
        return ip
    qn = jnp.sum(xs * xs, axis=2)                        # (nq, M)
    cn = jnp.sum(centroids * centroids, axis=2)          # (M, ksub)
    return qn[:, :, None] + cn[None, :, :] - 2.0 * ip


@jax.jit
def query_tables_ip(xq: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """-2<q_m, y_mj> term for the residual decomposition: (nq, M, ksub)."""
    nq, d = xq.shape
    M, ksub, dsub = centroids.shape
    xs = xq.astype(jnp.float32).reshape(nq, M, dsub)
    ip = jnp.einsum("nmd,mkd->nmk", xs, centroids,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return -2.0 * ip


@jax.jit
def precomputed_tables(coarse_centroids: jnp.ndarray,
                       centroids: jnp.ndarray) -> jnp.ndarray:
    """(nlist, M, ksub): ||y_mj||^2 + 2<c_l_m, y_mj>
    (IndexIVFPQ::precompute_table term 2)."""
    nlist, d = coarse_centroids.shape
    M, ksub, dsub = centroids.shape
    cl = coarse_centroids.reshape(nlist, M, dsub)
    ip = jnp.einsum("lmd,mkd->lmk", cl, centroids,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    cn = jnp.sum(centroids * centroids, axis=2)
    return cn[None, :, :] + 2.0 * ip


def pack_codes_4bit(codes: jnp.ndarray) -> jnp.ndarray:
    """(n, M) sub-indices < 16 -> (n, M/2) uint8, low nibble first."""
    n, M = codes.shape
    assert M % 2 == 0
    c = codes.astype(jnp.uint8).reshape(n, M // 2, 2)
    return (c[:, :, 0] | (c[:, :, 1] << 4)).astype(jnp.uint8)


def unpack_codes_4bit(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., M/2) uint8 -> (..., M) sub-indices."""
    lo = packed & 0x0F
    hi = packed >> 4
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))


@jax.jit
def sdc_tables(centroids: jnp.ndarray) -> jnp.ndarray:
    """(M, ksub, ksub) symmetric distance tables ||c_mi - c_mj||^2
    (ProductQuantizer::compute_sdc_table). Used by SDC search (codes vs
    codes, no decode) and code_distance utilities."""
    ip = jnp.einsum("mkd,mld->mkl", centroids, centroids,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    cn = jnp.sum(centroids * centroids, axis=2)
    return jnp.maximum(cn[:, :, None] + cn[:, None, :] - 2.0 * ip, 0.0)


def sdc_query_tables(qcodes: jnp.ndarray, sdc: jnp.ndarray) -> jnp.ndarray:
    """Per-query SDC LUT: (nq, M, ksub) = sdc[m, qcode_m, :]. Feeding this
    into `adc_scan` gives symmetric code-to-code search (IndexPQ ST_SDC) —
    the encoded query replaces the float query in the LUT."""
    M = sdc.shape[0]
    return sdc[jnp.arange(M)[None, :], qcodes.astype(jnp.int32)]


def adc_scan(lut: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Sum LUT entries over sub-codes: lut (nq, M, ksub) x codes (nq, C, M)
    -> (nq, C) distances. The TPU analog of the pq4 shuffle-LUT inner loop.
    """
    nq, M, ksub = lut.shape
    C = codes.shape[1]
    flat = lut.reshape(nq, M * ksub)
    idx = (codes.astype(jnp.int32)
           + (jnp.arange(M, dtype=jnp.int32) * ksub)[None, None, :])
    gathered = jnp.take_along_axis(flat, idx.reshape(nq, C * M), axis=1)
    return gathered.reshape(nq, C, M).sum(axis=2)


def adc_scan_db(lut: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """ADC over a SHARED code block: lut (nq, M, ksub) x codes (C, M)
    -> (nq, C). Same contraction as `adc_scan` but for database codes that
    are identical across queries (IndexPQ.cpp scan over the flat code
    array), restructured for the MXU: per sub-quantizer, the gather
    lut[:, m, codes[:, m]] is a one-hot GEMM (nq,ksub)@(ksub,C), so the
    large C dim stays in the lane dimension — the per-query `adc_scan`
    route would materialize an (nq, C, M) intermediate whose M-wide minor
    dim tile-pads 8x on TPU (84 GB at nq=5k, C=32k)."""
    nq, M, ksub = lut.shape
    C = codes.shape[0]
    iota = jnp.arange(ksub, dtype=jnp.int32)[:, None]            # (ksub, 1)
    codes_t = codes.T.astype(jnp.int32)                          # (M, C)

    def body(m, acc):
        lut_m = lax.dynamic_index_in_dim(lut, m, 1, keepdims=False)
        cm = lax.dynamic_index_in_dim(codes_t, m, 0, keepdims=False)
        onehot = (cm[None, :] == iota).astype(lut.dtype)         # (ksub, C)
        return acc + lax.dot(lut_m, onehot,
                             precision=lax.Precision.DEFAULT)

    return lax.fori_loop(0, M, body, jnp.zeros((nq, C), lut.dtype))
