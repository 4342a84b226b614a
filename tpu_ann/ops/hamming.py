"""Hamming-space kernels — faiss `utils/hamming.{h,cpp}` +
`utils/hamming_distance/`.

Binary vectors are uint8 code rows (d bits = d/8 bytes, faiss IndexBinary
`d8` convention). Distance = popcount(xor): on TPU that is
`lax.population_count` on the VPU, blocked over the database exactly like
the float GEMM path (no per-ISA HammingComputer templates needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def hamming_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(nq, nbytes) x (nb, nbytes) -> (nq, nb) int32 Hamming distances."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(lax.population_count(x).astype(jnp.int32), axis=-1)


def _pm1(codes: jnp.ndarray) -> jnp.ndarray:
    """(n, nbytes) uint8 -> (n, nbytes*8) bf16 in {-1, +1}."""
    n, nbytes = codes.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (codes[:, :, None] >> shifts[None, None, :]) & 1
    return (bits.reshape(n, nbytes * 8).astype(jnp.bfloat16) * 2 - 1)


@functools.partial(jax.jit, static_argnames=("k", "db_block", "via"))
def knn_hamming(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    k: int,
    *,
    valid_n=None,
    db_block: int = 8192,
    via: str = "auto",
):
    """Exact Hamming k-NN (faiss hammings_knn): blocked scan with a
    running top-k merge. Returns (D int32 ascending, I int32).

    Two equivalent distance routes:
    - 'xor': popcount(xor) on the VPU (byte-local, no expansion)
    - 'gemm': unpack codes to ±1 bf16 and ride the MXU —
      ham = (d - x·y)/2 since matching bits contribute +1 and differing
      bits -1. Products are ±1 (exact in bf16) and the MXU accumulates
      f32, so the result is exactly integral for any d. ~MXU/VPU
      throughput ratio faster for batched queries at the cost of an 8x
      in-kernel expansion of the db block.
    'auto' picks gemm for batched queries (nq >= 8), xor otherwise.
    """
    nq, nbytes = xq.shape
    nb = xb.shape[0]
    if valid_n is None:
        valid_n = jnp.int32(nb)
    BIG = jnp.int32(32767)
    use_gemm = via == "gemm" or (via == "auto" and nq >= 8)
    d_bits = nbytes * 8

    block = min(db_block, max(nb, 1))
    nblocks = -(-nb // block)
    pad = nblocks * block - nb
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
    xb_r = xb.reshape(nblocks, block, nbytes)
    xq_pm = _pm1(xq) if use_gemm else None

    def body(i, carry):
        bd, bi = carry
        if use_gemm:
            ip = jnp.dot(xq_pm, _pm1(xb_r[i]).T,
                         preferred_element_type=jnp.float32)
            dis = ((d_bits - ip) * 0.5).astype(jnp.int32)
        else:
            dis = hamming_distances(xq, xb_r[i])
        ids = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
        dis = jnp.where(ids < valid_n, dis, BIG)
        ids = jnp.broadcast_to(ids, dis.shape)
        cd = jnp.concatenate([bd, dis], axis=1)
        ci = jnp.concatenate([bi, ids], axis=1)
        nv, pos = lax.top_k(-cd, k)
        return -nv, jnp.take_along_axis(ci, pos, axis=1)

    init = (jnp.full((nq, k), BIG, jnp.int32),
            jnp.full((nq, k), -1, jnp.int32))
    bd, bi = lax.fori_loop(0, nblocks, body, init)
    return bd, jnp.where(bd < BIG, bi, -1)


def pack_bits(x01: jnp.ndarray) -> jnp.ndarray:
    """(n, d) 0/1 -> (n, d/8) uint8, LSB-first per byte (faiss
    binary_to_real convention)."""
    n, d = x01.shape
    assert d % 8 == 0
    bits = x01.reshape(n, d // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(bits * weights[None, None, :], axis=-1).astype(jnp.uint8)


def unpack_bits(codes: jnp.ndarray) -> jnp.ndarray:
    """(n, nbytes) uint8 -> (n, nbytes*8) float32 0/1."""
    n, nbytes = codes.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (codes[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(n, nbytes * 8).astype(jnp.float32)
