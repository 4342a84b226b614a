"""k-selection primitives — TPU replacement for faiss heaps / partitioning.

The reference maintains per-query binary heaps (`utils/Heap.h:47-191`) and a
SIMD fuzzy quickselect (`utils/partitioning.h:23`) and, on GPU, warp bitonic
k-select (`gpu/utils/Select.cuh`). On TPU the equivalent is `lax.top_k` over
blocked score matrices plus a sorted-merge for combining partial results
(the role of `HeapArray::addn` and the python `ResultHeap`,
python/extra_wrappers.py:219).

All functions follow the convention: "scores" are better-is-bigger if
``similarity=True`` (inner product), better-is-smaller otherwise (L2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def topk(scores: jnp.ndarray, k: int, *, similarity: bool = False):
    """Best-k along the last axis, best-first. Returns (vals, idx)."""
    if similarity:
        return lax.top_k(scores, k)
    v, i = lax.top_k(-scores, k)
    return -v, i


def topk_with_ids(
    scores: jnp.ndarray,
    ids: jnp.ndarray,
    k: int,
    *,
    similarity: bool = False,
):
    """Best-k along the last axis, carrying an id array along."""
    v, pos = topk(scores, k, similarity=similarity)
    return v, jnp.take_along_axis(ids, pos, axis=-1)


def merge_topk(
    d1: jnp.ndarray,
    i1: jnp.ndarray,
    d2: jnp.ndarray,
    i2: jnp.ndarray,
    k: int,
    *,
    similarity: bool = False,
):
    """Merge two partial top-k result sets into one (nq, k) set.

    The analog of `ResultHeap.add_result` merging in the reference's
    distributed client (`contrib/client_server.py:85-91`) and of
    `IndexShards`' heap merge (`impl/ThreadedIndex-inl.h`).
    """
    cd = jnp.concatenate([d1, d2], axis=-1)
    ci = jnp.concatenate([i1, i2], axis=-1)
    return topk_with_ids(cd, ci, k, similarity=similarity)


@functools.partial(jax.jit, static_argnames=("k", "similarity"))
def merge_topk_axis(
    dis: jnp.ndarray,
    ids: jnp.ndarray,
    k: int,
    *,
    similarity: bool = False,
):
    """Merge partial top-k sets laid out along a leading axis.

    dis/ids: (shards, nq, kk) -> (nq, k). Used for cross-device result
    merging after an all_gather (= the RPC client's ResultHeap merge).
    """
    s, nq, kk = dis.shape
    cd = jnp.moveaxis(dis, 0, 1).reshape(nq, s * kk)
    ci = jnp.moveaxis(ids, 0, 1).reshape(nq, s * kk)
    return topk_with_ids(cd, ci, k, similarity=similarity)
