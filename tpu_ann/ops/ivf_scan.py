"""IVF inverted-list storage + scan — TPU counterpart of faiss
`invlists/InvertedLists.h` + `IndexIVF::search_preassigned`
(faiss/IndexIVF.cpp:399-723).

The reference stores ragged per-list code/id vectors and scans them with
per-thread `InvertedListScanner`s and heaps. The TPU layout instead packs
every list into fixed-size blocks of ``block_size`` vectors (the same move
as the GPU backend's interleaved-by-32 layout, gpu/impl/IVFInterleaved.cu):

  data  (nblocks+1, B, d)   vectors, block-padded; last block is a shared
  ids   (nblocks+1, B)      empty "dummy" block (ids = -1) that masked-out
  norms (nblocks+1, B)      probes point at, so padding needs no branches.
  list_block_start (nlist,) first block of each list
  list_nblocks     (nlist,) number of blocks of each list

Search gathers the probed blocks per query and evaluates distances with
dense contractions + a running top-k merge — the role of `scan_codes` +
heap push (faiss/IndexIVFFlat.cpp:155-179) without any pointer chasing.
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
from . import topk as T


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedInvLists:
    """Block-padded inverted lists on device (see module docstring)."""

    data: jnp.ndarray              # (nblocks+1, B, d) float32
    ids: jnp.ndarray               # (nblocks+1, B) int32, -1 = padding
    norms: jnp.ndarray             # (nblocks+1, B) float32 (||y||^2)
    list_block_start: jnp.ndarray  # (nlist,) int32
    list_nblocks: jnp.ndarray      # (nlist,) int32

    def tree_flatten(self):
        return (
            (self.data, self.ids, self.norms, self.list_block_start,
             self.list_nblocks),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nlist(self) -> int:
        return self.list_block_start.shape[0]

    @property
    def block_size(self) -> int:
        return self.data.shape[1]

    @property
    def nblocks(self) -> int:
        return self.data.shape[0] - 1  # excluding the dummy block

    @property
    def max_nblocks_per_list(self) -> int:
        # static value: computed from host metadata at pack time
        return int(self._max_nblocks)

    _max_nblocks: int = 1

    def tree_flatten_with_keys(self):  # pragma: no cover - aux for debugging
        return self.tree_flatten()


def pack_invlists(
    x: np.ndarray,
    xids: np.ndarray,
    assign: np.ndarray,
    nlist: int,
    block_size: int = 128,
) -> PackedInvLists:
    """Build the packed layout on host from an assignment (counting sort by
    list — the batch equivalent of `InvertedLists::add_entries`). Uses the
    native multithreaded scatter when available."""
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    xids = np.asarray(xids, np.int32)
    assign = np.asarray(assign, np.int64)
    if n and (assign.min() < 0 or assign.max() >= nlist):
        # see pack_code_invlists: protects the native scatter from an
        # out-of-bounds write (segfault) on a bad assignment
        raise ValueError(
            f"pack_invlists: assignments must be in [0, {nlist}); "
            f"got [{assign.min()}, {assign.max()}]")
    B = block_size

    from ..utils import native as _native

    nat = _native.pack_rows_native(x, xids, assign, nlist, B)
    if nat is not None:
        data, ids, starts_blocks, nblocks_per_list = nat
        norms = _native.norms_l2sqr_native(data)
        pil = PackedInvLists(
            data=jnp.asarray(data),
            ids=jnp.asarray(ids),
            norms=jnp.asarray(norms),
            list_block_start=jnp.asarray(starts_blocks, dtype=jnp.int32),
            list_nblocks=jnp.asarray(nblocks_per_list, dtype=jnp.int32),
        )
        pil._max_nblocks = max(int(nblocks_per_list.max(initial=0)), 1)
        return pil

    order = np.argsort(assign, kind="stable")
    sizes = np.bincount(assign, minlength=nlist)
    nblocks_per_list = -(-sizes // B)  # ceil; empty lists get 0 blocks
    starts_blocks = np.zeros(nlist, np.int64)
    np.cumsum(nblocks_per_list[:-1], out=starts_blocks[1:])
    nb_total = int(nblocks_per_list.sum())

    data = np.zeros((nb_total + 1, B, d), np.float32)
    ids = np.full((nb_total + 1, B), -1, np.int32)

    # vectorized scatter: row r (in list order) lands at slot
    # starts_blocks[list]*B + rank-within-list
    a_sorted = assign[order]
    src_starts = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=src_starts[1:])
    rank = np.arange(n, dtype=np.int64) - src_starts[a_sorted]
    slot = starts_blocks[a_sorted] * B + rank
    data.reshape(-1, d)[slot] = x[order]
    ids.reshape(-1)[slot] = xids[order]

    norms = (data.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    # dummy block: already zero data / -1 ids; empty lists point at it
    empty = nblocks_per_list == 0
    starts_blocks[empty] = nb_total

    pil = PackedInvLists(
        data=jnp.asarray(data),
        ids=jnp.asarray(ids),
        norms=jnp.asarray(norms),
        list_block_start=jnp.asarray(starts_blocks, dtype=jnp.int32),
        list_nblocks=jnp.asarray(nblocks_per_list, dtype=jnp.int32),
    )
    pil._max_nblocks = max(int(nblocks_per_list.max(initial=0)), 1)
    return pil


@functools.partial(jax.jit, donate_argnums=(0,))
def _gather_from_chunk(rows_acc, chunk, src_blk, r0):
    """Fill the slots of one block range whose source rows live in
    ``chunk`` (global rows [r0, r0+len(chunk))); other slots keep their
    accumulated value. src_blk < 0 marks padding slots (never valid)."""
    local = src_blk - r0
    nloc = chunk.shape[0]
    valid = (src_blk >= 0) & (local >= 0) & (local < nloc)
    got = chunk[jnp.clip(local, 0, max(nloc - 1, 0))].astype(jnp.float32)
    return jnp.where(valid[..., None], got, rows_acc)


def _gather_pack_blocks(chunks, src_flat_2d: np.ndarray, d: int,
                        release=None):
    """Device-side block-layout realization with bounded peak HBM.

    Instead of one (S, d) gather — which makes XLA hold source mirror,
    gather result AND the select output at once (the measured OOM at
    10M x 96 on a 16 GB chip) — the slot space is walked in block
    ranges of <= _PACK_RANGE_BLOCKS: each range gathers from every
    source chunk in turn into its own accumulator. The source mirrors
    are droppable the moment the last range is gathered (``release``,
    plus the local refs), BEFORE the final concatenate materializes the
    full packed buffer — so peak residency is
    max(mirrors + ranges, 2 x packed) rather than the old
    mirrors + 2-3 x packed. No buffer donation is assumed (the remote
    TPU platform ignores input-output aliasing). The multi-chunk walk
    also replaces the old jnp.concatenate over mirrors (a second
    full-size source copy) with per-chunk masked gathers.
    """
    nb_pad, B = src_flat_2d.shape
    cb = min(nb_pad, _PACK_RANGE_BLOCKS)
    # bucketing guarantees divisibility (pow2 below the range size,
    # multiples of it above) — one compiled shape per bucket
    assert nb_pad % cb == 0, (nb_pad, cb)
    r0s = np.zeros(len(chunks), np.int64)
    np.cumsum([c.shape[0] for c in chunks[:-1]], out=r0s[1:])
    accs = []
    for b0 in range(0, nb_pad, cb):
        src_blk = jnp.asarray(src_flat_2d[b0:b0 + cb])
        acc = jnp.zeros((cb, B, d), jnp.float32)
        for c, r0 in zip(chunks, r0s):
            acc = _gather_from_chunk(acc, c, src_blk, jnp.int32(r0))
        accs.append(acc)
    chunks.clear()
    if release is not None:
        release()
    norms = [jnp.sum(a * a, axis=-1) for a in accs]
    data = accs[0] if len(accs) == 1 else jnp.concatenate(accs)
    del accs, acc
    norms = norms[0] if len(norms) == 1 else jnp.concatenate(norms)
    return data, norms


# block-range granularity of the chunked pack: 8192 blocks = 1M rows at
# B=128 (384 MB at d=96) — large enough to amortize dispatch, small
# enough that two in-flight ranges cost < 1 GB
_PACK_RANGE_BLOCKS = 8192


def pack_invlists_device(
    rows_dev,
    xids: np.ndarray,
    assign: np.ndarray,
    nlist: int,
    block_size: int = 128,
    release=None,
) -> PackedInvLists:
    """Device-side packed-invlists build: the block layout is realized as
    ONE inverse-permutation gather over rows already in HBM, so adding
    vectors never uploads the data twice (the host-path `pack_invlists`
    moves every row through host memory and back — measured 2x the add
    time at 10M on the tunnel-limited host link; the reference's
    `InvertedLists::add_entries` likewise never copies rows out of
    process). Host work is ONLY the O(n) integer counting sort that
    yields the slot->row permutation.

    rows_dev: (n, d) f32 device array — or a list of (n_j, d) device
    chunks concatenated logically (row order = xids order either way;
    a list avoids the full-size concatenate copy at repack time).
    Shapes are pow2-bucketed (slot count up, via extra dummy blocks) so
    repeated chunked adds reuse a handful of compiled gathers.
    """
    all_chunks = (list(rows_dev) if isinstance(rows_dev, (list, tuple))
                  else [rows_dev])
    d = all_chunks[0].shape[1]
    chunks = [c for c in all_chunks if c.shape[0]]
    n = sum(c.shape[0] for c in chunks)
    del all_chunks, rows_dev       # _gather_pack_blocks owns the refs now
    xids = np.asarray(xids, np.int32)
    assign = np.asarray(assign, np.int64)
    if n and (assign.min() < 0 or assign.max() >= nlist):
        raise ValueError(
            f"pack_invlists_device: assignments must be in [0, {nlist}); "
            f"got [{assign.min()}, {assign.max()}]")
    B = block_size

    order = np.argsort(assign, kind="stable")
    sizes = np.bincount(assign, minlength=nlist)
    nblocks_per_list = -(-sizes // B)
    starts_blocks = np.zeros(nlist, np.int64)
    np.cumsum(nblocks_per_list[:-1], out=starts_blocks[1:])
    nb_total = int(nblocks_per_list.sum())

    # bucket the slot count (in blocks, +1 dummy) to bound compiles:
    # pow2 up to 8192 blocks (128 MB at d=128), then 8192-block steps —
    # a pure-pow2 bucket overshoots HBM by up to 2x at 10M+ scale
    need = nb_total + 1
    if need <= 8192:
        nb_pad = 1
        while nb_pad < need:
            nb_pad *= 2
    else:
        nb_pad = -(-need // 8192) * 8192
    S = nb_pad * B

    a_sorted = assign[order]
    src_starts = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=src_starts[1:])
    rank = np.arange(n, dtype=np.int64) - src_starts[a_sorted]
    slot = starts_blocks[a_sorted] * B + rank

    src_flat = np.full(S, -1, np.int32)         # -1 = padding slot
    src_flat[slot] = order.astype(np.int32)
    ids = np.full(S, -1, np.int32)
    ids[slot] = xids[order]

    data, norms = _gather_pack_blocks(chunks, src_flat.reshape(nb_pad, B), d,
                                      release=release)

    empty = nblocks_per_list == 0
    starts_blocks[empty] = nb_pad - 1           # a padded all-(-1) block

    pil = PackedInvLists(
        data=data,
        ids=jnp.asarray(ids.reshape(nb_pad, B)),
        norms=norms,
        list_block_start=jnp.asarray(starts_blocks, dtype=jnp.int32),
        list_nblocks=jnp.asarray(nblocks_per_list, dtype=jnp.int32),
    )
    pil._max_nblocks = max(int(nblocks_per_list.max(initial=0)), 1)
    return pil


def _compact_block_table(probes, list_block_start, list_nblocks,
                         max_nblocks: int, NB):
    """Per-query compacted block id table.

    The naive layout pads every probed list to `max_nblocks` — with skewed
    list sizes that wastes most of the scan (imbalance 2 on SIFT1M-scale
    data means ~4-5x padding). Instead scatter each probe's real blocks
    contiguously: buffer[q, offs[q,p] + i] = start[q,p] + i, remainder NB
    (the dummy block). Work then scales with the actual number of probed
    blocks, the same effect as the reference's exact ragged scan loop
    (faiss/IndexIVF.cpp:511-589) and the GPU two-pass IVFUtils prefix-sum
    (gpu/impl/IVFUtils.cu).

    Returns (buffer (nq, W), total (nq,)) with W = nprobe * max_nblocks.
    """
    nq, nprobe = probes.shape
    starts = list_block_start[probes]
    nblk = jnp.minimum(list_nblocks[probes], max_nblocks)
    offs = jnp.cumsum(nblk, axis=1) - nblk               # exclusive
    total = offs[:, -1] + nblk[:, -1]
    W = nprobe * max_nblocks
    local = lax.broadcasted_iota(jnp.int32, (1, 1, max_nblocks), 2)
    valid = local < nblk[:, :, None]
    pos = jnp.where(valid, offs[:, :, None] + local, W)  # invalid -> col W
    bid = starts[:, :, None] + local
    row = lax.broadcasted_iota(jnp.int32, pos.shape, 0)
    buffer = jnp.full((nq, W + 1), NB, jnp.int32)
    buffer = buffer.at[row.reshape(nq, -1), pos.reshape(nq, -1)].set(
        bid.reshape(nq, -1))[:, :W]
    return buffer, total


def _scan_compacted(xq, probes, list_block_start, list_nblocks, NB,
                    chunk_score_fn, k: int, similarity: bool, bad,
                    max_nblocks: int, chunk_blocks: int, qt: int,
                    extra_per_query=None, id_mask=None,
                    approx: bool = False):
    """Generic compacted invlist scan driver.

    1. build the per-query compacted block table;
    2. sort queries by scan length so each tile is homogeneous;
    3. per query-tile, run chunks under `lax.while_loop` bounded by the
       tile's own max block count (work scales with real list sizes);
    4. un-permute results.

    chunk_score_fn(q, extras, bids) -> (dis (qtile, cb, B), vids) computes
    one chunk's distances (flat / SQ-dequant / PQ-LUT variants).
    """
    nq, d = xq.shape
    xq = xq.astype(jnp.float32)
    buffer, total = _compact_block_table(
        probes, list_block_start, list_nblocks, max_nblocks, NB)
    W = buffer.shape[1]

    perm = jnp.argsort(total)
    xq_s = xq[perm]
    buf_s = buffer[perm]
    tot_s = total[perm]
    extras = (extra_per_query[perm]
              if extra_per_query is not None else jnp.zeros((nq, 1)))

    cb = min(chunk_blocks, W)
    Wp = (-(-W // cb)) * cb
    if Wp != W:
        buf_s = jnp.pad(buf_s, ((0, 0), (0, Wp - W)), constant_values=NB)
    qtile = min(qt, nq)
    nqt = -(-nq // qtile)
    qpad = nqt * qtile - nq
    if qpad:
        xq_s = jnp.pad(xq_s, ((0, qpad), (0, 0)))
        buf_s = jnp.pad(buf_s, ((0, qpad), (0, 0)), constant_values=NB)
        tot_s = jnp.pad(tot_s, (0, qpad))
        extras = jnp.pad(extras, ((0, qpad),) + ((0, 0),) * (extras.ndim - 1))
    buf_t = buf_s.reshape(nqt, qtile, Wp)
    xq_t = xq_s.reshape(nqt, qtile, d)
    tot_t = tot_s.reshape(nqt, qtile)
    ex_t = extras.reshape((nqt, qtile) + extras.shape[1:])

    def scan_tile(args):
        q, qblk, qtot, qex = args
        nch = lax.div(jnp.max(qtot) + cb - 1, cb)        # dynamic bound

        def cond(state):
            return state[0] < nch

        def body(state):
            c, bd, bi, nd = state
            bids = lax.dynamic_slice(qblk, (0, c * cb), (qtile, cb))
            dis, vids = chunk_score_fn(q, qex, bids)
            valid = vids >= 0
            if id_mask is not None:
                # IDSelector bitmap filter (SearchParameters.sel)
                allowed = id_mask[jnp.where(valid, vids, 0)] != 0
                valid = valid & allowed
            dis = jnp.where(valid, dis, bad)
            nd = nd + jnp.sum(valid.astype(jnp.int32))
            dis2 = dis.reshape(qtile, -1)
            vids2 = vids.reshape(qtile, -1)
            if approx:
                # hardware partial top-k per chunk, exact 2k-wide merge
                # (the same fusion lesson as ops.distances.knn: exact
                # lax.top_k over chunk-wide scores costs ~10x the GEMM)
                key = dis2 if similarity else -dis2
                v, pos = lax.approx_max_k(key, min(k, dis2.shape[1]))
                cv = v if similarity else -v
                ci2 = jnp.take_along_axis(vids2, pos, axis=1)
                nbd, nbi = T.merge_topk(bd, bi, cv, ci2, k,
                                        similarity=similarity)
            else:
                nbd, nbi = T.merge_topk(bd, bi, dis2, vids2, k,
                                        similarity=similarity)
            return c + 1, nbd, nbi, nd

        init = (
            jnp.int32(0),
            jnp.full((qtile, k), bad, jnp.float32),
            jnp.full((qtile, k), -1, jnp.int32),
            jnp.int32(0),
        )
        _, bd, bi, nd = lax.while_loop(cond, body, init)
        return bd, bi, nd

    bd, bi, nd = lax.map(scan_tile, (xq_t, buf_t, tot_t, ex_t))
    bd = bd.reshape(nqt * qtile, k)[:nq]
    bi = bi.reshape(nqt * qtile, k)[:nq]
    inv = jnp.argsort(perm)
    return bd[inv], bi[inv], jnp.sum(nd)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "max_nblocks", "chunk_blocks", "qt",
                     "approx"),
)
def scan_invlists(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    invlists: PackedInvLists,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    max_nblocks: int,
    chunk_blocks: int = 8,
    qt: int = 256,
    id_mask: Optional[jnp.ndarray] = None,
    approx: bool = False,
):
    """Scan probed lists: the batched `search_preassigned` phase 2
    (compacted block table + length-sorted query tiles, see
    `_scan_compacted`). approx=True selects per-chunk candidates with the
    TPU's approx_max_k (exact merges; ~0.999 top-10 fidelity).

    Args:
      xq: (nq, d) queries.
      probes: (nq, nprobe) int32 list ids (the coarse quantizer's output).
      max_nblocks: static cap on blocks per list (acts like `max_codes`,
        faiss/IndexIVF.h:95 — longer lists are truncated at scan time).
    Returns:
      (D, I, ndis): (nq, k) best-first results and the total number of real
      (non-padding) distance evaluations (IndexIVFStats.ndis analog).
    """
    nq, d = xq.shape
    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)

    sq_bias = getattr(invlists, "sq_bias", None)

    def score(q, qex, bids):
        vecs = invlists.data[bids]                 # (qtile, cb, B, d)
        if sq_bias is not None:
            # SQ8 storage: dequantize gathered codes on the VPU
            vecs = sq_bias + vecs.astype(jnp.float32) * invlists.sq_scale
        vids = invlists.ids[bids]                  # (qtile, cb, B)
        vnorm = invlists.norms[bids]
        ip = jnp.einsum(
            "qd,qcbd->qcb", q, vecs,
            precision=lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        if similarity:
            dis = ip
        else:
            qn = jnp.sum(q * q, axis=1)
            dis = jnp.maximum(qn[:, None, None] + vnorm - 2.0 * ip, 0.0)
        return dis, vids

    return _scan_compacted(
        xq, probes, invlists.list_block_start, invlists.list_nblocks,
        invlists.nblocks, score, k, similarity, bad,
        max_nblocks, chunk_blocks, qt, id_mask=id_mask, approx=approx,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedInvListsSQ8:
    """Block-padded invlists storing 8-bit scalar-quantized vectors:
    data holds uint8 codes, (sq_vmin, sq_vdiff) the per-dim dequant
    affine (x = vmin + code * vdiff/255), norms the EXACT dequantized
    norms. Duck-compatible with PackedInvLists for the scan kernels; the
    fused Pallas scan streams the codes at HALF the bf16 byte rate by
    folding the affine into the query side (ivf_scan_pallas.py)."""

    data: jnp.ndarray              # (nblocks+1, B, d) uint8
    ids: jnp.ndarray               # (nblocks+1, B) int32
    norms: jnp.ndarray             # (nblocks+1, B) f32 (dequantized)
    list_block_start: jnp.ndarray  # (nlist,) int32
    list_nblocks: jnp.ndarray      # (nlist,) int32
    sq_bias: jnp.ndarray           # (d,) f32: x = bias + scale * code
    sq_scale: jnp.ndarray          # (d,) f32

    def tree_flatten(self):
        return (
            (self.data, self.ids, self.norms, self.list_block_start,
             self.list_nblocks, self.sq_bias, self.sq_scale),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    nlist = PackedInvLists.nlist
    block_size = PackedInvLists.block_size
    nblocks = PackedInvLists.nblocks
    max_nblocks_per_list = PackedInvLists.max_nblocks_per_list
    _max_nblocks: int = 1


def sq8_requantize_invlists(pil: PackedInvLists,
                            chunk_blocks: int = 512) -> PackedInvListsSQ8:
    """Re-quantize raw/bf16 packed invlists to the SQ8 stream format
    (per-dim min/max over real rows). Norms are recomputed from the
    DEQUANTIZED values so the fused kernel's exact-refine contract holds
    at the storage precision."""
    d = pil.data.shape[2]
    total = pil.data.shape[0]

    @jax.jit
    def _minmax(chunk, cids, vmin, vmax):
        x = chunk.astype(jnp.float32)
        valid = (cids >= 0)[:, :, None]
        big = jnp.where(valid, x, jnp.inf).reshape(-1, d)
        small = jnp.where(valid, x, -jnp.inf).reshape(-1, d)
        return (jnp.minimum(vmin, jnp.min(big, axis=0)),
                jnp.maximum(vmax, jnp.max(small, axis=0)))

    CH = min(chunk_blocks, total)
    starts = list(range(0, total, CH))
    if starts and starts[-1] + CH > total:
        starts[-1] = total - CH
    vmin = jnp.full((d,), jnp.inf)
    vmax = jnp.full((d,), -jnp.inf)
    for s in starts:
        vmin, vmax = _minmax(
            lax.dynamic_slice_in_dim(pil.data, s, CH, axis=0),
            lax.dynamic_slice_in_dim(pil.ids, s, CH, axis=0), vmin, vmax)
    vmin = jnp.where(jnp.isfinite(vmin), vmin, 0.0)
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 1.0)
    vdiff = jnp.maximum(vmax - vmin, 1e-12)
    scale = vdiff / 255.0

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _put(codes, norms, c_chunk, n_chunk, off):
        codes = lax.dynamic_update_slice(codes, c_chunk, (off, 0, 0))
        norms = lax.dynamic_update_slice(norms, n_chunk, (off, 0))
        return codes, norms

    @jax.jit
    def _quant(chunk):
        x = chunk.astype(jnp.float32)
        c = jnp.clip(jnp.round((x - vmin) / scale), 0, 255)
        deq = vmin + c * scale
        return c.astype(jnp.uint8), jnp.sum(deq * deq, axis=2)

    codes = jnp.zeros((total, pil.block_size, d), jnp.uint8)
    norms = jnp.zeros((total, pil.block_size), jnp.float32)
    for s in starts:
        chunk = lax.dynamic_slice_in_dim(pil.data, s, CH, axis=0)
        cc, nn = _quant(chunk)
        codes, norms = _put(codes, norms, cc, nn, s)

    out = PackedInvListsSQ8(
        data=codes, ids=pil.ids, norms=norms,
        list_block_start=pil.list_block_start,
        list_nblocks=pil.list_nblocks,
        sq_bias=vmin, sq_scale=scale,
    )
    out._max_nblocks = pil._max_nblocks
    return out


def sq8_view_from_codes(invlists, bias: jnp.ndarray, scale: jnp.ndarray,
                        chunk_blocks: int = 512) -> PackedInvListsSQ8:
    """Wrap 8-bit SQ code invlists (codes of width d) as the SQ8 stream
    format without copying the codes — only the exact dequantized norms
    are computed (chunked). Lets IndexIVFScalarQuantizer ride the fused
    Pallas kernel at the uint8 byte rate."""
    codes = invlists.codes
    total, B, d = codes.shape
    bias = jnp.broadcast_to(jnp.asarray(bias, jnp.float32), (d,))
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (d,))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _put(norms, chunk, off):
        return lax.dynamic_update_slice(norms, chunk, (off, 0))

    @jax.jit
    def _norms(chunk):
        x = bias + chunk.astype(jnp.float32) * scale
        return jnp.sum(x * x, axis=2)

    CH = min(chunk_blocks, total)
    norms = jnp.zeros((total, B), jnp.float32)
    starts = list(range(0, total, CH))
    if starts and starts[-1] + CH > total:
        starts[-1] = total - CH
    for s in starts:
        norms = _put(norms, _norms(
            lax.dynamic_slice_in_dim(codes, s, CH, axis=0)), s)

    out = PackedInvListsSQ8(
        data=codes, ids=invlists.ids, norms=norms,
        list_block_start=invlists.list_block_start,
        list_nblocks=invlists.list_nblocks,
        sq_bias=bias, sq_scale=scale,
    )
    out._max_nblocks = invlists._max_nblocks
    return out


# ---------------------------------------------------------------------------
# coded inverted lists (PQ / SQ codes instead of raw vectors)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedCodeInvLists:
    """Block-padded inverted lists of codes — same layout as PackedInvLists
    but `codes` holds the codec's per-vector code row (uint8/fp16/bf16),
    the role of `ArrayInvertedLists::codes` for IVFPQ/IVFSQ
    (invlists/InvertedLists.h:37-130)."""

    codes: jnp.ndarray             # (nblocks+1, B, code_width)
    ids: jnp.ndarray               # (nblocks+1, B) int32, -1 = padding
    list_block_start: jnp.ndarray  # (nlist,) int32
    list_nblocks: jnp.ndarray      # (nlist,) int32

    def tree_flatten(self):
        return (
            (self.codes, self.ids, self.list_block_start, self.list_nblocks),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nlist(self) -> int:
        return self.list_block_start.shape[0]

    @property
    def block_size(self) -> int:
        return self.codes.shape[1]

    @property
    def nblocks(self) -> int:
        return self.codes.shape[0] - 1

    @property
    def max_nblocks_per_list(self) -> int:
        return int(self._max_nblocks)

    _max_nblocks: int = 1


def pack_code_invlists(
    codes: np.ndarray,
    xids: np.ndarray,
    assign: np.ndarray,
    nlist: int,
    block_size: int = 128,
) -> PackedCodeInvLists:
    """Counting-sort codes into the block-padded layout (add_entries)."""
    codes = np.ascontiguousarray(codes)
    n, cw = codes.shape
    xids = np.asarray(xids, np.int32)
    assign = np.asarray(assign, np.int64)
    if n and (assign.min() < 0 or assign.max() >= nlist):
        # an out-of-range assignment would make the native counting-sort
        # scatter write out of bounds (process segfault, not an exception)
        raise ValueError(
            f"pack_code_invlists: assignments must be in [0, {nlist}); "
            f"got [{assign.min()}, {assign.max()}]")
    B = block_size

    from ..utils import native as _native

    nat = _native.pack_rows_native(codes, xids, assign, nlist, B)
    if nat is not None:
        cdata, ids, starts_blocks, nblocks_per_list = nat
        pil = PackedCodeInvLists(
            codes=jnp.asarray(cdata),
            ids=jnp.asarray(ids),
            list_block_start=jnp.asarray(starts_blocks, dtype=jnp.int32),
            list_nblocks=jnp.asarray(nblocks_per_list, dtype=jnp.int32),
        )
        pil._max_nblocks = max(int(nblocks_per_list.max(initial=0)), 1)
        return pil

    order = np.argsort(assign, kind="stable")
    sizes = np.bincount(assign, minlength=nlist)
    nblocks_per_list = -(-sizes // B)
    starts_blocks = np.zeros(nlist, np.int64)
    np.cumsum(nblocks_per_list[:-1], out=starts_blocks[1:])
    nb_total = int(nblocks_per_list.sum())

    cdata = np.zeros((nb_total + 1, B, cw), codes.dtype)
    ids = np.full((nb_total + 1, B), -1, np.int32)
    a_sorted = assign[order]
    src_starts = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=src_starts[1:])
    rank = np.arange(n, dtype=np.int64) - src_starts[a_sorted]
    slot = starts_blocks[a_sorted] * B + rank
    cdata.reshape(-1, cw)[slot] = codes[order]
    ids.reshape(-1)[slot] = xids[order]

    empty = nblocks_per_list == 0
    starts_blocks[empty] = nb_total
    pil = PackedCodeInvLists(
        codes=jnp.asarray(cdata),
        ids=jnp.asarray(ids),
        list_block_start=jnp.asarray(starts_blocks, dtype=jnp.int32),
        list_nblocks=jnp.asarray(nblocks_per_list, dtype=jnp.int32),
    )
    pil._max_nblocks = max(int(nblocks_per_list.max(initial=0)), 1)
    return pil


def decode_code_invlists_generic(
    invlists: PackedCodeInvLists,
    decode_rows,
    d: int,
    coarse_centroids: Optional[jnp.ndarray] = None,
    *,
    chunk_blocks: int = 128,
    dtype=jnp.float32,
) -> PackedInvLists:
    """Decoded cache for ANY codec: `decode_rows((n, code_width) codes)
    -> (n, d) f32` is traced into the chunked device decode. See
    decode_code_invlists for the rationale; the additive-quantizer IVF
    family uses this with an RQ decode (its 8-bit LUT gather scan has
    the same pathology as PQ's)."""

    NB = invlists.nblocks
    B = invlists.block_size
    total = NB + 1
    nlist = invlists.list_nblocks.shape[0]

    if coarse_centroids is not None:
        block2list = jnp.repeat(
            jnp.arange(nlist, dtype=jnp.int32), invlists.list_nblocks,
            total_repeat_length=NB)
        block2list = jnp.concatenate(
            [block2list, jnp.zeros((1,), jnp.int32)])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _put(data, norms, chunk, cnorm, off):
        data = lax.dynamic_update_slice(data, chunk, (off, 0, 0))
        norms = lax.dynamic_update_slice(norms, cnorm, (off, 0))
        return data, norms

    @jax.jit
    def _decode_chunk(codes_blk, cent_blk):
        nb, Bl = codes_blk.shape[:2]
        x = decode_rows(codes_blk.reshape(nb * Bl, -1))
        x = x.reshape(nb, Bl, d)
        if cent_blk is not None:
            x = x + cent_blk[:, None, :]
        n = jnp.sum(x * x, axis=2)
        return x.astype(dtype), n

    CH = min(chunk_blocks, total)
    data = jnp.zeros((total, B, d), dtype)
    norms = jnp.zeros((total, B), jnp.float32)
    starts = list(range(0, total, CH))
    if starts and starts[-1] + CH > total:
        starts[-1] = total - CH
    for s in starts:
        cb = lax.dynamic_slice_in_dim(invlists.codes, s, CH, axis=0)
        cent = (coarse_centroids[
            lax.dynamic_slice_in_dim(block2list, s, CH)]
            if coarse_centroids is not None else None)
        chunk, cnorm = _decode_chunk(cb, cent)
        data, norms = _put(data, norms, chunk, cnorm, s)

    pil = PackedInvLists(
        data=data,
        ids=invlists.ids,
        norms=norms,
        list_block_start=invlists.list_block_start,
        list_nblocks=invlists.list_nblocks,
    )
    pil._max_nblocks = invlists._max_nblocks
    return pil


def decode_code_invlists(
    invlists: PackedCodeInvLists,
    pq_centroids: jnp.ndarray,
    coarse_centroids: Optional[jnp.ndarray] = None,
    *,
    packed4: bool = False,
    chunk_blocks: int = 128,
    dtype=jnp.float32,
) -> PackedInvLists:
    """Decode PQ-coded invlists into a parallel raw-vector PackedInvLists
    with the SAME block structure (the "decoded cache").

    Purpose: a fast 8-bit ADC. For ksub=256 the per-pair one-hot
    contraction costs m*256 MACs (42x the d MACs of a plain distance
    GEMM) and the XLA gather fallback runs at ~50M elem/s — both
    pathological. Decoding once at add time and streaming the
    reconstructions through the flat scan kernels computes EXACTLY the
    ADC distance (||q - c_l - dec(code)||^2 == the summed residual LUT,
    subspaces being orthogonal) at IVFFlat speed. This is the
    decode-then-GEMM counterpart of the reference's per-ISA 8-bit ADC
    inner loops (impl/code_distance/code_distance.h:34,
    IndexIVFPQ.cpp scan_list_with_table) — trading d*4 bytes/vector of
    HBM capacity for MXU-speed scans, the TPU-native balance.

    The cache is derived state: it can be rebuilt from (codes, codebooks)
    after deserialization or an on-disk merge, and is never serialized.

    Args:
      coarse_centroids: (nlist, d) — added per owning list when the codec
        is residual (by_residual); None for plain PQ.
      packed4: codes hold two 4-bit sub-indices per byte.
      dtype: cache storage dtype. bfloat16 halves the HBM capacity cost;
        norms are computed from the f32 decode either way, and the scan
        kernels stream bf16 regardless, so only the exact-refine phase
        sees the storage precision — noise far below the codec error.
    """
    from . import pq as PQ

    M, ksub, dsub = pq_centroids.shape
    d = M * dsub

    def decode_rows(flat):
        c = PQ.unpack_codes_4bit(flat) if packed4 else flat
        # padding rows (ids == -1) keep whatever the dummy sub-indices
        # decode to; scans mask them by id, so no zeroing needed
        return PQ.pq_decode(c, pq_centroids)

    return decode_code_invlists_generic(
        invlists, decode_rows, d, coarse_centroids,
        chunk_blocks=chunk_blocks, dtype=dtype)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "by_residual", "max_nblocks",
                     "chunk_probes", "chunk_blocks", "qt", "packed4",
                     "approx"),
)
def scan_invlists_pq(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    coarse_dis: jnp.ndarray,
    invlists: PackedCodeInvLists,
    pq_centroids: jnp.ndarray,
    coarse_centroids: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    by_residual: bool = True,
    max_nblocks: int,
    chunk_probes: int = 4,        # accepted for API compat; unused
    chunk_blocks: int = 8,
    qt: int = 256,
    id_mask: Optional[jnp.ndarray] = None,
    packed4: bool = False,
    approx: bool = False,
):
    """ADC scan over PQ-coded invlists (IndexIVFPQ::search_preassigned ->
    scan_list_with_table / pq4 kernels).

    Compacted-table driver (see _scan_compacted): work scales with REAL
    list sizes — the earlier probe-major version padded every probe to
    max_nblocks, an 18x waste at nlist=65536 where the average list is a
    single block. Residual ADC tables are computed per (query, block)
    from r = q - c(owning list) (the use_precomputed_table=0 path,
    IndexIVFPQ.cpp); the block's owning list comes from the contiguous
    stream property of the packed layout (block2list = repeat(arange,
    nblocks)). by_residual=False uses one per-query table.

    coarse_dis: (nq, nprobe) coarse distances (kept for API parity;
    the residual expansion folds the coarse term into the tables).
    """
    from . import pq as PQ

    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)
    NB = invlists.nblocks
    M, ksub, dsub = pq_centroids.shape
    nlist = invlists.list_nblocks.shape[0]
    xq = xq.astype(jnp.float32)

    # block -> owning list; the dummy block (id NB) maps to list 0, whose
    # LUT is computed but masked by the driver (ids are -1 there)
    block2list = jnp.repeat(
        jnp.arange(nlist, dtype=jnp.int32), invlists.list_nblocks,
        total_repeat_length=NB)
    block2list = jnp.concatenate(
        [block2list, jnp.zeros((1,), jnp.int32)])

    use_residual = by_residual and not similarity
    moffs = (jnp.arange(M, dtype=jnp.int32) * ksub)[None, None, None, :]

    def score(q, qex, bids):
        qtile, cb = bids.shape
        codes = invlists.codes[bids]            # (qtile, cb, B, M[/2])
        if packed4:
            codes = PQ.unpack_codes_4bit(codes)
        vids = invlists.ids[bids]               # (qtile, cb, B)
        B = codes.shape[2]
        if use_residual:
            lists = block2list[jnp.clip(bids, 0, NB)]
            cl = coarse_centroids[lists]        # (qtile, cb, d)
            resid = q[:, None, :] - cl
            lut = PQ.query_tables(
                resid.reshape(qtile * cb, -1), pq_centroids, metric
            ).reshape(qtile, cb, M, ksub)
        else:
            lut1 = PQ.query_tables(q, pq_centroids, metric)
            lut = jnp.broadcast_to(
                lut1[:, None], (qtile, cb, M, ksub))
        if ksub <= 16:
            # pq4 fast-scan analog: the LUT lookup as a one-hot
            # contraction per subquantizer — the MXU/VPU counterpart of
            # pq4_fast_scan's in-register shuffle (impl/pq4_fast_scan).
            # XLA gathers cost ~50M elem/s here; the contraction runs at
            # memory speed. One-hot entries are exact in bf16; the bf16
            # rounding of the table is far below the 4-bit codec error.
            kiota = jnp.arange(ksub, dtype=jnp.int32)
            dis = jnp.zeros(codes.shape[:3], jnp.float32)
            lut_b = lut.astype(jnp.bfloat16)
            for m in range(M):
                oh = (codes[..., m][..., None] == kiota).astype(
                    jnp.bfloat16)                      # (qt, cb, B, ksub)
                dis = dis + jnp.einsum(
                    "qcbk,qck->qcb", oh, lut_b[:, :, m],
                    preferred_element_type=jnp.float32)
        else:
            lut_flat = lut.reshape(qtile, cb, M * ksub)
            idx = codes.astype(jnp.int32) + moffs
            g = jnp.take_along_axis(
                lut_flat, idx.reshape(qtile, cb, B * M), axis=2)
            dis = g.reshape(qtile, cb, B, M).sum(axis=3)
        return dis, vids

    return _scan_compacted(
        xq, probes, invlists.list_block_start, invlists.list_nblocks,
        NB, score, k, similarity, bad, max_nblocks, chunk_blocks, qt,
        id_mask=id_mask, approx=approx,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "nbit", "max_nblocks", "qt", "chunk_probes"),
)
def scan_invlists_hash(
    zq: jnp.ndarray,
    probes: jnp.ndarray,
    invlists: PackedCodeInvLists,
    trained: jnp.ndarray,
    period: float,
    k: int,
    *,
    nbit: int,
    max_nblocks: int,
    chunk_probes: int = 4,
    qt: int = 64,
    id_mask: Optional[jnp.ndarray] = None,
):
    """Hamming scan over spectral-hash invlists
    (faiss/IndexIVFSpectralHash.cpp IVFScanner): the query projection is
    binarized against each probed list's thresholds
    (binarize_with_freq: bit i = floor((z_i - c_i) * 2/period) & 1), then
    compared to the stored codes.

    TPU formulation: bits as +-1 bf16 vectors turn Hamming into one MXU
    contraction per block — ham = (nbit - q_pm . c_pm) / 2 — instead of
    XOR+popcount lanes (HammingComputer dispatch in the reference).

    Args:
      zq: (nq, nbit) float query projections (vt already applied).
      trained: (nlist, nbit) per-list thresholds (zeros for Thresh_global).
    Returns (D, I, ndis).
    """
    nq, _ = zq.shape
    nprobe = probes.shape[1]
    B = invlists.block_size
    NB = invlists.nblocks
    nbytes = nbit // 8
    freq = 2.0 / period
    zq = zq.astype(jnp.float32)

    pc = min(chunk_probes, nprobe)
    npc = -(-nprobe // pc)
    ppad = npc * pc - nprobe
    if ppad:
        probes = jnp.concatenate(
            [probes, jnp.full((nq, ppad), -1, probes.dtype)], axis=1)
    qtile = min(qt, nq)
    nqt = -(-nq // qtile)
    qpad = nqt * qtile - nq
    if qpad:
        zq = jnp.pad(zq, ((0, qpad), (0, 0)))
        probes = jnp.pad(probes, ((0, qpad), (0, 0)), constant_values=-1)
    zq_t = zq.reshape(nqt, qtile, nbit)
    probes_t = probes.reshape(nqt, qtile, npc, pc)
    shifts = jnp.arange(8, dtype=jnp.uint8)

    def unpack_pm(codes):
        # (..., nbytes) uint8 -> (..., nbit) +-1 bf16
        bits = (codes[..., None] >> shifts) & jnp.uint8(1)
        bits = bits.reshape(codes.shape[:-1] + (nbit,))
        return (bits.astype(jnp.bfloat16) * 2 - 1)

    def scan_tile(args):
        q, qprobes = args                     # (qtile, nbit), (qtile,npc,pc)

        def probe_chunk(c, carry):
            bd, bi, nd = carry
            pl = qprobes[:, c, :]
            pvalid = pl >= 0
            pl_s = jnp.where(pvalid, pl, 0)
            thr = trained[pl_s]                          # (qtile, pc, nbit)
            xi = jnp.floor((q[:, None, :] - thr) * freq).astype(jnp.int32)
            qpm = ((xi & 1).astype(jnp.bfloat16) * 2 - 1)  # (qtile,pc,nbit)
            starts = invlists.list_block_start[pl_s]
            nblk = jnp.minimum(invlists.list_nblocks[pl_s], max_nblocks)
            nblk = jnp.where(pvalid, nblk, 0)

            def block_body(o, carry2):
                bd2, bi2, nd2 = carry2
                bids = jnp.where(o < nblk, starts + o, NB)
                codes = invlists.codes[bids]             # (qtile,pc,B,nbytes)
                vids = invlists.ids[bids]
                cpm = unpack_pm(codes)                   # (qtile,pc,B,nbit)
                ip = jnp.einsum("qpn,qpbn->qpb", qpm, cpm,
                                preferred_element_type=jnp.float32)
                dis = 0.5 * (nbit - ip)
                valid = vids >= 0
                if id_mask is not None:
                    allowed = id_mask[jnp.where(valid, vids, 0)] != 0
                    valid = valid & allowed
                dis = jnp.where(valid, dis, jnp.inf)
                nd2 = nd2 + jnp.sum(valid.astype(jnp.int32))
                nbd, nbi = T.merge_topk(
                    bd2, bi2, dis.reshape(qtile, pc * B),
                    vids.reshape(qtile, pc * B), k, similarity=False)
                return nbd, nbi, nd2

            return lax.fori_loop(0, max_nblocks, block_body, (bd, bi, nd))

        init = (
            jnp.full((qtile, k), jnp.inf, jnp.float32),
            jnp.full((qtile, k), -1, jnp.int32),
            jnp.int32(0),
        )
        return lax.fori_loop(0, npc, probe_chunk, init)

    bd, bi, nd = lax.map(scan_tile, (zq_t, probes_t))
    bd = bd.reshape(nqt * qtile, k)[:nq]
    bi = bi.reshape(nqt * qtile, k)[:nq]
    return bd, bi, jnp.sum(nd)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qtype", "max_nblocks", "chunk_blocks",
                     "qt"),
)
def scan_invlists_sq(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    invlists: PackedCodeInvLists,
    vmin: jnp.ndarray,
    vdiff: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    qtype: int,
    max_nblocks: int,
    chunk_blocks: int = 8,
    qt: int = 256,
    id_mask: Optional[jnp.ndarray] = None,
):
    """Scan SQ-coded invlists: dequantize gathered code blocks on the VPU
    then one distance contraction (SQDistanceComputer role,
    impl/ScalarQuantizer.cpp) — incl. in-kernel 4-bit/6-bit unpacking.
    Compacted-table driver, see _scan_compacted.
    """
    from . import sq as SQ

    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)
    d = xq.shape[1]

    def dequant(codes):
        return SQ.sq_dequant_codes(codes, qtype, d, vmin, vdiff)

    def score(q, qex, bids):
        vecs = dequant(invlists.codes[bids])        # (qtile, cb, B, d)
        vids = invlists.ids[bids]
        ip = jnp.einsum("qd,qcbd->qcb", q, vecs,
                        precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        if similarity:
            dis = ip
        else:
            qn = jnp.sum(q * q, axis=1)[:, None, None]
            vn = jnp.sum(vecs * vecs, axis=3)
            dis = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
        return dis, vids

    return _scan_compacted(
        xq, probes, invlists.list_block_start, invlists.list_nblocks,
        invlists.nblocks, score, k, similarity, bad,
        max_nblocks, chunk_blocks, qt, id_mask=id_mask,
    )


# ---------------------------------------------------------------------------
# list-major grouped scan: queries probing the same list share block loads
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "max_nblocks", "group", "item_tile",
                     "approx"),
)
def scan_invlists_grouped(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    invlists: PackedInvLists,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    max_nblocks: int,
    group: int = 32,
    item_tile: int = 256,
    approx: bool = False,
):
    """List-major IVF scan (the GPU two-pass idea, gpu/impl/IVFUtils.cu,
    taken further): instead of each query gathering its probed blocks
    (bandwidth ∝ nq*nprobe*list bytes), (query, probe) pairs are sorted by
    list and grouped G at a time, so one HBM read of a list block feeds a
    (G, B, d) MXU contraction for G queries — data reuse ×G.

    Work items (list, ≤G pairs) are length-sorted and processed in tiles
    under a while_loop bounded per tile, like `_scan_compacted`. Item
    results scatter back to (nq, nprobe, k) and a final exact k-select
    merges per query.

    Best when nq*nprobe/nlist >= group/2 (big batches); the query-major
    `scan_invlists` wins for small batches.
    """
    nq, d = xq.shape
    nprobe = probes.shape[1]
    B = invlists.block_size
    NB = invlists.nblocks
    nlist = invlists.nlist
    G = group
    similarity = D.is_similarity_metric(metric)
    bad = D.worst_value(metric)
    xq = xq.astype(jnp.float32)
    npairs = nq * nprobe

    # --- build work items -------------------------------------------------
    l_flat = probes.reshape(npairs).astype(jnp.int32)
    order = jnp.argsort(l_flat)
    ls = l_flat[order]                                   # sorted list ids
    first = jnp.searchsorted(ls, ls)
    rank = jnp.arange(npairs, dtype=jnp.int32) - first.astype(jnp.int32)
    counts = jnp.zeros((nlist,), jnp.int32).at[ls].add(1)
    items_per_list = -(-counts // G)
    base_item = jnp.cumsum(items_per_list) - items_per_list
    item_of_pair = base_item[ls] + rank // G
    slot_of_pair = rank % G

    cap = npairs // G + nlist + 1
    item_list = jnp.full((cap,), -1, jnp.int32).at[item_of_pair].max(ls)
    # pair table: original pair index per (item, slot)
    item_pairs = jnp.full((cap, G), -1, jnp.int32).at[
        item_of_pair, slot_of_pair].set(order.astype(jnp.int32))

    il_valid = item_list >= 0
    item_start = jnp.where(il_valid,
                           invlists.list_block_start[
                               jnp.where(il_valid, item_list, 0)], 0)
    item_nblk = jnp.where(
        il_valid,
        jnp.minimum(invlists.list_nblocks[
            jnp.where(il_valid, item_list, 0)], max_nblocks), 0)

    # --- sort items by length, tile them ---------------------------------
    iorder = jnp.argsort(item_nblk)
    item_start = item_start[iorder]
    item_nblk = item_nblk[iorder]
    item_pairs = item_pairs[iorder]

    IT = min(item_tile, cap)
    nit = -(-cap // IT)
    ipad = nit * IT - cap
    if ipad:
        item_start = jnp.pad(item_start, (0, ipad))
        item_nblk = jnp.pad(item_nblk, (0, ipad))
        item_pairs = jnp.pad(item_pairs, ((0, ipad), (0, 0)),
                             constant_values=-1)
    item_start = item_start.reshape(nit, IT)
    item_nblk = item_nblk.reshape(nit, IT)
    item_pairs_t = item_pairs.reshape(nit, IT, G)

    qn_all = D.l2_norms(xq, precision=lax.Precision.DEFAULT)

    def scan_tile(args):
        starts, nblks, pairs = args   # (IT,), (IT,), (IT, G)
        pvalid = pairs >= 0
        qidx = jnp.where(pvalid, pairs // nprobe, 0)
        qv = xq[qidx]                                    # (IT, G, d)
        qnorm = jnp.where(pvalid, qn_all[qidx], 0.0)     # (IT, G)
        nch = jnp.max(nblks)

        def cond(state):
            return state[0] < nch

        def body(state):
            o, bd, bi, nd = state
            active = o < nblks
            bids = jnp.where(active, starts + o, NB)     # (IT,)
            vecs = invlists.data[bids]                   # (IT, B, d)
            vids = invlists.ids[bids]                    # (IT, B)
            vnorm = invlists.norms[bids]
            ip = jnp.einsum("igd,ibd->igb", qv, vecs,
                            precision=lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
            if similarity:
                dis = ip
            else:
                dis = jnp.maximum(
                    qnorm[:, :, None] + vnorm[:, None, :] - 2.0 * ip, 0.0)
            valid = (vids >= 0)[:, None, :] & pvalid[:, :, None]
            dis = jnp.where(valid, dis, bad)
            nd = nd + jnp.sum(valid.astype(jnp.int32))
            ids_b = jnp.broadcast_to(vids[:, None, :], dis.shape)
            if approx:
                flat_d = dis.reshape(-1, B)
                key = flat_d if similarity else -flat_d
                v, pos = lax.approx_max_k(key, min(k, B))
                cv = (v if similarity else -v).reshape(dis.shape[0],
                                                       dis.shape[1], -1)
                cids = jnp.take_along_axis(
                    ids_b.reshape(-1, B), pos, axis=1
                ).reshape(cv.shape)
                cd = jnp.concatenate([bd, cv], axis=2)
                ci = jnp.concatenate([bi, cids], axis=2)
            else:
                cd = jnp.concatenate([bd, dis], axis=2)  # (IT, G, k+B)
                ci = jnp.concatenate([bi, ids_b], axis=2)
            key = cd if similarity else -cd
            nv, pos = lax.top_k(key, k)
            nbd = nv if similarity else -nv
            nbi = jnp.take_along_axis(ci, pos, axis=2)
            return o + 1, nbd, nbi, nd

        init = (
            jnp.int32(0),
            jnp.full((IT, G, k), bad, jnp.float32),
            jnp.full((IT, G, k), -1, jnp.int32),
            jnp.int32(0),
        )
        _, bd, bi, nd = lax.while_loop(cond, body, init)
        return bd, bi, nd

    bd, bi, nd = lax.map(scan_tile, (item_start, item_nblk, item_pairs_t))
    bd = bd.reshape(nit * IT, G, k)
    bi = bi.reshape(nit * IT, G, k)
    pairs_all = item_pairs.reshape(nit * IT, G)

    # --- scatter item results back to (pair, k), merge per query ----------
    pv = pairs_all >= 0
    psafe = jnp.where(pv, pairs_all, npairs)             # dummy row
    pair_d = jnp.full((npairs + 1, k), bad, jnp.float32
                      ).at[psafe].set(jnp.where(pv[:, :, None], bd, bad))
    pair_i = jnp.full((npairs + 1, k), -1, jnp.int32
                      ).at[psafe].set(jnp.where(pv[:, :, None], bi, -1))
    pair_d = pair_d[:npairs].reshape(nq, nprobe * k)
    pair_i = pair_i[:npairs].reshape(nq, nprobe * k)
    key = pair_d if similarity else -pair_d
    nv, pos = lax.top_k(key, k)
    out_d = nv if similarity else -nv
    out_i = jnp.take_along_axis(pair_i, pos, axis=1)
    return out_d, out_i, jnp.sum(nd)
