"""Out-of-core paged IVF scan — single-chip search of indexes BIGGER than
HBM (the fork's signature capability: mmap invlists searched without
residency, faiss/invlists/OnDiskInvertedLists.h:60-136 + its
OngoingPrefetch at :116-126, impl/index_read.cpp:214-226 IO_FLAG_MMAP,
and the GPU backend's auto-paging, gpu/GpuIndex.h:70+).

TPU redesign. The packed-invlist layout stores each list's blocks
contiguously and lists in id order, so the sorted (query, probe) pairs of
a tile touch ONE contiguous block range (the ivf_scan_pallas layout
insight). Out-of-core search therefore never gathers: it slides a
fixed-size WINDOW of W consecutive blocks across the union of probed
ranges, skipping unprobed gaps,

    host memmap --(pinned numpy, worker thread)--> staging buffer
              --(async device_put)--> HBM window --(fused kernel)--> top-k

double-buffered so the host read + tunnel upload of window i+1 overlap
the Pallas scan of window i — the same pipeline shape as the measured
host-serving loop, with the reference's OngoingPrefetch role played by
the staging thread. Pair tiles whose block span straddles a window
boundary are scanned in BOTH windows with their range clamped to each,
and the per-pair top-k merged — so ANY nprobe / list-size distribution
works with one compiled kernel (all calls share the static shapes
(TB, PT, dp) x (W + CB, B, dp)).

The bf16 stream + exact-f32 refine precision model is unchanged from
`scan_invlists_fused`: the host store keeps a bf16 copy of the blocks
(streamed; half the tunnel bytes) and the f32 rows (refine gathers only
the nq * refine * k candidates at the end).

Capacity: HBM holds 2 windows + queries + results — independent of index
size. A 100M x 96d index (38 GB f32, 2.4x a v5e's HBM) searches on one
chip; see BENCHMARKS.md "out-of-core paged search".
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import distances as D

_BF16 = np.dtype(ml_dtypes.bfloat16)


# ---------------------------------------------------------------------------
# host-resident container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PagedInvLists:
    """Host-resident packed invlists (numpy or np.memmap block streams).

    data_bf16: (nblocks + 1, B, dp) bf16 — the scan stream, d zero-padded
        to a lane multiple so windows upload without per-window padding.
    data_f32:  (nblocks + 1, B, d) f32 — refine row store (gathered only
        for final candidates). May be None => refine re-scores from bf16.
    ids: (nblocks + 1, B) int32 (-1 padding), norms: (nblocks + 1, B) f32.
    list_block_start / list_nblocks: (nlist,) int64 host metadata.

    Mirrors PackedInvLists but lives OUTSIDE HBM; block NB is the dummy.
    """

    data_bf16: np.ndarray
    data_f32: Optional[np.ndarray]
    ids: np.ndarray
    norms: np.ndarray
    list_block_start: np.ndarray
    list_nblocks: np.ndarray
    d: int

    @property
    def nlist(self) -> int:
        return self.list_block_start.shape[0]

    @property
    def block_size(self) -> int:
        return self.data_bf16.shape[1]

    @property
    def nblocks(self) -> int:
        return self.data_bf16.shape[0] - 1

    @property
    def dp(self) -> int:
        return self.data_bf16.shape[2]

    @property
    def ntotal(self) -> int:
        return int((np.asarray(self.ids[:-1]) >= 0).sum()) \
            if self.nblocks < (1 << 16) else -1   # cheap only when small

    def nbytes_stream(self) -> int:
        return self.data_bf16.nbytes + self.ids.nbytes + self.norms.nbytes


_PAGED_META = "paged_meta.json"
_FILES = {
    "data_bf16": ("data_bf16.bin", _BF16),
    "data_f32": ("data_f32.bin", np.float32),
    "ids": ("ids.bin", np.int32),
    "norms": ("norms.bin", np.float32),
}


def create_paged_invlists(
    path: str,
    nlist: int,
    list_sizes: np.ndarray,
    d: int,
    block_size: int = 128,
    keep_f32: bool = True,
) -> PagedInvLists:
    """Allocate the on-disk layout for `list_sizes` rows per list and
    return writable memmaps (OnDiskInvertedLists::resize role). Rows are
    then filled streaming via `paged_add_chunk`."""
    os.makedirs(path, exist_ok=True)
    B = block_size
    dp = -(-d // 128) * 128
    sizes = np.asarray(list_sizes, np.int64)
    assert sizes.shape == (nlist,)
    nblk = -(-sizes // B)
    starts = np.zeros(nlist, np.int64)
    np.cumsum(nblk[:-1], out=starts[1:])
    nb_total = int(nblk.sum())
    starts[nblk == 0] = nb_total           # empty lists -> dummy block

    shapes = {
        "data_bf16": (nb_total + 1, B, dp),
        "data_f32": (nb_total + 1, B, d),
        "ids": (nb_total + 1, B),
        "norms": (nb_total + 1, B),
    }
    maps = {}
    for key, (fname, dt) in _FILES.items():
        if key == "data_f32" and not keep_f32:
            maps[key] = None
            continue
        mm = np.memmap(os.path.join(path, fname), mode="w+", dtype=dt,
                       shape=shapes[key])
        maps[key] = mm
    # padding slots must read as invalid everywhere
    maps["ids"][:] = -1
    meta = {"nlist": nlist, "d": d, "block_size": B, "dp": dp,
            "nb_total": nb_total, "keep_f32": keep_f32,
            "list_sizes": sizes.tolist()}
    with open(os.path.join(path, _PAGED_META), "w") as f:
        json.dump(meta, f)
    return PagedInvLists(
        data_bf16=maps["data_bf16"], data_f32=maps["data_f32"],
        ids=maps["ids"], norms=maps["norms"],
        list_block_start=starts, list_nblocks=nblk, d=d)


def open_paged_invlists(path: str, mode: str = "r") -> PagedInvLists:
    """mmap-load an on-disk paged index directory (IO_FLAG_MMAP role:
    host RAM proportional to touched pages, HBM independent of size)."""
    with open(os.path.join(path, _PAGED_META)) as f:
        meta = json.load(f)
    B, dp, d = meta["block_size"], meta["dp"], meta["d"]
    nb_total = meta["nb_total"]
    sizes = np.asarray(meta["list_sizes"], np.int64)
    nblk = -(-sizes // B)
    starts = np.zeros(len(sizes), np.int64)
    np.cumsum(nblk[:-1], out=starts[1:])
    starts[nblk == 0] = nb_total
    shapes = {
        "data_bf16": (nb_total + 1, B, dp),
        "data_f32": (nb_total + 1, B, d),
        "ids": (nb_total + 1, B),
        "norms": (nb_total + 1, B),
    }
    maps = {}
    for key, (fname, dt) in _FILES.items():
        fp = os.path.join(path, fname)
        if key == "data_f32" and not meta["keep_f32"]:
            maps[key] = None
            continue
        maps[key] = np.memmap(fp, mode=mode, dtype=dt, shape=shapes[key])
    return PagedInvLists(
        data_bf16=maps["data_bf16"], data_f32=maps["data_f32"],
        ids=maps["ids"], norms=maps["norms"],
        list_block_start=starts, list_nblocks=nblk, d=d)


def paged_add_chunk(
    pil: PagedInvLists,
    fill: np.ndarray,
    x: np.ndarray,
    xids: np.ndarray,
    assign: np.ndarray,
) -> None:
    """Scatter one chunk of rows into the on-disk layout.

    `fill` is the caller-held (nlist,) int64 per-list fill cursor
    (InvertedLists::add_entries role), updated in place. Rows are grouped
    by list on host (one argsort over the chunk) so each list's slice
    writes contiguously into the memmap."""
    B = pil.block_size
    d = pil.d
    assign = np.asarray(assign, np.int64)
    order = np.argsort(assign, kind="stable")
    a_s = assign[order]
    x_s = np.asarray(x, np.float32)[order]
    i_s = np.asarray(xids, np.int32)[order]
    # per-row destination slot = start*B + fill + rank-within-chunk
    uniq, first = np.unique(a_s, return_index=True)
    counts = np.diff(np.append(first, len(a_s)))
    rank = np.arange(len(a_s)) - np.repeat(first, counts)
    slot = (pil.list_block_start[a_s] * B + fill[a_s] + rank)
    fill[uniq] += counts
    bf = x_s.astype(_BF16)
    if pil.dp != d:
        bf = np.concatenate(
            [bf, np.zeros((len(bf), pil.dp - d), _BF16)], axis=1)
    pil.data_bf16.reshape(-1, pil.dp)[slot] = bf
    if pil.data_f32 is not None:
        pil.data_f32.reshape(-1, d)[slot] = x_s
    pil.ids.reshape(-1)[slot] = i_s
    pil.norms.reshape(-1)[slot] = (
        (x_s.astype(np.float64) ** 2).sum(-1).astype(np.float32))


# ---------------------------------------------------------------------------
# window planner
# ---------------------------------------------------------------------------

def _plan_windows(
    tile_bs: np.ndarray,      # (ntiles,) int64 first needed block per tile
    tile_be: np.ndarray,      # (ntiles,) int64 end block per tile
    W: int,                   # window width (blocks)
    TB: int,                  # tiles per kernel call
) -> Iterator[Tuple[int, int, int]]:
    """Yield (w0, ta, tb): scan tiles [ta, tb) against window
    [w0, w0 + W). Tiles are span-sorted (pairs sorted by list id =>
    tile spans are non-decreasing), so each window covers a contiguous
    tile range; a tile wider than its window reappears in later windows
    until its span is exhausted. Unprobed gaps are skipped by starting
    each window at the next uncovered tile's first block."""
    ntiles = len(tile_bs)
    t = 0
    # skip empty tiles (zero span)
    spans = tile_be - tile_bs
    while t < ntiles and spans[t] == 0:
        t += 1
    covered = 0            # blocks of tile t already scanned
    while t < ntiles:
        w0 = int(tile_bs[t] + covered)
        w1 = w0 + W
        # tiles fully or partially inside [w0, w1)
        tb = t
        while tb < ntiles and (spans[tb] == 0 or tile_bs[tb] < w1):
            tb += 1
        # split wide tile ranges into TB-sized batches on the same window
        ta = t
        while ta < tb:
            yield w0, ta, min(ta + TB, tb)
            ta += TB
        # advance: tiles whose end lies within this window are done
        nt = t
        while nt < tb and (spans[nt] == 0 or tile_be[nt] <= w1):
            nt += 1
        if nt == t:
            covered = w1 - int(tile_bs[t])     # tile t continues
        else:
            t = nt
            while t < ntiles and spans[t] == 0:
                t += 1
            # the new head tile may already be partially covered by THIS
            # window (its span started before w1) — resume past w1, never
            # re-covering blocks (duplicates would double candidates)
            covered = (max(0, w1 - int(tile_bs[t]))
                       if t < ntiles else 0)


# ---------------------------------------------------------------------------
# the paged scan
# ---------------------------------------------------------------------------

def _make_window_kernel(TB, PT, dp, B, W, CB, kp, similarity, RW,
                        max_chunks, interpret):
    """One compiled fused-scan over a (W + CB)-block window and TB tiles;
    identical inner loop to scan_invlists_fused (same _grouped_kernel)."""
    from .ivf_scan_pallas import _grouped_kernel
    import functools

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((1, PT, dp), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, PT, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, PT, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, PT, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, kp, PT), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, kp, PT), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CB, B, dp), jnp.bfloat16),
            pltpu.VMEM((2, CB, B), jnp.int32),
            pltpu.VMEM((2, CB, B), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    def kern(tile_bs_ref, tile_nb_ref, tile_cs_ref, qv_ref, qn_ref,
             ps_ref, pe_ref, data_hbm, ids_hbm, norms_hbm,
             outd_ref, outp_ref, dbuf, ibuf, nbuf, sems):
        _grouped_kernel(
            tile_bs_ref, tile_nb_ref, tile_cs_ref,
            qv_ref[0], qn_ref[0], ps_ref[0], pe_ref[0],
            data_hbm, ids_hbm, norms_hbm,
            outd_ref.at[0], outp_ref.at[0],
            dbuf, ibuf, nbuf, sems,
            k=kp, CB=CB, B=B, max_chunks=max_chunks,
            similarity=similarity, RW=RW,
        )

    @functools.partial(jax.jit, static_argnames=())
    def run(tile_bs, tile_nb, tile_cs, qv, qn, ps, pe, data, ids, norms):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((TB, kp, PT), jnp.float32),
                jax.ShapeDtypeStruct((TB, kp, PT), jnp.int32),
            ],
            interpret=interpret,
        )(tile_bs, tile_nb, tile_cs, qv, qn, ps, pe, data, ids, norms)

    return run


def upload_resident(pil: PagedInvLists, resident_blocks: int):
    """Upload the first `resident_blocks` of the stream to HBM once.

    The hot tier of the two-tier layout: windows that fall entirely
    inside the resident prefix are served by a device slice (no host
    transfer), windows beyond it stream as usual — the same hot/cold
    split as the GPU backend's paging threshold (GpuIndex.h:70+
    minPagedSize) applied to a prefix of the block stream."""
    rb = int(min(resident_blocks, pil.nblocks))
    data = np.zeros((rb, pil.block_size, pil.dp), _BF16)
    data[:] = pil.data_bf16[:rb]
    ids = np.asarray(pil.ids[:rb], np.int32)
    norms = np.asarray(pil.norms[:rb], np.float32)
    return (rb, jnp.asarray(data), jnp.asarray(ids), jnp.asarray(norms))


@functools.partial(jax.jit, static_argnames=("NBW",))
def _slice_resident(data, ids, norms, w0, NBW: int):
    d0 = lax.dynamic_slice(data, (w0, 0, 0),
                           (NBW, data.shape[1], data.shape[2]))
    i0 = lax.dynamic_slice(ids, (w0, 0), (NBW, ids.shape[1]))
    n0 = lax.dynamic_slice(norms, (w0, 0), (NBW, norms.shape[1]))
    return d0, i0, n0


@jax.jit
def _merge_tile_partials(md, mp, nd, np_, sel):
    """Merge a tile-batch's new per-pair top-k into the running per-tile
    results at rows `sel` (windows may revisit a tile)."""
    from . import topk as TK

    cd = md[sel]                                   # (TB, kp, PT)
    cp = mp[sel]
    # merge along the kp axis per (tile, pair-lane)
    a_d = cd.transpose(0, 2, 1).reshape(-1, cd.shape[1])
    a_p = cp.transpose(0, 2, 1).reshape(-1, cd.shape[1])
    b_d = nd.transpose(0, 2, 1).reshape(-1, nd.shape[1])
    b_p = np_.transpose(0, 2, 1).reshape(-1, nd.shape[1])
    g_d, g_p = TK.merge_topk(a_d, a_p, b_d, b_p, cd.shape[1],
                             similarity=False)
    g_d = g_d.reshape(cd.shape[0], cd.shape[2], cd.shape[1]).transpose(
        0, 2, 1)
    g_p = g_p.reshape(cd.shape[0], cd.shape[2], cd.shape[1]).transpose(
        0, 2, 1)
    return md.at[sel].set(g_d), mp.at[sel].set(g_p)


def scan_invlists_paged(
    xq,
    probes,
    pil: PagedInvLists,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    PT: int = 128,
    CB: int = 8,
    TB: int = 64,
    window_blocks: int = 8192,
    refine: int = 4,
    kp: int = 0,
    RW: int = 512,
    interpret: bool = False,
    resident=None,
    stats: Optional[dict] = None,
):
    """Search host-resident invlists bigger than HBM (module docstring).

    Semantics match `scan_invlists_fused` (same kernel, same bf16+refine
    precision model); capacity is bounded by HOST storage, not HBM.
    Returns (D (nq, k) f32, I (nq, k) int32 row ids, ndis).
    """
    similarity = D.is_similarity_metric(metric)
    xq = np.asarray(xq, np.float32)
    probes = np.asarray(probes)
    nq, d = xq.shape
    nprobe = probes.shape[1]
    B = pil.block_size
    dp = pil.dp
    W = int(window_blocks)
    NBW = W + CB                          # uploaded blocks per window

    kp = int(kp) if kp else max(k, min(2 * k, k + 6))
    if RW:
        RW = min(int(RW), CB * B)
        step = 1 if interpret else 128
        RW = (RW // step) * step
        while RW > 0 and (CB * B) % RW:
            RW -= step
        if 8 * kp > RW:
            RW = 0

    # ---- host: sort pairs by list, tile them ------------------------------
    npairs = nq * nprobe
    l_flat = probes.reshape(npairs).astype(np.int64)
    order = np.argsort(l_flat, kind="stable")
    ls = l_flat[order]
    pq_idx = order // nprobe
    valid = ls >= 0
    ls_safe = np.where(valid, ls, 0)
    sstart = np.cumsum(pil.list_nblocks) - pil.list_nblocks
    p_start = np.where(valid, sstart[ls_safe], 0)
    p_nb = np.where(valid, pil.list_nblocks[ls_safe], 0)
    p_end = p_start + p_nb

    ntiles = -(-npairs // PT)
    pad = ntiles * PT - npairs
    if pad:
        p_start = np.pad(p_start, (0, pad))
        p_end = np.pad(p_end, (0, pad))
        pq_idx = np.pad(pq_idx, (0, pad))

    qv = xq[pq_idx]
    if similarity:
        qn = np.zeros((len(qv), 1), np.float32)
    else:
        qn = (qv * qv).sum(1, keepdims=True).astype(np.float32)
    if dp != d:
        qv = np.concatenate(
            [qv, np.zeros((len(qv), dp - d), np.float32)], axis=1)

    ps_t = p_start.reshape(ntiles, PT).astype(np.int64)
    pe_t = p_end.reshape(ntiles, PT).astype(np.int64)
    width = pe_t - ps_t
    tile_bs = np.where(width > 0, ps_t, np.iinfo(np.int64).max).min(1)
    tile_be = np.where(width > 0, pe_t, 0).max(1)
    tile_bs = np.minimum(tile_bs, tile_be)

    qv_t = qv.astype(_BF16).reshape(ntiles, PT, dp)
    qn_t = qn.reshape(ntiles, PT, 1)

    ndis = int((np.where(l_flat >= 0,
                         pil.list_nblocks[np.maximum(l_flat, 0)],
                         0)).sum()) * B

    # ---- device: running per-tile merged results (+1 trash row: batch
    # padding rows scatter there so duplicate indices never clobber a
    # real tile — .at[].set with duplicates is last-writer-wins) --------
    md = jnp.full((ntiles + 1, kp, PT), jnp.inf, jnp.float32)
    mp = jnp.full((ntiles + 1, kp, PT), -1, jnp.int32)

    max_chunks = -(-NBW // CB) + 1
    kernel = _make_window_kernel(TB, PT, dp, B, W, CB, kp, similarity,
                                 RW, max_chunks, interpret)

    plan = list(_plan_windows(tile_bs, tile_be, W, TB))
    res_blocks = resident[0] if resident is not None else 0

    def _is_resident(w0: int) -> bool:
        return w0 + NBW <= res_blocks

    if stats is not None:
        stats["windows"] = len({w for w, _, _ in plan})
        stats["calls"] = len(plan)
        stats["bytes_uploaded"] = 0
        stats["windows_resident"] = len(
            {w for w, _, _ in plan if _is_resident(w)})

    # ---- staging thread: read + convert the next window -------------------
    def _stage(w0: int):
        """(data, ids, norms) numpy buffers for window [w0, w0 + W)."""
        NBLK = pil.nblocks
        end = min(w0 + W, NBLK)
        n_real = max(end - w0, 0)
        dbuf = np.zeros((NBW, B, dp), _BF16)
        ibuf = np.full((NBW, B), -1, np.int32)
        nbuf = np.zeros((NBW, B), np.float32)
        if n_real:
            dbuf[:n_real] = pil.data_bf16[w0:end]
            ibuf[:n_real] = pil.ids[w0:end]
            nbuf[:n_real] = pil.norms[w0:end]
        return dbuf, ibuf, nbuf

    stage_q: "queue.Queue" = queue.Queue(maxsize=2)
    windows = []
    for w0, ta, tb in plan:
        if not windows or windows[-1] != w0:
            windows.append(w0)
    # the staging thread feeds only the COLD windows; hot ones slice the
    # resident device prefix directly
    cold_windows = [w for w in windows if not _is_resident(w)]

    def _stager():
        for w0 in cold_windows:
            stage_q.put((w0, _stage(w0)))
        stage_q.put(None)

    thr = threading.Thread(target=_stager, daemon=True)
    thr.start()

    cur_w0 = None
    data_dev = ids_dev = norms_dev = None
    pi = 0
    while pi < len(plan):
        w0, ta, tb = plan[pi]
        if w0 != cur_w0:
            if _is_resident(w0):
                data_dev, ids_dev, norms_dev = _slice_resident(
                    resident[1], resident[2], resident[3],
                    jnp.int32(w0), NBW=NBW)
            else:
                item = stage_q.get()
                assert item is not None and item[0] == w0, \
                    "window plan drift"
                dbuf, ibuf, nbuf = item[1]
                data_dev = jnp.asarray(dbuf)     # async upload
                ids_dev = jnp.asarray(ibuf)
                norms_dev = jnp.asarray(nbuf)
                if stats is not None:
                    stats["bytes_uploaded"] += (
                        dbuf.nbytes + ibuf.nbytes + nbuf.nbytes)
            cur_w0 = w0
        nt = tb - ta
        # window-local tile scalars, clamped to the window
        bs = np.clip(tile_bs[ta:tb] - w0, 0, W)
        be = np.clip(tile_be[ta:tb] - w0, 0, W)
        t_bs = np.zeros(TB, np.int32)
        t_nb = np.zeros(TB, np.int32)
        t_bs[:nt] = bs
        t_nb[:nt] = be - bs
        t_nc = np.minimum(-(-t_nb // CB), max_chunks)
        t_cs = (np.cumsum(t_nc) - t_nc).astype(np.int32)
        qv_b = np.zeros((TB, PT, dp), _BF16)
        qn_b = np.zeros((TB, PT, 1), np.float32)
        ps_b = np.zeros((TB, PT, 1), np.int32)
        pe_b = np.zeros((TB, PT, 1), np.int32)
        qv_b[:nt] = qv_t[ta:tb]
        qn_b[:nt] = qn_t[ta:tb]
        ps_b[:nt, :, 0] = np.clip(ps_t[ta:tb] - w0, 0, W)
        pe_b[:nt, :, 0] = np.clip(pe_t[ta:tb] - w0, 0, W)
        outd, outp = kernel(
            jnp.asarray(t_bs), jnp.asarray(t_nb), jnp.asarray(t_cs),
            jnp.asarray(qv_b), jnp.asarray(qn_b),
            jnp.asarray(ps_b), jnp.asarray(pe_b),
            data_dev, ids_dev, norms_dev)
        # positions back to the GLOBAL stream; -1 stays -1
        outp = jnp.where(outp >= 0, outp + np.int32(w0) * B, -1)
        # real rows -> their tiles; padding rows -> the trash row
        sel_np = np.full(TB, ntiles, np.int32)
        sel_np[:nt] = np.arange(ta, ta + nt, dtype=np.int32)
        md, mp = _merge_tile_partials(md, mp, outd, outp,
                                      jnp.asarray(sel_np))
        pi += 1
    thr.join()

    # ---- unsort pairs, merge per query, refine ----------------------------
    outd = md[:-1].transpose(0, 2, 1).reshape(ntiles * PT, kp)
    outp = mp[:-1].transpose(0, 2, 1).reshape(ntiles * PT, kp)
    inv = np.argsort(order, kind="stable")
    pair_d = outd[jnp.asarray(inv)].reshape(nq, nprobe * kp)
    pair_p = outp[jnp.asarray(inv)].reshape(nq, nprobe * kp)

    R = max(min(refine * k, nprobe * kp), min(k, nprobe * kp)) \
        if refine and refine > 1 else min(k, nprobe * kp)
    nv, sel2 = lax.top_k(-pair_d, R)
    cand_p = np.asarray(jnp.take_along_axis(pair_p, sel2, axis=1))
    cand_d = np.asarray(-nv)

    if refine and refine > 1:
        # exact f32 re-score: gather ONLY the candidate rows from host
        safe = np.maximum(cand_p, 0)
        blk, lane = safe // B, safe % B
        store = pil.data_f32 if pil.data_f32 is not None else None
        if store is not None:
            rows = store[blk, lane]                       # (nq, R, d)
        else:
            rows = np.asarray(
                pil.data_bf16[blk, lane][..., :d], np.float32)
        rn = pil.norms[blk, lane]
        rows_d = jnp.asarray(rows, jnp.float32)
        xq_d = jnp.asarray(xq)
        ipx = jnp.einsum("qd,qrd->qr", xq_d, rows_d,
                         preferred_element_type=jnp.float32)
        if similarity:
            dis = -ipx
        else:
            qn2 = jnp.sum(xq_d * xq_d, axis=1, keepdims=True)
            dis = jnp.maximum(qn2 + jnp.asarray(rn) - 2.0 * ipx, 0.0)
        dis = jnp.where(jnp.asarray(cand_p) >= 0, dis, jnp.inf)
        kk = min(k, dis.shape[1])
        nv2, s3 = lax.top_k(-dis, kk)
        out_d = -nv2
        out_p = jnp.take_along_axis(jnp.asarray(cand_p), s3, axis=1)
    else:
        kk = min(k, cand_d.shape[1])
        out_d = jnp.asarray(cand_d[:, :kk])
        out_p = jnp.asarray(cand_p[:, :kk])
    if kk < k:
        out_d = jnp.pad(out_d, ((0, 0), (0, k - kk)),
                        constant_values=jnp.inf)
        out_p = jnp.pad(out_p, ((0, 0), (0, k - kk)),
                        constant_values=-1)

    # id lookup from the host store (tiny gather)
    out_p_np = np.asarray(out_p)
    safe = np.maximum(out_p_np, 0)
    ids_np = pil.ids[safe // B, safe % B]
    out_i = np.where(out_p_np >= 0, ids_np, -1).astype(np.int32)
    out_d = np.asarray(out_d)
    out_d = np.where(out_p_np >= 0, out_d, np.inf).astype(np.float32)
    if similarity:
        out_d = -out_d
    return out_d, out_i, ndis
