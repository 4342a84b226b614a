"""Pallas fused list-major IVF scan — the TPU kernel for high-nprobe /
large-batch IVF search (the role of the GPU backend's IVFInterleaved
two-pass scan, gpu/impl/IVFInterleaved.cu + IVFUtils.cu, redesigned for
the TPU memory system).

Why list-major: with nq queries probing nprobe lists each, a query-major
scan reads every probed list's blocks once PER (query, probe) pair —
nq*nprobe/nlist times each on average (156x redundant at the SIFT1M
benchmark point). Sorting the (query, probe) pairs by list id and tiling
them means one HBM read of a block feeds a (PT, B) MXU contraction for a
whole pair tile.

The layout insight that makes the kernel simple: packed invlists store
each list's blocks contiguously and lists in id order, so the pairs of a
sorted tile (covering lists l0..l1) touch ONE CONTIGUOUS RANGE of blocks
[stream_start[l0], stream_start[l1] + nblk[l1]). The kernel's inner loop
is therefore a double-buffered sequential DMA stream — no gather at all —
and each pair masks the stream to its own list's sub-range with two
scalar comparisons per (pair, block).

Per chunk of CB blocks:
    dis (PT, CB*B) = qnorm + bnorm - 2 * qv @ chunk^T      (one MXU dot)
    mask rows outside each pair's [pstart, pend) block range
    running per-pair top-k via k-step min-extraction        (VPU)

Precision model (measured on v5e): Mosaic lowers an f32 matmul to a
single-pass bf16 MXU product, which puts O(0.5%) noise on the inner
product — enough to scramble a top-10 at SIFT1M scale (recall 0.99 ->
0.91). So the kernel embraces bf16 on purpose — vectors stream as bf16
(HALF the DMA bytes; norms stay exact f32) and the caller re-scores the
merged top-(refine*k) candidate rows in exact f32 against the packed
storage before the final top-k, exactly like the FlatL2 bf16+refine
headline path. The kernel therefore returns stream POSITIONS
(block*B + lane), which both the refine gather and the id lookup use.

Output is per-pair top-k; the caller merges pairs per query, refines,
and maps positions to ids. Equivalence to the query-major
`scan_invlists` is tested in tests/test_ivf_pallas.py (interpret mode on
CPU, compiled on TPU).

Reference hot loop this replaces: faiss/IndexIVF.cpp:511-589
(search_preassigned's per-probe scan_codes) and IndexIVFFlat.cpp:130-196.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import distances as D


def _grouped_kernel(
    # scalar prefetch
    tile_bs_ref,       # (ntiles,) int32: first stream block of tile
    tile_nb_ref,       # (ntiles,) int32: number of stream blocks of tile
    tile_cs_ref,       # (ntiles,) int32: exclusive cumsum of chunk counts
    # tensor inputs
    qv_ref,            # (PT, d) VMEM bf16: tile's pair query vectors
    qn_ref,            # (PT, 1) VMEM f32: tile's pair query norms
    ps_ref,            # (PT, 1) VMEM int32: pair's list first stream block
    pe_ref,            # (PT, 1) VMEM int32: pair's list end stream block
    data_hbm,          # (nblocks+1+CB, B, d) bf16 HBM
    ids_hbm,           # (nblocks+1+CB, B) int32 HBM (-1 = padding slot)
    norms_hbm,         # (nblocks+1+CB, B) f32 HBM
    # outputs
    outd_ref,          # (k, PT) VMEM f32
    outp_ref,          # (k, PT) VMEM int32 stream positions
    # scratch
    dbuf,              # (2, CB, B, d) bf16 VMEM
    ibuf,              # (2, CB, B) int32 VMEM
    nbuf,              # (2, CB, B) f32 VMEM
    sems,              # DMA sems (2, 3)
    *,
    k: int,
    CB: int,
    B: int,
    max_chunks: int,
    similarity: bool = False,
    RW: int = 0,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    bs = tile_bs_ref[t]
    nb = tile_nb_ref[t]
    cs = tile_cs_ref[t]
    nchunks = jnp.minimum(lax.div(nb + CB - 1, CB), max_chunks)
    PT = qv_ref.shape[0]

    # DMA slots are assigned by GLOBAL chunk parity (cs + c), so a tile's
    # first chunk can be prefetched by the PREVIOUS tile's epilogue — the
    # cold per-tile DMA wait otherwise serializes every tile boundary
    # (tiles average only a few chunks at small nprobe, so that cold wait
    # was ~1/3 of all stream DMAs).
    def start_dma_at(off, slot):
        pltpu.make_async_copy(
            data_hbm.at[pl.ds(off, CB)], dbuf.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(off, CB)], ibuf.at[slot], sems.at[slot, 1]
        ).start()
        pltpu.make_async_copy(
            norms_hbm.at[pl.ds(off, CB)], nbuf.at[slot], sems.at[slot, 2]
        ).start()

    def start_dma(c, slot):
        # contiguous CB-block slice of the stream starting at bs + c*CB
        start_dma_at(bs + c * CB, slot)

    def slot_of(c):
        return lax.rem(cs + c, 2)

    def start_next_tile(slot):
        # prefetch tile t+1's first chunk; skipped for empty successors
        # (they issue no DMAs; an empty tile forwards the start itself).
        # Index clamped: both & operands evaluate, so a bare t+1 would
        # read past the scalar array on the last tile.
        t_next = jnp.minimum(t + 1, nt - 1)

        @pl.when((t + 1 < nt) & (tile_nb_ref[t_next] > 0))
        def _():
            start_dma_at(tile_bs_ref[t_next], slot)

    def wait_dma(c, slot):
        off = bs + c * CB
        pltpu.make_async_copy(
            data_hbm.at[pl.ds(off, CB)], dbuf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(off, CB)], ibuf.at[slot], sems.at[slot, 1]
        ).wait()
        pltpu.make_async_copy(
            norms_hbm.at[pl.ds(off, CB)], nbuf.at[slot], sems.at[slot, 2]
        ).wait()

    @pl.when((t == 0) & (nchunks > 0))
    def _():
        start_dma(0, slot_of(0))

    @pl.when(nchunks == 0)
    def _():
        # empty tile: forward the cross-tile prefetch (parity unchanged:
        # this tile contributes no chunks to the global count)
        start_next_tile(slot_of(0))

    qv = qv_ref[:]                                    # (PT, d) bf16
    qn = qn_ref[:]                                    # (PT, 1) f32
    pstart = ps_ref[:]                                # (PT, 1)
    pend = pe_ref[:]                                  # (PT, 1)

    def chunk_body(c, carry):
        bd, bp = carry                                # (PT, k) each
        slot = slot_of(c)

        @pl.when(c + 1 < nchunks)
        def _():
            start_dma(c + 1, slot_of(c + 1))

        @pl.when(c + 1 == nchunks)
        def _():
            start_next_tile(slot_of(c + 1))

        wait_dma(c, slot)
        chunk = dbuf[slot]
        if chunk.dtype != jnp.bfloat16:
            # int8/uint8 stream (HALF the DMA bytes of bf16): codes cast
            # exactly to bf16; the dequant affine is folded into the
            # caller's query transform (<q,x> = <q,min> + <q*scale, c>),
            # so the kernel body is otherwise unchanged. Mosaic has no
            # direct u8->bf16 (or u8->f32) cast — route through i32
            # (verified on v5e; interpret mode accepts all routes).
            chunk = (chunk.astype(jnp.int32).astype(jnp.float32)
                     .astype(jnp.bfloat16))
        chunk = chunk.reshape(CB * B, qv.shape[1])
        vids = ibuf[slot].reshape(1, CB * B)
        vnorm = nbuf[slot].reshape(1, CB * B)
        ip = jax.lax.dot_general(
            qv, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (PT, CB*B) f32
        if similarity:
            # qn carries the folded <q, min> offset (0 for raw storage)
            dis = -ip - qn
        else:
            dis = jnp.maximum(qn + vnorm - 2.0 * ip, 0.0)

        # stream position of each lane; mask: the lane's block must lie
        # in the pair's list range and hold a real row (ids >= 0)
        lane = lax.broadcasted_iota(jnp.int32, (1, CB * B), 1)
        blk = bs + c * CB + lane // B
        ok = (blk >= pstart) & (blk < pend) & (vids >= 0)
        dis = jnp.where(ok, dis, jnp.inf)
        pos = jnp.broadcast_to((bs + c * CB) * B + lane, dis.shape)

        if RW:
            # lane-min reservoir fold (see ops/flat_knn_pallas.py): 4 VPU
            # ops per score instead of k rounds of min-extraction PER
            # CHUNK — the extraction runs once per tile, after the loop.
            # Lane collisions can drop a true top-i candidate with
            # p ~ C(k,2)/RW per pair; the caller's refine absorbs it.
            for g in range(CB * B // RW):
                sub = dis[:, g * RW:(g + 1) * RW]
                sp = pos[:, g * RW:(g + 1) * RW]
                upd = sub < bd
                bd = jnp.where(upd, sub, bd)
                bp = jnp.where(upd, sp, bp)
            return bd, bp

        # merge chunk into the running per-pair top-k: k rounds of
        # min-extraction over (PT, k + CB*B) (WarpSelect's role; argmin ->
        # one-hot dot keeps everything on the VPU, no dynamic gathers)
        cd = jnp.concatenate([bd, dis], axis=1)
        ci = jnp.concatenate([bp, pos], axis=1)
        # pad the lane dim to a 128 multiple with +inf/-1 so reductions
        # never see Mosaic's lane padding
        Wp = (-cd.shape[1]) % 128
        if Wp:
            cd = jnp.concatenate(
                [cd, jnp.full((PT, Wp), jnp.inf, cd.dtype)], axis=1)
            ci = jnp.concatenate(
                [ci, jnp.full((PT, Wp), -1, ci.dtype)], axis=1)
        W = cd.shape[1]
        lanes = lax.broadcasted_iota(jnp.int32, (PT, W), 1)
        nd = []
        npos = []
        for _ in range(k):
            val = jnp.min(cd, axis=1, keepdims=True)          # (PT, 1)
            sel = jnp.argmin(cd, axis=1)                      # (PT,)
            onehot = lanes == sel[:, None]
            pv = jnp.sum(jnp.where(onehot, ci, 0), axis=1)
            nd.append(val[:, 0])
            npos.append(pv)
            cd = jnp.where(onehot, jnp.inf, cd)
        bd = jnp.stack(nd, axis=1)
        bp = jnp.stack(npos, axis=1)
        bp = jnp.where(jnp.isinf(bd), -1, bp)
        return bd, bp

    cw = RW if RW else k
    init = (
        jnp.full((PT, cw), jnp.inf, jnp.float32),
        jnp.full((PT, cw), -1, jnp.int32),
    )
    bd, bp = lax.fori_loop(0, nchunks, chunk_body, init)
    if RW:
        # ONE k-round min-extraction over the (PT, RW) reservoir
        lanes = lax.broadcasted_iota(jnp.int32, (PT, RW), 1)
        cd, ci = bd, bp
        nd, npos = [], []
        for _ in range(k):
            val = jnp.min(cd, axis=1, keepdims=True)
            sel = jnp.argmin(cd, axis=1)
            onehot = lanes == sel[:, None]
            pv = jnp.sum(jnp.where(onehot, ci, 0), axis=1)
            nd.append(val[:, 0])
            npos.append(pv)
            cd = jnp.where(onehot, jnp.inf, cd)
        bd = jnp.stack(nd, axis=1)
        bp = jnp.stack(npos, axis=1)
        bp = jnp.where(jnp.isinf(bd), -1, bp)
    # outputs are stored (k, PT): the lane dimension must stay 128-aligned
    # (Mosaic rejects k-wide lane slices); callers transpose back in XLA
    outd_ref[:] = bd.T
    outp_ref[:] = bp.T


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "PT", "CB", "refine", "kp", "RW",
                     "interpret"),
)
def scan_invlists_fused(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    invlists,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    PT: int = 128,
    CB: int = 8,
    refine: int = 4,
    kp: int = 0,
    RW: int = 512,
    interpret: bool = False,
):
    """List-major fused IVF scan (see module docstring).

    Args:
      xq: (nq, d) queries, d a multiple of 128. probes: (nq, nprobe)
        int32 (-1 entries are skipped). invlists: PackedInvLists
        (raw-vector storage). refine: exact-f32 re-rank width multiplier
        (top refine*k merged bf16 candidates are re-scored; refine=0
        trusts the bf16 distances). RW: in-kernel reservoir width
        (multiple of 128 dividing CB*block_size; 0 = legacy per-chunk
        k-round extraction — no lane-collision loss but k VPU extraction
        rounds EVERY chunk instead of once per tile).
    Returns (D, I, ndis): per-query top-k over the probed lists with
    exact f32 distances (refine > 0).
    """
    nq, d = xq.shape
    # Mosaic requires 128-aligned minor-dim DMA slices: zero-pad d for
    # the bf16 stream (zeros don't change inner products; the f32 refine
    # uses the original d-dim storage)
    dp = -(-d // 128) * 128
    nprobe = probes.shape[1]
    B = invlists.block_size
    if B % 128 and not interpret:
        # Mosaic can't lane-collapse a (CB, B<128) reshape; pack with
        # block_size=128 (the default) for the fused path
        raise ValueError(f"fused scan requires block_size % 128 == 0 "
                         f"(got {B})")
    NB = invlists.nblocks
    nlist = invlists.nlist
    similarity = D.is_similarity_metric(metric)
    xq = xq.astype(jnp.float32)
    # default per-pair width: a bit above k so the bf16 phase keeps every
    # true top-k candidate for the refine (measured on v5e, SIFT1M
    # IVF4096 np=16: kp=k -> recall 0.9785, kp=1.6k -> 0.9992 at -12% QPS)
    kp = int(kp) if kp else max(k, min(2 * k, k + 6))
    if RW:
        # largest width <= requested that divides CB*B and keeps the
        # lane dim 128-aligned (alignment is moot in interpret mode)
        RW = min(int(RW), CB * B)
        step = 1 if interpret else 128
        RW = (RW // step) * step
        while RW > 0 and (CB * B) % RW:
            RW -= step
        if 8 * kp > RW:
            # a reservoir under ~8x the extraction width loses too many
            # top-kp candidates to lane collisions (p ~ C(kp,2)/RW);
            # fall back to the exact per-chunk epilogue
            RW = 0
    npairs = nq * nprobe

    # SQ8 storage: uint8 codes + per-dim affine (see PackedInvListsSQ8).
    # The dequant folds into the queries, so the kernel streams raw codes
    # at HALF the bf16 byte rate; norms stay exact f32.
    sq_bias = getattr(invlists, "sq_bias", None)
    is_sq8 = sq_bias is not None
    if is_sq8:
        sq_scale = invlists.sq_scale                 # (d,)
        qconst = xq @ sq_bias                        # (nq,) f32 exact

    nblk = invlists.list_nblocks                     # (nlist,)
    # stream starts: contiguous cumulative block offsets (identical to
    # list_block_start except empty lists, whose start points at the
    # dummy block; zero-width ranges mask them out anyway)
    sstart = jnp.cumsum(nblk) - nblk                 # (nlist,)

    # ---- sort pairs by list id -> contiguous tile block ranges ----------
    l_flat = probes.reshape(npairs).astype(jnp.int32)
    order = jnp.argsort(l_flat)
    ls = l_flat[order]                               # sorted list ids
    pq_idx = order // nprobe                         # pair's query row
    valid_pair = ls >= 0
    ls_safe = jnp.where(valid_pair, ls, 0)
    p_start = jnp.where(valid_pair, sstart[ls_safe], 0)
    p_nb = jnp.where(valid_pair, nblk[ls_safe], 0)
    p_end = p_start + p_nb

    ntiles = -(-npairs // PT)
    pad = ntiles * PT - npairs
    if pad:
        # padded pairs: zero-width range, query row 0
        p_start = jnp.pad(p_start, (0, pad))
        p_end = jnp.pad(p_end, (0, pad))
        pq_idx = jnp.pad(pq_idx, (0, pad))

    qv = xq[pq_idx]                                  # (npairs_pad, d)
    if is_sq8:
        # fold the dequant affine into the query side:
        #   <q, x> = <q, bias> + <q*scale, codes>
        qv_eff = qv * sq_scale[None, :]
        if similarity:
            qn = qconst[pq_idx][:, None]             # offset, see kernel
        else:
            qn = (jnp.sum(qv * qv, axis=1, keepdims=True)
                  - 2.0 * qconst[pq_idx][:, None])
        qv = qv_eff
    elif similarity:
        qn = jnp.zeros((qv.shape[0], 1), jnp.float32)
    else:
        qn = jnp.sum(qv * qv, axis=1, keepdims=True)

    ps_t = p_start.reshape(ntiles, PT, 1).astype(jnp.int32)
    pe_t = p_end.reshape(ntiles, PT, 1).astype(jnp.int32)
    if dp != d:
        qv = jnp.pad(qv, ((0, 0), (0, dp - d)))
    qv_t = qv.astype(jnp.bfloat16).reshape(ntiles, PT, dp)
    qn_t = qn.reshape(ntiles, PT, 1)

    # tile block range: [min pstart, max pend) over real pairs
    ps2 = ps_t[:, :, 0]
    pe2 = pe_t[:, :, 0]
    width = pe2 - ps2
    tile_bs = jnp.min(jnp.where(width > 0, ps2, NB), axis=1)
    tile_be = jnp.max(jnp.where(width > 0, pe2, 0), axis=1)
    tile_bs = jnp.minimum(tile_bs, tile_be)          # empty tile -> 0 len
    tile_nb = tile_be - tile_bs
    max_chunks = int(-(-NB // CB)) + 1
    # exclusive cumsum of per-tile chunk counts: global chunk parity for
    # the cross-tile DMA slot scheme (must mirror the kernel's nchunks)
    tile_nc = jnp.minimum((tile_nb + CB - 1) // CB, max_chunks)
    tile_cs = (jnp.cumsum(tile_nc) - tile_nc).astype(jnp.int32)

    # ndis: rows scanned incl. block padding (IndexIVFStats.ndis analog)
    ndis = jnp.sum(jnp.where(l_flat >= 0,
                             nblk[jnp.maximum(l_flat, 0)], 0)) * B

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
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
            pltpu.VMEM((2, CB, B, dp),
                       jnp.uint8 if is_sq8 else jnp.bfloat16),
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

    # pad the block stream so a full CB chunk past the end stays in bounds
    data_f32 = invlists.data
    if is_sq8:
        data = jnp.pad(data_f32, ((0, CB), (0, 0), (0, dp - d)))
    else:
        data = jnp.pad(data_f32.astype(jnp.bfloat16),
                       ((0, CB), (0, 0), (0, dp - d)))
    ids = jnp.pad(invlists.ids, ((0, CB), (0, 0)), constant_values=-1)
    norms = jnp.pad(invlists.norms, ((0, CB), (0, 0)))

    outd, outp = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, kp, PT), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, kp, PT), jnp.int32),
        ],
        interpret=interpret,
    )(tile_bs.astype(jnp.int32), tile_nb.astype(jnp.int32), tile_cs,
      qv_t, qn_t, ps_t, pe_t, data, ids, norms)

    # ---- un-sort pairs, merge per query ----------------------------------
    outd = outd.transpose(0, 2, 1).reshape(ntiles * PT, kp)
    outp = outp.transpose(0, 2, 1).reshape(ntiles * PT, kp)
    # un-sort with an inverse-permutation GATHER (a scatter here costs
    # more than the whole kernel on TPU)
    inv = jnp.argsort(order)
    pair_d = outd[inv].reshape(nq, nprobe * kp)
    pair_p = outp[inv].reshape(nq, nprobe * kp)

    ids_flat = invlists.ids.reshape(-1)              # (nblocks+1)*B
    if refine and refine > 1:
        R = max(min(refine * k, nprobe * kp), min(k, nprobe * kp))
        nv, sel = lax.top_k(-pair_d, R)
        cand_p = jnp.take_along_axis(pair_p, sel, axis=1)    # (nq, R)
        safe_p = jnp.maximum(cand_p, 0)
        # exact f32 re-score against the packed storage (SQ8: dequantized)
        rows = data_f32.reshape(-1, d)[safe_p]               # (nq, R, d)
        if is_sq8:
            rows = (rows.astype(jnp.float32) * sq_scale[None, None, :]
                    + sq_bias[None, None, :])
        ipx = jnp.einsum("qd,qrd->qr", xq, rows,
                         preferred_element_type=jnp.float32)
        if similarity:
            dis = -ipx
        else:
            rn = invlists.norms.reshape(-1)[safe_p]
            qn2 = jnp.sum(xq * xq, axis=1, keepdims=True)
            dis = jnp.maximum(qn2 + rn - 2.0 * ipx, 0.0)
        dis = jnp.where(cand_p >= 0, dis, jnp.inf)
        kk = min(k, dis.shape[1])
        nv2, sel2 = lax.top_k(-dis, kk)
        out_d = -nv2
        out_p = jnp.take_along_axis(cand_p, sel2, axis=1)
        if kk < k:
            out_d = jnp.pad(out_d, ((0, 0), (0, k - kk)),
                            constant_values=jnp.inf)
            out_p = jnp.pad(out_p, ((0, 0), (0, k - kk)),
                            constant_values=-1)
    else:
        kk = min(k, pair_d.shape[1])
        nv, sel = lax.top_k(-pair_d, kk)
        out_d = -nv
        out_p = jnp.take_along_axis(pair_p, sel, axis=1)
        if kk < k:
            out_d = jnp.pad(out_d, ((0, 0), (0, k - kk)),
                            constant_values=jnp.inf)
            out_p = jnp.pad(out_p, ((0, 0), (0, k - kk)),
                            constant_values=-1)
    out_i = jnp.where(out_p >= 0, ids_flat[jnp.maximum(out_p, 0)], -1)
    out_d = jnp.where(out_p >= 0, out_d, jnp.inf)
    if similarity:
        out_d = -out_d                 # back to user-facing (descending)
    return out_d, out_i, ndis


# ---------------------------------------------------------------------------
# 2-D grid schedule: (pair-tile, chunk) both in the Pallas grid, Mosaic
# auto-pipelines the chunk block DMA (the schedule that won the flat
# kernel its best occupancy). The manual-DMA kernel above keeps the
# general case (unbounded per-tile chunk counts); this one trades a
# static per-tile chunk bound `maxc` for deeper, compiler-managed
# pipelining — multiple chunk fetches in flight across grid steps, so
# the ~99% idle HBM the round-3 analysis measured gets used.
# ---------------------------------------------------------------------------

def _grid2d_kernel(
    tile_c0_ref,       # (ntiles,) int32: tile's first CB-aligned chunk
    qv_ref,            # (1, PT, dp) bf16
    qn_ref,            # (1, PT, 1) f32
    ps_ref,            # (1, PT, 1) int32 pair list-start (block units)
    pe_ref,            # (1, PT, 1) int32 pair list-end
    data_ref,          # (1, CB, B, dp) bf16 — auto-fetched chunk
    ids_ref,           # (1, CB, B) int32
    norms_ref,         # (1, CB, B) f32
    outd_ref,          # (1, kp, PT) f32
    outp_ref,          # (1, kp, PT) int32
    rv,                # (PT, RW) f32 scratch reservoir values
    rp,                # (PT, RW) int32 scratch reservoir positions
    *,
    kp: int,
    CB: int,
    B: int,
    RW: int,
    similarity: bool,
):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    t = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        rv[:] = jnp.full(rv.shape, jnp.inf, jnp.float32)
        rp[:] = jnp.full(rp.shape, -1, jnp.int32)

    qv = qv_ref[0]
    qn = qn_ref[0]
    pstart = ps_ref[0]
    pend = pe_ref[0]
    chunk = data_ref[0]
    if chunk.dtype != jnp.bfloat16:
        chunk = (chunk.astype(jnp.int32).astype(jnp.float32)
                 .astype(jnp.bfloat16))
    chunk = chunk.reshape(CB * B, qv.shape[1])
    vids = ids_ref[0].reshape(1, CB * B)
    vnorm = norms_ref[0].reshape(1, CB * B)
    ip = jax.lax.dot_general(
        qv, chunk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (PT, CB*B)
    if similarity:
        dis = -ip - qn
    else:
        dis = jnp.maximum(qn + vnorm - 2.0 * ip, 0.0)

    # tile_c0 is in CB-chunk units (see wrapper); block index of lane 0
    base_blk = (tile_c0_ref[t] + c) * CB
    lane = lax.broadcasted_iota(jnp.int32, (1, CB * B), 1)
    blk = base_blk + lane // B
    ok = (blk >= pstart) & (blk < pend) & (vids >= 0)
    dis = jnp.where(ok, dis, jnp.inf)
    pos = jnp.broadcast_to(base_blk * B + lane, dis.shape)

    av, ap = rv[:], rp[:]
    for g in range(CB * B // RW):
        sub = dis[:, g * RW:(g + 1) * RW]
        sp = pos[:, g * RW:(g + 1) * RW]
        upd = sub < av
        av = jnp.where(upd, sub, av)
        ap = jnp.where(upd, sp, ap)
    rv[:] = av
    rp[:] = ap

    @pl.when(c == nc - 1)
    def _():
        # one kp-round min-extraction per tile
        lanes = lax.broadcasted_iota(jnp.int32, (av.shape[0], RW), 1)
        cd, ci = rv[:], rp[:]
        nd, npos = [], []
        for _ in range(kp):
            val = jnp.min(cd, axis=1, keepdims=True)
            sel = jnp.argmin(cd, axis=1)
            onehot = lanes == sel[:, None]
            pv = jnp.sum(jnp.where(onehot, ci, 0), axis=1)
            nd.append(val[:, 0])
            npos.append(pv)
            cd = jnp.where(onehot, jnp.inf, cd)
        bd = jnp.stack(nd, axis=1)
        bp = jnp.stack(npos, axis=1)
        outd_ref[0] = bd.T
        outp_ref[0] = jnp.where(jnp.isinf(bd), -1, bp).T


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "PT", "CB", "refine", "kp", "RW",
                     "maxc", "interpret"),
)
def scan_invlists_fused_grid(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    invlists,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    maxc: int,
    PT: int = 128,
    CB: int = 8,
    refine: int = 4,
    kp: int = 0,
    RW: int = 512,
    interpret: bool = False,
):
    """2-D grid fused scan (see header above). `maxc` is the STATIC
    per-tile chunk bound: every tile runs maxc chunk steps with ranges
    masked to its own lists — callers compute it from the probe config
    (`grid2d_maxc`) and it recompiles only when it changes. Same
    returns as `scan_invlists_fused`."""
    nq, d = xq.shape
    dp = -(-d // 128) * 128
    nprobe = probes.shape[1]
    B = invlists.block_size
    if B % 128 and not interpret:
        raise ValueError("fused scan requires block_size % 128 == 0")
    NB = invlists.nblocks
    nlist = invlists.nlist
    similarity = D.is_similarity_metric(metric)
    xq = xq.astype(jnp.float32)
    kp = int(kp) if kp else max(k, min(2 * k, k + 6))
    RW = min(int(RW), CB * B)
    step = 1 if interpret else 128
    RW = (RW // step) * step
    while RW > 0 and (CB * B) % RW:
        RW -= step
    npairs = nq * nprobe

    sq_bias = getattr(invlists, "sq_bias", None)
    is_sq8 = sq_bias is not None
    if is_sq8:
        sq_scale = invlists.sq_scale
        qconst = xq @ sq_bias

    nblk = invlists.list_nblocks
    sstart = jnp.cumsum(nblk) - nblk

    l_flat = probes.reshape(npairs).astype(jnp.int32)
    order = jnp.argsort(l_flat)
    ls = l_flat[order]
    pq_idx = order // nprobe
    valid_pair = ls >= 0
    ls_safe = jnp.where(valid_pair, ls, 0)
    p_start = jnp.where(valid_pair, sstart[ls_safe], 0)
    p_nb = jnp.where(valid_pair, nblk[ls_safe], 0)
    p_end = p_start + p_nb

    ntiles = -(-npairs // PT)
    pad = ntiles * PT - npairs
    if pad:
        p_start = jnp.pad(p_start, (0, pad))
        p_end = jnp.pad(p_end, (0, pad))
        pq_idx = jnp.pad(pq_idx, (0, pad))

    qv = xq[pq_idx]
    if is_sq8:
        qv_eff = qv * sq_scale[None, :]
        if similarity:
            qn = qconst[pq_idx][:, None]
        else:
            qn = (jnp.sum(qv * qv, axis=1, keepdims=True)
                  - 2.0 * qconst[pq_idx][:, None])
        qv = qv_eff
    elif similarity:
        qn = jnp.zeros((qv.shape[0], 1), jnp.float32)
    else:
        qn = jnp.sum(qv * qv, axis=1, keepdims=True)

    ps_t = p_start.reshape(ntiles, PT, 1).astype(jnp.int32)
    pe_t = p_end.reshape(ntiles, PT, 1).astype(jnp.int32)
    if dp != d:
        qv = jnp.pad(qv, ((0, 0), (0, dp - d)))
    qv_t = qv.astype(jnp.bfloat16).reshape(ntiles, PT, dp)
    qn_t = qn.reshape(ntiles, PT, 1)

    ps2 = ps_t[:, :, 0]
    pe2 = pe_t[:, :, 0]
    width = pe2 - ps2
    tile_bs = jnp.min(jnp.where(width > 0, ps2, NB), axis=1)
    tile_be = jnp.max(jnp.where(width > 0, pe2, 0), axis=1)
    tile_bs = jnp.minimum(tile_bs, tile_be)
    # CB-aligned chunk start; ranges the static maxc cannot cover are
    # TRUNCATED from the far end (the max_codes budget semantics) —
    # callers size maxc so this truncates only pathological skew
    tile_c0 = (tile_bs // CB).astype(jnp.int32)

    ndis = jnp.sum(jnp.where(l_flat >= 0,
                             nblk[jnp.maximum(l_flat, 0)], 0)) * B

    # pad the stream so index maxc*CB past any tile start stays in bounds
    data_f32 = invlists.data
    pad_blocks = maxc * CB + CB
    if is_sq8:
        data = jnp.pad(data_f32, ((0, pad_blocks), (0, 0), (0, dp - d)))
    else:
        data = jnp.pad(data_f32.astype(jnp.bfloat16),
                       ((0, pad_blocks), (0, 0), (0, dp - d)))
    ids = jnp.pad(invlists.ids, ((0, pad_blocks), (0, 0)),
                  constant_values=-1)
    norms = jnp.pad(invlists.norms, ((0, pad_blocks), (0, 0)))
    # view in CB-chunk granularity for the BlockSpec
    ncb = data.shape[0] // CB
    data = data[:ncb * CB].reshape(ncb, CB, B, dp)
    ids_r = ids[:ncb * CB].reshape(ncb, CB, B)
    norms_r = norms[:ncb * CB].reshape(ncb, CB, B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles, maxc),
        in_specs=[
            pl.BlockSpec((1, PT, dp), lambda t, c, c0: (t, 0, 0)),
            pl.BlockSpec((1, PT, 1), lambda t, c, c0: (t, 0, 0)),
            pl.BlockSpec((1, PT, 1), lambda t, c, c0: (t, 0, 0)),
            pl.BlockSpec((1, PT, 1), lambda t, c, c0: (t, 0, 0)),
            pl.BlockSpec((1, CB, B, dp),
                         lambda t, c, c0: (c0[t] + c, 0, 0, 0)),
            pl.BlockSpec((1, CB, B),
                         lambda t, c, c0: (c0[t] + c, 0, 0)),
            pl.BlockSpec((1, CB, B),
                         lambda t, c, c0: (c0[t] + c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, kp, PT), lambda t, c, c0: (t, 0, 0)),
            pl.BlockSpec((1, kp, PT), lambda t, c, c0: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((PT, RW), jnp.float32),
            pltpu.VMEM((PT, RW), jnp.int32),
        ],
    )

    kern = functools.partial(
        _grid2d_kernel, kp=kp, CB=CB, B=B, RW=RW, similarity=similarity)

    outd, outp = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, kp, PT), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, kp, PT), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tile_c0, qv_t, qn_t, ps_t, pe_t, data, ids_r, norms_r)

    outd = outd.transpose(0, 2, 1).reshape(ntiles * PT, kp)
    outp = outp.transpose(0, 2, 1).reshape(ntiles * PT, kp)
    inv = jnp.argsort(order)
    pair_d = outd[inv].reshape(nq, nprobe * kp)
    pair_p = outp[inv].reshape(nq, nprobe * kp)

    ids_flat = invlists.ids.reshape(-1)
    if refine and refine > 1:
        R = max(min(refine * k, nprobe * kp), min(k, nprobe * kp))
        nv, sel = lax.top_k(-pair_d, R)
        cand_p = jnp.take_along_axis(pair_p, sel, axis=1)
        safe_p = jnp.maximum(cand_p, 0)
        rows = data_f32.reshape(-1, d)[safe_p]
        if is_sq8:
            rows = (rows.astype(jnp.float32) * sq_scale[None, None, :]
                    + sq_bias[None, None, :])
        ipx = jnp.einsum("qd,qrd->qr", xq, rows,
                         preferred_element_type=jnp.float32)
        if similarity:
            dis = -ipx
        else:
            rn = invlists.norms.reshape(-1)[safe_p]
            qn2 = jnp.sum(xq * xq, axis=1, keepdims=True)
            dis = jnp.maximum(qn2 + rn - 2.0 * ipx, 0.0)
        dis = jnp.where(cand_p >= 0, dis, jnp.inf)
        kk = min(k, dis.shape[1])
        nv2, sel2 = lax.top_k(-dis, kk)
        out_d = -nv2
        out_p = jnp.take_along_axis(cand_p, sel2, axis=1)
    else:
        kk = min(k, pair_d.shape[1])
        nv, sel = lax.top_k(-pair_d, kk)
        out_d = -nv
        out_p = jnp.take_along_axis(pair_p, sel, axis=1)
    if kk < k:
        out_d = jnp.pad(out_d, ((0, 0), (0, k - kk)),
                        constant_values=jnp.inf)
        out_p = jnp.pad(out_p, ((0, 0), (0, k - kk)),
                        constant_values=-1)
    out_i = jnp.where(out_p >= 0, ids_flat[jnp.maximum(out_p, 0)], -1)
    out_d = jnp.where(out_p >= 0, out_d, jnp.inf)
    if similarity:
        out_d = -out_d
    return out_d, out_i, ndis


def grid2d_maxc(invlists, probes_np, PT: int = 128, CB: int = 8,
                slack: int = 1) -> int:
    """Static per-tile chunk bound for `scan_invlists_fused_grid`: the
    max CB-chunk span over the pair tiles of THIS probe layout, host-
    computed (cheap ints). Buckets to the next power of two so repeated
    batches reuse one compile."""
    probes_np = np.asarray(probes_np)
    nblk = np.asarray(invlists.list_nblocks)
    sstart = np.cumsum(nblk) - nblk
    npairs = probes_np.size
    l_flat = probes_np.reshape(-1).astype(np.int64)
    order = np.argsort(l_flat, kind="stable")
    ls = l_flat[order]
    valid = ls >= 0
    lss = np.where(valid, ls, 0)
    p_start = np.where(valid, sstart[lss], 0)
    p_end = p_start + np.where(valid, nblk[lss], 0)
    ntiles = -(-npairs // PT)
    pad = ntiles * PT - npairs
    if pad:
        p_start = np.pad(p_start, (0, pad))
        p_end = np.pad(p_end, (0, pad))
    ps = p_start.reshape(ntiles, PT)
    pe = p_end.reshape(ntiles, PT)
    w = pe - ps
    bs = np.where(w > 0, ps, np.iinfo(np.int64).max).min(1)
    be = np.where(w > 0, pe, 0).max(1)
    bs = np.minimum(bs, be)
    c0 = bs // CB
    spans = np.maximum(be - c0 * CB, 0)
    mc = int(-(-spans.max(initial=1) // CB)) + slack
    p2 = 1
    while p2 < mc:
        p2 *= 2
    return p2
