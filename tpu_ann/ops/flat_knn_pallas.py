"""Pallas fused flat k-NN — brute-force scan with the top-k reduction
fused into the GEMM's VMEM epilogue.

Role: the exact-search hot loop (faiss utils/distances.cpp:885
`knn_L2sqr` / :1061 `knn_inner_product`, and the GPU backend's bfKnn +
warp-select two-pass, gpu/impl/Distance.cu + L2Select.cu), redesigned
around the TPU memory system.

Why a kernel at all: the XLA path (`ops/distances.knn`) materializes each
(nq, db_block) f32 score matrix in HBM because `approx_max_k` lowers to a
custom call that does not fuse with the producer dot — at SIFT1M/10k
queries that is ~84 GB of score traffic against a 13 ms GEMM, measured
5.7% MFU on v5e. Here the scores never leave VMEM: each query tile
streams the database once (double-buffered DMA, bf16) and folds every
chunk into a W-wide per-query reservoir with elementwise minima.

The reservoir ("lane-min sketch") replaces a running top-k: lane j of
the W-wide accumulator holds the best row among those the scan mapped to
j (row r of chunk c lands in lane (c*R + r) mod W).  A true top-i entry
is lost only if two of the true top-W' candidates collide in a lane —
for k=10, W=1024 the expected loss is < 0.5% of rows, and the caller
re-scores the top refine*k reservoir entries in exact f32 (same
bf16+refine discipline as the fused IVF scan) so the final top-k is
exact over the surviving candidates.  This is the same partial-reduction
idea as `lax.approx_max_k`, but fused, so the VPU merge cost is ~4
elementwise ops per score instead of an HBM round trip.

Per query tile (Q queries):
    for each DB chunk of R rows (double-buffered DMA, bf16 + f32 norms):
        ip  (Q, R) = qv' @ chunk^T                     (one MXU dot)
        dis (Q, R) = bn + ip                           (one VPU op)
        for g in range(R // W):                        (VPU)
            acc_val, acc_pos = elementwise-min merge of dis[:, gW:(g+1)W]
    out: (Q, W) reservoir values + global row positions

The queries are pre-scaled OUTSIDE the kernel (qv' = -2*xq for L2,
-xq for IP) and the per-query norm ||q||^2 is dropped entirely — a
per-query constant cannot change that query's argmin — so the score
epilogue is ONE VPU op per element instead of three.  The epilogue is
what bounds this kernel: per score the MXU does d MACs (~d/1633 cycles
on v5e's 4 MXUs at d=128) while the VPU merge does 4 ops (~4/4096
cycles), so the VPU epilogue costs ~1.6x the GEMM and the serialized
dependence chain (dot -> merge per chunk) caps MFU near 35-40%.

Padding rows carry norms = +inf (L2) / +inf bias (IP), so they can never
enter the reservoir; `valid_n` and IDSelector bitmaps fold into the same
(nb,) norms vector on the XLA side — never into the score matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import distances as D


def _merge_groups(dis, av, ap, base, W, lane):
    """Fold a (Q, R) score block into the (Q, W) lane-min reservoir."""
    R = dis.shape[1]
    for g in range(R // W):
        sub = dis[:, g * W:(g + 1) * W]
        upd = sub < av
        av = jnp.where(upd, sub, av)
        ap = jnp.where(upd, base + g * W + lane, ap)
    return av, ap


def _merge_groups_tree(dis, av, ap, base, W, lane):
    """Two-stage fold (the round-3 analysis' proposed fix for the
    serialized dot->merge chain): stage 1 reduces the chunk's G = R/W
    groups PAIRWISE in a log-depth tree — every level's merges are
    independent, so the VPU pipelines them instead of stalling on the
    G-deep accumulator chain of `_merge_groups` — and stage 2 folds the
    single surviving group into the running reservoir once per chunk.
    Same reservoir semantics (lane j sees the same candidate set), ~same
    op count, dependence depth G -> log2(G) + 1."""
    R = dis.shape[1]
    G = R // W
    vals = [dis[:, g * W:(g + 1) * W] for g in range(G)]
    poss = [base + g * W + lane for g in range(G)]
    while len(vals) > 1:
        nv, nps = [], []
        for i in range(0, len(vals) - 1, 2):
            upd = vals[i + 1] < vals[i]
            nv.append(jnp.where(upd, vals[i + 1], vals[i]))
            nps.append(jnp.where(upd, poss[i + 1], poss[i]))
        if len(vals) % 2:
            nv.append(vals[-1])
            nps.append(poss[-1])
        vals, poss = nv, nps
    upd = vals[0] < av
    return jnp.where(upd, vals[0], av), jnp.where(upd, poss[0], ap)


def _flat_kernel_unrolled(
    qv_ref,        # (Q, dp) VMEM bf16: tile's queries, PRE-SCALED
    data_hbm,      # (nchunks, R, dp) bf16 HBM; nchunks % U == 0
    bias_hbm,      # (nchunks, 1, R) f32 HBM
    outv_ref,      # (Q, W) VMEM f32 reservoir values
    outp_ref,      # (Q, W) VMEM int32 reservoir row positions
    dbuf,          # (2*U, R, dp) bf16 VMEM
    bbuf,          # (2*U, 1, R) f32 VMEM
    sems,          # DMA sems (2*U, 2)
    *,
    R: int,
    W: int,
    U: int,
    nchunks: int,
    merge_fn=_merge_groups,
):
    """schedule='fori', unroll=U>1: each fori iteration consumes U chunks
    from its own U DMA slots while the other U slots prefetch the next
    iteration's chunks.  Each in-iteration chunk j folds into its OWN
    (av_j, ap_j) accumulator, so consecutive merges have no data
    dependence — the scheduler can overlap chunk j+1's MXU dot with
    chunk j's VPU merge — and the fori loop/DMA-issue overhead is paid
    once per U chunks.  The U accumulators min-merge after the loop."""
    Q = qv_ref.shape[0]
    niter = nchunks // U

    def start_dma(c, slot):
        pltpu.make_async_copy(
            data_hbm.at[c], dbuf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            bias_hbm.at[c], bbuf.at[slot], sems.at[slot, 1]).start()

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            data_hbm.at[c], dbuf.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            bias_hbm.at[c], bbuf.at[slot], sems.at[slot, 1]).wait()

    for j in range(U):
        start_dma(j, j)
    qv = qv_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (Q, W), 1)
    init = tuple(
        (jnp.full((Q, W), jnp.inf, jnp.float32),
         jnp.full((Q, W), -1, jnp.int32))
        for _ in range(U)
    )

    def iter_body(i, accs):
        half = lax.rem(i, 2) * U
        nxt = (lax.rem(i, 2) ^ 1) * U

        @pl.when(i + 1 < niter)
        def _():
            for j in range(U):
                start_dma((i + 1) * U + j, nxt + j)

        out = []
        for j in range(U):
            av, ap = accs[j]
            slot = half + j
            c = i * U + j
            wait_dma(c, slot)
            ip = lax.dot_general(
                qv, dbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dis = bbuf[slot] + ip
            out.append(merge_fn(dis, av, ap, c * R, W, lane))
        return tuple(out)

    accs = lax.fori_loop(0, niter, iter_body, init)
    av, ap = accs[0]
    for j in range(1, U):
        av2, ap2 = accs[j]
        upd = av2 < av
        av = jnp.where(upd, av2, av)
        ap = jnp.where(upd, ap2, ap)
    outv_ref[:] = av
    outp_ref[:] = ap


def _flat_kernel(
    qv_ref,        # (Q, dp) VMEM bf16: tile's queries, PRE-SCALED
    data_hbm,      # (nchunks, R, dp) bf16 HBM
    bias_hbm,      # (nchunks, 1, R) f32 HBM: L2 norms / IP bias (+inf pad)
    outv_ref,      # (Q, W) VMEM f32 reservoir values
    outp_ref,      # (Q, W) VMEM int32 reservoir row positions
    dbuf,          # (2, R, dp) bf16 VMEM
    bbuf,          # (2, 1, R) f32 VMEM
    sems,          # DMA sems (2, 2)
    disbuf,        # None, or (Q, R) f32 VMEM for schedule='pipe'
    *,
    R: int,
    W: int,
    nchunks: int,
    merge_fn=_merge_groups,
):
    Q = qv_ref.shape[0]

    def start_dma(c, slot):
        pltpu.make_async_copy(
            data_hbm.at[c], dbuf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            bias_hbm.at[c], bbuf.at[slot], sems.at[slot, 1]).start()

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            data_hbm.at[c], dbuf.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            bias_hbm.at[c], bbuf.at[slot], sems.at[slot, 1]).wait()

    start_dma(0, 0)
    qv = qv_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (Q, W), 1)
    init = (
        jnp.full((Q, W), jnp.inf, jnp.float32),
        jnp.full((Q, W), -1, jnp.int32),
    )

    if disbuf is None:                                # schedule='fori'
        def chunk_body(c, carry):
            av, ap = carry                            # (Q, W) each
            slot = lax.rem(c, 2)

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, lax.rem(c + 1, 2))

            wait_dma(c, slot)
            ip = lax.dot_general(
                qv, dbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                         # (Q, R) f32
            dis = bbuf[slot] + ip                     # (1,R)+(Q,R): 1 op
            return merge_fn(dis, av, ap, c * R, W, lane)

        av, ap = lax.fori_loop(0, nchunks, chunk_body, init)
        outv_ref[:] = av
        outp_ref[:] = ap
        return

    # schedule='pipe': issue the MXU dot for chunk c BEFORE merging chunk
    # c-1's scores from the scratch buffer — the two are independent, so
    # the scheduler can overlap the VPU merge with the MXU dot
    outv_ref[:] = init[0]
    outp_ref[:] = init[1]

    def merge_from_scratch(base):
        av, ap = merge_fn(disbuf[:], outv_ref[:], outp_ref[:],
                          base, W, lane)
        outv_ref[:] = av
        outp_ref[:] = ap

    def chunk_body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            start_dma(c + 1, lax.rem(c + 1, 2))

        wait_dma(c, slot)
        ip = lax.dot_general(
            qv, dbuf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c > 0)
        def _():
            merge_from_scratch((c - 1) * R)

        disbuf[:] = bbuf[slot] + ip
        return 0

    lax.fori_loop(0, nchunks, chunk_body, 0)
    merge_from_scratch((nchunks - 1) * R)


def _reservoir_topk_kernel(resv_ref, resp_ref, outv_ref, outp_ref,
                           *, k: int, KP: int):
    """k-round min-extraction over a (QB, W) reservoir block — the
    in-kernel replacement for the post-kernel lax.top_k select, which
    measured ~5.5 ms for (10k, 1024)->10 on v5e (XLA's variadic sort)
    vs ~50 VPU passes here (~0.2 ms for the whole batch; r5_queue1 vs
    r5_queue3 logs). Round j: per-row min value, its lane via a masked
    lane-min, a one-hot gather of the row position, then the winning
    lane is knocked out with +inf. Outputs are (QB, KP) lane-padded;
    the caller slices [:, :k]."""
    pos = resp_ref[:]
    QB, W = pos.shape
    lane = lax.broadcasted_iota(jnp.int32, (QB, W), 1)
    out_lane = lax.broadcasted_iota(jnp.int32, (QB, KP), 1)

    # fori (not a Python unroll): Mosaic stack-allocates each unrolled
    # round's temporaries, which blows scoped vmem past ~10 rounds at
    # production shapes; the carried loop keeps one live copy
    def round_(j, carry):
        val, ov, op = carry
        m = jnp.min(val, axis=1, keepdims=True)            # (QB, 1)
        is_m = val == m
        win = jnp.min(jnp.where(is_m, lane, W), axis=1,
                      keepdims=True)                       # (QB, 1)
        sel_ = lane == win
        p = jnp.max(jnp.where(sel_, pos, -1), axis=1,
                    keepdims=True)                         # (QB, 1)
        ok = jnp.isfinite(m)
        ov = jnp.where((out_lane == j) & ok, m, ov)
        op = jnp.where((out_lane == j) & ok, p, op)
        return jnp.where(sel_, jnp.inf, val), ov, op

    _, ov, op = lax.fori_loop(
        0, k, round_,
        (resv_ref[:],
         jnp.full((QB, KP), jnp.inf, jnp.float32),
         jnp.full((QB, KP), -1, jnp.int32)))
    outv_ref[:] = ov
    outp_ref[:] = op


def reservoir_topk(resv, resp, k: int, *, QB: int = 1024,
                   interpret: bool = False):
    """(nq, W) lane-min reservoir -> exact per-row k smallest
    (values, positions), via the Pallas extraction kernel."""
    nq, W = resv.shape
    KP = 128                       # lane-width-padded output columns
    assert k <= KP
    QB = min(QB, max(nq, 8))
    nblk = -(-nq // QB)
    pad = nblk * QB - nq
    if pad:
        resv = jnp.pad(resv, ((0, pad), (0, 0)),
                       constant_values=jnp.inf)
        resp = jnp.pad(resp, ((0, pad), (0, 0)), constant_values=-1)
    # scoped-vmem sizing: 2x (QB, W) inputs (+double-buffered), 2x
    # (QB, KP) outputs, plus the extraction loop's live temporaries —
    # Mosaic's 16 MB default rejects QB=1024/W=1024 (measured 25.9 MB)
    blocks = 2 * (QB * W * 4) + 2 * (QB * KP * 4)
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel",),
        vmem_limit_bytes=min(int(3 * blocks) + (8 << 20), 128 << 20),
    )
    outv, outp = pl.pallas_call(
        functools.partial(_reservoir_topk_kernel, k=k, KP=KP),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((QB, W), lambda i: (i, 0)),
            pl.BlockSpec((QB, W), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((QB, KP), lambda i: (i, 0)),
            pl.BlockSpec((QB, KP), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk * QB, KP), jnp.float32),
            jax.ShapeDtypeStruct((nblk * QB, KP), jnp.int32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(resv, resp)
    return outv[:nq, :k], outp[:nq, :k]


# plain Python ints: jnp scalars here would be captured as pallas_call
# constants (Mosaic rejects implicit captures)
_PACKED_INIT = 0x7FFFFFFF
_HI_MASK = -65536                     # 0xFFFF0000


def _merge_groups_packed(bits, acc, g_base, W):
    """Packed lane-min fold: ONE int32 accumulator per lane holding
    (score bits & 0xFFFF0000) | group_index.  Scores are pre-shifted to
    be non-negative (bias += C outside the kernel), so the IEEE-754 bit
    pattern of the f32 score is monotone as an int32 and a single
    `min` merges value and provenance at once: 3 VPU ops per score
    (mask, +group, min) vs the 4 of `_merge_groups`, and a 1-op (vs
    3-op) serialized dependence chain through the accumulator.  The
    group index (global, < nb/W, 16 bits) recovers the row as
    g * W + lane after the kernel; the masked-off mantissa bits are
    bf16-grade truncation, absorbed by the exact refine pass."""
    R = bits.shape[1]
    for g in range(R // W):
        sub = bits[:, g * W:(g + 1) * W]
        packed = (sub & _HI_MASK) + (g_base + g)
        acc = jnp.minimum(acc, packed)
    return acc


def _flat_kernel_grid_packed(qv_ref, bias_ref, data_ref, out_ref,
                             *, R: int, W: int):
    """schedule='grid', merge='packed': single int32 reservoir."""
    c = pl.program_id(1)
    qv = qv_ref[0][:]
    Q = qv.shape[0]

    @pl.when(c == 0)
    def _():
        out_ref[0] = jnp.full((Q, W), _PACKED_INIT, jnp.int32)

    ip = lax.dot_general(
        qv, data_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bits = lax.bitcast_convert_type(bias_ref[0] + ip, jnp.int32)
    out_ref[0] = _merge_groups_packed(
        bits, out_ref[0][:], c * (R // W), W)


def _flat_kernel_packed(
    qv_ref, data_hbm, bias_hbm, out_ref, dbuf, bbuf, sems,
    *, R: int, W: int, U: int, nchunks: int,
):
    """schedule='fori', merge='packed': manual double-buffered DMA with
    U independent packed accumulators (U>1 removes the merge->merge
    dependence between in-iteration chunks, as in the unrolled f32
    kernel)."""
    Q = qv_ref.shape[0]
    niter = nchunks // U
    Gc = R // W

    def start_dma(c, slot):
        pltpu.make_async_copy(
            data_hbm.at[c], dbuf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            bias_hbm.at[c], bbuf.at[slot], sems.at[slot, 1]).start()

    def wait_dma(c, slot):
        pltpu.make_async_copy(
            data_hbm.at[c], dbuf.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            bias_hbm.at[c], bbuf.at[slot], sems.at[slot, 1]).wait()

    for j in range(U):
        start_dma(j, j)
    qv = qv_ref[:]
    init = tuple(jnp.full((Q, W), _PACKED_INIT, jnp.int32)
                 for _ in range(U))

    def iter_body(i, accs):
        nxt = (lax.rem(i, 2) ^ 1) * U
        half = lax.rem(i, 2) * U

        @pl.when(i + 1 < niter)
        def _():
            for j in range(U):
                start_dma((i + 1) * U + j, nxt + j)

        out = []
        for j in range(U):
            slot = half + j
            c = i * U + j
            wait_dma(c, slot)
            ip = lax.dot_general(
                qv, dbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bits = lax.bitcast_convert_type(bbuf[slot] + ip, jnp.int32)
            out.append(_merge_groups_packed(bits, accs[j], c * Gc, W))
        return tuple(out)

    accs = lax.fori_loop(0, niter, iter_body, init)
    acc = accs[0]
    for j in range(1, U):
        acc = jnp.minimum(acc, accs[j])
    out_ref[:] = acc


def _flat_kernel_grid(qv_ref, bias_ref, data_ref, outv_ref, outp_ref,
                      *, R: int, W: int, merge_fn=_merge_groups):
    """schedule='grid': one grid step per (query tile, DB chunk); Pallas
    auto-pipelines the chunk DMA, the reservoir accumulates in the out
    refs across consecutive same-tile revisits."""
    c = pl.program_id(1)
    qv = qv_ref[0][:]
    Q = qv.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (Q, W), 1)

    @pl.when(c == 0)
    def _():
        outv_ref[0] = jnp.full((Q, W), jnp.inf, jnp.float32)
        outp_ref[0] = jnp.full((Q, W), -1, jnp.int32)

    ip = lax.dot_general(
        qv, data_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dis = bias_ref[0] + ip
    av, ap = merge_fn(dis, outv_ref[0][:], outp_ref[0][:],
                      c * R, W, lane)
    outv_ref[0] = av
    outp_ref[0] = ap


@functools.partial(
    jax.jit,
    static_argnames=("metric", "R", "unroll"),
)
def pack_flat_db(
    xb: jnp.ndarray,
    metric: int = D.METRIC_L2,
    *,
    xb_norms=None,
    valid_n=None,
    R: int = 8192,
    unroll: int = 1,
):
    """Precompute the fused kernel's streamed database layout.

    The per-call DB prep (bf16 cast + pad + chunk reshape + bias build)
    measures 24 ms at 1M x 128-d on v5e — 38% of the whole fused call
    (benchs/logs/r4_queue5.jsonl, 'prep probe'). Databases are
    search-many / add-rarely, so callers cache this across searches
    (IndexFlat does) and pass it via `flat_knn_fused(packed=...)`.

    Returns (data, bias):
      data: (nchunks, R, dp) bf16 — zero-padded chunked rows.
      bias: (nchunks, 1, R) f32 — L2 row norms / IP zeros; +inf for
        padded or >= valid_n rows (bakes valid_n in: repack after adds).
    """
    nb, d = xb.shape
    dp = -(-d // 128) * 128
    if D.is_similarity_metric(metric):
        bias = jnp.zeros((nb,), jnp.float32)
    else:
        bias = (jnp.sum(xb.astype(jnp.float32) ** 2, axis=1)
                if xb_norms is None else xb_norms.astype(jnp.float32))
    if valid_n is not None:
        rows = jnp.arange(nb, dtype=jnp.int32)
        bias = jnp.where(rows < jnp.asarray(valid_n, jnp.int32),
                         bias, jnp.inf)
    nchunks = max(-(-nb // R), 1)
    if unroll > 1:
        nchunks = -(-nchunks // unroll) * unroll
    pad = nchunks * R - nb
    data = jnp.pad(xb.astype(jnp.bfloat16),
                   ((0, pad), (0, dp - d))).reshape(nchunks, R, dp)
    bias_p = jnp.pad(bias, (0, pad),
                     constant_values=jnp.inf).reshape(nchunks, 1, R)
    return data, bias_p


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "Q", "R", "W", "refine", "schedule",
                     "unroll", "merge", "sel", "sel_recall", "interpret"),
)
def flat_knn_fused(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    xb_norms=None,
    valid_n=None,
    id_mask=None,
    packed=None,
    Q: int = 256,
    R: int = 2048,
    W: int = 1024,
    refine: int = 4,
    schedule: str = "fori",
    unroll: int = 1,
    merge: str = "serial",
    sel: str = "exact",
    sel_recall: float = 0.95,
    interpret: bool = False,
):
    """Fused brute-force k-NN (see module docstring).

    Args:
      xq: (nq, d) f32 queries. xb: (nb, d) database (any float dtype;
        streamed as bf16). xb_norms: optional (nb,) f32 ||x||^2.
      valid_n / id_mask: same contracts as `ops.distances.knn` — both
        fold into the streamed bias vector.
      Q/R/W: query-tile rows / DB chunk rows / reservoir width. R % W
        == 0; W % 128 == 0; k <= W.
      refine: exact-f32 re-rank width multiplier over the reservoir
        (refine*k candidates); 0/1 trusts the bf16 reservoir values.
      schedule: chunk-loop strategy — 'fori' (manual fori + manual
        double-buffered DMA), 'grid' (chunk dim in the Pallas grid,
        auto-pipelined BlockSpec DMA, reservoir accumulated in the out
        refs), 'pipe' ('fori' with the chunk-c dot issued before the
        chunk-(c-1) merge so MXU and VPU work can overlap).
      unroll: (schedule='fori' only) chunks per fori iteration; U>1 uses
        2U DMA slots and U independent lane-min accumulators (merged
        after the loop), amortizing loop/DMA-issue overhead U× and
        removing the merge→merge dependence between in-iteration chunks.
      sel: post-kernel reservoir→candidate selection — 'exact'
        (lax.top_k full sort over the W lanes) or 'approx'
        (lax.approx_max_k partial-reduce; recall-neutral under refine
        since the refine pass re-ranks exactly).
      sel_recall: recall_target of the 'approx' selection.  The 0.95
        default is right under refine>=2 (the refine re-ranks exactly,
        so select losses above width refine*k are immaterial); at
        refine=0 the select loss hits the returned top-k directly, so
        integer-valued data (real SIFT/BigANN uint8 descriptors, whose
        bf16 scores are bit-exact — see IndexFlat._fused_search_device)
        should pair refine=0 with sel='exact' or sel_recall>=0.999.
      packed: optional `pack_flat_db(xb, ...)` result — skips the
        per-call DB prep (the dominant e2e overhead; see pack_flat_db).
        Must have been packed with the same R (and unroll if fori) and
        with valid_n baked in; id_mask still composes per call.
    Returns (D, I): (nq, k) — L2 ascending distances / IP descending
      similarities, int32 ids (-1 for invalid).
    """
    nq, d = xq.shape
    nb = xb.shape[0]
    assert R % W == 0 and W % 128 == 0 and k <= W
    assert merge in ("serial", "tree", "packed"), merge
    merge_fn = _merge_groups_tree if merge == "tree" else _merge_groups
    dp = -(-d // 128) * 128
    similarity = D.is_similarity_metric(metric)
    xq = xq.astype(jnp.float32)

    pack_C = None
    if merge == "packed":
        # shift scores non-negative so their f32 bit pattern is monotone
        # as int32 (see _merge_groups_packed); C is a per-batch scalar,
        # constant per query, so ordering is unchanged
        qn_max = jnp.max(jnp.sum(xq * xq, axis=1))
        if similarity:
            xn = jnp.sum(xb.astype(jnp.float32) ** 2, axis=1)
            pack_C = jnp.sqrt(qn_max) * jnp.sqrt(jnp.max(xn)) + 1.0
        else:
            pack_C = qn_max + 1.0

    if packed is not None:
        data, bias_p = packed
        nchunks = data.shape[0]
        assert data.shape[1] == R and data.shape[2] == dp, (
            f"packed layout {data.shape} mismatches R={R}, dp={dp}")
        assert valid_n is None, "bake valid_n into pack_flat_db"
        pad = nchunks * R - nb
        if id_mask is not None:
            # per-call selector: rebuild only the bias plane (nb floats)
            mflat = jnp.pad(id_mask != 0, (0, pad), constant_values=False)
            bias_p = jnp.where(mflat, bias_p.reshape(-1),
                               jnp.inf).reshape(nchunks, 1, R)
        if pack_C is not None:
            bias_p = bias_p + pack_C       # inf rows stay inf
    else:
        # bias vector: L2 row norms / IP zeros, +inf for padded, invalid,
        # or masked-out rows (+inf bias = unelectable in-kernel)
        if similarity:
            bias = jnp.zeros((nb,), jnp.float32)
        else:
            bias = (jnp.sum(xb.astype(jnp.float32) ** 2, axis=1)
                    if xb_norms is None else xb_norms.astype(jnp.float32))
        if valid_n is not None:
            rows = jnp.arange(nb, dtype=jnp.int32)
            bias = jnp.where(rows < jnp.asarray(valid_n, jnp.int32),
                             bias, jnp.inf)
        if id_mask is not None:
            bias = jnp.where(id_mask != 0, bias, jnp.inf)
        if pack_C is not None:
            bias = bias + pack_C

        nchunks = max(-(-nb // R), 1)
        if schedule == "fori" and unroll > 1:
            # unrolled body has no per-chunk validity guards: round the
            # chunk count up; +inf-bias padding rows absorb the excess
            nchunks = -(-nchunks // unroll) * unroll
        pad = nchunks * R - nb
        data = jnp.pad(xb.astype(jnp.bfloat16),
                       ((0, pad), (0, dp - d))).reshape(nchunks, R, dp)
        bias_p = jnp.pad(bias, (0, pad),
                         constant_values=jnp.inf).reshape(nchunks, 1, R)

    ntiles = -(-nq // Q)
    qpad = ntiles * Q - nq
    qv = jnp.pad(xq, ((0, qpad), (0, dp - d)))
    # pre-scale so the in-kernel score is just bias + dot (see module
    # docstring); the dropped per-query ||q||^2 is re-added post-kernel
    # only when the reservoir values are returned un-refined
    scale = -1.0 if similarity else -2.0
    qv_t = (scale * qv).astype(jnp.bfloat16).reshape(ntiles, Q, dp)

    out_shape = [
        jax.ShapeDtypeStruct((ntiles, Q, W), jnp.float32),
        jax.ShapeDtypeStruct((ntiles, Q, W), jnp.int32),
    ]
    def _params(scratch_bytes):
        # Mosaic's default scoped-vmem check (16 MB) rejects deep-unroll /
        # wide-R configurations whose buffers easily fit the 128 MB chip
        # VMEM — size the limit from the actual scratch + block footprint
        if interpret:
            return None
        blocks = (Q * dp * 2) + 2 * (Q * W * 4) + (Q * R * 4)
        need = min(int(1.25 * (scratch_bytes + blocks)) + (8 << 20),
                   128 << 20)
        return pltpu.CompilerParams(vmem_limit_bytes=max(need, 32 << 20))

    if merge == "packed":
        n_groups = nchunks * (R // W)
        assert n_groups <= 65536, (
            f"merge='packed' holds the group index in 16 bits: nb must "
            f"be <= 65536*W rows ({n_groups} groups at R={R}, W={W})")
        out_shape_p = jax.ShapeDtypeStruct((ntiles, Q, W), jnp.int32)
        if schedule == "grid":
            acc = pl.pallas_call(
                functools.partial(_flat_kernel_grid_packed, R=R, W=W),
                grid=(ntiles, nchunks),
                in_specs=[
                    pl.BlockSpec((1, Q, dp), lambda t, c: (t, 0, 0)),
                    pl.BlockSpec((1, 1, R), lambda t, c: (c, 0, 0)),
                    pl.BlockSpec((1, R, dp), lambda t, c: (c, 0, 0)),
                ],
                out_specs=[pl.BlockSpec((1, Q, W), lambda t, c: (t, 0, 0))],
                out_shape=[out_shape_p],
                compiler_params=None if interpret else pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=_params(
                        2 * (R * dp * 2 + R * 4)).vmem_limit_bytes,
                ),
                interpret=interpret,
            )(qv_t, bias_p, data)[0]
        else:
            assert schedule == "fori", "merge='packed': grid/fori only"
            U = max(unroll, 1)
            nslots = 2 * U
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(ntiles,),
                in_specs=[
                    pl.BlockSpec((1, Q, dp), lambda t: (t, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[pl.BlockSpec((1, Q, W), lambda t: (t, 0, 0))],
                scratch_shapes=[
                    pltpu.VMEM((nslots, R, dp), jnp.bfloat16),
                    pltpu.VMEM((nslots, 1, R), jnp.float32),
                    pltpu.SemaphoreType.DMA((nslots, 2)),
                ],
            )

            def kern_p(qv_ref, data_h, bias_h, out_ref, dbuf, bbuf, sems):
                _flat_kernel_packed(
                    qv_ref[0], data_h, bias_h, out_ref.at[0],
                    dbuf, bbuf, sems, R=R, W=W, U=U, nchunks=nchunks)

            acc = pl.pallas_call(
                kern_p,
                grid_spec=grid_spec,
                out_shape=[out_shape_p],
                compiler_params=_params(nslots * R * dp * 2
                                        + nslots * R * 4),
                interpret=interpret,
            )(qv_t, data, bias_p)[0]

        acc = acc.reshape(ntiles * Q, W)[:nq]
        val = lax.bitcast_convert_type(acc & _HI_MASK, jnp.float32)
        lanev = jnp.arange(W, dtype=jnp.int32)[None, :]
        pos = (acc & jnp.int32(0xFFFF)) * W + lanev
        alive = jnp.isfinite(val) & (acc != _PACKED_INIT)
        resv = jnp.where(alive, val - pack_C, jnp.inf)
        resp = jnp.where(alive, pos, -1)
    elif schedule == "grid":
        outv, outp = pl.pallas_call(
            functools.partial(_flat_kernel_grid, R=R, W=W,
                              merge_fn=merge_fn),
            grid=(ntiles, nchunks),
            in_specs=[
                pl.BlockSpec((1, Q, dp), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((1, 1, R), lambda t, c: (c, 0, 0)),
                pl.BlockSpec((1, R, dp), lambda t, c: (c, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, Q, W), lambda t, c: (t, 0, 0)),
                pl.BlockSpec((1, Q, W), lambda t, c: (t, 0, 0)),
            ],
            out_shape=out_shape,
            compiler_params=None if interpret else pltpu.CompilerParams(
                # query tiles are independent; the chunk dim accumulates
                # into the out refs, so it must stay sequential
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=_params(
                    2 * (R * dp * 2 + R * 4)).vmem_limit_bytes,
            ),
            interpret=interpret,
        )(qv_t, bias_p, data)
    else:
        assert schedule in ("fori", "pipe"), schedule
        U = unroll if schedule == "fori" else 1
        nslots = 2 * U if U > 1 else 2
        scratch = [
            pltpu.VMEM((nslots, R, dp), jnp.bfloat16),
            pltpu.VMEM((nslots, 1, R), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots, 2)),
        ]
        if schedule == "pipe":
            scratch.append(pltpu.VMEM((Q, R), jnp.float32))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((1, Q, dp), lambda t: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, Q, W), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, Q, W), lambda t: (t, 0, 0)),
            ],
            scratch_shapes=scratch,
        )

        if U > 1:
            def kern(qv_ref, data_h, bias_h, outv_ref, outp_ref,
                     dbuf, bbuf, sems):
                _flat_kernel_unrolled(
                    qv_ref[0], data_h, bias_h,
                    outv_ref.at[0], outp_ref.at[0], dbuf, bbuf, sems,
                    R=R, W=W, U=U, nchunks=nchunks, merge_fn=merge_fn)
        else:
            def kern(qv_ref, data_h, bias_h, outv_ref, outp_ref,
                     dbuf, bbuf, sems, *maybe_dis):
                _flat_kernel(qv_ref[0], data_h, bias_h,
                             outv_ref.at[0], outp_ref.at[0],
                             dbuf, bbuf, sems,
                             maybe_dis[0] if maybe_dis else None,
                             R=R, W=W, nchunks=nchunks,
                             merge_fn=merge_fn)

        scratch_bytes = (nslots * R * dp * 2 + nslots * R * 4
                         + (Q * R * 4 if schedule == "pipe" else 0))
        outv, outp = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=_params(scratch_bytes),
            interpret=interpret,
        )(qv_t, data, bias_p)

    if merge != "packed":
        resv = outv.reshape(ntiles * Q, W)[:nq]
        resp = outp.reshape(ntiles * Q, W)[:nq]

    bad = D.worst_value(metric)
    assert sel in ("exact", "approx", "kernel"), sel

    def _select(neg_scores, kk_):
        # reservoir -> candidate selection. 'approx' uses the TPU-native
        # partial-reduce select (lax.approx_max_k): the reservoir is
        # already approximate (lane-min collisions) and the refine pass
        # re-ranks exactly, so a 0.95-recall select over W lanes is
        # recall-neutral in practice while skipping the full sort network
        if sel == "approx" and kk_ < neg_scores.shape[1]:
            return lax.approx_max_k(neg_scores, kk_,
                                    recall_target=sel_recall)
        return lax.top_k(neg_scores, kk_)

    if refine and refine > 1:
        Rk = min(refine * k, W)
        if sel == "kernel" and Rk <= 128:
            rv, cand = reservoir_topk(resv, resp, Rk,
                                      interpret=interpret)
            nv = -rv
        else:
            nv, sidx = _select(-resv, Rk)
            cand = jnp.take_along_axis(resp, sidx, axis=1)   # (nq, Rk)
        ok = (cand >= 0) & jnp.isfinite(-nv)
        safe = jnp.maximum(cand, 0)
        vecs = xb[safe].astype(jnp.float32)                  # (nq, Rk, d)
        ip = jnp.einsum("qd,qrd->qr", xq, vecs,
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        if similarity:
            dis = -ip
        else:
            vn = jnp.sum(vecs * vecs, axis=2)
            qn2 = jnp.sum(xq * xq, axis=1, keepdims=True)
            dis = jnp.maximum(qn2 + vn - 2.0 * ip, 0.0)
        dis = jnp.where(ok, dis, jnp.inf)
        kk = min(k, Rk)
        nv2, sel2 = lax.top_k(-dis, kk)
        out_d = -nv2
        out_i = jnp.take_along_axis(cand, sel2, axis=1)
    else:
        kk = min(k, W)
        if sel == "kernel" and kk <= 128:
            out_d, out_i = reservoir_topk(resv, resp, kk,
                                          interpret=interpret)
        else:
            nv, sidx = _select(-resv, kk)
            out_d = -nv
            out_i = jnp.take_along_axis(resp, sidx, axis=1)
        if not similarity:
            # reservoir values are ||x||^2 - 2<q,x>: restore ||q||^2
            out_d = out_d + jnp.sum(xq * xq, axis=1, keepdims=True)
    if kk < k:
        out_d = jnp.pad(out_d, ((0, 0), (0, k - kk)),
                        constant_values=jnp.inf)
        out_i = jnp.pad(out_i, ((0, 0), (0, k - kk)),
                        constant_values=-1)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    out_d = jnp.where(out_i >= 0, out_d, bad)
    if similarity:
        out_d = jnp.where(out_i >= 0, -out_d, bad)
    else:
        out_d = jnp.maximum(out_d, 0.0)
    return out_d, out_i
