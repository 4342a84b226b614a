"""Mesh-sharded search and clustering — the TPU-native replacement for the
reference's entire distribution stack.

The reference distributes three ways (SURVEY.md §2.7): `IndexShards{,IVF}`
(one thread per sub-index + heap merge, impl/ThreadedIndex-inl.h),
`IndexReplicas` (round-robin queries), and pickle-over-TCP RPC with a
client-side `ResultHeap` merge (contrib/client_server.py:49-91,
contrib/rpc.py). Distributed k-means runs assignment on worker slices and
updates centroids on the client (benchs/distributed_ondisk/
distributed_kmeans.py, contrib/clustering.py:130-180).

Here all of that is a `jax.sharding.Mesh` with two axes:

  shard    — database rows / invlist blocks partitioned across devices
             (the ClientIndex/IndexShards axis)
  replica  — query batch split across identical copies (IndexReplicas axis)

and the merges are in-graph XLA collectives riding ICI: per-device local
top-k, `all_gather` of the (k)-sized partials, one final k-select — instead
of pickled numpy over TCP. Distributed k-means is a `psum` of per-centroid
(sum, count) partials.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_map(f, *, mesh, in_specs, out_specs):
    # check_vma=False: outputs are made replicated by explicit all_gathers /
    # psums, which the static replication checker cannot always see through
    # nested jitted calls.
    return jax.shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )

from ..ops import distances as D
from ..ops import topk as T


def make_mesh(n_shards: int, n_replicas: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a (replica, shard) device mesh."""
    devices = devices if devices is not None else jax.devices()
    need = n_shards * n_replicas
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_replicas, n_shards)
    return Mesh(dev, axis_names=("replica", "shard"))


def shard_rows(x: np.ndarray, n_shards: int) -> np.ndarray:
    """Pad rows to a multiple of n_shards (rows of 0) so the array can be
    evenly row-sharded. Returns (padded_array, valid_n)."""
    n = x.shape[0]
    pad = (-n) % n_shards
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "mesh")
)
def sharded_knn(
    xq: jnp.ndarray,
    xb: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    mesh: Mesh,
    valid_n: Optional[jnp.ndarray] = None,
):
    """Exact k-NN with the database row-sharded over the `shard` mesh axis
    and queries batch-split over `replica`.

    = IndexShards (data parallel over the database) composed with
    IndexReplicas (throughput parallel over queries), with the RPC client's
    ResultHeap merge replaced by all_gather + k-select on ICI.

    xb must be evenly divisible by the shard axis size (see shard_rows);
    `valid_n` masks global padding rows. Results are replicated.
    """
    n_shards = mesh.shape["shard"]
    shard_size = xb.shape[0] // n_shards
    if valid_n is None:
        valid_n = jnp.int32(xb.shape[0])

    def local(xq_l, xb_l):
        # global ids for this shard's rows
        base = lax.axis_index("shard") * shard_size
        # local valid count: rows with global id < valid_n
        local_valid = jnp.clip(valid_n - base, 0, shard_size)
        d_l, i_l = D.knn(xq_l, xb_l, k, metric, valid_n=local_valid)
        i_l = jnp.where(i_l >= 0, i_l + base, -1)
        # merge across shards: gather all partials, k-select
        dg = lax.all_gather(d_l, "shard")   # (nshard, nq_l, k)
        ig = lax.all_gather(i_l, "shard")
        d_m, i_m = T.merge_topk_axis(dg, ig, k,
                                     similarity=D.is_similarity_metric(metric))
        # queries were split over replica; gather them back
        d_all = lax.all_gather(d_m, "replica", axis=0, tiled=True)
        i_all = lax.all_gather(i_m, "replica", axis=0, tiled=True)
        return d_all, i_all

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("replica", None), P("shard", None)),
        out_specs=(P(None, None), P(None, None)),
    )
    return fn(xq, xb)


@functools.partial(jax.jit, static_argnames=("k", "metric", "mesh"))
def sharded_kmeans_iter(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    mesh: Mesh,
):
    """One distributed Lloyd iteration: x row-sharded, centroids replicated.

    = distributed_kmeans.py's server-assign / client-update loop
    (benchs/distributed_ondisk/distributed_kmeans.py) collapsed into one
    psum of per-centroid (sum, count) partials over the mesh.

    Returns (new_centroids, obj) both replicated. Empty clusters keep their
    previous centroid (the host-side `kmeans` driver handles splitting).
    """
    d = x.shape[1]

    def local(x_l, cent):
        dis, assign = D.knn(x_l, cent, 1, metric,
                            precision=lax.Precision.DEFAULT)
        assign = assign[:, 0]
        # one-hot GEMM segment sums (TPU scatters serialize; see
        # ops/kmeans.segment_sums)
        from ..ops.kmeans import segment_sums

        sums, counts = segment_sums(x_l, assign, k)
        obj = jnp.sum(dis[:, 0])
        sums = lax.psum(sums, ("shard", "replica"))
        counts = lax.psum(counts, ("shard", "replica"))
        obj = lax.psum(obj, ("shard", "replica"))
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], cent
        )
        return new_c, counts, obj

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(("replica", "shard"), None), P(None, None)),
        out_specs=(P(None, None), P(None), P()),
    )
    return fn(x, centroids)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "max_nblocks", "mesh", "fused",
                     "interpret"),
)
def sharded_ivf_scan(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    data: jnp.ndarray,
    ids: jnp.ndarray,
    norms: jnp.ndarray,
    list_block_start: jnp.ndarray,
    list_nblocks: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    max_nblocks: int,
    mesh: Mesh,
    fused: bool = False,
    interpret: bool = False,
):
    """Sharded IVF list scan: each device holds its own packed invlists
    (stacked on a leading `shard` axis) covering a row-partition of the
    database, sharing the (replicated) coarse quantizer — the exact design
    of IndexShardsIVF (faiss/IndexShardsIVF.cpp: common quantizer, disjoint
    invlists) and of the distributed on-disk pipeline.

    Args (leading axis = shard):
      data (S, nblocks+1, B, d), ids (S, nblocks+1, B), norms alike,
      list_block_start/list_nblocks (S, nlist).
      xq (nq, d) replicated; probes (nq, nprobe) replicated.
      fused: route the per-shard scan through the Pallas list-major
        kernel (ops/ivf_scan_pallas; interpret=True for CPU-mesh
        validation — the driver protocol exercises exactly that).
    Returns replicated (D, I) with global ids taken from `ids`.
    """
    from ..ops.ivf_scan import PackedInvLists, scan_invlists

    similarity = D.is_similarity_metric(metric)

    def local(xq_r, probes_r, data_l, ids_l, norms_l, lbs_l, lnb_l):
        pil = PackedInvLists(
            data=data_l[0], ids=ids_l[0], norms=norms_l[0],
            list_block_start=lbs_l[0], list_nblocks=lnb_l[0],
        )
        if fused:
            from ..ops.ivf_scan_pallas import scan_invlists_fused

            # NOTE: the fused kernel streams every probed list in full
            # (CB blocks at a time) — the max_nblocks cap applies only
            # to the truncating query-major path
            d_l, i_l, _ = scan_invlists_fused(
                xq_r, probes_r, pil, k, metric, interpret=interpret)
        else:
            d_l, i_l, _ = scan_invlists(
                xq_r, probes_r, pil, k, metric, max_nblocks=max_nblocks
            )
        dg = lax.all_gather(d_l, "shard")
        ig = lax.all_gather(i_l, "shard")
        d_m, i_m = T.merge_topk_axis(dg, ig, k, similarity=similarity)
        d_all = lax.all_gather(d_m, "replica", axis=0, tiled=True)
        i_all = lax.all_gather(i_m, "replica", axis=0, tiled=True)
        return d_all, i_all

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("replica", None), P("replica", None),
            P("shard", None, None, None), P("shard", None, None),
            P("shard", None, None), P("shard", None), P("shard", None),
        ),
        out_specs=(P(None, None), P(None, None)),
    )
    return fn(xq, probes, data, ids, norms, list_block_start, list_nblocks)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "by_residual", "max_nblocks",
                     "packed4", "mesh"),
)
def sharded_ivf_scan_pq(
    xq: jnp.ndarray,
    probes: jnp.ndarray,
    coarse_dis: jnp.ndarray,
    codes: jnp.ndarray,
    ids: jnp.ndarray,
    list_block_start: jnp.ndarray,
    list_nblocks: jnp.ndarray,
    pq_centroids: jnp.ndarray,
    coarse_centroids: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    by_residual: bool = True,
    max_nblocks: int,
    packed4: bool = False,
    mesh: Mesh,
):
    """Sharded ADC scan over PQ-coded invlists — the mesh analog of
    multi-GPU sharded IVFPQ (faiss/IndexShardsIVF.cpp composed with
    gpu/impl/IVFPQ.cu): every shard holds a disjoint row-partition's
    code invlists, shares the replicated coarse quantizer + PQ codebooks,
    runs the local ADC scan, and the per-shard top-k partials merge with
    one all_gather + exact k-select on ICI. This is BASELINE config #5
    (`IVF65536,PQ32x4fs` sharded over a v5p mesh).

    Args (leading axis = shard):
      codes (S, nblocks+1, B, code_width), ids (S, nblocks+1, B),
      list_block_start/list_nblocks (S, nlist).
    Replicated: xq (nq, d), probes/coarse_dis (nq, nprobe),
      pq_centroids (M, ksub, dsub), coarse_centroids (nlist, d).
    Returns replicated (D, I); ids are whatever the shard packs stored
    (global row ids by convention).
    """
    from ..ops.ivf_scan import PackedCodeInvLists, scan_invlists_pq

    similarity = D.is_similarity_metric(metric)

    def local(xq_r, probes_r, cdis_r, codes_l, ids_l, lbs_l, lnb_l,
              pqc, cc):
        pil = PackedCodeInvLists(
            codes=codes_l[0], ids=ids_l[0],
            list_block_start=lbs_l[0], list_nblocks=lnb_l[0],
        )
        d_l, i_l, _ = scan_invlists_pq(
            xq_r, probes_r, cdis_r, pil, pqc, cc, k, metric,
            by_residual=by_residual, max_nblocks=max_nblocks,
            packed4=packed4,
        )
        dg = lax.all_gather(d_l, "shard")
        ig = lax.all_gather(i_l, "shard")
        d_m, i_m = T.merge_topk_axis(dg, ig, k, similarity=similarity)
        d_all = lax.all_gather(d_m, "replica", axis=0, tiled=True)
        i_all = lax.all_gather(i_m, "replica", axis=0, tiled=True)
        return d_all, i_all

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("replica", None), P("replica", None), P("replica", None),
            P("shard", None, None, None), P("shard", None, None),
            P("shard", None), P("shard", None),
            P(None, None, None), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
    )
    return fn(xq, probes, coarse_dis, codes, ids, list_block_start,
              list_nblocks, pq_centroids, coarse_centroids)


@functools.partial(jax.jit, static_argnames=("k", "metric", "mesh"))
def sharded_refine(
    xq: jnp.ndarray,
    cand_ids: jnp.ndarray,
    xb: jnp.ndarray,
    k: int,
    metric: int = D.METRIC_L2,
    *,
    mesh: Mesh,
):
    """Exact re-rank of candidate ids against row-sharded full-precision
    storage — IndexRefineFlat's k_factor step at mesh scale (the sharded
    coded scan supplies the candidates; IndexRefine.h semantics).

    Each shard scores only the candidates whose rows it owns (the rest
    contribute worst-value), an all_gather-min combines ownership, and
    top-k runs on the replica-split queries. xb must be evenly
    divisible by the shard axis (shard_rows); cand_ids is (nq, R)
    GLOBAL ids with -1 = empty slot. Returns replicated (D, I)."""
    n_shards = mesh.shape["shard"]
    shard_size = xb.shape[0] // n_shards
    similarity = D.is_similarity_metric(metric)
    worst = D.worst_value(metric)

    def local(xq_l, cand_l, xb_l):
        base = lax.axis_index("shard") * shard_size
        lid = cand_l - base
        ok = (cand_l >= 0) & (lid >= 0) & (lid < shard_size)
        rows = xb_l[jnp.clip(lid, 0, shard_size - 1)]     # (nq_l, R, d)
        if similarity:
            dis = jnp.einsum("qd,qrd->qr", xq_l, rows)
        else:
            dif = xq_l[:, None, :] - rows
            dis = jnp.sum(dif * dif, axis=-1)
        dis = jnp.where(ok, dis, worst)
        # every candidate id is owned by exactly one shard
        dg = lax.all_gather(dis, "shard")                 # (S, nq_l, R)
        dis = dg.max(0) if similarity else dg.min(0)
        kk = min(k, cand_l.shape[1])
        nd, sel = lax.top_k(dis if similarity else -dis, kk)
        d_m = nd if similarity else -nd
        i_m = jnp.take_along_axis(cand_l, sel, axis=1)
        i_m = jnp.where(d_m == worst, -1, i_m)
        d_all = lax.all_gather(d_m, "replica", axis=0, tiled=True)
        i_all = lax.all_gather(i_m, "replica", axis=0, tiled=True)
        return d_all, i_all

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("replica", None), P("replica", None),
                  P("shard", None)),
        out_specs=(P(None, None), P(None, None)),
    )
    return fn(xq, cand_ids, xb)


def kmeans_distributed(
    x: np.ndarray,
    k: int,
    *,
    mesh: Mesh,
    niter: int = 25,
    seed: int = 1234,
    verbose: bool = False,
) -> np.ndarray:
    """Full distributed Lloyd's driver (the reference's
    benchs/distributed_ondisk/distributed_kmeans.py client loop): data
    row-sharded over the mesh, centroids replicated, one `psum`ed
    iteration per round, empty clusters re-seeded host-side like
    split_clusters. Returns (k, d) centroids."""
    from ..ops.kmeans import ClusteringParameters, subsample_training_set

    cp = ClusteringParameters(niter=niter, seed=seed)
    x = np.ascontiguousarray(x, np.float32)
    xt = subsample_training_set(x, k, cp.max_points_per_centroid, seed)
    n_shards = mesh.shape["shard"] * mesh.shape.get("replica", 1)
    total = mesh.shape["shard"] * mesh.shape["replica"]
    pad = (-len(xt)) % total
    if pad:
        # pad with repeats (weightless enough at subsample scale)
        xt = np.concatenate([xt, xt[:pad]])
    rs = np.random.RandomState(seed)
    cent = jnp.asarray(xt[rs.choice(len(xt), k, replace=False)])
    x_dev = jnp.asarray(xt)
    for it in range(niter):
        cent, counts, obj = sharded_kmeans_iter(x_dev, cent, k, mesh=mesh)
        counts_h = np.asarray(counts)
        empty = np.nonzero(counts_h == 0)[0]
        if len(empty):
            cent_h = np.asarray(cent)
            donors = np.argsort(-counts_h)[: len(empty)]
            cent_h[empty] = cent_h[donors] * (1 + 1e-3)
            cent = jnp.asarray(cent_h)
        if verbose:
            print(f"  distributed kmeans iter {it}: obj={float(obj):.4g} "
                  f"empty={len(empty)}")
    return np.asarray(cent)


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) bring-up — the role of the reference's Slurm env
    parsing (SLURM_NPROCS/SLURM_PROCID in distributed_ondisk): delegates
    to jax.distributed.initialize, after which `jax.devices()` spans all
    hosts and the same Mesh code runs over ICI within a slice and DCN
    across slices. No-op when already initialized or single-host."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment
