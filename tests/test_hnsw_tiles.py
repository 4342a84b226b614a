"""Tile-granular HNSW traversal tests (ops/hnsw_tiles.py) — recall-parity
oracle like the reference's test_hnsw.cpp (recall/stats, not graph shape)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_ann.ops import distances as D
from tpu_ann.ops import hnsw as H
from tpu_ann.ops import hnsw_tiles as HT
from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.hnsw import IndexHNSWFlat
from tpu_ann.utils.evaluation import recall_at_r


@pytest.fixture(scope="module")
def data():
    import tpu_ann.utils.datasets as ds_mod

    ds = ds_mod.SyntheticDataset(d=32, nt=0, nb=12000, nq=100)
    xb, xq = ds.get_database(), ds.get_queries()
    flat = IndexFlat(32)
    flat.add(xb)
    _, gt = flat.search(xq, 10)
    return xb, xq, gt


@pytest.fixture(scope="module")
def tile_graph(data):
    xb, xq, gt = data
    graph, assign = H.build_graph_knn(jnp.asarray(xb), 16, 40)
    order = HT.spatial_order(xb, 32, assign=assign)
    tg = HT.build_tiles(xb, np.asarray(graph.neighbors0), order=order, b=32)
    return tg, graph


def test_knn_build_recall_per_node_search(data):
    """The batch kNN build must give per-node beam recall parity."""
    xb, xq, gt = data
    graph, _ = H.build_graph_knn(jnp.asarray(xb), 16, 40)
    Dv, Iv, _ = H.hnsw_search(jnp.asarray(xb), graph, jnp.asarray(xq),
                              ef=64, k=10)
    r = recall_at_r(np.asarray(Iv), gt, 10)
    assert r > 0.9, f"recall@10 {r}"


def test_tile_search_recall(tile_graph, data):
    xb, xq, gt = data
    tg, _ = tile_graph
    Dv, Iv, st = HT.tile_search(tg, jnp.asarray(xq), 10, ef=96,
                                refine_vectors=jnp.asarray(xb))
    r = recall_at_r(np.asarray(Iv), gt, 10)
    assert r > 0.85, f"recall@10 {r}"
    assert int(st["ndis"]) > 0 and int(st["nhops"]) > 0
    # the walk must not degenerate into a full scan
    assert int(st["ndis"]) < 0.6 * len(xb) * len(xq)


def test_tile_search_ids_and_distances(tile_graph, data):
    """Returned ids are node ids; distances match exact recomputation."""
    xb, xq, gt = data
    tg, _ = tile_graph
    Dv, Iv, _ = HT.tile_search(tg, jnp.asarray(xq[:10]), 5, ef=64,
                               refine_vectors=jnp.asarray(xb))
    Dv, Iv = np.asarray(Dv), np.asarray(Iv)
    for q in range(10):
        for j in range(5):
            if Iv[q, j] < 0:
                continue
            true = ((xq[q] - xb[Iv[q, j]]) ** 2).sum()
            assert abs(true - Dv[q, j]) < 1e-2 * max(true, 1.0)


def test_tile_search_self_query(tile_graph, data):
    xb, xq, gt = data
    tg, _ = tile_graph
    _, Iv, _ = HT.tile_search(tg, jnp.asarray(xb[:32]), 1, ef=32,
                              refine_vectors=jnp.asarray(xb))
    hit = (np.asarray(Iv)[:, 0] == np.arange(32)).mean()
    assert hit > 0.9


def test_tile_search_inner_product(data):
    xb, xq, gt = data
    graph, assign = H.build_graph_knn(jnp.asarray(xb), 16, 40,
                                      metric=D.METRIC_INNER_PRODUCT)
    order = HT.spatial_order(xb, 32, assign=assign)
    tg = HT.build_tiles(xb, np.asarray(graph.neighbors0), order=order, b=32)
    Dv, Iv, _ = HT.tile_search(tg, jnp.asarray(xq), 10, ef=96,
                               metric=D.METRIC_INNER_PRODUCT,
                               refine_vectors=jnp.asarray(xb))
    ips = xq @ xb.T
    gt_ip = np.argsort(-ips, axis=1)[:, :10]
    r = recall_at_r(np.asarray(Iv), gt_ip, 10)
    assert r > 0.8, f"IP recall@10 {r}"
    # similarities descending
    Dv = np.asarray(Dv)
    assert (np.diff(Dv, axis=1) <= 1e-3).all()


def test_incremental_add_extends_graph(data, monkeypatch):
    """A small second add must extend the graph (wave continuation), not
    rebuild it, and keep recall (hnsw_add_vertices on non-empty index)."""
    xb, xq, gt = data
    index = IndexHNSWFlat(32, M=16)
    index.hnsw.efConstruction = 40
    index.add(xb[:9000])
    calls = []
    orig = H.build_graph_knn
    monkeypatch.setattr(H, "build_graph_knn",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    index.add(xb[9000:])
    assert not calls, "small add must not trigger a full rebuild"
    assert index.graph.n == len(xb)
    index.hnsw.efSearch = 96
    index.hnsw.tile_threshold = 10**9   # per-node path: isolate graph quality
    _, I = index.search(xq, 10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.85, f"recall@10 after incremental add {r}"


def test_index_hnsw_tile_path(data):
    """IndexHNSW routes through tiles above the threshold and keeps
    recall; below it, the per-node path answers identically-shaped."""
    xb, xq, gt = data
    index = IndexHNSWFlat(32, M=16)
    index.hnsw.efConstruction = 40
    index.hnsw.tile_threshold = 4096   # force tile path (nb=12000)
    index.add(xb)
    assert index._use_tiles()
    index.hnsw.efSearch = 96
    _, I, st = index.search_stats(xq, 10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.85, f"recall@10 {r}"
    assert st.ndis > 0


def test_tile_search_fused_interpret(rng):
    """Fused tile search (hop-0 centroid route + Pallas scans + graph
    hops) reaches the recall of the exact oracle on a small clustered
    set (interpret mode on CPU)."""
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops.hnsw import build_graph_knn
    from tpu_ann.ops.hnsw_tiles import (build_tiles_fused, spatial_order,
                                        tile_search_fused)

    n, d, nq, k = 4000, 32, 64, 10
    cents = rng.rand(24, d).astype(np.float32) * 6
    xb = (cents[rng.randint(24, size=n)]
          + rng.randn(n, d).astype(np.float32) * 0.7)
    xq = (cents[rng.randint(24, size=nq)]
          + rng.randn(nq, d).astype(np.float32) * 0.7)

    import jax

    graph, _ = build_graph_knn(jax.numpy.asarray(xb), 8, 40)
    order = spatial_order(xb, 32)
    ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                            order=order, b=32)
    Dv, Pv, Iv = tile_search_fused(
        ftg, jnp.asarray(xq), k, nprobe0=8, hops=2, expand=8, F=8,
        kp=8, rk=32, interpret=True)
    Iv = np.asarray(Iv)
    _, gt = D.knn(jnp.asarray(xq), jnp.asarray(xb), k)
    gt = np.asarray(gt)
    rec = np.mean([len(set(Iv[q]) & set(gt[q])) / k for q in range(nq)])
    assert rec >= 0.85, rec
    # positions map back consistently: distances match exact recompute
    Dv, Pv = np.asarray(Dv), np.asarray(Pv)
    q0 = 0
    for j in range(k):
        if Iv[q0, j] >= 0:
            true = np.sum((xq[q0] - xb[Iv[q0, j]]) ** 2)
            np.testing.assert_allclose(Dv[q0, j], true, rtol=1e-3)


def test_index_hnsw_pq():
    """IndexHNSWPQ: PQ-coded storage, ADC search (small-n decode path +
    coded tile path semantics on CPU)."""
    import jax.numpy as jnp

    from tpu_ann.models.hnsw import IndexHNSWPQ
    from tpu_ann.ops import distances as D

    rng = np.random.RandomState(5)    # own stream: order-independent
    n, d = 3000, 32
    cents = rng.rand(16, d).astype(np.float32) * 6
    xb = cents[rng.randint(16, size=n)] + rng.randn(n, d).astype(
        np.float32) * 0.5
    xq = cents[rng.randint(16, size=64)] + rng.randn(64, d).astype(
        np.float32) * 0.5

    idx = IndexHNSWPQ(d, pq_m=8, M=8)
    idx.hnsw.tile_threshold = 10**9       # force small-n decode path
    idx.hnsw.efSearch = 48
    idx.train(xb)
    idx.add(xb)
    assert idx._codes.shape == (n, 8)
    Dv, Iv = idx.search(xq, 10)
    # oracle = ADC brute force (the codec bounds recall vs exact GT;
    # the graph search should track the codec's own ranking)
    from tpu_ann.ops import pq as PQ

    dec = np.asarray(PQ.pq_decode(jnp.asarray(idx._codes),
                                  jnp.asarray(idx.pq.centroids)))
    full = ((xq[:, None, :] - dec[None]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :10]
    rec = np.mean([len(set(Iv[q]) & set(gt[q])) / 10 for q in range(64)])
    assert rec > 0.7, rec
    r = idx.reconstruct(5)
    assert r.shape == (d,)


def test_tile_search_pq_interpret(rng):
    """Coded tile traversal matches ADC brute force reasonably."""
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops import pq as PQ
    from tpu_ann.ops.hnsw import build_graph_knn
    from tpu_ann.ops.hnsw_tiles import (build_tiles_pq, spatial_order,
                                        tile_search_pq)

    n, d, nq, k = 4000, 32, 48, 10
    cents = rng.rand(24, d).astype(np.float32) * 6
    xb = cents[rng.randint(24, size=n)] + rng.randn(n, d).astype(
        np.float32) * 0.7
    xq = cents[rng.randint(24, size=nq)] + rng.randn(nq, d).astype(
        np.float32) * 0.7
    pq = PQ.train_pq(xb, 8, 8, niter=8)
    codes = np.asarray(PQ.pq_encode(jnp.asarray(xb),
                                    jnp.asarray(pq.centroids)))
    graph, _ = build_graph_knn(jnp.asarray(xb), 8, 40)
    order = spatial_order(xb, 128)
    ptg = build_tiles_pq(xb, codes, pq.centroids,
                         np.asarray(graph.neighbors0), order=order, b=128)
    Dv, Pv, Iv = tile_search_pq(ptg, jnp.asarray(xq), k, nprobe0=6,
                                hops=2, expand=8, F=4, rk=32)
    Iv = np.asarray(Iv)
    # oracle: ADC over all codes
    dec = np.asarray(PQ.pq_decode(jnp.asarray(codes),
                                  jnp.asarray(pq.centroids)))
    full = ((xq[:, None, :] - dec[None]) ** 2).sum(-1)
    gt = np.argsort(full, axis=1)[:, :k]
    rec = np.mean([len(set(Iv[q]) & set(gt[q])) / k for q in range(nq)])
    assert rec >= 0.7, rec


def test_index_hnsw_2level(rng):
    from tpu_ann.models.hnsw import IndexHNSW2Level

    n, d = 2000, 32
    xb = rng.rand(n, d).astype(np.float32)
    idx = IndexHNSW2Level(d, nlist=32, pq_m=8, M=8)
    idx.hnsw.tile_threshold = 10**9
    idx.train(xb)
    idx.add(xb)
    codes = idx.sa_encode(xb[:10])
    rec = idx.sa_decode(codes)
    assert rec.shape == (10, d)
    Dv, Iv = idx.search(xb[:20], 5)
    # decoded-space self-search: stored reconstruction of row i is the
    # nearest decoded point to x_i most of the time
    assert (Iv[:, 0] == np.arange(20)).mean() > 0.6


def test_tile_search_fused_bf16_storage(rng):
    """FusedTileGraph with compressed (bf16) tile storage — the
    IndexHNSWSQ memory contract through the fused path."""
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops.hnsw import build_graph_knn
    from tpu_ann.ops.hnsw_tiles import (build_tiles_fused, spatial_order,
                                        tile_search_fused)

    rng2 = np.random.RandomState(11)
    n, d, nq, k = 3000, 32, 48, 10
    cents = rng2.rand(16, d).astype(np.float32) * 6
    xb = cents[rng2.randint(16, size=n)] + rng2.randn(n, d).astype(
        np.float32) * 0.6
    xq = cents[rng2.randint(16, size=nq)] + rng2.randn(nq, d).astype(
        np.float32) * 0.6
    graph, _ = build_graph_knn(jnp.asarray(xb), 8, 40)
    order = spatial_order(xb, 128)
    ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                            order=order, b=128)
    ftg.il.data = ftg.il.data.astype(jnp.bfloat16)
    Dv, Pv, Iv = tile_search_fused(ftg, jnp.asarray(xq), k, nprobe0=6,
                                   hops=2, expand=8, F=4, rk=32,
                                   interpret=True)
    Iv = np.asarray(Iv)
    _, gt = D.knn(jnp.asarray(xq), jnp.asarray(xb), k)
    gt = np.asarray(gt)
    rec = np.mean([len(set(Iv[q]) & set(gt[q])) / k for q in range(nq)])
    assert rec >= 0.8, rec


def test_hnswpq_hnswsq_io_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tpu_ann.models.hnsw import IndexHNSWPQ, IndexHNSWSQ
    from tpu_ann.utils import index_io

    rng = np.random.RandomState(9)
    xb = rng.rand(1200, 32).astype(np.float32)

    sq = IndexHNSWSQ(32, "float16", M=8)
    sq.add(xb)
    p = str(tmp_path / "sq.tann")
    index_io.write_index(sq, p)
    back = index_io.read_index(p)
    assert back.storage_dtype == "float16" and back.ntotal == 1200
    D0, I0 = sq.search(xb[:10], 5)
    D1, I1 = back.search(xb[:10], 5)
    np.testing.assert_array_equal(I0, I1)

    pq = IndexHNSWPQ(32, pq_m=8, M=8)
    pq.hnsw.tile_threshold = 10**9
    pq.train(xb)
    pq.add(xb)
    p = str(tmp_path / "pq.tann")
    index_io.write_index(pq, p)
    back = index_io.read_index(p)
    assert back.ntotal == 1200 and back._codes.shape == (1200, 8)
    back.hnsw.tile_threshold = 10**9
    D0, I0 = pq.search(xb[:10], 5)
    D1, I1 = back.search(xb[:10], 5)
    np.testing.assert_array_equal(I0, I1)


def test_hnswsq_int8_coded_tiles(small_ds):
    """IndexHNSWSQ(int8): fused tiles hold SQ8 codes (quarter f32 bytes),
    the raw storage is dropped (codes are the authority), reconstruct
    dequantizes, serialization round-trips, and add-after-drop restores
    the rows for the rebuild."""
    import jax.numpy as jnp

    from tpu_ann.models.hnsw import IndexHNSWSQ
    from tpu_ann.ops.ivf_scan import PackedInvListsSQ8

    xb = small_ds.get_database()[:3000]
    idx = IndexHNSWSQ(small_ds.d, "int8", 8)
    assert idx.storage_dtype == "sq8"
    idx.hnsw.tile_threshold = 1000
    idx.add(xb)
    ftg = idx._ensure_tiles_fused()
    assert isinstance(ftg.il, PackedInvListsSQ8)
    assert ftg.il.data.dtype == jnp.uint8
    assert idx._storage_dropped()

    # reconstruct = dequantized storage (8-bit/dim accuracy)
    r = idx.reconstruct(7)
    err = np.abs(r - xb[7]).max()
    rng_span = xb.max() - xb.min()
    assert err < rng_span / 128, (err, rng_span)

    # io round-trip preserves ntotal + graph + storage precision
    import os
    import tempfile

    from tpu_ann.utils import index_io

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "sq8.tann")
        index_io.write_index(idx, p)
        idx2 = index_io.read_index(p)
    assert idx2.ntotal == idx.ntotal and idx2.storage_dtype == "sq8"
    np.testing.assert_allclose(idx2.reconstruct(7), r, rtol=1e-5)

    # add after the drop restores rows and extends the graph
    extra = small_ds.get_database()[3000:3100]
    idx.add(extra)
    assert idx.ntotal == 3100
    _, Iv = idx.search(np.concatenate([xb[:2], extra[:1]]), 4)
    assert set(np.asarray(Iv)[:, 0]) == {0, 1, 3000}


def test_tile_search_fused_sq8_interpret(rng):
    """ops-level: tile_search_fused over an SQ8 FusedTileGraph matches
    the f32 variant (interpret mode; storage-precision refine)."""
    import jax.numpy as jnp

    from tpu_ann.ops import hnsw as H
    from tpu_ann.ops.hnsw_tiles import build_tiles_fused, tile_search_fused
    from tpu_ann.ops.ivf_scan import sq8_requantize_invlists

    n, d = 2000, 32
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(32, d).astype(np.float32)
    graph, assign = H.build_graph_knn(jnp.asarray(xb), 8, 24)
    ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0), b=128)
    D0, P0, I0 = tile_search_fused(ftg, jnp.asarray(xq), 5, nprobe0=4,
                                   hops=1, interpret=True)
    ftg.il = sq8_requantize_invlists(ftg.il)
    D1, P1, I1 = tile_search_fused(ftg, jnp.asarray(xq), 5, nprobe0=4,
                                   hops=1, interpret=True)
    overlap = np.mean([len(set(np.asarray(I1)[q]) & set(np.asarray(I0)[q]))
                       / 5 for q in range(len(xq))])
    assert overlap > 0.9, overlap


def test_tile_search_fused_inner_product(rng):
    """IP metric through the fused tile path (was NotImplementedError;
    the reference's graph search is metric-generic via
    NegativeDistanceComputer, impl/DistanceComputer.h)."""
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops.hnsw import build_graph_knn
    from tpu_ann.ops.hnsw_tiles import (build_tiles_fused, spatial_order,
                                        tile_search_fused)

    n, d, nq, k = 4000, 32, 64, 10
    cents = rng.rand(24, d).astype(np.float32) * 6
    xb = (cents[rng.randint(24, size=n)]
          + rng.randn(n, d).astype(np.float32) * 0.7)
    xq = (cents[rng.randint(24, size=nq)]
          + rng.randn(nq, d).astype(np.float32) * 0.7)

    graph, _ = build_graph_knn(jax.numpy.asarray(xb), 8, 40)
    order = spatial_order(xb, 32)
    ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                            order=order, b=32)
    Dv, Pv, Iv = tile_search_fused(
        ftg, jnp.asarray(xq), k, nprobe0=8, hops=2, expand=8, F=8,
        kp=8, rk=32, metric=D.METRIC_INNER_PRODUCT, interpret=True)
    Iv = np.asarray(Iv)
    _, gt = D.knn(jnp.asarray(xq), jnp.asarray(xb), k,
                  D.METRIC_INNER_PRODUCT)
    gt = np.asarray(gt)
    rec = np.mean([len(set(Iv[q]) & set(gt[q])) / k for q in range(nq)])
    assert rec >= 0.85, rec
    # returned scores are true inner products (descending)
    Dv = np.asarray(Dv)
    q0 = int(np.argmax(Iv[:, 0] >= 0))
    for j in range(k):
        if Iv[q0, j] >= 0:
            true = float(np.dot(xq[q0], xb[Iv[q0, j]]))
            assert abs(Dv[q0, j] - true) < 1e-2 * max(1.0, abs(true))
    assert np.all(np.diff(Dv[q0][Iv[q0] >= 0]) <= 1e-4)
