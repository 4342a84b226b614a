"""NN-Descent / NSG tests (reference: tests/test_graph_based.py,
test_build_blocks NNDescent section)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.nsg import IndexNNDescentFlat, IndexNSGFlat
from tpu_ann.ops.nndescent import nn_descent
from tpu_ann.utils.evaluation import recall_at_r


def test_nn_descent_graph_quality(small_ds):
    """NN-descent graph must approximate the exact k-NN graph."""
    xb = small_ds.get_database()[:1000]
    vec = jnp.asarray(xb)
    graph, dist = nn_descent(vec, 8, iters=8)
    from tpu_ann.ops import distances as D

    _, exact = D.knn(vec, vec, 9)   # self + 8
    exact = np.asarray(exact)[:, 1:]
    g = np.asarray(graph)
    inter = np.mean([len(np.intersect1d(g[i], exact[i])) / 8
                     for i in range(1000)])
    assert inter > 0.85, inter


def test_nndescent_index_recall(small_ds):
    idx = IndexNNDescentFlat(small_ds.d, K=16)
    idx.add(small_ds.get_database())
    idx.efSearch = 64
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.85


def test_nsg_index_recall(small_ds):
    idx = IndexNSGFlat(small_ds.d, R=16)
    idx.add(small_ds.get_database())
    idx.efSearch = 64
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.8


def test_nsg_self_search(small_ds):
    idx = IndexNSGFlat(small_ds.d, R=16)
    idx.add(small_ds.get_database())
    idx.efSearch = 32
    D, I = idx.search(small_ds.get_database()[:20], 1)
    assert (I[:, 0] == np.arange(20)).mean() > 0.8


# --- coded storage variants (IndexNSG.h:91,104) ----------------------------

def test_nsg_pq_recall_and_reconstruct(small_ds):
    """IndexNSGPQ: graph over PQ codes — recall bounded by the codec, so
    compare against brute-force over the DECODED rows (the reference's
    storage distance), not the exact ground truth."""
    from tpu_ann.models.nsg import IndexNSGPQ
    from tpu_ann.ops import distances as D

    idx = IndexNSGPQ(small_ds.d, 8, R=16)
    idx.nnd_iters = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.efSearch = 64
    xq = small_ds.get_queries()
    _, I = idx.search(xq, 10)
    # codec-space ground truth: exact knn over reconstructions
    dec = np.vstack([idx.reconstruct(i) for i in range(0, 200)])
    assert dec.shape == (200, small_ds.d)
    recon = idx.sa_decode(idx.sa_encode(small_ds.get_database()))
    _, gt_codec = D.knn(jnp.asarray(xq), jnp.asarray(recon), 10)
    r = recall_at_r(I, np.asarray(gt_codec), 10)
    assert r > 0.8, r


def test_nsg_sq_recall(small_ds):
    from tpu_ann.models.nsg import IndexNSGSQ
    from tpu_ann.ops import sq as SQ

    idx = IndexNSGSQ(small_ds.d, SQ.QT_8BIT, R=16)
    idx.nnd_iters = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.efSearch = 64
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    # SQ8 reconstructions are near-exact: true-GT recall stays high
    assert recall_at_r(I, gt, 10) > 0.75


def test_nsg_coded_io_roundtrip(tmp_path, small_ds):
    from tpu_ann.models.nsg import IndexNSGPQ, IndexNSGSQ
    from tpu_ann.utils.index_io import read_index, write_index

    xq = small_ds.get_queries()[:10]
    for make in (lambda: IndexNSGPQ(small_ds.d, 4, R=8),
                 lambda: IndexNSGSQ(small_ds.d, R=8)):
        idx = make()
        idx.nnd_iters = 3
        idx.train(small_ds.get_train())
        idx.add(small_ds.get_database()[:1000])
        D0, I0 = idx.search(xq, 5)
        p = str(tmp_path / "nsg_coded.idx")
        write_index(idx, p)
        idx2 = read_index(p)
        D1, I1 = idx2.search(xq, 5)
        np.testing.assert_array_equal(I0, I1)
        np.testing.assert_allclose(D0, D1, rtol=1e-5)


def test_nsg_factory_spellings(small_ds):
    """`NSG32,PQ16` / `NSG16,SQ8` / bare `NSG24` factory grammar
    (index_factory.cpp parse_IndexNSG role)."""
    from tpu_ann.models.nsg import IndexNSGFlat, IndexNSGPQ, IndexNSGSQ
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(64, "NSG32,PQ16")
    assert isinstance(idx, IndexNSGPQ)
    assert idx.R == 32 and idx.pq_m == 16
    idx = index_factory(32, "NSG16,SQ8")
    assert isinstance(idx, IndexNSGSQ) and idx.R == 16
    idx = index_factory(32, "NSG24")
    assert isinstance(idx, IndexNSGFlat) and idx.R == 24
    idx = index_factory(32, "NSG8,PQ4x4")
    assert isinstance(idx, IndexNSGPQ) and idx.nbits == 4
