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
