"""Long-tail index types (LSH, RowwiseMinMax, IMI, 2Layer, SplitVectors,
Random) — reference: tests/test_index.py / test_index_composite.py."""

import numpy as np
import pytest

from tpu_ann.models.extra import (
    Index2Layer,
    IndexLSH,
    IndexRandom,
    IndexRowwiseMinMax,
    IndexSplitVectors,
    MultiIndexQuantizer,
)
from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.pq import IndexScalarQuantizer
from tpu_ann.utils.evaluation import recall_at_r


def test_lsh_recall(small_ds):
    idx = IndexLSH(small_ds.d, nbits=128)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.4, r   # 128-bit sketches of 32d: coarse but useful


def test_lsh_code_size(small_ds):
    idx = IndexLSH(small_ds.d, nbits=64)
    idx.train(small_ds.get_train())
    codes = idx.sa_encode(small_ds.get_database()[:10])
    assert codes.shape == (10, 8)


def test_rowwise_minmax(small_ds):
    sub = IndexScalarQuantizer(small_ds.d)
    idx = IndexRowwiseMinMax(sub)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    assert idx.ntotal == small_ds.nb
    # reconstruct approximately inverts the normalization
    rec = idx.reconstruct(3)
    orig = small_ds.get_database()[3]
    assert np.abs(rec - orig).max() < 0.05 * np.abs(orig).max() + 0.05


def test_multi_index_quantizer(small_ds):
    imi = MultiIndexQuantizer(small_ds.d, M=2, nbits=4)
    imi.train(small_ds.get_train())
    assert imi.ntotal == 16 * 16
    D, I = imi.search(small_ds.get_queries()[:10], 5)
    assert (I >= 0).all() and (I < 256).all()
    # distances ascending per row
    assert (np.diff(D, axis=1) >= -1e-5).all()
    with pytest.raises(RuntimeError):
        imi.add(small_ds.get_database())


def test_index2layer_and_conversion(small_ds):
    q1 = IndexFlat(small_ds.d)
    idx = Index2Layer(q1, nlist=16, M=8)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r2l = recall_at_r(I, gt, 10)
    assert r2l > 0.6, r2l
    ivfpq = idx.to_ivfpq()
    ivfpq.nprobe = 16
    _, I2 = ivfpq.search(small_ds.get_queries(), 10)
    assert recall_at_r(I2, gt, 10) > 0.5


def test_split_vectors(small_ds):
    d = small_ds.d
    sv = IndexSplitVectors(d)
    sv.add_sub_index(IndexFlat(d // 2))
    sv.add_sub_index(IndexFlat(d - d // 2))
    xb = small_ds.get_database()[:500]
    sv.add(xb)
    D, I = sv.search(small_ds.get_queries()[:20], 5)
    flat = IndexFlat(d)
    flat.add(xb)
    Df, If = flat.search(small_ds.get_queries()[:20], 5)
    assert (I[:, 0] == If[:, 0]).all()   # split L2 sums to full L2
    np.testing.assert_allclose(D, Df, rtol=1e-3, atol=1e-3)


def test_index_random():
    idx = IndexRandom(16, ntotal=1000)
    D, I = idx.search(np.zeros((4, 16), np.float32), 5)
    D2, I2 = idx.search(np.zeros((4, 16), np.float32), 5)
    assert (I == I2).all()  # deterministic
    assert (I < 1000).all()


def test_kmeans1d_exact(rng):
    from tpu_ann.ops.kmeans import kmeans1d

    # three well-separated 1-D clusters: DP must find them exactly
    x = np.concatenate([rng.randn(50) * 0.1, rng.randn(50) * 0.1 + 10,
                        rng.randn(50) * 0.1 + 20])
    cent, assign = kmeans1d(x, 3)
    assert len(np.unique(assign)) == 3
    assert np.allclose(sorted(cent), [0, 10, 20], atol=0.2)
    # same-cluster points share assignment
    assert len(np.unique(assign[:50])) == 1


def test_index_flat_1d(rng):
    from tpu_ann.models.flat import IndexFlat1D

    idx = IndexFlat1D()
    vals = rng.rand(500, 1).astype(np.float32)
    idx.add(vals)
    D, I = idx.search(vals[:10], 3)
    # ties between equal values make the exact id ambiguous; the matched
    # VALUE must be exact with distance 0
    assert np.allclose(vals[I[:, 0], 0], vals[:10, 0])
    assert np.allclose(D[:, 0], 0)
    # oracle vs brute force
    q = rng.rand(5, 1).astype(np.float32)
    D2, I2 = idx.search(q, 5)
    dis = (vals[:, 0][None, :] - q[:, 0][:, None]) ** 2
    exact = np.sort(dis, axis=1)[:, :5]
    assert np.allclose(np.sort(D2, axis=1), exact, atol=1e-6)
