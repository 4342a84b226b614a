"""IndexFlat functional tests (role of tests/test_index_accuracy.py's Flat
cases + the fork's self-search sanity check)."""

import numpy as np

from tpu_ann import IndexFlatIP, IndexFlatL2
from tpu_ann.utils.evaluation import check_self_search, recall_at_r


def test_flat_l2_exact(small_ds):
    idx = IndexFlatL2(small_ds.d)
    idx.add(small_ds.get_database())
    assert idx.ntotal == small_ds.nb
    D, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 1) == 1.0
    assert (np.diff(D, axis=1) >= -1e-5).all()  # sorted ascending


def test_flat_self_search(small_ds):
    idx = IndexFlatL2(small_ds.d)
    idx.add(small_ds.get_database())
    assert check_self_search(idx, small_ds.get_database(), tol=1e-3)


def test_flat_incremental_add(rng):
    d = 16
    xb = rng.rand(3000, d).astype(np.float32)
    idx = IndexFlatL2(d)
    for i in range(0, 3000, 700):  # uneven chunks force capacity growth
        idx.add(xb[i : i + 700])
    assert idx.ntotal == 3000
    D, I = idx.search(xb[:7], 1)
    np.testing.assert_array_equal(I[:, 0], np.arange(7))
    np.testing.assert_allclose(D[:, 0], 0, atol=1e-4)


def test_flat_ip(rng):
    d = 8
    xb = rng.rand(200, d).astype(np.float32)
    xq = rng.rand(9, d).astype(np.float32)
    idx = IndexFlatIP(d)
    idx.add(xb)
    D, I = idx.search(xq, 5)
    ref = xq @ xb.T
    order = np.argsort(-ref, axis=1)[:, :5]
    np.testing.assert_allclose(
        D, np.take_along_axis(ref, order, 1), rtol=1e-5, atol=1e-5
    )
    assert (np.diff(D, axis=1) <= 1e-5).all()  # descending similarities


def test_flat_reconstruct(rng):
    d = 12
    xb = rng.rand(50, d).astype(np.float32)
    idx = IndexFlatL2(d)
    idx.add(xb)
    np.testing.assert_allclose(idx.reconstruct(7), xb[7], rtol=1e-6)
    np.testing.assert_allclose(idx.reconstruct_n(10, 5), xb[10:15], rtol=1e-6)


def test_flat_reset(rng):
    idx = IndexFlatL2(4)
    idx.add(rng.rand(10, 4).astype(np.float32))
    idx.reset()
    assert idx.ntotal == 0
    D, I = idx.search(rng.rand(2, 4).astype(np.float32), 3)
    assert (I == -1).all()


def test_flat_sa_codec(rng):
    d = 6
    x = rng.rand(5, d).astype(np.float32)
    idx = IndexFlatL2(d)
    codes = idx.sa_encode(x)
    assert codes.shape == (5, idx.sa_code_size())
    np.testing.assert_array_equal(idx.sa_decode(codes), x)
