"""Inspect tools + adaptive range search (contrib/inspect_tools.py,
contrib/exhaustive_search.py:range_search_max_results roles)."""
import numpy as np
import pytest

from tpu_ann.utils.contrib import (get_linear_transform, get_pq_centroids,
                                   range_search_max_results)
from tpu_ann.utils.factory import index_factory


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(3)
    xb = rs.randn(3000, 24).astype(np.float32)
    return xb


def test_get_pq_centroids(data):
    idx = index_factory(24, "PQ4x8")
    idx.train(data)
    cent = get_pq_centroids(idx)
    assert cent.shape == (4, 256, 6)
    with pytest.raises(ValueError):
        get_pq_centroids(index_factory(24, "Flat"))


def test_get_linear_transform(data):
    from tpu_ann.models.transforms import PCAMatrix

    vt = PCAMatrix(24, 8)
    vt.train(data)
    A, b = get_linear_transform(vt)
    got = data[:5] @ A.T + b
    np.testing.assert_allclose(got, vt.apply(data[:5]), rtol=1e-4,
                               atol=1e-4)


def test_range_search_max_results(data):
    idx = index_factory(24, "Flat")
    idx.add(data)
    xq = data[:64]
    # generous radius would return far more than max_results
    big_r = 40.0
    lims0, D0, I0 = idx.range_search(xq, big_r)
    assert len(D0) > 2000

    r, lims, D, I = range_search_max_results(
        idx, xq, big_r, max_results=1500, batch_size=16)
    assert len(D) <= 1500
    assert r < big_r
    assert lims[0] == 0 and lims[-1] == len(D)
    assert len(lims) == len(xq) + 1
    # surviving results are exactly the reference search at the final
    # radius (modulo boundary ties)
    limsr, Dr, Ir = idx.range_search(xq, r)
    for q in range(len(xq)):
        got = set(I[lims[q]:lims[q + 1]])
        ref = set(Ir[limsr[q]:limsr[q + 1]])
        assert got.issubset(ref | got)  # sanity: well-formed CSR
        # every kept distance is within the tightened radius
        assert np.all(D[lims[q]:lims[q + 1]] <= r + 1e-5)
    # self-match must survive (distance 0)
    for q in range(len(xq)):
        assert q in I[lims[q]:lims[q + 1]]


def test_range_search_max_results_no_tighten(data):
    idx = index_factory(24, "Flat")
    idx.add(data)
    xq = data[:8]
    r0 = 1e-3
    r, lims, D, I = range_search_max_results(
        idx, xq, r0, max_results=1000, batch_size=4)
    assert r == r0                       # never needed to tighten
    lims0, D0, I0 = idx.range_search(xq, r0)
    np.testing.assert_array_equal(lims, lims0)
    np.testing.assert_array_equal(np.sort(I), np.sort(I0))


def test_index_api_conveniences(data):
    """assign / reconstruct_batch / search_and_reconstruct / merge_from
    (faiss/Index.h:104,231,244 + Index::merge_from)."""
    idx = index_factory(24, "Flat")
    idx.add(data[:2000])

    lab = idx.assign(data[:5], k=3)
    assert lab.shape == (5, 3) and (lab[:, 0] == np.arange(5)).all()

    rb = idx.reconstruct_batch([3, 7, 1])
    np.testing.assert_allclose(rb, data[[3, 7, 1]], rtol=1e-6)

    D, I, R = idx.search_and_reconstruct(data[:4], 2)
    assert R.shape == (4, 2, 24)
    np.testing.assert_allclose(R[:, 0], data[:4], rtol=1e-5, atol=1e-5)

    other = index_factory(24, "Flat")
    other.add(data[2000:2500])
    idx.merge_from(other)
    assert idx.ntotal == 2500 and other.ntotal == 0
    np.testing.assert_allclose(idx.reconstruct(2400), data[2400],
                               rtol=1e-6)


def test_ivf_merge_from(data):
    from tpu_ann.models.ivf import make_ivf_flat

    a = make_ivf_flat(24, 16)
    a.cp.niter = 4
    a.train(data[:1500])
    b = make_ivf_flat(24, 16)
    b.quantizer = a.quantizer          # shared trained quantizer
    b.is_trained = True
    b._cent_dev = getattr(a, "_cent_dev", None)
    a.add_with_ids(data[:1000], np.arange(1000, dtype=np.int64))
    b.add_with_ids(data[1000:1600],
                   np.arange(1000, 1600, dtype=np.int64))
    a.merge_from(b)
    assert a.ntotal == 1600 and b.ntotal == 0
    D, I = a.search(data[1200:1210], 1)
    assert (I[:, 0] == np.arange(1200, 1210)).all()
