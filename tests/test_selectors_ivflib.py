"""ID selectors, interrupt/timeout, IVF surgery, balance manager —
reference: tests/test_search_params.py (selectors), test_callback*.py
(interrupt), and the fork's 20-hnsw-ivf-balance.py capability."""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.hnsw import IndexHNSWFlat, SearchParametersHNSW
from tpu_ann.models.ivf import SearchParametersIVF, make_ivf_flat
from tpu_ann.models.selectors import (
    IDSelectorAnd,
    IDSelectorArray,
    IDSelectorBitmap,
    IDSelectorNot,
    IDSelectorOr,
    IDSelectorRange,
    IDSelectorXOr,
)
from tpu_ann.models.base import SearchParameters
from tpu_ann.utils.interrupt import (
    FunctionInterrupt,
    InterruptCallback,
    InterruptError,
    TimeoutGuard,
)
from tpu_ann.utils.ivflib import (
    ClusterManager,
    SlidingIndexWindow,
    extract_index_ivf,
    replace_ivf_quantizer,
)


def test_selector_range_flat(small_ds):
    flat = IndexFlat(small_ds.d)
    flat.add(small_ds.get_database())
    sel = IDSelectorRange(100, 200)
    D, I = flat.search(small_ds.get_queries(), 10,
                       params=SearchParameters(sel=sel))
    assert ((I >= 100) & (I < 200)).all()
    # oracle: brute force over the restricted set
    xb = small_ds.get_database()
    sub = IndexFlat(small_ds.d)
    sub.add(xb[100:200])
    _, I2 = sub.search(small_ds.get_queries(), 10)
    assert (I - 100 == I2).mean() > 0.95


def test_selector_combinators():
    a = IDSelectorRange(0, 100)
    b = IDSelectorArray([50, 150])
    assert IDSelectorAnd(a, b).make_bitmap(200).sum() == 1
    assert IDSelectorOr(a, b).make_bitmap(200).sum() == 101
    assert IDSelectorNot(a).make_bitmap(200).sum() == 100
    assert IDSelectorXOr(a, b).make_bitmap(200).sum() == 100
    bm = np.zeros(25, np.uint8)
    bm[0] = 0b1  # id 0 only
    assert IDSelectorBitmap(bm).make_bitmap(200).sum() == 1


def test_selector_ivf(small_ds):
    idx = make_ivf_flat(small_ds.d, 16)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    sel = IDSelectorRange(0, 500)
    D, I = idx.search(small_ds.get_queries(), 10,
                      params=SearchParametersIVF(sel=sel))
    valid = I[I >= 0]
    assert (valid < 500).all()


def test_selector_hnsw(small_ds):
    idx = IndexHNSWFlat(small_ds.d, M=8)
    idx.hnsw.efSearch = 64
    idx.add(small_ds.get_database())
    sel = IDSelectorRange(0, 1000)
    D, I = idx.search(small_ds.get_queries(), 5,
                      params=SearchParametersHNSW(sel=sel))
    assert (I[I >= 0] < 1000).all()


def test_interrupt_kmeans(small_ds):
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans

    calls = []

    def trip():
        calls.append(1)
        return len(calls) > 2

    InterruptCallback.set(FunctionInterrupt(trip))
    try:
        with pytest.raises(InterruptError):
            kmeans(small_ds.get_train(), 8,
                   ClusteringParameters(niter=20, seed=0))
    finally:
        InterruptCallback.clear()


def test_timeout_guard_noop(small_ds):
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans

    with TimeoutGuard(300.0):  # generous: must NOT trip
        cent, _ = kmeans(small_ds.get_train(), 8,
                         ClusteringParameters(niter=3, seed=0))
    assert cent.shape == (8, small_ds.d)
    assert InterruptCallback.get() is None


def test_extract_and_replace_quantizer(small_ds):
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(small_ds.d, "PCA16,Flat")
    with pytest.raises(TypeError):
        extract_index_ivf(idx)
    ivf = index_factory(small_ds.d, "IVF16,Flat")
    ivf.cp.niter = 4
    ivf.train(small_ds.get_train())
    ivf.add(small_ds.get_database())
    assert extract_index_ivf(ivf) is ivf
    # replace quantizer with an HNSW over the same centroids
    cents = np.asarray(ivf.quantizer.vectors)
    hq = IndexHNSWFlat(small_ds.d, M=8)
    hq.add(cents)
    replace_ivf_quantizer(ivf, hq)
    ivf.nprobe = 8
    _, I = ivf.search(small_ds.get_database()[:5], 1)
    assert (I[:, 0] == np.arange(5)).all()


def test_cluster_manager_balance(small_ds):
    idx = make_ivf_flat(small_ds.d, 8)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    big = int(idx.list_sizes.max())
    cm = ClusterManager(idx, max_cell_size=big - 1, split_k=2)
    created = cm.balance(max_rounds=4)
    assert created >= 1
    assert idx.nlist > 8
    assert idx.list_sizes.sum() == small_ds.nb
    idx.nprobe = idx.nlist
    _, I = idx.search(small_ds.get_database()[:5], 1)
    assert (I[:, 0] == np.arange(5)).all()


def test_sliding_window(small_ds):
    idx = make_ivf_flat(small_ds.d, 8)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    win = SlidingIndexWindow(idx, nslice=2)
    xb = small_ds.get_database()
    win.step(xb[:1000], np.arange(1000))
    win.step(xb[1000:2000], np.arange(1000, 2000))
    assert idx.ntotal == 2000
    win.step(xb[2000:3000], np.arange(2000, 3000))
    assert idx.ntotal == 2000  # oldest slice dropped
    idx.nprobe = 8
    _, I = idx.search(xb[2500:2505], 1)
    assert (I[:, 0] == np.arange(2500, 2505)).all()


def test_remove_ids_flat(small_ds):
    flat = IndexFlat(small_ds.d)
    flat.add(small_ds.get_database())
    n0 = flat.ntotal
    removed = flat.remove_ids(IDSelectorRange(0, 100))
    assert removed == 100 and flat.ntotal == n0 - 100
    D, I = flat.search(small_ds.get_database()[:5], 1)
    assert (D[:, 0] > 1e-6).all()  # originals gone


def test_remove_and_update_ivf(small_ds):
    idx = make_ivf_flat(small_ds.d, 16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    removed = idx.remove_ids(IDSelectorRange(0, 50))
    assert removed == 50 and idx.ntotal == small_ds.nb - 50
    idx.nprobe = 16
    _, I = idx.search(small_ds.get_database()[:5], 1)
    assert (I[:, 0] >= 50).all()
    # update: move vector 100 to a new location
    newv = small_ds.get_train()[:1]
    idx.update_vectors(np.array([100]), newv)
    _, I2 = idx.search(newv, 1)
    assert I2[0, 0] == 100
