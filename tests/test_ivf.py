"""IVF-Flat + k-means tests — recall-threshold style like the reference's
tests/test_index_accuracy.py, plus exact invariants on the packed layout."""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.ivf import IndexIVFFlat, SearchParametersIVF, make_ivf_flat
from tpu_ann.ops import distances as D
from tpu_ann.ops.kmeans import ClusteringParameters, Kmeans, kmeans
from tpu_ann.utils.evaluation import check_self_search, recall_at_r


def test_kmeans_converges(small_ds):
    xt = small_ds.get_train()
    cp = ClusteringParameters(niter=8, seed=7)
    cent, stats = kmeans(xt, 16, cp)
    assert cent.shape == (16, small_ds.d)
    objs = [s.obj for s in stats]
    assert objs[-1] <= objs[0]
    # no empty clusters after split fix
    _, a = D.knn(xt.astype(np.float32), cent, 1)


def test_kmeans_class_api(rng):
    x = rng.rand(500, 8).astype(np.float32)
    km = Kmeans(8, 10, niter=5, seed=3)
    obj = km.train(x)
    assert km.centroids.shape == (10, 8)
    dis, ids = km.assign(x[:20])
    assert ids.shape == (20,) and (ids >= 0).all() and (ids < 10).all()


def test_ivfflat_high_nprobe_is_exact(small_ds):
    """nprobe == nlist must equal brute force (modulo ties) — the standard
    faiss consistency property."""
    d = small_ds.d
    index = make_ivf_flat(d, nlist=16)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 16
    Dv, Iv = index.search(small_ds.get_queries(), 10)

    flat = IndexFlat(d)
    flat.add(small_ds.get_database())
    Df, If = flat.search(small_ds.get_queries(), 10)
    np.testing.assert_allclose(Dv, Df, rtol=1e-4, atol=1e-4)
    assert (Iv[:, 0] == If[:, 0]).mean() > 0.99


def test_ivfflat_recall(small_ds):
    index = make_ivf_flat(small_ds.d, nlist=32)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 8
    _, I = index.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.9


def test_ivf_self_search(small_ds):
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 16
    assert check_self_search(index, small_ds.get_database())


def test_ivf_search_stats(small_ds):
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 4
    Dv, Iv, st = index.search_stats(small_ds.get_queries(), 5)
    assert st.nq == small_ds.nq
    assert st.quantization_us > 0 and st.list_scan_us > 0
    assert st.ndis > 0
    assert st.nlist_visited == small_ds.nq * 4


def test_ivf_params_override(small_ds):
    """per-call nprobe override = faiss SearchParametersIVF plumbing."""
    index = make_ivf_flat(small_ds.d, nlist=32)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 1
    _, I1 = index.search(small_ds.get_queries(), 10)
    _, I32 = index.search(
        small_ds.get_queries(), 10, params=SearchParametersIVF(nprobe=32)
    )
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I32, gt, 10) > recall_at_r(I1, gt, 10)


def test_ivf_list_sizes_sum(small_ds):
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    assert index.list_sizes.sum() == small_ds.nb
    assert index.imbalance_factor() >= 1.0


def test_ivf_add_with_ids(small_ds):
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    xb = small_ds.get_database()
    ids = np.arange(len(xb)) * 10 + 3
    index.add_with_ids(xb, ids)
    _, I = index.search(xb[:5], 1)
    assert (I[:, 0] == ids[:5]).all()
