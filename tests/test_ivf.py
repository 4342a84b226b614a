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


def test_ivf_int64_ids(small_ds):
    """ids beyond int32 must survive the packed layout (reference idx_t is
    int64); device invlists store int32 rows + a host remap."""
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    xb = small_ds.get_database()
    ids = np.arange(len(xb), dtype=np.int64) + (1 << 40)
    index.add_with_ids(xb, ids)
    _, I = index.search(xb[:5], 1)
    assert (I[:, 0] == ids[:5]).all()
    # selector filtering still works through the row remap
    from tpu_ann.models.selectors import IDSelectorRange

    params = SearchParametersIVF(
        nprobe=16, sel=IDSelectorRange((1 << 40), (1 << 40) + 100))
    _, I2 = index.search(xb[:5], 1, params=params)
    assert (I2[I2 >= 0] < (1 << 40) + 100).all()


def test_ivf_deferred_repack_consumers(small_ds):
    """repack=False adds must be flushed by every invlist consumer
    (range_search / search_preassigned / list_sizes / serialization)."""
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    xb = small_ds.get_database()
    index.add(xb[:2000])
    index.add_with_ids(
        xb[2000:], np.arange(2000, len(xb), dtype=np.int64), repack=False)
    assert index.list_sizes.sum() == len(xb)
    # range_search sees deferred rows
    index._dirty = True
    lims, dis, lab = index.range_search(xb[2001:2002], 1e-3)
    assert 2001 in set(lab.tolist())
    # serialization flushes
    import tempfile, os
    from tpu_ann.utils.index_io import read_index, write_index

    index.add_with_ids(xb[:1] + 100.0, np.array([99999]), repack=False)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "i.tpuann")
        write_index(index, p)
        idx2 = read_index(p)
    assert idx2.list_sizes.sum() == len(xb) + 1
    _, I = idx2.search(xb[:1] + 100.0, 1)
    assert I[0, 0] == 99999


def test_ivf_reset_after_deferred_add(small_ds):
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    index.add_with_ids(small_ds.get_database(),
                       np.arange(small_ds.nb, dtype=np.int64), repack=False)
    index.reset()
    with pytest.raises(RuntimeError):
        index.search(small_ds.get_queries(), 1)


def test_ivf_chunked_add_caches_assignments(small_ds):
    """A repack after chunked adds must not recompute old chunks' coarse
    assignments (O(chunk) add contract)."""
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    xb = small_ds.get_database()
    index.add(xb[:2000])
    a0 = index._assign_host[0]
    assert a0 is not None
    index.add(xb[2000:])
    assert index._assign_host[0] is a0  # identity: not recomputed
    Dv, Iv = index.search(xb[:5], 1)
    assert (Iv[:, 0] == np.arange(5)).all()


def test_ivf_remove_update_vectorized(small_ds):
    from tpu_ann.models.selectors import IDSelectorArray

    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    xb = small_ds.get_database()
    index.add(xb)
    removed = index.remove_ids(IDSelectorArray([1, 3, 5]))
    assert removed == 3
    assert index.ntotal == len(xb) - 3
    _, I = index.search(xb[1:2], 1)
    assert I[0, 0] != 1
    # update vector 7 to a far point; its id must follow
    far = xb[7:8] + 50.0
    index.update_vectors(np.array([7]), far)
    index.nprobe = 16
    _, I = index.search(far, 1)
    assert I[0, 0] == 7


def test_kmeans_nredo_ip_keeps_best(rng):
    """For the similarity (IP/spherical) objective, nredo must keep the
    restart with the MAX summed similarity: adding restarts can only
    improve on the single-run result (redo 0 is seed-identical)."""
    x = rng.rand(600, 16).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cp1 = ClusteringParameters(niter=6, nredo=1, seed=5, spherical=True)
    _, stats1 = kmeans(x, 8, cp1, metric=D.METRIC_INNER_PRODUCT)
    cp3 = ClusteringParameters(niter=6, nredo=3, seed=5, spherical=True)
    _, stats3 = kmeans(x, 8, cp3, metric=D.METRIC_INNER_PRODUCT)
    assert stats3[-1].obj >= stats1[-1].obj - 1e-4


def test_search_preassigned_stats(small_ds):
    import numpy as np

    from tpu_ann.models.ivf import make_ivf_flat

    idx = make_ivf_flat(small_ds.d, 32)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    xq = small_ds.get_queries()
    _, probes = idx.quantizer.search(xq, 8)
    D0, I0 = idx.search_preassigned(xq, 10, probes)
    D1, I1, st = idx.search_preassigned_stats(xq, 10, probes)
    np.testing.assert_array_equal(I0, I1)
    assert st.list_scan_us > 0 and st.quantization_us == 0
    assert st.nlist_visited == len(xq) * 8


def test_ivfflat_dedup(small_ds):
    """IndexIVFFlatDedup (IndexIVFFlat.h:57): duplicates stored once,
    expanded back into search results, promoted on remove."""
    from tpu_ann.models.flat import IndexFlat
    from tpu_ann.models.ivf import IndexIVFFlatDedup
    from tpu_ann.models.selectors import IDSelectorBatch

    d = small_ds.d
    xb = small_ds.get_database()[:1000]
    idx = IndexIVFFlatDedup(IndexFlat(d), d, 16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    # rows 0..99 duplicated three times under distinct ids
    x_all = np.concatenate([xb, xb[:100], xb[:100]])
    ids = np.arange(len(x_all), dtype=np.int64)
    idx.add_with_ids(x_all, ids)
    assert idx.ntotal == 1000                  # dups not re-stored
    assert sum(len(v) for v in idx.instances.values()) == 200

    # searching AT a duplicated vector returns all its ids
    idx.nprobe = 8
    Dv, Iv = idx.search(xb[:5], 10)
    for q in range(5):
        hits = set(int(v) for v in Iv[q])
        assert {q, 1000 + q, 1100 + q} <= hits, (q, hits)
        assert Dv[q, 0] < 1e-4

    # removing the stored representative promotes a duplicate
    before = idx.ntotal
    removed = idx.remove_ids(IDSelectorBatch([0]))
    assert removed == 1
    assert idx.ntotal == before                # row survives under 1000
    _, Iv2 = idx.search(xb[:1], 5)
    hits = set(int(v) for v in Iv2[0])
    assert 0 not in hits and {1000, 1100} <= hits

    # factory + io
    from tpu_ann.utils.factory import index_factory

    f = index_factory(d, "IVF16,FlatDedup")
    assert isinstance(f, IndexIVFFlatDedup)


def test_direct_map_slots_match_pack_order(small_ds):
    """The DirectMap's computed slots must agree with the actual packed
    layout (native or numpy pack): ids[slot[r]] == r for every row."""
    idx = make_ivf_flat(small_ds.d, nlist=16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    flat_ids = np.asarray(idx.invlists.ids).reshape(-1)
    rows = np.arange(idx.ntotal)
    assert np.array_equal(flat_ids[idx._row_slot[rows]], rows)


def test_incremental_remove_is_o_affected(small_ds):
    """remove_ids edits only the touched slots (DirectMap.h:38-42): no
    repack, invlists data identity preserved, removed ids vanish from
    results."""
    from tpu_ann.models.selectors import IDSelectorArray

    idx = make_ivf_flat(small_ds.d, nlist=16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    xb = small_ds.get_database()
    idx.add(xb)
    idx.nprobe = 16
    data_before = idx.invlists.data        # identity probe

    victims = np.asarray([0, 5, 17, 101], np.int64)
    removed = idx.remove_ids(IDSelectorArray(victims))
    assert removed == 4
    assert idx.ntotal == len(xb) - 4
    assert idx.invlists.data is data_before       # no repack happened
    assert not idx._dirty

    Dv, Iv = idx.search(xb[victims], 3)
    assert not np.isin(victims, Iv).any()
    # double-remove is a no-op
    assert idx.remove_ids(IDSelectorArray(victims)) == 0

    # the deferred host compaction still reconciles everything
    idx._dirty = True
    idx._maybe_repack()
    assert idx.ntotal == len(xb) - 4
    Dv, Iv = idx.search(xb[victims], 3)
    assert not np.isin(victims, Iv).any()


def test_incremental_update_vectors(small_ds):
    """update_vectors: same-list overwrites edit slots in place; a
    cross-list move appends into the target list's padding; both leave
    the packed arrays' identity intact (no repack)."""
    idx = make_ivf_flat(small_ds.d, nlist=16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    xb = small_ds.get_database().copy()
    idx.add(xb)
    idx.nprobe = 16
    ids_before = idx.invlists.ids

    # same-list: nudge a stored vector slightly
    upd_id = 7
    new_v = xb[upd_id] + 0.001
    idx.update_vectors(np.asarray([upd_id]), new_v[None])
    np.testing.assert_allclose(idx.reconstruct(upd_id), new_v, rtol=1e-6)
    Dv, Iv = idx.search(new_v[None], 1)
    assert Iv[0, 0] == upd_id and Dv[0, 0] < 1e-9

    # cross-list: replace a vector with one that lives elsewhere
    far_id = 11
    target = xb[2000]                       # different region of space
    idx.update_vectors(np.asarray([far_id]), target[None])
    Dv, Iv = idx.search(target[None], 2)
    assert far_id in Iv[0]
    # the old location must not still serve the old vector under that id
    np.testing.assert_allclose(idx.reconstruct(far_id), target, rtol=1e-6)

    # updates above should not have triggered a repack unless a list
    # overflowed; either way results stay consistent after one
    idx._dirty = True
    idx._maybe_repack()
    Dv, Iv = idx.search(target[None], 2)
    assert far_id in Iv[0]


def test_add_after_incremental_remove(small_ds):
    from tpu_ann.models.selectors import IDSelectorArray

    idx = make_ivf_flat(small_ds.d, nlist=16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    xb = small_ds.get_database()
    idx.add(xb[:3000])
    idx.remove_ids(IDSelectorArray([1, 2, 3]))
    idx.add(xb[3000:])                       # triggers repack with mask
    assert idx.ntotal == len(xb) - 3
    idx.nprobe = 16
    _, Iv = idx.search(xb[1:4], 2)
    assert not np.isin([1, 2, 3], Iv).any()
    # add() assigns sequential ids from the post-removal ntotal (faiss
    # semantics), so the first re-added row carries id 2997
    assert 2997 in idx.search(xb[3000:3001], 1)[1]


def test_compute_residual(small_ds):
    """Index::compute_residual{,_n} (Index.h:245): x - reconstruct(key),
    and residual of a centroid w.r.t. itself is zero."""
    from tpu_ann.models.ivf import make_ivf_flat

    xt = small_ds.get_train()
    idx = make_ivf_flat(small_ds.d, 8)
    idx.cp.niter = 4
    idx.train(xt)
    q = idx.quantizer
    c0 = q.reconstruct(0)
    assert np.allclose(q.compute_residual(c0, 0), 0.0, atol=1e-6)
    keys = np.array([0, 3, 5])
    x = xt[:3]
    r = q.compute_residual_n(x, keys)
    ref = x - np.stack([q.reconstruct(int(k)) for k in keys])
    assert np.allclose(r, ref, atol=1e-6)


def test_global_indexivf_stats(small_ds):
    """The cumulative indexIVF_stats singleton (faiss.cvar role,
    IndexIVF.h:567-583): accumulated by every *_stats search, reset
    between phases."""
    import tpu_ann
    from tpu_ann.models.ivf import make_ivf_flat

    tpu_ann.indexIVF_stats.reset()
    idx = make_ivf_flat(small_ds.d, 8)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 4
    xq = small_ds.get_queries()
    _, _, s1 = idx.search_stats(xq, 5)
    _, _, s2 = idx.search_stats(xq, 5)
    g = tpu_ann.indexIVF_stats
    assert g.nq == s1.nq + s2.nq
    assert g.ndis == s1.ndis + s2.ndis
    assert g.total_us >= s1.total_us
    tpu_ann.indexIVF_stats.reset()
    assert tpu_ann.indexIVF_stats.nq == 0


def test_ivf_search_chunk_paging(small_ds):
    """search_chunk pages big query batches transparently (the
    reference's GpuIndex auto-paging role); results identical."""
    index = make_ivf_flat(small_ds.d, nlist=16)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 4
    xq = small_ds.get_queries()
    D1, I1 = index.search(xq, 5)
    index.search_chunk = 32
    D2, I2 = index.search(xq, 5)
    assert np.array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-6)
