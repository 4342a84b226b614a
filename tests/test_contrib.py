"""Contrib tooling tests (reference: tests/test_contrib.py)."""

import os

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.ivf import make_ivf_flat
from tpu_ann.utils import contrib


def test_knn_ground_truth_matches_flat(small_ds):
    xb = small_ds.get_database()
    xq = small_ds.get_queries()
    flat = IndexFlat(small_ds.d)
    flat.add(xb)
    Df, If = flat.search(xq, 10)
    chunks = [xb[i : i + 1000] for i in range(0, len(xb), 1000)]
    Dg, Ig = contrib.knn_ground_truth(xq, iter(chunks), 10)
    assert (If == Ig).mean() > 0.999
    np.testing.assert_allclose(Df, Dg, rtol=1e-4, atol=1e-4)


def test_big_batch_search_checkpoint(small_ds, tmp_path):
    idx = IndexFlat(small_ds.d)
    idx.add(small_ds.get_database())
    xq = small_ds.get_queries()
    ck = str(tmp_path / "bbs.pkl")
    D1, I1 = contrib.big_batch_search(idx, xq, 5, batch_size=32,
                                      checkpoint_path=ck)
    assert os.path.exists(ck)
    # resume from a partially-done checkpoint: zero out, mark half done
    import pickle

    with open(ck, "rb") as f:
        st = pickle.load(f)
    st["done"][2:] = False
    with open(ck, "wb") as f:
        pickle.dump(st, f)
    D2, I2 = contrib.big_batch_search(idx, xq, 5, batch_size=32,
                                      checkpoint_path=ck)
    assert (I1 == I2).all()
    Dref, Iref = idx.search(xq, 5)
    assert (I1 == Iref).all()


def test_add_preassigned(small_ds):
    idx = make_ivf_flat(small_ds.d, 16)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    xb = small_ds.get_database()
    a = idx._assign(xb)
    contrib.add_preassigned(idx, xb, a)
    assert idx.ntotal == len(xb)
    idx.nprobe = 16
    D, I = idx.search(xb[:5], 1)
    assert (I[:, 0] == np.arange(5)).all()


def test_merge_indexes(small_ds):
    xb = small_ds.get_database()
    half = len(xb) // 2
    a = make_ivf_flat(small_ds.d, 16)
    a.cp.niter = 5
    a.train(small_ds.get_train())
    b = make_ivf_flat(small_ds.d, 16)
    b.quantizer = a.quantizer
    b.is_trained = True
    a.add_with_ids(xb[:half], np.arange(half))
    b.add_with_ids(xb[half:], np.arange(half, len(xb)))
    contrib.merge_indexes(a, [b])
    assert a.ntotal == len(xb)
    a.nprobe = 16
    _, I = a.search(xb[half : half + 5], 1)
    assert (I[:, 0] == np.arange(half, half + 5)).all()


def test_matrix_stats(small_ds):
    st = contrib.MatrixStats.compute(small_ds.get_train())
    assert st.n == small_ds.nt and st.d == small_ds.d
    assert st.n_nan == 0
    assert "no obvious problems" in st.comments
    bad = small_ds.get_train().copy()
    bad[0] = 0
    bad[:, 0] = 3.0
    st2 = contrib.MatrixStats.compute(bad)
    assert st2.n_zero_rows == 0  # row 0 no longer all-zero (dim 0 is 3.0)
    assert st2.n_constant_dims == 1


def test_get_invlist(small_ds):
    idx = make_ivf_flat(small_ds.d, 16)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    sizes = contrib.get_invlist_sizes(idx)
    tot = 0
    for l in range(16):
        ids, vecs = contrib.get_invlist(idx, l)
        assert len(ids) == sizes[l]
        assert vecs.shape == (sizes[l], small_ds.d)
        tot += len(ids)
    assert tot == small_ds.nb


def test_torch_tensor_inputs(small_ds):
    """torch interop (contrib/torch_utils.py role): CPU torch tensors are
    accepted wherever numpy arrays are."""
    torch = pytest.importorskip("torch")
    flat = IndexFlat(small_ds.d)
    xb = torch.from_numpy(small_ds.get_database())
    flat.add(xb)
    xq = torch.from_numpy(small_ds.get_queries()[:5])
    D, I = flat.search(xq, 3)
    D2, I2 = flat.search(small_ds.get_queries()[:5], 3)
    assert (I == I2).all()


def test_sift_surrogate_stats():
    """The generated surrogate keeps SIFT's defining marginals
    (nonnegative uint8-ranged, clipped+renormalized to ~512 norm)."""
    import numpy as np

    from tpu_ann.utils.datasets import SiftSurrogateDataset, sift_surrogate

    x = sift_surrogate(2000, seed=3)
    assert x.shape == (2000, 128) and (x >= 0).all() and (x <= 255).all()
    norms = np.linalg.norm(x, axis=1)
    assert 470 < norms.mean() < 520 and norms.std() < 15
    ds = SiftSurrogateDataset(nt=500, nb=2000, nq=50)
    gt = ds.get_groundtruth(5)
    assert gt.shape == (50, 5)


def test_range_search_evaluation(small_ds):
    """range_PR / filter_range_results / check_ref_range_results
    (contrib/evaluation.py:30-292) on an exact-vs-partial-probe pair."""
    from tpu_ann.models.flat import IndexFlat
    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.utils.evaluation import (
        check_ref_knn_with_draws, check_ref_range_results,
        filter_range_results, range_PR, range_PR_multiple_thresholds)

    xt, xb, xq = (small_ds.get_train(), small_ds.get_database(),
                  small_ds.get_queries())
    d = xb.shape[1]
    flat = IndexFlat(d)
    flat.add(xb)
    Dq, _ = flat.search(xq, 10)
    radius = float(np.median(Dq[:, 9]))
    Lr, Dr, Ir = flat.range_search(xq, radius)
    assert Lr[-1] > 0

    # exact result vs itself: perfect PR, and the checker passes
    p, r = range_PR(Lr, Ir, Lr, Ir)
    assert p == 1.0 and r == 1.0
    check_ref_range_results(Lr, Dr, Ir, Lr, Dr, Ir)

    # partial-probe IVF: every hit is true (precision 1), recall < 1 ok
    ivf = make_ivf_flat(d, nlist=16)
    ivf.cp.niter = 4
    ivf.train(xt)
    ivf.add(xb)
    ivf.nprobe = 4
    Ln, Dn, In = ivf.range_search(xq, radius)
    p, r = range_PR(Lr, Ir, Ln, In, mode="overall")
    assert p == 1.0 and 0.3 < r <= 1.0
    pa, ra = range_PR(Lr, Ir, Ln, In, mode="average")
    assert pa == 1.0 and 0.3 < ra <= 1.0

    # filtering at a smaller threshold only keeps closer hits
    t2 = radius * 0.5
    Lf, Df, If = filter_range_results(Ln, Dn, In, t2)
    assert (Df < t2).all() and Lf[-1] <= Ln[-1]

    # multiple thresholds: recall grows with the threshold
    pr = range_PR_multiple_thresholds(
        Lr, Ir, Ln, Dn, In, [t2, radius])
    assert pr[0, 1] <= pr[1, 1]

    # ties-aware knn comparison: permuting a tie group must pass
    Dk, Ik = flat.search(xq, 5)
    Ik2 = Ik.copy()
    Dk2 = Dk.copy()
    check_ref_knn_with_draws(Dk, Ik, Dk2, Ik2)
    # introduce a mismatch -> must raise
    Ik2[0, 0] = -7
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        check_ref_knn_with_draws(Dk, Ik, Dk2, Ik2)


def test_extra_wrappers():
    """kmin/kmax/bucket_sort/rand_smooth_vectors
    (python/extra_wrappers.py roles)."""
    from tpu_ann.utils.contrib import (bucket_sort, kmax, kmin,
                                       rand_smooth_vectors)

    rs = np.random.RandomState(0)
    D = rs.randn(10, 50).astype(np.float32)
    vals, idx = kmin(D, 5)
    ref = np.sort(D, axis=1)[:, :5]
    assert np.allclose(vals, ref)
    assert np.allclose(np.take_along_axis(D, idx, 1), vals)
    vals, idx = kmax(D, 5)
    assert np.allclose(vals, -np.sort(-D, axis=1)[:, :5])

    tab = rs.randint(0, 8, 100)
    lims, perm = bucket_sort(tab, 8)
    assert lims[-1] == 100
    for b in range(8):
        seg = perm[lims[b]:lims[b + 1]]
        assert (tab[seg] == b).all()
        assert (np.diff(seg) > 0).all()   # stable order

    x = rand_smooth_vectors(100, 32)
    assert np.allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)
    # smooth: adjacent-dim correlation far above iid
    adj = np.mean([np.corrcoef(x[i, :-1], x[i, 1:])[0, 1]
                   for i in range(100)])
    assert adj > 0.5


def test_two_level_clustering(small_ds):
    """contrib/clustering.py:24 two_level_clustering +
    train_ivf_index_with_2level: exact centroid count, balanced budgets,
    and recall parity with flat k-means training."""
    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.models.transforms import IndexPreTransform, PCAMatrix
    from tpu_ann.utils.contrib import (two_level_clustering,
                                       train_ivf_index_with_2level)
    from tpu_ann.utils.evaluation import recall_at_r

    xt = small_ds.get_train()
    xb = small_ds.get_database()
    xq = small_ds.get_queries()
    gt = small_ds.get_groundtruth(10)
    d = small_ds.d

    cent = two_level_clustering(xt, 4, 32, clustering_niter=5)
    assert cent.shape == (32, d) and np.isfinite(cent).all()
    cent_nb = two_level_clustering(xt, 4, 32, rebalance=False,
                                   clustering_niter=5)
    assert cent_nb.shape == (32, d)

    # train an IVF with the 2-level path and compare recall to flat kmeans
    idx2 = make_ivf_flat(d, nlist=32)
    train_ivf_index_with_2level(idx2, xt, clustering_niter=5)
    assert idx2.is_trained and idx2.quantizer.ntotal == 32
    idx2.add(xb)
    idx2.nprobe = 8
    _, I2 = idx2.search(xq, 10)
    r2 = recall_at_r(I2, gt, 10)

    idx1 = make_ivf_flat(d, nlist=32)
    idx1.cp.niter = 5
    idx1.train(xt)
    idx1.add(xb)
    idx1.nprobe = 8
    _, I1 = idx1.search(xq, 10)
    r1 = recall_at_r(I1, gt, 10)
    assert r2 > r1 - 0.1, (r1, r2)

    # PreTransform chain handling
    pt = IndexPreTransform(PCAMatrix(d, d // 2), make_ivf_flat(d // 2, 16))
    train_ivf_index_with_2level(pt, xt, clustering_niter=4)
    assert pt.is_trained
    pt.add(xb)
    pt.index.nprobe = 16
    _, I3 = pt.search(xq, 10)
    assert recall_at_r(I3, gt, 10) > 0.3


def test_permute_and_sort_invlists(small_ds):
    """ivf_tools permute_invlists / sort_invlists_by_size /
    range_search_preassigned: results invariant under relayout."""
    from tpu_ann.utils.contrib import (permute_invlists,
                                       range_search_preassigned,
                                       sort_invlists_by_size)

    idx = make_ivf_flat(small_ds.d, 16)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 4
    xq = small_ds.get_queries()
    D0, I0 = idx.search(xq, 5)
    sizes0 = np.sort(contrib.get_invlist_sizes(idx))

    rs = np.random.RandomState(0)
    perm = rs.permutation(16)
    permute_invlists(idx, perm)
    D1, I1 = idx.search(xq, 5)
    assert np.array_equal(I0, I1) and np.allclose(D0, D1)

    sp = sort_invlists_by_size(idx)
    sizes = contrib.get_invlist_sizes(idx)
    assert (np.diff(sizes) >= 0).all()
    assert np.array_equal(np.sort(sizes), sizes0)
    D2, I2 = idx.search(xq, 5)
    assert np.array_equal(I0, I2)

    # preassigned range search == plain range search at same probes
    radius = float(np.median(D0[:, 4]))
    probes = idx.coarse_assign(xq, 4)
    L1_, Dr1, Ir1 = range_search_preassigned(idx, xq, radius, probes)
    L2_, Dr2, Ir2 = idx.range_search(xq, radius)
    assert np.array_equal(L1_, L2_)
    from tpu_ann.utils.evaluation import check_ref_range_results
    check_ref_range_results(L1_, Dr1, Ir1, L2_, Dr2, Ir2)


def test_inspect_tools_extras(small_ds):
    """inspect_tools remainder: flat data/codes, AQ codebooks, NSG
    neighbors, explicit LinearTransform."""
    from tpu_ann.models.pq import IndexPQ
    from tpu_ann.models.rq import IndexResidualQuantizer
    from tpu_ann.models.nsg import IndexNSGFlat
    from tpu_ann.utils.contrib import (
        get_additive_quantizer_codebooks, get_flat_codes, get_flat_data,
        get_NSG_neighbors, make_LinearTransform_matrix)

    xb = small_ds.get_database()
    d = small_ds.d
    flat = IndexFlat(d)
    flat.add(xb)
    assert np.allclose(get_flat_data(flat), xb, atol=1e-6)

    pq = IndexPQ(d, 4, 4)
    pq.train(small_ds.get_train())
    pq.add(xb[:500])
    codes = get_flat_codes(pq)
    assert codes.shape[0] == 500 and codes.dtype == np.uint8

    rq = IndexResidualQuantizer(d, 2, 4)
    rq.train(small_ds.get_train())
    books = get_additive_quantizer_codebooks(rq)
    assert books.shape == (2, 16, d)

    nsg = IndexNSGFlat(d, 16)
    nsg.add(xb[:800])
    nbrs = get_NSG_neighbors(nsg)
    assert nbrs.shape[0] == 800

    A = np.random.RandomState(0).randn(8, d).astype(np.float32)
    b = np.ones(8, np.float32)
    vt = make_LinearTransform_matrix(A, b)
    y = vt.apply(xb[:10])
    assert np.allclose(y, xb[:10] @ A.T + b, atol=1e-4)


def test_range_ground_truth_and_iterators(small_ds):
    """exhaustive_search remainder: blockwise range GT equals the
    single-shot range search; exponential query batches cover xq."""
    from tpu_ann.utils.contrib import (exponential_query_iterator,
                                       range_ground_truth)
    from tpu_ann.utils.datasets import dataset_from_name
    from tpu_ann.utils.evaluation import check_ref_range_results

    xb = small_ds.get_database()
    xq = small_ds.get_queries()[:20]
    flat = IndexFlat(small_ds.d)
    flat.add(xb)
    D0, _ = flat.search(xq, 10)
    radius = float(np.median(D0[:, 9]))
    Lr, Dr, Ir = flat.range_search(xq, radius)

    blocks = [xb[i: i + 1000] for i in range(0, len(xb), 1000)]
    Lg, Dg, Ig = range_ground_truth(xq, iter(blocks), radius)
    check_ref_range_results(Lr, Dr, Ir, Lg, Dg, Ig)

    batches = list(exponential_query_iterator(xq, start_bs=2, max_bs=8))
    assert sum(len(b) for b in batches) == len(xq)
    assert [len(b) for b in batches[:3]] == [2, 4, 8]

    ds = dataset_from_name("synthetic-16-100-500-10")
    assert ds.d == 16 and ds.nb == 500
    ds2 = dataset_from_name("sift-surrogate-100-400-10")
    assert ds2.get_database().shape == (400, 128)


def test_dataset_assign_kmeans(small_ds):
    """contrib/clustering.py DatasetAssign + pure-python kmeans driver:
    converges like the device kmeans, and the dispatch wrapper (the
    distributed-kmeans client role) gives identical per-iteration math."""
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans
    from tpu_ann.utils.contrib import (DatasetAssign, DatasetAssignDispatch,
                                       kmeans_assign)

    xt = small_ds.get_train()
    k = 16
    c1, st = kmeans_assign(k, DatasetAssign(xt), niter=8, seed=5,
                           return_stats=True)
    assert c1.shape == (k, small_ds.d)
    assert st[-1]["obj"] <= st[0]["obj"]

    # same seed, data split over 3 "servers": identical trajectory
    parts = np.array_split(xt, 3)
    disp = DatasetAssignDispatch([DatasetAssign(p) for p in parts])
    assert disp.count() == len(xt)
    c2 = kmeans_assign(k, disp, niter=8, seed=5)
    assert np.allclose(c1, c2, atol=1e-3)

    # objective comparable to the device Lloyd loop
    cd, _ = kmeans(xt, k, ClusteringParameters(niter=8, seed=5))
    def obj(c):
        from tpu_ann.ops import distances as D
        import jax.numpy as jnp
        dis, _ = D.knn(jnp.asarray(xt), jnp.asarray(c), 1)
        return float(np.asarray(dis).sum())
    assert obj(c1) < obj(cd) * 1.25


def test_dataset_zoo_file_loaders(tmp_path):
    """bvecs IO + BigANN/GIST/Deep1B file-layout loaders
    (contrib/datasets.py:171-351, vecs_io bvecs)."""
    from tpu_ann.utils.datasets import (DatasetBigANN, bvecs_read,
                                        bvecs_write, fvecs_write,
                                        ivecs_write, load_gist1m)

    rs = np.random.RandomState(2)
    root = str(tmp_path)

    # bvecs round-trip
    xb8 = rs.randint(0, 256, (100, 16)).astype(np.uint8)
    bvecs_write(os.path.join(root, "bigann_base.bvecs"), xb8)
    assert np.array_equal(bvecs_read(
        os.path.join(root, "bigann_base.bvecs")), xb8)
    bvecs_write(os.path.join(root, "bigann_learn.bvecs"), xb8[:50])
    bvecs_write(os.path.join(root, "bigann_query.bvecs"), xb8[:10])
    os.makedirs(os.path.join(root, "gnd"), exist_ok=True)
    ivecs_write(os.path.join(root, "gnd", "idx_1M.ivecs"),
                rs.randint(0, 100, (10, 5)))

    ds = DatasetBigANN(root, nb_M=1)
    assert ds.d == 16
    assert ds.get_queries().shape == (10, 16)
    assert ds.get_database().dtype == np.float32
    chunks = list(ds.database_iterator(bs=30))
    assert sum(len(c) for c in chunks) == 100
    assert np.allclose(np.vstack(chunks), xb8.astype(np.float32))
    assert ds.get_groundtruth(5).shape == (10, 5)

    # gist layout
    xf = rs.randn(60, 24).astype(np.float32)
    for name in ["gist_base.fvecs", "gist_learn.fvecs",
                 "gist_query.fvecs"]:
        fvecs_write(os.path.join(root, name), xf)
    ivecs_write(os.path.join(root, "gist_groundtruth.ivecs"),
                rs.randint(0, 60, (60, 10)))
    g = load_gist1m(root)
    assert g.d == 24 and np.allclose(g.get_queries(), xf)


def test_review_fixes():
    """Regression cases from the round-3 code review: PR edge cases,
    bucket_sort range check, dispatch weights, bounded fvecs reads."""
    from tpu_ann.utils.contrib import (DatasetAssign, DatasetAssignDispatch,
                                       bucket_sort)
    from tpu_ann.utils.evaluation import counts_to_PR

    # reference edge conventions (contrib/evaluation.py:80): empty
    # result -> precision 1.0, recall 0.0 when GT is non-empty; empty GT
    # -> recall (nres == 0); all-empty -> perfect
    assert counts_to_PR([5], [0], [0], mode="average") == (1.0, 0.0)
    assert counts_to_PR([0], [5], [0], mode="average") == (0.0, 0.0)
    assert counts_to_PR([5], [0], [0], mode="overall") == (1.0, 0.0)
    assert counts_to_PR([0], [0], [0], mode="average") == (1.0, 1.0)

    with pytest.raises(ValueError, match="bucket_sort"):
        bucket_sort(np.array([0, 5, 1]), 3)

    # dispatched weighted sums match the single-assigner weighted sums
    rs = np.random.RandomState(4)
    x = rs.randn(300, 8).astype(np.float32)
    w = rs.rand(300).astype(np.float32)
    cents = rs.randn(4, 8).astype(np.float32)
    a_all = DatasetAssign(x)
    _, _, s_all = a_all.assign_to(cents, w)
    disp = DatasetAssignDispatch(
        [DatasetAssign(p) for p in np.array_split(x, 3)])
    _, _, s_disp = disp.assign_to(cents, w)
    np.testing.assert_allclose(s_all, s_disp, rtol=1e-4, atol=1e-4)

    # bounded fvecs read
    import tempfile, os as _os
    from tpu_ann.utils.datasets import fvecs_read, fvecs_write
    t = tempfile.mkdtemp()
    p = _os.path.join(t, "x.fvecs")
    fvecs_write(p, x)
    assert np.array_equal(fvecs_read(p, maxn=7), x[:7])


def test_binary_ivf_review_fixes():
    """Empty binary IVF raises cleanly; -1 probe padding scans nothing."""
    from tpu_ann.models.binary import IndexBinaryIVF

    idx = IndexBinaryIVF(None, 64, 8)
    rs = np.random.RandomState(1)
    xb = rs.randint(0, 256, (500, 8)).astype(np.uint8)
    idx.train(xb)
    with pytest.raises(RuntimeError, match="empty"):
        idx.search(xb[:2], 3)
    with pytest.raises(RuntimeError, match="empty"):
        idx.range_search(xb[:2], 10)
    idx.add(xb)
    idx.nprobe = 8
    idx._maybe_repack()   # pack with the real quantizer before patching
    # padded probes (simulate a quantizer returning -1s): monkeypatch
    orig = idx.quantizer.search
    def padded(x, k):
        D_, I_ = orig(x, k)
        I_ = np.array(I_)
        I_[:, k // 2:] = -1          # half the probes unreached
        return D_, I_
    idx.quantizer.search = padded
    D, I = idx.search(xb[:20], 5)
    # no duplicate ids in any row (the -1 wrap bug produced dupes)
    for row in I:
        v = row[row >= 0]
        assert len(np.unique(v)) == len(v)


def test_dataset_assign_sparse():
    """contrib/clustering.py:249 DatasetAssignSparse: identical k-means
    trajectory to the dense DatasetAssign on the same data."""
    sp = pytest.importorskip("scipy.sparse")
    from tpu_ann.utils.contrib import (DatasetAssign, DatasetAssignSparse,
                                       kmeans_assign)

    rs = np.random.RandomState(8)
    dense = rs.rand(800, 24).astype(np.float32)
    dense[dense < 0.7] = 0.0                  # ~70% sparse
    xs = sp.csr_matrix(dense)

    das = DatasetAssignSparse(xs)
    assert das.count() == 800 and das.dim() == 24
    assert np.allclose(das.get_subset([3, 7]), dense[[3, 7]])

    a1, d1, s1 = DatasetAssign(dense).assign_to(dense[:8])
    a2, d2, s2 = das.assign_to(dense[:8])
    assert np.array_equal(a1, a2)
    np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)

    # weighted sums agree too
    w = rs.rand(800).astype(np.float32)
    _, _, sw1 = DatasetAssign(dense).assign_to(dense[:8], w)
    _, _, sw2 = das.assign_to(dense[:8], w)
    np.testing.assert_allclose(sw1, sw2, rtol=1e-4, atol=1e-4)

    c1 = kmeans_assign(8, DatasetAssign(dense), niter=5, seed=2)
    c2 = kmeans_assign(8, das, niter=5, seed=2)
    np.testing.assert_allclose(c1, c2, rtol=1e-3, atol=1e-3)


def test_two_level_clustering_batched(small_ds):
    """batched=True runs all second-level k-means as one vmapped device
    program; objective parity with the sequential path."""
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.contrib import two_level_clustering

    import jax.numpy as jnp

    xt = small_ds.get_train()

    cb = two_level_clustering(xt, 4, 32, rebalance=False,
                              clustering_niter=5, batched=True)
    cs = two_level_clustering(xt, 4, 32, rebalance=False,
                              clustering_niter=5)
    assert cb.shape == cs.shape == (32, small_ds.d)
    assert np.isfinite(cb).all()

    def obj(c):
        dis, _ = D.knn(jnp.asarray(xt), jnp.asarray(c), 1)
        return float(np.asarray(dis).sum())
    ob, os_ = obj(cb), obj(cs)
    assert ob < os_ * 1.15, (ob, os_)

    with pytest.raises(ValueError, match="batched"):
        two_level_clustering(xt, 4, 32, batched=True)   # rebalance=True
