"""range_search breadth + IndexIDMap semantics (round-5 VERDICT #7).

Reference surface: faiss implements range_search on coded flat indexes
(IndexFlatCodes.h:65), HNSW (IndexHNSW.h:78), IDMap (IndexIDMap.h:53),
PreTransform (IndexPreTransform.h:61), Refine (IndexRefine.h:57) and
IVFFastScan (IndexIVFFastScan.h:140); IndexIDMap supports remove_ids
with selector translation and IndexIDMap2 keeps a hashtable rev_map
(faiss/IndexIDMap.cpp). Oracles follow the reference's test style:
brute force over the decoded vectors (tests/test_index_accuracy.py).
"""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.idmap import IndexIDMap, IndexIDMap2
from tpu_ann.models.pq import IndexPQ, IndexScalarQuantizer
from tpu_ann.models.selectors import IDSelectorArray, IDSelectorRange


def _csr_row(lims, arr, i):
    return arr[lims[i]:lims[i + 1]]


def _radius_for(index, xq, q=5):
    D, _ = index.search(xq, 10)
    return float(np.median(D[:, q]))


def _check_vs_decoded_oracle(index, decoded, xq, radius, *, eps=1e-3):
    """Hits must match brute force over `decoded` rows, ignoring
    boundary cases within eps*radius (mixed-precision paths may rank
    them differently)."""
    lims, dd, ii = index.range_search(xq, radius)
    for i in range(len(xq)):
        dif = decoded - xq[i]
        dis = (dif * dif).sum(1)
        core = set(np.nonzero(dis < radius * (1 - eps))[0].tolist())
        outer = set(np.nonzero(dis < radius * (1 + eps))[0].tolist())
        got = set(_csr_row(lims, ii, i).tolist())
        assert core <= got <= outer, (i, core - got, got - outer)
        assert (_csr_row(lims, dd, i) < radius * (1 + eps)).all()


def test_pq_range_search(small_ds):
    idx = IndexPQ(small_ds.d, M=8, nbits=8)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    xq = small_ds.get_queries()[:20]
    decoded = idx.sa_decode(np.asarray(idx._codes[: idx.ntotal]))
    _check_vs_decoded_oracle(idx, decoded, xq, _radius_for(idx, xq))


def test_pq4_range_search(small_ds):
    idx = IndexPQ(small_ds.d, M=8, nbits=4)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    xq = small_ds.get_queries()[:10]
    decoded = idx.sa_decode(np.asarray(idx._codes[: idx.ntotal]))
    _check_vs_decoded_oracle(idx, decoded, xq, _radius_for(idx, xq))


def test_sq_range_search(small_ds):
    idx = IndexScalarQuantizer(small_ds.d)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    xq = small_ds.get_queries()[:20]
    decoded = idx.sa_decode(np.asarray(idx._codes))
    _check_vs_decoded_oracle(idx, decoded, xq, _radius_for(idx, xq))


def test_hnsw_range_search(small_ds):
    from tpu_ann.models.hnsw import IndexHNSWFlat

    idx = IndexHNSWFlat(small_ds.d, 16)
    xb = small_ds.get_database()
    idx.add(xb)
    idx.hnsw.efSearch = 64
    xq = small_ds.get_queries()[:20]
    radius = _radius_for(idx, xq, q=3)
    lims, dd, ii = idx.range_search(xq, radius)
    found = total = 0
    for i in range(len(xq)):
        dif = xb - xq[i]
        dis = (dif * dif).sum(1)
        expect = set(np.nonzero(dis < radius)[0].tolist())
        got = set(_csr_row(lims, ii, i).tolist())
        # no false positives (returned distances are storage-exact)
        assert all(dis[j] < radius * (1 + 1e-3) for j in got)
        found += len(got & expect)
        total += len(expect)
    assert found >= 0.85 * total  # approximate, beam-bounded (faiss too)


def test_pretransform_range_search(small_ds):
    from tpu_ann.models.transforms import IndexPreTransform, PCAMatrix

    pca = PCAMatrix(small_ds.d, 16)
    idx = IndexPreTransform(pca, IndexFlat(16))
    idx.train(small_ds.get_train())
    xb = small_ds.get_database()
    idx.add(xb)
    xq = small_ds.get_queries()[:10]
    radius = _radius_for(idx, xq)
    lims, dd, ii = idx.range_search(xq, radius)
    xb_t = pca.apply(xb)
    xq_t = pca.apply(xq)
    for i in range(len(xq)):
        dif = xb_t - xq_t[i]
        dis = (dif * dif).sum(1)
        expect = set(np.nonzero(dis < radius)[0].tolist())
        assert set(_csr_row(lims, ii, i).tolist()) == expect


def test_refine_range_search(small_ds):
    from tpu_ann.models.refine import IndexRefineFlat

    base = IndexPQ(small_ds.d, M=8, nbits=8)
    idx = IndexRefineFlat(base)
    idx.train(small_ds.get_train())
    xb = small_ds.get_database()
    idx.add(xb)
    xq = small_ds.get_queries()[:10]
    radius = _radius_for(idx, xq)
    lims, dd, ii = idx.range_search(xq, radius)
    bl, _, bi = base.range_search(xq, radius)
    for i in range(len(xq)):
        got = _csr_row(lims, ii, i)
        base_hits = set(_csr_row(bl, bi, i).tolist())
        # refine-grade distances, refine-grade filter, base-bounded set
        assert set(got.tolist()) <= base_hits
        dif = xb[got] - xq[i]
        exact = (dif * dif).sum(1)
        np.testing.assert_allclose(_csr_row(lims, dd, i), exact,
                                   rtol=1e-4, atol=1e-4)
        assert (exact < radius * (1 + 1e-5)).all()


@pytest.mark.parametrize("kind", ["pq", "pq4fs", "sq"])
def test_ivf_coded_range_search(small_ds, kind):
    """IVF-PQ (8-bit + 4-bit fast-scan layout) and IVF-SQ range search:
    with exhaustive probing, range hits must agree with a wide search()
    on the same index wherever distances clear the radius."""
    from tpu_ann.utils.factory import index_factory

    spec = {"pq": "IVF16,PQ8", "pq4fs": "IVF16,PQ8x4fs",
            "sq": "IVF16,SQ8"}[kind]
    idx = index_factory(small_ds.d, spec)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    xq = small_ds.get_queries()[:10]
    D, I = idx.search(xq, 64)
    radius = float(np.median(D[:, 4]))
    lims, dd, ii = idx.range_search(xq, radius)
    eps = 2e-3 * radius
    for i in range(10):
        got = set(_csr_row(lims, ii, i).tolist())
        must = set(I[i][(D[i] < radius - eps) & (I[i] >= 0)].tolist())
        may = set(I[i][(D[i] < radius + eps) & (I[i] >= 0)].tolist())
        assert must <= got, (i, must - got)
        # every returned hit either appears in the wide search within
        # tolerance or lies beyond its horizon (search k exhausted)
        horizon = D[i, -1]
        for j, dj in zip(_csr_row(lims, ii, i), _csr_row(lims, dd, i)):
            assert dj < radius + eps
            assert int(j) in may or dj >= horizon - eps


def test_idmap_semantics(small_ds):
    xb = small_ds.get_database()[:500]
    ids = np.arange(500, dtype=np.int64) * 2 + 1000
    idx = IndexIDMap(IndexFlat(small_ds.d))
    idx.add_with_ids(xb, ids)
    xq = small_ds.get_queries()[:5]
    _, I = idx.search(xq, 5)
    assert ((I >= 1000) & (I % 2 == 0)).all()
    # faiss parity: plain IDMap cannot reconstruct by external id
    with pytest.raises(RuntimeError):
        idx.reconstruct(int(ids[3]))
    with pytest.raises(RuntimeError):
        idx.add(xb)
    # range_search remaps labels
    radius = _radius_for(idx, xq)
    lims, dd, ii = idx.range_search(xq, radius)
    assert ((ii >= 1000) & (ii % 2 == 0)).all()
    flat = IndexFlat(small_ds.d)
    flat.add(xb)
    fl, fd, fi = flat.range_search(xq, radius)
    assert np.array_equal(fl, lims)
    assert np.array_equal(ids[fi], ii)


def test_idmap_remove_ids(small_ds):
    xb = small_ds.get_database()[:400]
    ids = np.arange(400, dtype=np.int64) + 7000
    idx = IndexIDMap(IndexFlat(small_ds.d))
    idx.add_with_ids(xb, ids)
    # remove every external id in [7100, 7200)
    n = idx.remove_ids(IDSelectorRange(7100, 7200))
    assert n == 100 and idx.ntotal == 300
    xq = small_ds.get_queries()[:10]
    _, I = idx.search(xq, 10)
    assert not (((I >= 7100) & (I < 7200)).any())
    # survivors keep their external ids and exact vectors
    flat = IndexFlat(small_ds.d)
    keep = (ids < 7100) | (ids >= 7200)
    flat.add(xb[keep])
    _, If = flat.search(xq, 10)
    assert np.array_equal(ids[keep][If], I)


def test_idmap2_rev_map(small_ds):
    xb = small_ds.get_database()[:300]
    ids = np.arange(300, dtype=np.int64) * 3 + 5
    idx = IndexIDMap2(IndexFlat(small_ds.d))
    idx.add_with_ids(xb, ids)
    # O(1) reconstruct by external id
    np.testing.assert_array_equal(idx.reconstruct(int(ids[42])), xb[42])
    with pytest.raises(KeyError):
        idx.reconstruct(4)
    # rev_map survives removal (rebuilt like construct_rev_map)
    idx.remove_ids(IDSelectorArray(ids[:50]))
    assert idx.ntotal == 250
    np.testing.assert_array_equal(idx.reconstruct(int(ids[60])), xb[60])
    assert idx.rev_map[int(ids[60])] == 10
    with pytest.raises(KeyError):
        idx.reconstruct(int(ids[10]))


def test_idmap2_io_roundtrip(small_ds, tmp_path):
    from tpu_ann.utils.index_io import read_index, write_index

    xb = small_ds.get_database()[:200]
    ids = np.arange(200, dtype=np.int64) + 999
    idx = IndexIDMap2(IndexFlat(small_ds.d))
    idx.add_with_ids(xb, ids)
    f = str(tmp_path / "idmap2.bin")
    write_index(idx, f)
    idx2 = read_index(f)
    assert isinstance(idx2, IndexIDMap2)
    np.testing.assert_array_equal(idx2.reconstruct(1050), xb[51])
    xq = small_ds.get_queries()[:5]
    np.testing.assert_array_equal(idx.search(xq, 5)[1],
                                  idx2.search(xq, 5)[1])


def test_idmap2_factory(small_ds):
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(small_ds.d, "IDMap2,Flat")
    assert isinstance(idx, IndexIDMap2)
    idx1 = index_factory(small_ds.d, "IDMap,Flat")
    assert isinstance(idx1, IndexIDMap)
    assert not isinstance(idx1, IndexIDMap2)


@pytest.mark.parametrize("kind", ["rq", "qinco", "lsh", "minmax",
                                  "twolayer"])
def test_flatcodes_family_range_search(small_ds, kind):
    """Every IndexFlatCodes descendant range-searches in the reference
    (faiss/IndexFlatCodes.h:65); check each repo counterpart against
    its own decoded/coded oracle."""
    xq = small_ds.get_queries()[:8]
    xb = small_ds.get_database()[:1500]
    xt = small_ds.get_train()

    if kind == "rq":
        from tpu_ann.models.rq import IndexResidualQuantizer

        idx = IndexResidualQuantizer(small_ds.d, M=4, nbits=4)
        idx.train(xt)
        idx.add(xb)
        decoded = idx.sa_decode(np.asarray(idx._codes[: idx.ntotal]))
    elif kind == "qinco":
        from tpu_ann.models.qinco import IndexQINCo

        idx = IndexQINCo(small_ds.d, K=16, L=1, M=2, h=16)
        idx.train(xt[:500])
        idx.add(xb[:400])
        decoded = idx.sa_decode(idx._codes)
    elif kind == "lsh":
        from tpu_ann.models.extra import IndexLSH

        idx = IndexLSH(small_ds.d, 32)
        idx.add(xb)
        D1, _ = idx.search(xq, 10)
        radius = float(np.median(D1[:, 5])) + 0.5
        lims, dd, ii = idx.range_search(xq, radius)
        # oracle: Hamming over the codes
        qc = np.unpackbits(idx.sa_encode(xq), axis=1,
                           bitorder="little")
        bc = np.unpackbits(idx.sa_encode(xb), axis=1,
                           bitorder="little")
        for i in range(len(xq)):
            ham = (qc[i][None] != bc).sum(1)
            expect = set(np.nonzero(ham < radius)[0].tolist())
            assert set(ii[lims[i]:lims[i + 1]].tolist()) == expect
        return
    elif kind == "minmax":
        from tpu_ann.models.extra import IndexRowwiseMinMax
        from tpu_ann.models.flat import IndexFlat

        idx = IndexRowwiseMinMax(IndexFlat(small_ds.d))
        idx.add(xb)
        D1, _ = idx.search(xq, 10)
        radius = float(np.median(D1[:, 5]))
        lims, dd, ii = idx.range_search(xq, radius)
        xn, _, _ = idx._normalize(xb)
        qn, _, _ = idx._normalize(xq)
        for i in range(len(xq)):
            dif = xn - qn[i]
            dis = (dif * dif).sum(1)
            expect = set(np.nonzero(dis < radius)[0].tolist())
            assert set(ii[lims[i]:lims[i + 1]].tolist()) == expect
        return
    else:
        from tpu_ann.models.extra import Index2Layer

        from tpu_ann.models.flat import IndexFlat

        idx = Index2Layer(IndexFlat(small_ds.d), nlist=8, M=4)
        idx.train(xt)
        idx.add(xb)
        decoded = idx._decode_all()

    D1, _ = idx.search(xq, 10)
    radius = float(np.median(D1[:, 5]))
    _check_vs_decoded_oracle(idx, decoded, xq, radius, eps=3e-3)
