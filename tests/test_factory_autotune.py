"""index_factory + ParameterSpace + composite wrappers + range search —
mirrors tests/test_factory.py, test_index_composite.py,
test_params_override.py, and the range-search parts of
test_index_accuracy.py in the reference."""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.idmap import IndexIDMap, IndexReplicas, IndexShards
from tpu_ann.utils.autotune import (
    IntersectionCriterion,
    OneRecallAtRCriterion,
    ParameterSpace,
)
from tpu_ann.utils.factory import index_factory
from tpu_ann.utils.evaluation import recall_at_r


@pytest.mark.parametrize("spec,cls", [
    ("Flat", "IndexFlat"),
    ("PQ4", "IndexPQ"),
    ("SQ8", "IndexScalarQuantizer"),
    ("SQfp16", "IndexScalarQuantizer"),
    ("HNSW16", "IndexHNSWFlat"),
    ("IVF32,Flat", "IndexIVFFlat"),
    ("IVF32,PQ4", "IndexIVFPQ"),
    ("IVF32,SQ8", "IndexIVFScalarQuantizer"),
    ("IVF32_HNSW8,Flat", "IndexIVFHNSW"),
    ("PCA16,Flat", "IndexPreTransform"),
    ("OPQ4,IVF32,PQ4", "IndexPreTransform"),
    ("IDMap,Flat", "IndexIDMap"),
    ("IVF32,Flat,RFlat", "IndexRefineFlat"),
    ("IVF32,PQ4,RSQ8t", "IndexRefineSQ8Tier"),
])
def test_factory_types(spec, cls):
    idx = index_factory(32, spec)
    assert type(idx).__name__ == cls, (spec, type(idx).__name__)
    assert idx.d == 32


def test_factory_end_to_end(small_ds):
    idx = index_factory(small_ds.d, "IVF32_HNSW8,Flat")
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 8
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.8


def test_factory_rejects_garbage():
    with pytest.raises(ValueError):
        index_factory(32, "NOPE42")
    with pytest.raises(ValueError):
        index_factory(32, "")


def test_parameter_space_explore(small_ds):
    idx = index_factory(small_ds.d, "IVF32,Flat")
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    ps = ParameterSpace()
    ps.initialize(idx)
    assert "nprobe" in ps.parameter_ranges
    crit = OneRecallAtRCriterion(small_ds.nq, 10)
    crit.set_groundtruth(None, small_ds.get_groundtruth(10))
    ops = ps.explore(idx, small_ds.get_queries(), crit)
    opt = ops.optimal_pts()
    assert len(opt) >= 1
    # Pareto: increasing time must increase perf
    perfs = [p.perf for p in opt]
    assert perfs == sorted(perfs)
    assert opt[-1].perf > 0.9


def test_set_index_parameters(small_ds):
    idx = index_factory(small_ds.d, "IVF32,Flat")
    ps = ParameterSpace()
    ps.set_index_parameters(idx, "nprobe=12")
    assert idx.nprobe == 12


def test_idmap(small_ds):
    idx = IndexIDMap(IndexFlat(small_ds.d))
    xb = small_ds.get_database()
    ids = np.arange(len(xb)) * 7 + 1
    idx.add_with_ids(xb, ids)
    _, I = idx.search(xb[:5], 1)
    assert (I[:, 0] == ids[:5]).all()
    with pytest.raises(RuntimeError):
        idx.add(xb)


def test_shards_matches_single(small_ds):
    xb = small_ds.get_database()
    sh = IndexShards(small_ds.d)
    for _ in range(4):
        sh.add_shard(IndexFlat(small_ds.d))
    sh.add(xb)
    assert sh.ntotal == len(xb)
    flat = IndexFlat(small_ds.d)
    flat.add(xb)
    D1, I1 = sh.search(small_ds.get_queries(), 5)
    D2, I2 = flat.search(small_ds.get_queries(), 5)
    np.testing.assert_allclose(D1, D2, rtol=1e-4, atol=1e-4)
    assert (I1[:, 0] == I2[:, 0]).mean() > 0.99


def test_replicas(small_ds):
    xb = small_ds.get_database()
    rep = IndexReplicas(small_ds.d)
    for _ in range(2):
        rep.add_replica(IndexFlat(small_ds.d))
    rep.add(xb)
    flat = IndexFlat(small_ds.d)
    flat.add(xb)
    D1, I1 = rep.search(small_ds.get_queries(), 5)
    D2, I2 = flat.search(small_ds.get_queries(), 5)
    assert (I1 == I2).all()


def test_range_search_flat(small_ds):
    flat = IndexFlat(small_ds.d)
    xb = small_ds.get_database()
    flat.add(xb)
    xq = small_ds.get_queries()[:20]
    D, _ = flat.search(xq, 10)
    radius = float(np.median(D[:, 5]))
    lims, dd, ii = flat.range_search(xq, radius)
    # oracle: numpy exact
    for i in range(20):
        dif = xb - xq[i]
        dis = (dif * dif).sum(1)
        expect = set(np.nonzero(dis < radius)[0].tolist())
        got = set(ii[lims[i]:lims[i + 1]].tolist())
        assert got == expect
        assert (dd[lims[i]:lims[i + 1]] < radius).all()


def test_range_search_ivf(small_ds):
    idx = index_factory(small_ds.d, "IVF16,Flat")
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    xb = small_ds.get_database()
    idx.add(xb)
    idx.nprobe = 16  # exhaustive -> must match brute force
    xq = small_ds.get_queries()[:10]
    flat = IndexFlat(small_ds.d)
    flat.add(xb)
    D, _ = flat.search(xq, 10)
    radius = float(np.median(D[:, 5]))
    l1, d1, i1 = flat.range_search(xq, radius)
    l2, d2, i2 = idx.range_search(xq, radius)
    for i in range(10):
        s1 = set(i1[l1[i]:l1[i + 1]].tolist())
        s2 = set(i2[l2[i]:l2[i + 1]].tolist())
        assert s1 == s2


def test_factory_hnsw_storage_variants():
    from tpu_ann.models.hnsw import (IndexHNSW2Level, IndexHNSWPQ,
                                     IndexHNSWSQ)
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(64, "HNSW16,PQ8")
    assert isinstance(idx, IndexHNSWPQ)
    assert idx.pq_m == 8 and idx.hnsw.M == 16
    idx = index_factory(64, "HNSW16,SQfp16")
    assert isinstance(idx, IndexHNSWSQ) and idx.storage_dtype == "float16"
    idx = index_factory(64, "HNSW16,32+PQ8")
    assert isinstance(idx, IndexHNSW2Level)
    assert idx.codec.nlist == 32 and idx.codec.M == 8


def test_factory_lsh():
    from tpu_ann.models.extra import IndexLSH
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(64, "LSH")
    assert isinstance(idx, IndexLSH) and idx.nbits == 64
    idx = index_factory(64, "LSH128rt")
    assert idx.nbits == 128 and idx.rotate_data and idx.train_thresholds


def test_operating_points_with_ranges():
    """contrib/evaluation.py:357 OperatingPointsWithRanges: cno
    enumeration, dominance, prediction bounds, range restriction."""
    from tpu_ann.utils.autotune import OperatingPointsWithRanges

    ops = OperatingPointsWithRanges()
    ops.add_range("nprobe", [1, 4, 16])
    ops.add_range("efSearch", [16, 64])
    assert ops.num_experiments() == 6
    keys = [ops.cno_to_key(c) for c in range(6)]
    assert len(set(keys)) == 6 and keys[0] == (0, 0)
    assert ops.get_parameters((2, 1)) == {"nprobe": 16, "efSearch": 64}
    assert ops.compare_keys((2, 1), (0, 0)) == 1
    assert ops.compare_keys((0, 0), (2, 1)) == -1
    assert ops.compare_keys((2, 0), (0, 1)) == 0
    # measured: cheap low-recall and expensive high-recall points
    ops.add(0.5, 0.01, (0, 0))
    ops.add(0.9, 0.10, (2, 1))
    max_perf, min_time = ops.predict_bounds((1, 0))
    assert max_perf == 0.9      # dominated by the (2,1) measurement
    assert min_time == 0.01     # dominates the (0,0) measurement
    ops.restrict_range("nprobe", 16)
    assert ops.num_experiments() == 4


def test_fastscan_spellings_for_aq():
    """index_factory accepts the reference's AQ fast-scan spellings
    (Index{,IVF}AdditiveQuantizerFastScan grammar: RQ{M}x4fs[_bbs])."""
    from tpu_ann import index_factory
    from tpu_ann.models.rq import (IndexIVFResidualQuantizer,
                                   IndexResidualQuantizer)

    idx = index_factory(16, "RQ2x4fs_32")
    assert isinstance(idx, IndexResidualQuantizer)
    ivf = index_factory(16, "IVF16,RQ2x4fs")
    assert isinstance(ivf, IndexIVFResidualQuantizer)
