"""Serialization sweep: EVERY index type round-trips through
write_index/read_index and searches identically after reload — the
tests/test_io.py stance of the reference (impl/index_write.cpp:391
dispatches every type; anything unregistered fails loudly here).
"""

import os

import numpy as np
import pytest

from tpu_ann.utils import index_io

D_, NB, NQ, NT = 32, 600, 20, 800


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(5)
    xt = rs.randn(NT, D_).astype(np.float32)
    xb = rs.randn(NB, D_).astype(np.float32)
    xq = rs.randn(NQ, D_).astype(np.float32)
    return xt, xb, xq


def _trained_added(idx, xt, xb):
    if not idx.is_trained:
        idx.train(xt)
    idx.add(xb)
    return idx


def _build(name, xt, xb):
    """One representative instance per registered class."""
    import tpu_ann.models as M
    from tpu_ann.models.flat import IndexFlat
    from tpu_ann.ops.distances import METRIC_L2

    if name == "IndexFlat":
        return _trained_added(M.IndexFlat(D_), xt, xb)
    if name == "IndexFlatL2":
        return _trained_added(M.IndexFlatL2(D_), xt, xb)
    if name == "IndexFlatIP":
        return _trained_added(M.IndexFlatIP(D_), xt, xb)
    if name == "IndexFlat1D":
        idx = M.IndexFlat1D()
        idx.add(xb[:, :1].copy())
        return idx
    if name == "IndexHNSW" or name == "IndexHNSWFlat":
        return _trained_added(M.IndexHNSWFlat(D_, 8), xt, xb)
    if name == "IndexHNSWSQ":
        return _trained_added(M.IndexHNSWSQ(D_, "bfloat16", 8), xt, xb)
    if name == "IndexHNSWPQ":
        return _trained_added(M.IndexHNSWPQ(D_, 4, 8), xt, xb)
    if name == "IndexHNSW2Level":
        return _trained_added(M.IndexHNSW2Level(D_, 8, 4, 8), xt, xb)
    if name in ("IndexIVF", "IndexIVFFlat"):
        idx = M.IndexIVFFlat(IndexFlat(D_), D_, 8)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFFlatDedup":
        idx = M.IndexIVFFlatDedup(IndexFlat(D_), D_, 8)
        idx.cp.niter = 4
        idx.train(xt)
        idx.add(np.concatenate([xb, xb[:50]]))   # 50 exact duplicates
        return idx
    if name == "IndexIVFHNSW":
        from tpu_ann.models.ivf_hnsw import IndexIVFHNSW

        idx = IndexIVFHNSW(D_, 8)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexPQ":
        return _trained_added(M.IndexPQ(D_, 4, 6), xt, xb)
    if name == "IndexScalarQuantizer":
        return _trained_added(M.IndexScalarQuantizer(D_), xt, xb)
    if name == "IndexIVFPQ":
        idx = M.IndexIVFPQ(IndexFlat(D_), D_, 8, 4, 6)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFPQR":
        idx = M.IndexIVFPQR(IndexFlat(D_), D_, 8, 4, 6, 4, 6)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFScalarQuantizer":
        idx = M.IndexIVFScalarQuantizer(IndexFlat(D_), D_, 8)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexPreTransform":
        from tpu_ann.models.transforms import (IndexPreTransform,
                                               RandomRotationMatrix)

        vt = RandomRotationMatrix(D_, D_)
        idx = IndexPreTransform(vt, M.IndexFlat(D_))
        return _trained_added(idx, xt, xb)
    if name == "IndexIDMap":
        idx = M.IndexIDMap(M.IndexFlat(D_))
        idx.add_with_ids(xb, np.arange(NB) * 7 + 3)
        return idx
    if name == "IndexIDMap2":
        idx = M.IndexIDMap2(M.IndexFlat(D_))
        idx.add_with_ids(xb, np.arange(NB) * 7 + 3)
        return idx
    if name in ("IndexRefine", "IndexRefineFlat"):
        idx = M.IndexRefineFlat(M.IndexPQ(D_, 4, 6))
        return _trained_added(idx, xt, xb)
    if name == "IndexRefineSQ8Tier":
        idx = M.IndexRefineSQ8Tier(M.IndexPQ(D_, 4, 6))
        return _trained_added(idx, xt, xb)
    if name == "IndexQINCo":
        from tpu_ann.models.qinco import IndexQINCo

        idx = IndexQINCo(D_, K=16, L=1, M=2, h=16)
        return _trained_added(idx, xt[:200], xb[:100])
    if name == "IndexLattice":
        from tpu_ann.models.lattice import IndexLattice

        idx = IndexLattice(D_, nsq=4, scale_nbit=4, r2=14)
        return _trained_added(idx, xt, xb)
    if name in ("IndexResidualQuantizer", "IndexAdditiveQuantizer"):
        return _trained_added(M.IndexResidualQuantizer(D_, 3, 4), xt, xb)
    if name == "IndexLocalSearchQuantizer":
        idx = M.IndexLocalSearchQuantizer(D_, 3, 4)
        idx.train_iters = 2
        return _trained_added(idx, xt, xb)
    if name == "IndexProductResidualQuantizer":
        return _trained_added(
            M.IndexProductResidualQuantizer(D_, 2, 2, 4), xt, xb)
    if name == "IndexProductLocalSearchQuantizer":
        idx = M.IndexProductLocalSearchQuantizer(D_, 2, 2, 4)
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFResidualQuantizer":
        idx = M.IndexIVFResidualQuantizer(IndexFlat(D_), D_, 8, 3, 4)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFLocalSearchQuantizer":
        idx = M.IndexIVFLocalSearchQuantizer(IndexFlat(D_), D_, 8, 3, 4)
        idx.cp.niter = 4
        idx.train_iters = 2
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFProductResidualQuantizer":
        idx = M.IndexIVFProductResidualQuantizer(
            IndexFlat(D_), D_, 8, 2, 2, 4)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFProductLocalSearchQuantizer":
        idx = M.IndexIVFProductLocalSearchQuantizer(
            IndexFlat(D_), D_, 8, 2, 2, 4)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "ResidualCoarseQuantizer":
        idx = M.ResidualCoarseQuantizer(D_, 2, 3)
        idx.train(xt)
        return idx
    if name == "LocalSearchCoarseQuantizer":
        idx = M.LocalSearchCoarseQuantizer(D_, 2, 3)
        idx.train(xt)
        return idx
    if name == "IndexBinaryFlat":
        idx = M.IndexBinaryFlat(D_)
        idx.add((xb > 0).astype(np.uint8)[:, : D_ // 8])
        return idx
    if name == "IndexBinaryIVF":
        idx = M.IndexBinaryIVF(None, D_, 4)
        codes = np.packbits(xb > 0, axis=1)[:, : D_ // 8]
        idx.train(codes[:NT // 2])
        idx.add(codes)
        return idx
    if name == "IndexBinaryHNSW":
        idx = M.IndexBinaryHNSW(D_, 8)
        idx.add(np.packbits(xb[:200] > 0, axis=1)[:, : D_ // 8])
        return idx
    if name == "IndexBinaryHash":
        idx = M.IndexBinaryHash(D_, 8)
        idx.add(np.packbits(xb > 0, axis=1)[:, : D_ // 8])
        return idx
    if name == "IndexBinaryMultiHash":
        idx = M.IndexBinaryMultiHash(D_, 2, 8)
        idx.add(np.packbits(xb > 0, axis=1)[:, : D_ // 8])
        return idx
    if name == "IndexBinaryFromFloat":
        idx = M.IndexBinaryFromFloat(M.IndexFlat(D_))
        idx.add(np.packbits(xb > 0, axis=1)[:, : D_ // 8])
        return idx
    if name == "IndexLSH":
        return _trained_added(M.IndexLSH(D_, 16), xt, xb)
    if name == "IndexRowwiseMinMax":
        return _trained_added(M.IndexRowwiseMinMax(M.IndexFlat(D_)),
                              xt, xb)
    if name == "MultiIndexQuantizer":
        idx = M.MultiIndexQuantizer(D_, 2, 4)
        idx.train(xt)
        return idx
    if name == "Index2Layer":
        idx = M.Index2Layer(IndexFlat(D_), 8, 4)
        return _trained_added(idx, xt, xb)
    if name == "IndexSplitVectors":
        idx = M.IndexSplitVectors(D_)
        idx.add_sub_index(M.IndexFlat(D_ // 2))
        idx.add_sub_index(M.IndexFlat(D_ // 2))
        idx.add(xb[:100])
        return idx
    if name == "IndexRandom":
        return M.IndexRandom(D_, 100)
    if name == "IndexNSGFlat":
        idx = M.IndexNSGFlat(D_, 8)
        idx.nnd_iters = 3
        idx.add(xb)
        return idx
    if name == "IndexNNDescentFlat":
        idx = M.IndexNNDescentFlat(D_, 8)
        idx.nnd_iters = 3
        idx.add(xb)
        return idx
    if name == "IndexIVFFlatPaged":
        import tempfile

        from tpu_ann.models.ivf_paged import IndexIVFFlatPaged

        idx = IndexIVFFlatPaged(D_, 8, tempfile.mkdtemp(
            prefix="tann_paged_"))
        idx.cp_niter = 4
        idx.window_blocks = 8
        idx.tile_batch = 8
        return _trained_added(idx, xt, xb)
    if name == "IndexNSGPQ":
        idx = M.IndexNSGPQ(D_, 4, 8)
        idx.nnd_iters = 3
        return _trained_added(idx, xt, xb)
    if name == "IndexNSGSQ":
        idx = M.IndexNSGSQ(D_, R=8)
        idx.nnd_iters = 3
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFSpectralHash":
        from tpu_ann.models.ivf_extra import IndexIVFSpectralHash

        idx = IndexIVFSpectralHash(IndexFlat(D_), D_, 8, 16)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFIndependentQuantizer":
        from tpu_ann.models.ivf_extra import IndexIVFIndependentQuantizer
        from tpu_ann.models.transforms import PCAMatrix

        payload = M.IndexIVFFlat(IndexFlat(16), 16, 8)
        payload.cp.niter = 4
        idx = IndexIVFIndependentQuantizer(
            IndexFlat(D_), payload, PCAMatrix(D_, 16))
        return _trained_added(idx, xt, xb)
    if name == "IndexIVFHNSW":
        from tpu_ann.models.ivf_hnsw import IndexIVFHNSW

        idx = IndexIVFHNSW(D_, 8)
        idx.cp.niter = 4
        return _trained_added(idx, xt, xb)
    if name == "IndexShards":
        idx = M.IndexShards(D_)
        idx.add_shard(M.IndexFlat(D_))
        idx.add_shard(M.IndexFlat(D_))
        idx.add(xb)
        return idx
    if name == "IndexReplicas":
        idx = M.IndexReplicas(D_)
        idx.add_replica(M.IndexFlat(D_))
        idx.add_replica(M.IndexFlat(D_))
        idx.add(xb)
        return idx
    raise KeyError(name)


_ALL = sorted(set(index_io._DUMPERS.keys()))


def test_every_model_class_is_registered():
    """Any Index subclass reachable from tpu_ann.models must have a
    serializer (the index_write.cpp:391 'every type' contract)."""
    import tpu_ann.models as M
    from tpu_ann.models.base import Index
    from tpu_ann.models.binary import IndexBinary

    skip = {
        "Index", "IndexBinary",            # abstract bases
        "AdditiveCoarseQuantizer",         # abstract (no codec trainer)
        "IndexNeuralNetCodec",             # abstract codec base
    }
    missing = []
    for name in dir(M):
        obj = getattr(M, name)
        if not isinstance(obj, type):
            continue
        if not issubclass(obj, (Index, IndexBinary)):
            continue
        if obj.__name__ in skip or obj.__name__ in index_io._DUMPERS:
            continue
        missing.append(obj.__name__)
    assert not missing, f"unserializable index classes: {missing}"


@pytest.mark.parametrize("name", _ALL)
def test_roundtrip(name, data, tmp_path):
    xt, xb, xq = data
    try:
        idx = _build(name, xt, xb)
    except KeyError:
        pytest.fail(f"no sweep builder for registered class {name}")
    p = os.path.join(tmp_path, f"{name}.tann")
    index_io.write_index(idx, p)
    idx2 = index_io.read_index(p)
    # IndexFlatL2/IP reload as IndexFlat with the metric preserved
    # (same tag; behavior-identical)
    if hasattr(idx, "metric_type"):
        assert idx2.metric_type == idx.metric_type
    assert idx2.ntotal == idx.ntotal

    if name in ("MultiIndexQuantizer",):
        q = xq
        D1, I1 = idx.search(q, 4)
        D2, I2 = idx2.search(q, 4)
    elif name.startswith("IndexBinary"):
        q = np.packbits(xq > 0, axis=1)[:, : D_ // 8]
        D1, I1 = idx.search(q, 4)
        D2, I2 = idx2.search(q, 4)
    elif name == "IndexFlat1D":
        q = xq[:, :1].copy()
        D1, I1 = idx.search(q, 4)
        D2, I2 = idx2.search(q, 4)
    else:
        D1, I1 = idx.search(xq, 4)
        D2, I2 = idx2.search(xq, 4)
    # LSQ encodes with a fresh RNG per call; everything else must match
    # exactly (same arrays, same kernels)
    if "LocalSearch" not in name:
        np.testing.assert_array_equal(I1, I2)
        np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)
    else:
        assert (I1 == I2).mean() > 0.5


@pytest.mark.parametrize("name", ["IndexIVFPQ", "IndexHNSWFlat",
                                  "IndexResidualQuantizer"])
def test_roundtrip_mmap(name, data, tmp_path):
    xt, xb, xq = data
    idx = _build(name, xt, xb)
    p = os.path.join(tmp_path, f"{name}.tann")
    index_io.write_index(idx, p)
    idx2 = index_io.read_index(p, mmap=True)
    D1, I1 = idx.search(xq, 4)
    D2, I2 = idx2.search(xq, 4)
    np.testing.assert_array_equal(I1, I2)


def test_clone_index_is_independent(data):
    """clone_index (clone_index.cpp role): in-memory deep copy; mutating
    the original leaves the clone untouched."""
    import tpu_ann.models as M
    from tpu_ann.utils.index_io import clone_index

    xt, xb, xq = data
    idx = M.IndexIVFFlat(M.IndexFlat(D_), D_, 8)
    idx.cp.niter = 4
    idx.train(xt)
    idx.add(xb)
    idx.nprobe = 8
    c = clone_index(idx)
    D1, I1 = idx.search(xq, 5)
    D2, I2 = c.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)

    from tpu_ann.models.selectors import IDSelectorArray

    idx.remove_ids(IDSelectorArray(I1[:, 0]))
    _, I3 = c.search(xq, 5)
    np.testing.assert_array_equal(I2, I3)    # clone unaffected


def test_serialize_deserialize_buffer(data):
    """serialize_index/deserialize_index byte-buffer round trip
    (python/__init__.py:315-339 role)."""
    xt, xb, xq = data
    from tpu_ann import index_factory
    from tpu_ann.utils.index_io import deserialize_index, serialize_index

    idx = index_factory(D_, "IVF8,Flat")
    idx.cp.niter = 3
    idx.train(xt)
    idx.add(xb)
    idx.nprobe = 4
    buf = serialize_index(idx)
    assert buf.dtype == np.uint8 and buf.nbytes > 0
    idx2 = deserialize_index(buf)
    D1, I1 = idx.search(xq, 4)
    D2, I2 = idx2.search(xq, 4)
    assert np.array_equal(I1, I2)
