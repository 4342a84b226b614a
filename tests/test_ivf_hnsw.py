"""Hybrid (HNSW coarse quantizer over IVF) + serialization round-trips —
the fork's core workflow (tutorial/python/190-hnsw-ivf-test.py:
build -> save -> mmap reopen -> search -> recall)."""

import os

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.ivf import SearchParametersIVF
from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
from tpu_ann.utils import index_io
from tpu_ann.utils.evaluation import recall_at_r


@pytest.fixture(scope="module")
def hybrid(small_ds):
    index = IndexIVFHNSW(small_ds.d, nlist=64, M=16)
    index.set_hnsw_parameters(efConstruction=40, efSearch=32)
    index.cp.niter = 8
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    return index


def test_hybrid_recall(hybrid, small_ds):
    hybrid.nprobe = 16
    _, I = hybrid.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.9, f"recall {r}"


def test_hybrid_stats_split(hybrid, small_ds):
    hybrid.nprobe = 8
    _, _, st = hybrid.search_stats(small_ds.get_queries(), 10)
    assert st.quantization_us > 0 and st.list_scan_us > 0
    assert st.total_us == st.quantization_us + st.list_scan_us


def test_hybrid_chunked_add(small_ds):
    index = IndexIVFHNSW(small_ds.d, nlist=32, M=8)
    index.cp.niter = 5
    index.add_chunk_size = 1000
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())   # 4 chunks
    assert index.ntotal == small_ds.nb
    index.nprobe = 32
    gt = small_ds.get_groundtruth(10)
    _, I = index.search(small_ds.get_queries(), 10)
    assert recall_at_r(I, gt, 10) > 0.9


@pytest.mark.parametrize("mmap", [False, True])
def test_hybrid_save_load(hybrid, small_ds, tmp_path, mmap):
    p = str(tmp_path / "hybrid.tann")
    hybrid.save_to_disk(p)
    loaded = index_io.read_index(p, mmap=mmap)
    assert isinstance(loaded, IndexIVFHNSW)
    assert loaded.ntotal == hybrid.ntotal
    loaded.nprobe = 16
    hybrid.nprobe = 16
    D1, I1 = hybrid.search(small_ds.get_queries(), 10)
    D2, I2 = loaded.search(small_ds.get_queries(), 10)
    assert (I1 == I2).all()
    np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)


def test_flat_save_load(small_ds, tmp_path):
    p = str(tmp_path / "flat.tann")
    idx = IndexFlat(small_ds.d)
    idx.add(small_ds.get_database())
    index_io.write_index(idx, p)
    loaded = index_io.read_index(p)
    D1, I1 = idx.search(small_ds.get_queries(), 5)
    D2, I2 = loaded.search(small_ds.get_queries(), 5)
    assert (I1 == I2).all()


def test_auto_save(small_ds, tmp_path):
    p = str(tmp_path / "auto.tann")
    index = IndexIVFHNSW(small_ds.d, nlist=16, M=8)
    index.cp.niter = 4
    index.index_file_path = p
    index.auto_save = True
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    assert os.path.exists(p)
    loaded = IndexIVFHNSW.load(p)
    assert loaded.ntotal == small_ds.nb


def test_bad_magic(tmp_path):
    p = str(tmp_path / "junk")
    with open(p, "wb") as f:
        f.write(b"not an index")
    with pytest.raises(ValueError):
        index_io.read_index(p)


@pytest.mark.parametrize("spec", [
    "PQ4", "SQ8", "IVF16,PQ4", "IVF16,SQ8", "PCA16,Flat",
    "IVF16,Flat,RFlat",
])
def test_save_load_all_types(spec, small_ds, tmp_path):
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(small_ds.d, spec)
    if hasattr(idx, "cp"):
        idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    p = str(tmp_path / "x.tann")
    index_io.write_index(idx, p)
    loaded = index_io.read_index(p)
    if hasattr(loaded, "nprobe"):
        loaded.nprobe = idx.nprobe = 8
    D1, I1 = idx.search(small_ds.get_queries()[:20], 5)
    D2, I2 = loaded.search(small_ds.get_queries()[:20], 5)
    assert (I1 == I2).all(), spec


def test_save_load_idmap(small_ds, tmp_path):
    from tpu_ann.models.flat import IndexFlat
    from tpu_ann.models.idmap import IndexIDMap

    idx = IndexIDMap(IndexFlat(small_ds.d))
    ids = np.arange(small_ds.nb) * 3 + 7
    idx.add_with_ids(small_ds.get_database(), ids)
    p = str(tmp_path / "m.tann")
    index_io.write_index(idx, p)
    loaded = index_io.read_index(p)
    _, I1 = idx.search(small_ds.get_database()[:5], 1)
    _, I2 = loaded.search(small_ds.get_database()[:5], 1)
    assert (I1 == I2).all()


def test_quantizer_mode_ef_couples_to_nprobe(small_ds):
    """coarse_mode='quantizer' must scale the HNSW beam with nprobe
    (IndexIVF.coarse_ef_factor): a beam of efSearch<nprobe candidates
    cannot rank nprobe lists, so high-nprobe recall would silently starve
    (the reference sweeps quantizer efSearch alongside nprobe,
    tutorial/python/190 harness)."""
    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.utils.evaluation import recall_at_r

    idx = IndexIVFHNSW(small_ds.d, 64)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.coarse_mode = "quantizer"
    idx.set_hnsw_parameters(efSearch=8)      # deliberately starved default
    idx.nprobe = 48
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r_coupled = recall_at_r(I, gt, 10)

    idx.coarse_mode = "flat"
    _, If = idx.search(small_ds.get_queries(), 10)
    r_exact = recall_at_r(If, gt, 10)
    # with the coupling, the faithful mode keeps pace with exact coarse
    assert r_coupled >= r_exact - 0.02, (r_coupled, r_exact)
