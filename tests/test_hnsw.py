"""HNSW tests — recall-parity oracle like the reference's test_hnsw.cpp /
test_graph_based.py (the reference asserts recall/stats, not graph shape)."""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.hnsw import IndexHNSWFlat, SearchParametersHNSW
from tpu_ann.utils.evaluation import recall_at_r


@pytest.fixture(scope="module")
def built(request):
    import tpu_ann.utils.datasets as ds_mod

    ds = ds_mod.SyntheticDataset(d=32, nt=0, nb=4000, nq=100)
    index = IndexHNSWFlat(32, M=16)
    index.hnsw.efConstruction = 40
    index.add(ds.get_database())
    flat = IndexFlat(32)
    flat.add(ds.get_database())
    _, gt = flat.search(ds.get_queries(), 10)
    return index, ds, gt


def test_hnsw_recall(built):
    index, ds, gt = built
    index.hnsw.efSearch = 64
    _, I = index.search(ds.get_queries(), 10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.9, f"recall@10 {r}"


def test_hnsw_ef_monotonic(built):
    """Larger efSearch must not hurt recall (faiss autotune assumption)."""
    index, ds, gt = built
    rs = []
    for ef in (8, 32, 128):
        _, I = index.search(
            ds.get_queries(), 10, params=SearchParametersHNSW(efSearch=ef)
        )
        rs.append(recall_at_r(I, gt, 10))
    assert rs[0] <= rs[1] + 0.05 and rs[1] <= rs[2] + 0.02
    assert rs[2] > 0.95, f"ef=128 recall {rs[2]}"


def test_hnsw_self_search(built):
    index, ds, _ = built
    index.hnsw.efSearch = 32
    D, I = index.search(ds.get_database()[:20], 1)
    assert (I[:, 0] == np.arange(20)).mean() > 0.9
    assert (D[:, 0] < 1e-4).mean() > 0.9


def test_hnsw_stats(built):
    index, ds, _ = built
    _, _, st = index.search_stats(ds.get_queries(), 5)
    assert st.ndis > 0 and st.nlist_visited > 0


def test_hnsw_graph_invariants(built):
    index, _, _ = built
    nb = np.asarray(index.graph.neighbors0)
    n = nb.shape[0]
    # no self-links, ids in range
    row = np.arange(n)[:, None]
    assert not (nb == row).any()
    assert (nb < n).all() and (nb >= -1).all()
    # every node except possibly a handful is connected at level 0
    deg = (nb >= 0).sum(1)
    assert (deg == 0).sum() <= 1  # entry of an isolated build step


def test_hnsw_empty_search():
    index = IndexHNSWFlat(16, M=8)
    D, I = index.search(np.zeros((3, 16), np.float32), 4)
    assert (I == -1).all()


def test_hnsw_sq_bf16(built):
    """Reduced-precision storage keeps recall (IndexHNSWSQ role)."""
    from tpu_ann.models.hnsw import IndexHNSWSQ
    import tpu_ann.utils.datasets as ds_mod

    ds = ds_mod.SyntheticDataset(d=32, nt=0, nb=4000, nq=100)
    idx = IndexHNSWSQ(32, "bfloat16", M=16)
    idx.hnsw.efConstruction = 40
    idx.hnsw.efSearch = 64
    idx.add(ds.get_database())
    _, I = idx.search(ds.get_queries(), 10)
    _, _, gt = built
    from tpu_ann.utils.evaluation import recall_at_r

    assert recall_at_r(I, gt, 10) > 0.88
