"""Invlist composition views + streaming on-disk merge
(faiss/invlists/InvertedLists.h:306-401 views,
OnDiskInvertedLists::merge_from_multiple + contrib/ondisk.py workflow)."""

import numpy as np
import pytest

from tpu_ann.models.ivf import make_ivf_flat
from tpu_ann.models.ivf_pq import IndexIVFPQ
from tpu_ann.utils import contrib, index_io
from tpu_ann.utils.invlists_io import (
    ArraySource,
    FileInvlistSource,
    HStackInvlists,
    IndexInvlistSource,
    MaskedInvlists,
    SliceInvlists,
    StopWordsInvlists,
    VStackInvlists,
    merge_ondisk,
)


def _mk_shards(small_ds, nshard=3, nlist=32):
    xt = small_ds.get_train()
    xb = small_ds.get_database()
    base = make_ivf_flat(small_ds.d, nlist)
    base.cp.niter = 5
    base.train(xt)
    shards = []
    bounds = np.linspace(0, len(xb), nshard + 1, dtype=int)
    for s in range(nshard):
        ix = make_ivf_flat(small_ds.d, nlist)
        ix.quantizer = base.quantizer
        ix.is_trained = True
        lo, hi = bounds[s], bounds[s + 1]
        ix.add_with_ids(xb[lo:hi], np.arange(lo, hi, dtype=np.int64))
        shards.append(ix)
    return base, shards, xb


def test_views_semantics():
    p0 = [np.full((2, 4), 1.0, np.float32), np.zeros((0, 4), np.float32)]
    i0 = [np.array([10, 11]), np.array([], np.int64)]
    p1 = [np.full((1, 4), 2.0, np.float32), np.full((3, 4), 3.0, np.float32)]
    i1 = [np.array([20]), np.array([30, 31, 32])]
    a, b = ArraySource(p0, i0), ArraySource(p1, i1)

    h = HStackInvlists([a, b])
    assert h.nlist == 2 and h.list_size(0) == 3 and h.list_size(1) == 3
    _, ids = h.get_list(0)
    assert list(ids) == [10, 11, 20]

    v = VStackInvlists([a, b])
    assert v.nlist == 4
    assert [v.list_size(i) for i in range(4)] == [2, 0, 1, 3]
    assert list(v.get_list(3)[1]) == [30, 31, 32]

    s = SliceInvlists(v, 1, 3)
    assert s.nlist == 2 and s.list_size(1) == 1
    assert list(s.get_list(1)[1]) == [20]

    m = MaskedInvlists(a, b)
    assert m.list_size(0) == 2          # a non-empty -> a
    assert list(m.get_list(1)[1]) == [30, 31, 32]  # a empty -> b

    sw = StopWordsInvlists(b, maxsize=2)
    assert sw.list_size(0) == 1 and sw.list_size(1) == 0
    assert len(sw.get_list(1)[0]) == 0


def test_file_source_host_form(small_ds, tmp_path):
    """il_from_host saves (index_io._dump_ivf_common) write NO il_data
    for raw-float IVF — FileInvlistSource must serve per-list access
    straight from the mmapped host store + assignments (regression:
    'no packed invlists in file' broke the shard-merge workflow)."""
    _, shards, _ = _mk_shards(small_ds, nshard=1)
    sh = shards[0]
    p = str(tmp_path / "hostform.tann")
    index_io.write_index(sh, p)
    meta, arrays = index_io._read_container(p, mmap=True)
    assert meta.get("il_from_host") and "il_data" not in arrays
    src = FileInvlistSource(p)
    assert src.nlist == sh.nlist and src.ntotal == sh.ntotal
    sizes = [src.list_size(i) for i in range(src.nlist)]
    assert sum(sizes) == sh.ntotal
    li = max(range(src.nlist), key=lambda i: sizes[i])
    payload, ids = src.get_list(li)
    assert payload.shape == (sizes[li], sh.d)
    assert len(set(ids.tolist())) == sizes[li]


def test_merge_ondisk_flat(small_ds, tmp_path):
    base, shards, xb = _mk_shards(small_ds)
    # oracle: in-RAM merge
    ram = make_ivf_flat(small_ds.d, base.nlist)
    ram.quantizer = base.quantizer
    ram.is_trained = True
    contrib.merge_indexes(ram, shards)

    paths = []
    for j, sh in enumerate(shards):
        p = str(tmp_path / f"shard{j}.tann")
        index_io.write_index(sh, p)
        paths.append(p)

    dst = str(tmp_path / "merged.tann")
    n = merge_ondisk(base, [FileInvlistSource(p) for p in paths], dst)
    assert n == len(xb)

    loaded = index_io.read_index(dst, mmap=True)
    assert loaded.ntotal == len(xb)
    xq = small_ds.get_queries()
    loaded.nprobe = ram.nprobe = 8
    D0, I0 = ram.search(xq, 10)
    D1, I1 = loaded.search(xq, 10)
    np.testing.assert_array_equal(I0, I1)
    np.testing.assert_allclose(D0, D1, rtol=1e-4, atol=1e-4)
    # merged flat file keeps the host store: still mutable
    loaded.add_with_ids(xb[:5], np.arange(10_000, 10_005, dtype=np.int64))
    assert loaded.ntotal == len(xb) + 5


def test_index_source_matches_file_source(small_ds, tmp_path):
    base, shards, _ = _mk_shards(small_ds, nshard=1)
    sh = shards[0]
    p = str(tmp_path / "s.tann")
    index_io.write_index(sh, p)
    a, b = IndexInvlistSource(sh), FileInvlistSource(p)
    assert a.nlist == b.nlist
    for l in range(a.nlist):
        assert a.list_size(l) == b.list_size(l)
        if a.list_size(l):
            pa, ia = a.get_list(l)
            pb, ib = b.get_list(l)
            # same id set (order within a list may differ across packers)
            assert set(ia) == set(ib)
            np.testing.assert_allclose(
                pa[np.argsort(ia)], pb[np.argsort(ib)], rtol=1e-6)


def test_merge_ondisk_coded(small_ds, tmp_path):
    xt = small_ds.get_train()
    xb = small_ds.get_database()
    nlist = 16
    from tpu_ann.models.flat import IndexFlat
    base = IndexIVFPQ(IndexFlat(small_ds.d), small_ds.d, nlist=nlist, M=4,
                      nbits=8)
    base.cp.niter = 5
    base.train(xt)
    half = len(xb) // 2
    sh = []
    for lo, hi in ((0, half), (half, len(xb))):
        ix = IndexIVFPQ(IndexFlat(small_ds.d), small_ds.d, nlist=nlist,
                        M=4, nbits=8)
        ix.quantizer = base.quantizer
        ix.pq = base.pq
        ix._pq_cent_dev = base._pq_cent_dev
        ix.is_trained = True
        ix.add_with_ids(xb[lo:hi], np.arange(lo, hi, dtype=np.int64))
        sh.append(ix)
    ram = IndexIVFPQ(IndexFlat(small_ds.d), small_ds.d, nlist=nlist,
                     M=4, nbits=8)
    ram.quantizer = base.quantizer
    ram.pq = base.pq
    ram._pq_cent_dev = base._pq_cent_dev
    ram.is_trained = True
    contrib.merge_indexes(ram, sh)

    paths = []
    for j, s in enumerate(sh):
        p = str(tmp_path / f"pq{j}.tann")
        index_io.write_index(s, p)
        paths.append(p)
    dst = str(tmp_path / "pq_merged.tann")
    n = merge_ondisk(base, [FileInvlistSource(p) for p in paths], dst)
    assert n == len(xb)

    loaded = index_io.read_index(dst, mmap=True)
    xq = small_ds.get_queries()
    loaded.nprobe = ram.nprobe = 8
    D0, I0 = ram.search(xq, 10)
    D1, I1 = loaded.search(xq, 10)
    # ADC distances identical => identical ranking up to ties
    np.testing.assert_allclose(np.sort(D0), np.sort(D1), rtol=1e-4,
                               atol=1e-4)
    assert (I0 == I1).mean() > 0.9
    # coded merge is search-only
    with pytest.raises(RuntimeError):
        loaded.add_with_ids(xb[:3], np.arange(3, dtype=np.int64))


def test_ondisk_slot_allocator(tmp_path):
    """OnDiskInvertedLists (OnDiskInvertedLists.h:132-133): chunked adds
    append into block padding / allocate from the free list; removals
    free empty blocks; untouched blocks are never rewritten."""
    import os

    from tpu_ann.utils.invlists_io import OnDiskInvertedLists

    p = str(tmp_path / "lists.todl")
    il = OnDiskInvertedLists.create(p, nlist=4, width=8, block_size=4)
    rs = np.random.RandomState(0)

    x0 = rs.randn(6, 8).astype(np.float32)
    il.add_entries(0, x0, np.arange(6))
    assert il.list_size(0) == 6 and il.nblocks == 2

    # incremental append: fills padding first (no new block for 2 rows)
    x1 = rs.randn(2, 8).astype(np.float32)
    il.add_entries(0, x1, np.arange(6, 8))
    assert il.nblocks == 2 and il.list_size(0) == 8

    # snapshot block 0 bytes; appending to ANOTHER list must not touch it
    blk_bytes = il._block_bytes
    with open(p, "rb") as f:
        b0_before = f.read(blk_bytes)
    il.add_entries(1, rs.randn(5, 8).astype(np.float32),
                   np.arange(100, 105))
    with open(p, "rb") as f:
        b0_after = f.read(blk_bytes)
    assert b0_before == b0_after          # no regeneration of old blocks
    assert il.nblocks == 4

    # removal frees an emptied block, and the next add reuses it
    removed = il.remove_entries(0, np.arange(4, 8))
    assert removed == 4
    assert len(il.free_blocks) == 1
    assert il.list_size(0) == 4
    il.add_entries(2, rs.randn(3, 8).astype(np.float32),
                   np.arange(200, 203))
    assert il.nblocks == 4                # file did not grow
    assert not il.free_blocks

    # round-trips through the sidecar
    il.flush()
    il2 = OnDiskInvertedLists(p)
    pay, ids = il2.get_list(1)
    assert len(ids) == 5 and set(ids) == set(range(100, 105))

    py, i0 = il2.get_list(0)
    assert set(i0) == set(range(4))
    np.testing.assert_allclose(py, x0[:4], rtol=1e-6)


def test_ondisk_allocator_feeds_merge(small_ds, tmp_path):
    """The allocator implements InvlistSource, so it plugs straight into
    merge_ondisk to produce a searchable mmap index."""
    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.utils import index_io
    from tpu_ann.utils.invlists_io import OnDiskInvertedLists, merge_ondisk

    d = small_ds.d
    xb = small_ds.get_database()[:2000]
    trained = make_ivf_flat(d, nlist=8)
    trained.cp.niter = 4
    trained.train(small_ds.get_train())

    # route vectors into the on-disk container by coarse assignment,
    # in two chunks (the incremental add workflow)
    p = str(tmp_path / "grow.todl")
    il = OnDiskInvertedLists.create(p, nlist=8, width=d)
    for lo, hi in ((0, 1000), (1000, 2000)):
        a = trained._assign(xb[lo:hi])
        for l in np.unique(a):
            m = a == l
            il.add_entries(int(l), xb[lo:hi][m],
                           np.arange(lo, hi)[m])
    dst = str(tmp_path / "merged.tann")
    n = merge_ondisk(trained, il, dst)
    assert n == 2000
    idx = index_io.read_index(dst, mmap=True)
    idx.nprobe = 8
    _, Iv = idx.search(xb[:10], 1)
    assert (np.asarray(Iv)[:, 0] == np.arange(10)).all()


def test_ivf_save_skips_invlist_download(small_ds):
    """The il_from_host fast save (round-5): raw-float IVF dumps must
    NOT serialize the packed device invlists when the host store is
    complete — the 10M save measured 1109 s of redundant device
    download before the fix (benchs/logs/r5_queue5.jsonl save_path)."""
    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.models.selectors import IDSelectorRange
    from tpu_ann.utils import index_io

    idx = make_ivf_flat(small_ds.d, 16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    m, a = index_io.dump_index(idx)
    assert m["il_from_host"] is True
    assert "il_data" not in a and "il_norms" not in a
    assert "assign_host" in a
    idx2 = index_io.load_index(m, a)
    idx.nprobe = idx2.nprobe = 4
    xq = small_ds.get_queries()[:20]
    np.testing.assert_array_equal(idx.search(xq, 5)[1],
                                  idx2.search(xq, 5)[1])

    # pending removals force the safe full dump (ids must persist)
    idx.remove_ids(IDSelectorRange(0, 50))
    m2, a2 = index_io.dump_index(idx)
    idx3 = index_io.load_index(m2, a2)
    _, I3 = idx3.search(xq, 5)
    assert not ((I3 >= 0) & (I3 < 50)).any()
