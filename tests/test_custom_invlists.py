"""Custom invlist-backend extension point (reference demos/rocksdb_ivf:
a key-value store plugged in through InvertedListsIOHook; here through
the InvlistSource protocol). Runs the sqlite demo adapter end-to-end."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))


def test_sqlite_invlists_roundtrip(tmp_path):
    from demo_custom_invlists import SQLiteInvertedLists

    from tpu_ann import index_factory, read_index
    from tpu_ann.utils.contrib import get_invlist
    from tpu_ann.utils.invlists_io import merge_ondisk

    rs = np.random.RandomState(3)
    xt = rs.randn(2000, 16).astype(np.float32)
    xb = rs.randn(8000, 16).astype(np.float32)
    xq = rs.randn(30, 16).astype(np.float32)

    index = index_factory(16, "IVF16,Flat")
    index.cp.niter = 4
    index.train(xt)
    index.add(xb)
    index.nprobe = 16
    _, I_ref = index.search(xq, 5)

    kv = SQLiteInvertedLists(str(tmp_path / "kv.sqlite"), nlist=16,
                             width=16, create=True)
    for l in range(16):
        ids, payload = get_invlist(index, l)
        kv.put_list(l, payload, ids)
    kv.commit()
    assert kv.ntotal == 8000
    # per-list contents survive the store byte-exactly
    ids0, pay0 = get_invlist(index, 0)
    pay1, ids1 = kv.get_list(0)
    assert np.array_equal(ids0, ids1)
    assert np.array_equal(pay0.astype(np.float32), pay1)

    shell = index_factory(16, "IVF16,Flat")
    shell.quantizer = index.quantizer
    shell.is_trained = True
    merged = str(tmp_path / "merged.tann")
    n = merge_ondisk(shell, [kv], merged)
    assert n == 8000
    index2 = read_index(merged, mmap=True)
    index2.nprobe = 16
    _, I_new = index2.search(xq, 5)
    assert np.array_equal(np.sort(I_ref, 1), np.sort(I_new, 1))
