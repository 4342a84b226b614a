#!/usr/bin/env python
"""Custom inverted-list storage backend demo (reference:
demos/rocksdb_ivf/ — a RocksDBInvertedLists registered through
InvertedListsIOHook so an IVF index can serve lists from an external
key-value store).

TPU-native translation: the extension point is the `InvlistSource`
protocol (tpu_ann/utils/invlists_io.py) instead of a C++ IOHook vtable.
Any object with {nlist, coded, width, list_size(i), get_list(i)} plugs
into the streaming machinery — composition views, `merge_ondisk`, and
the device repack — so a key-value store becomes searchable by writing
one small adapter class. Here the store is stdlib sqlite3 (standing in
for RocksDB, which isn't in this image): one row per inverted list,
payload and ids as raw blobs.
"""
import os
import sqlite3
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection

import numpy as np  # noqa: E402


class SQLiteInvertedLists:
    """InvlistSource adapter over a sqlite3 table (RocksDBInvertedLists
    role, demos/rocksdb_ivf/RocksDBInvertedLists.h)."""

    def __init__(self, path: str, nlist: int = 0, width: int = 0,
                 coded: bool = False, create: bool = False):
        self.conn = sqlite3.connect(path)
        if create:
            self.conn.execute(
                "CREATE TABLE IF NOT EXISTS meta "
                "(nlist INTEGER, width INTEGER, coded INTEGER)")
            self.conn.execute(
                "CREATE TABLE IF NOT EXISTS lists "
                "(list_no INTEGER PRIMARY KEY, size INTEGER, "
                "payload BLOB, ids BLOB)")
            self.conn.execute("DELETE FROM meta")
            self.conn.execute("INSERT INTO meta VALUES (?,?,?)",
                              (nlist, width, int(coded)))
            self.conn.commit()
        row = self.conn.execute("SELECT * FROM meta").fetchone()
        self.nlist, self.width, self.coded = row[0], row[1], bool(row[2])
        self._pdtype = np.uint8 if self.coded else np.float32

    # --- write side (add_entries role) -----------------------------------
    def put_list(self, list_no: int, payload: np.ndarray,
                 ids: np.ndarray) -> None:
        payload = np.ascontiguousarray(payload, self._pdtype)
        ids = np.ascontiguousarray(ids, np.int64)
        self.conn.execute(
            "INSERT OR REPLACE INTO lists VALUES (?,?,?,?)",
            (int(list_no), len(ids), payload.tobytes(), ids.tobytes()))

    def commit(self) -> None:
        self.conn.commit()

    # --- InvlistSource protocol -------------------------------------------
    def list_size(self, i: int) -> int:
        row = self.conn.execute(
            "SELECT size FROM lists WHERE list_no=?", (i,)).fetchone()
        return 0 if row is None else int(row[0])

    def get_list(self, i: int):
        row = self.conn.execute(
            "SELECT size, payload, ids FROM lists WHERE list_no=?",
            (i,)).fetchone()
        if row is None:
            return (np.zeros((0, self.width), self._pdtype),
                    np.zeros(0, np.int64))
        sz, payload, ids = row
        return (np.frombuffer(payload, self._pdtype).reshape(sz, self.width),
                np.frombuffer(ids, np.int64))

    @property
    def ntotal(self) -> int:
        row = self.conn.execute("SELECT SUM(size) FROM lists").fetchone()
        return int(row[0] or 0)


def main():
    from tpu_ann import index_factory, read_index
    from tpu_ann.utils.contrib import get_invlist
    from tpu_ann.utils.datasets import SyntheticDataset
    from tpu_ann.utils.evaluation import knn_intersection_measure
    from tpu_ann.utils.invlists_io import merge_ondisk

    ds = SyntheticDataset(d=64, nt=10000, nb=50000, nq=100)
    tmp = tempfile.mkdtemp()

    # 1. build a normal in-memory IVF index
    index = index_factory(64, "IVF128,Flat")
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 16
    _, I_ref = index.search(ds.get_queries(), 10)

    # 2. pour its lists into the key-value store
    db_path = os.path.join(tmp, "invlists.sqlite")
    kv = SQLiteInvertedLists(db_path, nlist=index.nlist, width=index.d,
                             create=True)
    for l in range(index.nlist):
        ids, payload = get_invlist(index, l)
        kv.put_list(l, payload, ids)
    kv.commit()
    print(f"stored {kv.ntotal} vectors in {index.nlist} sqlite rows "
          f"({os.path.getsize(db_path) / 1e6:.1f} MB)")

    # 3. stream the store back into a searchable index file — the same
    # merge_ondisk path OnDisk/File sources use; peak RAM = one list
    shell = index_factory(64, "IVF128,Flat")
    shell.quantizer = index.quantizer
    shell.is_trained = True
    merged = os.path.join(tmp, "from_sqlite.tann")
    n = merge_ondisk(shell, [kv], merged)
    index2 = read_index(merged, mmap=True)
    index2.nprobe = 16
    _, I_new = index2.search(ds.get_queries(), 10)

    inter = knn_intersection_measure(I_ref, I_new)
    print(f"merged {n} vectors from sqlite; "
          f"result intersection vs in-memory index = {inter:.4f}")
    assert inter == 1.0


if __name__ == "__main__":
    main()
