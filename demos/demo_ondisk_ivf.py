#!/usr/bin/env python
"""On-disk IVF demo (reference: demos/demo_ondisk_ivf.py): build shards,
save them, merge on disk, reopen memory-mapped, search."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection


def main():
    import numpy as np

    from tpu_ann import IndexIVFHNSW, read_index
    from tpu_ann.utils.datasets import SyntheticDataset
    from tpu_ann.utils.evaluation import recall_at_r

    ds = SyntheticDataset(d=64, nt=20000, nb=100000, nq=200)
    tmp = tempfile.mkdtemp()
    xb = ds.get_database()

    # 1. train one quantizer, build 4 shards sharing it
    master = IndexIVFHNSW(64, nlist=256, M=16)
    master.train(ds.get_train())
    shards = []
    ns = 4
    per = len(xb) // ns
    for s in range(ns):
        sh = IndexIVFHNSW(64, nlist=256, M=16)
        sh.quantizer = master.quantizer
        sh.is_trained = True
        sh.add_with_ids(xb[s * per:(s + 1) * per],
                        np.arange(s * per, (s + 1) * per))
        p = os.path.join(tmp, f"shard{s}.tann")
        sh.save_to_disk(p)
        shards.append(p)
        print(f"shard {s}: {sh.ntotal} vectors -> {p}")

    # 2. stream-merge the shard FILES into one index file without loading
    # them into RAM (OnDiskInvertedLists::merge_from_multiple +
    # contrib/ondisk.py merge_ondisk; peak host RAM = one list)
    from tpu_ann.utils.invlists_io import FileInvlistSource, merge_ondisk

    merged = os.path.join(tmp, "merged.tann")
    empty = IndexIVFHNSW(64, nlist=256, M=16)
    empty.quantizer = master.quantizer
    empty.is_trained = True
    n = merge_ondisk(empty, [FileInvlistSource(p) for p in shards], merged)
    print(f"merged: {n} vectors -> {merged}")

    # 3. reopen memory-mapped (IO_FLAG_MMAP role) and search
    index = read_index(merged, mmap=True)
    index.nprobe = 16
    _, I = index.search(ds.get_queries(), 10)
    rec = recall_at_r(I, ds.get_groundtruth(10), 10)
    print(f"mmap search recall@10 = {rec:.4f}")


if __name__ == "__main__":
    main()
