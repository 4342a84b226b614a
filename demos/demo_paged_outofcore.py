#!/usr/bin/env python
"""Out-of-core paged IVF demo — search an index bigger than device HBM.

Reference role: the fork's whole 190-series workflow — build, save,
reopen with IO_FLAG_MMAP, search without loading the inverted lists
into RAM (tutorial/python/190-hnsw-ivf-test.py:1404-1427;
invlists/OnDiskInvertedLists.h:60-136; gpu/GpuIndex.h:70+ auto-paging).

Here the packed invlist blocks stay on disk (np.memmap); per query
batch the coarse pass plans contiguous block windows, and a
double-buffered host->HBM upload overlaps each window's transfer with
the previous window's fused scan. An optional hot tier pins the first
`resident_blocks` of the stream in HBM.

Scaled-down shapes so the demo runs anywhere (CPU included); the same
code path searched 100M x 96-d (2.4x a v5e's HBM) on one chip — see
BENCHMARKS.md "out-of-core paged search".
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection


def main():
    import numpy as np

    from tpu_ann.models.ivf_paged import IndexIVFFlatPaged
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.datasets import SyntheticDataset

    import jax
    import jax.numpy as jnp

    ds = SyntheticDataset(d=64, nt=20000, nb=200000, nq=200)
    xb, xq = ds.get_database(), ds.get_queries()
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "big.paged")

    # 1. build: train in HBM on a sample, stream the database to disk
    idx = IndexIVFFlatPaged(64, nlist=512, path=path)
    if jax.default_backend() == "cpu":
        idx.scan_interpret = True          # no Mosaic on CPU
    idx.train(ds.get_train())
    idx.add(xb)                            # two-pass streaming build
    idx.save()
    print(f"built + saved: ntotal={idx.ntotal:,} "
          f"blocks={idx.invlists.nblocks:,} at {path}")

    # 2. reopen memory-mapped: O(MB) resident, invlists stay on disk
    idx = IndexIVFFlatPaged.load(path)
    if jax.default_backend() == "cpu":
        idx.scan_interpret = True
    idx.nprobe = 16

    # optional hot tier: pin the first ~quarter of the stream in HBM
    from tpu_ann.ops.ivf_scan_paged import upload_resident
    idx.resident_blocks = idx.invlists.nblocks // 4
    idx._resident = upload_resident(idx.invlists, idx.resident_blocks)

    Dv, Iv = idx.search(xq, 10)

    # 3. verify against exact brute force
    gt_d, gt_i = D.knn(jnp.asarray(xq), jnp.asarray(xb), 10)
    gt_i = np.asarray(gt_i)
    recall = np.mean([len(set(np.asarray(Iv)[q]) & set(gt_i[q])) / 10
                      for q in range(len(xq))])
    print(f"recall@10 vs exact: {recall:.4f} (nprobe={idx.nprobe})")
    assert recall > 0.85, recall
    print("demo ok")


if __name__ == "__main__":
    main()
