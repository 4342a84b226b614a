"""VERDICT #5 residual: attribute the 1M warm add's 18.4 s (target
<=10 s). Hypothesis: the add is tunnel-upload-bound — 1M x 128-d f32 is
512 MB, and this host's measured host->HBM link is ~42 MB/s (the same
bound the out-of-core sweep hit), i.e. ~12 s of the 18.4 s is the copy
itself. This probe times each stage separately:

  a. bare device_put of the 512 MB chunk (the irreducible link cost),
  b. assignment GEMM on the resident mirror,
  c. host counting sort (slot permutation),
  d. device pack gathers (_gather_pack_blocks),
  e. the full IndexIVFFlat.add + repack warm path for comparison.

Results -> benchs/logs/r4_add1m.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_add1m.jsonl")


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.ops import distances as D
    from tpu_ann.ops import ivf_scan as IV

    log("devices:", jax.devices())
    n, d, nlist = 1_000_000, 128, 4096
    rs = np.random.RandomState(0)
    x = rs.randn(n, d).astype(np.float32)   # same data as bench_add_new

    idx0 = make_ivf_flat(d, nlist=nlist)
    idx0.train(x[:200_000])
    cent_dev = jnp.asarray(idx0.quantizer.reconstruct_n(0, nlist))

    # a) bare upload, twice (first may include layout compile)
    for trial in range(2):
        t0 = time.time()
        xd = jax.device_put(x)
        xd.block_until_ready()
        t = time.time() - t0
        emit({"stage": "device_put 512MB", "trial": trial, "t_s": t,
              "mb_s": x.nbytes / 1e6 / t})
        if trial == 0:
            del xd

    # b) assignment GEMM on the resident mirror
    for trial in range(2):
        t0 = time.time()
        _, a = D.knn(xd, cent_dev, 1)
        a.block_until_ready()
        t = time.time() - t0
        emit({"stage": "assign knn(1M,4096)", "trial": trial, "t_s": t})
    assign = np.asarray(a)[:, 0].astype(np.int64)

    # c) host counting sort / slot permutation
    t0 = time.time()
    order = np.argsort(assign, kind="stable")
    sizes = np.bincount(assign, minlength=nlist)
    t = time.time() - t0
    emit({"stage": "host argsort+bincount", "t_s": t})

    # d) device pack (warm: run twice)
    ids = np.arange(n, dtype=np.int64)
    for trial in range(2):
        t0 = time.time()
        pil = IV.pack_invlists_device(xd, ids, assign, nlist)
        pil.data.block_until_ready()
        t = time.time() - t0
        emit({"stage": "pack_invlists_device", "trial": trial, "t_s": t})
        del pil

    # e) the production add path, cold then warm (same as bench_add_new)
    for trial in range(2):
        idx = make_ivf_flat(d, nlist=nlist)
        idx.quantizer = idx0.quantizer
        idx.is_trained = True
        t0 = time.time()
        idx.add(x)
        t = time.time() - t0
        emit({"stage": "IndexIVFFlat.add (incl repack)", "trial": trial,
              "t_s": t})
        del idx

    log("add1m DONE")


if __name__ == "__main__":
    main()
