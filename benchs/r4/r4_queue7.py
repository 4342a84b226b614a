"""Round-4 queue 7 — hybrid 1M total build (VERDICT #5 last bar).

The round-3 figure was train 83.9 s + add 35.2 s at the fork's config
(nlist=15625, HNSW quantizer); the bar is "total build comparable to
the fork's CPU point (<=60 s train+add)". This re-measures after the
round-4 add-path and Lloyd changes, cold AND warm, with a phase split
(kmeans vs HNSW-quantizer build vs add).

Results -> benchs/logs/r4_queue7.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_queue7.jsonl")


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax

    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.ops.kmeans import kmeans

    log("devices:", jax.devices())
    n, d, nlist, k = 1_000_000, 128, 15625, 10
    rs = np.random.RandomState(7)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10
    x = (cents[rs.randint(ncent, size=n)]
         + rs.randn(n, d).astype(np.float32))

    for trial in ("cold", "warm"):
        idx = IndexIVFHNSW(d, nlist, M=32)
        t0 = time.time()
        idx.train(x)
        t_train = time.time() - t0
        t0 = time.time()
        idx.add(x)
        t_add = time.time() - t0
        # sanity: self-hit on the first 256 rows
        idx.nprobe = 8
        _, I = idx.search(x[:256], k)
        hit = float((np.asarray(I)[:, 0] == np.arange(256)).mean())
        emit({"trial": trial, "train_s": t_train, "add_s": t_add,
              "total_s": t_train + t_add, "self_hit": hit})
        log(trial, "train", round(t_train, 1), "add", round(t_add, 1))
        if trial == "cold":
            # phase split, warm: kmeans alone, then quantizer build alone
            from tpu_ann.models.hnsw import IndexHNSWFlat

            t0 = time.time()
            cent, _ = kmeans(x, nlist, idx.cp, idx.metric_type)
            t_km = time.time() - t0
            q = IndexHNSWFlat(d, 32)
            t0 = time.time()
            q.train(cent)
            q.add(cent)
            t_q = time.time() - t0
            emit({"trial": "warm-phase-split", "kmeans_s": t_km,
                  "quantizer_build_s": t_q})
        del idx

    log("queue7 DONE")


if __name__ == "__main__":
    main()
