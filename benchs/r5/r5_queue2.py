"""Round-5 queue 2 — verify the HNSW-quantizer hard-data fix
(VERDICT #2). r4_queue10 measured quantizer-mode recall frozen at
0.816 for efSearch 128..2048: the fused tile search capped candidate
extraction at kp=8 per tile while spatial tiles concentrate a query's
true top-nprobe centroids into a few tiles. The fix scales kp with k
(models/hnsw.py:_fused_search_chunk).

Bar (VERDICT): quantizer-mode recall@10 >= 0.95 @ nprobe=64 on the
calibrated-hard 1M surrogate (fork anchor 0.9194) at <= 1.5x the
exact-GEMM coarse cost. Results -> benchs/logs/r5_queue2.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue2.jsonl")


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

    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.datasets import SIFT1M_CALIBRATED, sift_surrogate

    log("devices:", jax.devices())
    n, nq, k, d, nlist = 1_000_000, 10_000, 10, 128, 15625
    allx = sift_surrogate(n + nq, seed=7, **SIFT1M_CALIBRATED)
    xb = allx[:n]
    xq = allx[n:]
    del allx

    xb_dev = jnp.asarray(xb)
    xq_dev = jnp.asarray(xq)
    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        _, I = D.knn(xq_dev[i:i + 2000], xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
    log("GT ready")

    def recall(I):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q]) & set(gt[q])) / k
                              for q in range(nq)]))

    idx = IndexIVFHNSW(d, nlist, M=32)
    t0 = time.time()
    idx.train(xb)
    idx.add(xb)
    log(f"built in {time.time()-t0:.0f}s")

    def run(mode, ef_factor, nprobe):
        idx.coarse_mode = mode
        idx.coarse_ef_factor = ef_factor
        idx.nprobe = nprobe
        idx.search(xq[:256], k)       # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _, I = idx.search(xq, k)
            best = min(best, time.time() - t0)
        # probe-set fidelity vs the exact coarse top-nprobe
        _, p_exact = D.knn(xq_dev[:1000], idx._centroid_table(), nprobe,
                           idx.metric_type)
        _, p_mode = idx._coarse_search_device(xq_dev[:1000], nprobe)
        pe, pm = np.asarray(p_exact), np.asarray(p_mode)
        pfid = float(np.mean([len(set(pe[q]) & set(pm[q])) / nprobe
                              for q in range(1000)]))
        emit({"mode": mode, "ef_factor": ef_factor, "nprobe": nprobe,
              "recall@10": recall(I), "qps": nq / best,
              "probe_fidelity": pfid})

    for nprobe in (64, 128):
        run("auto", 2, nprobe)
    for ef_factor in (2, 4):
        for nprobe in (64, 128):
            try:
                run("quantizer", ef_factor, nprobe)
            except Exception as e:   # noqa: BLE001
                emit({"mode": "quantizer", "ef_factor": ef_factor,
                      "nprobe": nprobe, "error": repr(e)})

    log("queue2 DONE")


if __name__ == "__main__":
    main()
