"""Round-4 queue 10 — can a bigger coarse beam fix the HNSW-quantizer
saturation on hard data? r4_queue8 found the faithful quantizer mode
stuck at 0.816 recall on the calibrated-hard surrogate for nprobe
16..128 at the default coarse_ef_factor=2 (efSearch = 2 x nprobe),
while exact-GEMM coarse reaches 0.991. This sweeps coarse_ef_factor x
nprobe on the same workload to find where (whether) the graph routing
recovers, and what it costs.

Results -> benchs/logs/r4_queue10.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_queue10.jsonl")


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

    # exact-coarse routing recall ceiling at each nprobe, for reference
    idx.coarse_mode = "auto"
    for nprobe in (64, 128):
        idx.nprobe = nprobe
        idx.search(xq[:256], k)
        _, I = idx.search(xq, k)
        emit({"mode": "auto", "nprobe": nprobe, "recall@10": recall(I)})

    idx.coarse_mode = "quantizer"
    for ef_factor in (2, 4, 8, 16):
        idx.coarse_ef_factor = ef_factor
        for nprobe in (64, 128):
            idx.nprobe = nprobe
            try:
                idx.search(xq[:256], k)    # warm/compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    _, I = idx.search(xq, k)
                    best = min(best, time.time() - t0)
                emit({"mode": "quantizer", "ef_factor": ef_factor,
                      "nprobe": nprobe, "efSearch": ef_factor * nprobe,
                      "recall@10": recall(I), "qps": nq / best})
            except Exception as e:   # noqa: BLE001
                emit({"mode": "quantizer", "ef_factor": ef_factor,
                      "nprobe": nprobe, "error": repr(e)})

    log("queue10 DONE")


if __name__ == "__main__":
    main()
