"""Round-4 queue 8 — headline operating points on the CALIBRATED-hard
SIFT surrogate (nproto=64 sigma=1.3: recall-vs-probe-ratio curve within
RMSE 0.0215 of the reference's published SIFT1M anchors — BENCHMARKS.md
calibration appendix). The round-1..4 headline tables use an easier
clustered synthetic; this re-validates the beat-the-baseline claims at
real-SIFT difficulty:

  A. IVFHNSW nlist=15625 (the fork's config) nprobe sweep, both coarse
     modes — versus the fork's 10 511 QPS @ R@10 0.9194 (nprobe=64).
  B. fused flat kernel (prepacked) — recall + QPS at 1M.

Results -> benchs/logs/r4_queue8.jsonl.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_queue8.jsonl")


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
    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db
    from tpu_ann.utils.datasets import sift_surrogate

    log("devices:", jax.devices())
    n, nq, k, d, nlist = 1_000_000, 10_000, 10, 128, 15625
    allx = sift_surrogate(n + 60_000 + nq, seed=7, nproto=64, sigma=1.3)
    xt = allx[:60_000]
    xb = allx[60_000:60_000 + n]
    xq = allx[60_000 + n:]
    del allx
    log("data ready")

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

    # --- A: the fork's config on the calibrated surrogate ------------------
    idx = IndexIVFHNSW(d, nlist, M=32)
    t0 = time.time()
    idx.train(xb)
    t_train = time.time() - t0
    t0 = time.time()
    idx.add(xb)
    t_add = time.time() - t0
    log(f"hybrid built: train {t_train:.1f}s add {t_add:.1f}s")
    for mode in ("auto", "quantizer"):
        idx.coarse_mode = mode
        for nprobe in (16, 32, 64, 128):
            idx.nprobe = nprobe
            try:
                idx.search(xq[:256], k)    # warm/compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    _, I = idx.search(xq, k)
                    best = min(best, time.time() - t0)
                emit({"section": "A", "mode": mode, "nprobe": nprobe,
                      "recall@10": recall(I), "qps": nq / best,
                      "train_s": t_train, "add_s": t_add})
            except Exception as e:   # noqa: BLE001
                emit({"section": "A", "mode": mode, "nprobe": nprobe,
                      "error": repr(e)})
    del idx

    # --- B: fused flat kernel ----------------------------------------------
    packed = pack_flat_db(xb_dev, D.METRIC_L2, R=8192)
    fn = functools.partial(flat_knn_fused, k=k, Q=512, R=8192, W=1024,
                           refine=4, schedule="grid", sel="exact",
                           packed=packed)
    out = fn(xq_dev, xb_dev)
    np.asarray(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(xq_dev, xb_dev)
        np.asarray(out[1])
        best = min(best, time.time() - t0)
    emit({"section": "B", "config": "fused flat prepacked refine=4",
          "recall@10": recall(out[1]), "qps": nq / best,
          "mfu": 2.0 * nq * n * d / best / 197e12})

    log("queue8 DONE")


if __name__ == "__main__":
    main()
