"""Round-4 queue 2 (fresh session — also serves as the VERDICT item-3
second-session reproduction of the >=130k fused-scan number).

  A. fused IVF scan manual-DMA kernel @ nprobe=16/32 (reproduction run).
  B. flat kernel merge='packed' sweep vs the serial round-4 best
     (157.9k / 20.5% MFU) — VERDICT item 2 bar: >= 30% MFU at
     recall >= 0.995.
  C. calibration curve: namesake hybrid (nlist=15625, HNSW quantizer
     mode + exact mode) on the SIFT-surrogate 1M at the fork's
     operating points nprobe = 64/128/256/512 — compared in
     BENCHMARKS.md against tutorial/cpp/benchmark_search_results CSV
     (0.9194 / 0.9662 / 0.9899 / 0.9970).

Protocol: device-resident inputs, np.asarray to force completion,
best-of-3 after warm-up. Results -> benchs/logs/r4_queue2.jsonl.
"""
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
os.makedirs(LOG, exist_ok=True)
OUT = os.path.join(LOG, "r4_queue2.jsonl")


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

    from tpu_ann.ops import distances as D
    from tpu_ann.utils.evaluation import recall_k_at_k

    log("devices:", jax.devices())
    d, nb, nq, k = 128, 1_000_000, 10_000, 10
    rs = np.random.RandomState(123)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return cents[which] + rs.randn(n, d).astype(np.float32)

    xb, xq = draw(nb), draw(nq)
    gt = np.zeros((nq, k), np.int64)
    xb_dev = jnp.asarray(xb)
    for i in range(0, nq, 2000):
        _, I = D.knn(jnp.asarray(xq[i:i + 2000]), xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
    xq_dev = jnp.asarray(xq)
    log("data + GT ready")

    def time_device(fn, reps=3):
        out = fn()
        np.asarray(out[0])
        best = np.inf
        for _ in range(reps):
            ta = time.time()
            out = fn()
            np.asarray(out[0])
            best = min(best, time.time() - ta)
        return best, out

    # ---------- A: fused IVF second-session confirm ------------------------
    try:
        from tpu_ann.models.ivf import make_ivf_flat
        from tpu_ann.ops.ivf_scan_pallas import scan_invlists_fused

        log("A: IVF4096 fused (reproduction session)")
        index = make_ivf_flat(d, 4096)
        xt = draw(100_000)
        index.train(xt)
        index.add(xb)
        il = index.invlists
        cent = index._centroid_table()
        for nprobe in (16, 32):
            _, probes = D.knn(xq_dev, cent, nprobe)
            probes = probes.astype(jnp.int32)
            t, out = time_device(lambda: scan_invlists_fused(
                xq_dev, probes, il, k))
            rec = recall_k_at_k(np.asarray(out[1]), gt, k)
            emit({"section": "A", "config": f"manual nprobe={nprobe}",
                  "qps": nq / t, "recall@10": float(rec)})
        del index
    except Exception:
        log("A FAILED:\n" + traceback.format_exc())

    # ---------- B: flat kernel packed merge ---------------------------------
    try:
        from tpu_ann.ops.flat_knn_pallas import flat_knn_fused

        log("B: flat kernel packed-merge sweep")
        peak = 197e12
        configs = [
            ("grid", 512, 8192, 1024, "serial", 1),   # round-4 reference
            ("grid", 512, 8192, 1024, "packed", 1),
            ("grid", 512, 8192, 2048, "packed", 1),
            ("grid", 512, 16384, 2048, "packed", 1),
            ("grid", 1024, 8192, 1024, "packed", 1),
            ("grid", 512, 8192, 512, "packed", 1),
            ("fori", 512, 8192, 1024, "packed", 1),
            ("fori", 512, 8192, 1024, "packed", 2),
            ("fori", 512, 8192, 1024, "packed", 4),
            ("fori", 512, 16384, 2048, "packed", 2),
        ]
        for sched, Q, R, W, merge, U in configs:
            tag = f"{sched} Q={Q} R={R} W={W} merge={merge} U={U}"
            try:
                t, out = time_device(lambda: flat_knn_fused(
                    xq_dev, xb_dev, k, Q=Q, R=R, W=W, refine=4,
                    schedule=sched, merge=merge, unroll=U))
                rec = recall_k_at_k(np.asarray(out[1]), gt, k)
                mfu = 2.0 * nq * nb * 128 / t / peak
                emit({"section": "B", "config": tag, "qps": nq / t,
                      "recall@10": float(rec), "mfu": mfu})
            except Exception as e:  # noqa: BLE001
                log(f"B config {tag} failed: {e!r}")
                emit({"section": "B", "config": tag, "error": repr(e)})
    except Exception:
        log("B FAILED:\n" + traceback.format_exc())

    # ---------- C: surrogate calibration curve ------------------------------
    try:
        from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
        from tpu_ann.utils.datasets import sift_surrogate

        log("C: SIFT-surrogate calibration @ fork config nlist=15625")
        nt, nb2, nq2 = 100_000, 1_000_000, 10_000
        allx = sift_surrogate(nt + nb2 + nq2, seed=7)
        xt2 = allx[:nt]
        xb2 = allx[nt:nt + nb2]
        xq2 = allx[nt + nb2:]
        del allx
        xb2_dev = jnp.asarray(xb2)
        gt2 = np.zeros((nq2, k), np.int64)
        for i in range(0, nq2, 2000):
            _, I = D.knn(jnp.asarray(xq2[i:i + 2000]), xb2_dev, k)
            gt2[i:i + 2000] = np.asarray(I)
        del xb2_dev
        log("C: surrogate GT ready")
        idx = IndexIVFHNSW(128, 15625, M=32)
        t0 = time.time()
        idx.train(xt2)
        t_train = time.time() - t0
        t0 = time.time()
        idx.add(xb2)
        t_add = time.time() - t0
        log(f"C: train {t_train:.1f}s add {t_add:.1f}s")
        for mode in ("auto", "quantizer"):
            idx.coarse_mode = mode
            for nprobe in (64, 128, 256, 512):
                idx.nprobe = nprobe
                idx.search(xq2[:256], k)
                t, out = time_device(lambda: idx.search(xq2, k))
                rec = recall_k_at_k(np.asarray(out[1]), gt2, k)
                emit({"section": "C", "mode": mode, "nprobe": nprobe,
                      "qps": nq2 / t, "recall@10": float(rec),
                      "train_s": t_train, "add_s": t_add})
    except Exception:
        log("C FAILED:\n" + traceback.format_exc())

    log("r4_queue2 DONE")


if __name__ == "__main__":
    main()
