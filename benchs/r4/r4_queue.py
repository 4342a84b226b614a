"""Round-4 queued on-chip measurements.

  A. fused IVF scan occupancy: manual-DMA kernel vs the 2-D grid
     schedule (tile x chunk, Mosaic-pipelined) at nprobe=16/32 —
     VERDICT item 3 bar: >= 130k QPS @ nprobe=16 @ recall >= 0.996.
  B. flat kernel two-stage (tree) merge vs serial at the round-3 best
     config + W/R variations — VERDICT item 2 bar: >= 30% MFU at
     recall >= 0.995.

Protocol: device-resident inputs, np.asarray to force completion,
best-of-3 after warm-up, nothing else running on the box.
Results -> benchs/logs/r4_queue.jsonl.
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
OUT = os.path.join(LOG, "r4_queue.jsonl")


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
    d, nb, nt, nq, k = 128, 1_000_000, 100_000, 10_000, 10
    rs = np.random.RandomState(123)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return cents[which] + rs.randn(n, d).astype(np.float32)

    xb, xt, xq = draw(nb), draw(nt), draw(nq)
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

    # ---------- A: fused IVF occupancy ------------------------------------
    try:
        from tpu_ann.models.ivf import make_ivf_flat
        from tpu_ann.ops.ivf_scan_pallas import (grid2d_maxc,
                                                 scan_invlists_fused,
                                                 scan_invlists_fused_grid)

        log("A: IVF4096 fused vs grid2d")
        index = make_ivf_flat(d, 4096)
        ta = time.time()
        index.train(xt)
        index.add(xb)
        log(f"A: train+add {time.time()-ta:.1f}s")
        il = index.invlists
        cent = index._centroid_table()
        for nprobe in (16, 32):
            _, probes = D.knn(xq_dev, cent, nprobe)
            probes = probes.astype(jnp.int32)
            probes_np = np.asarray(probes)
            t, out = time_device(lambda: scan_invlists_fused(
                xq_dev, probes, il, k))
            rec = recall_k_at_k(np.asarray(out[1]), gt, k)
            emit({"section": "A", "config": f"manual nprobe={nprobe}",
                  "qps": nq / t, "recall@10": float(rec)})
            mc = grid2d_maxc(il, probes_np)
            for CB in (8, 16):
                mc2 = grid2d_maxc(il, probes_np, CB=CB)
                t, out = time_device(lambda: scan_invlists_fused_grid(
                    xq_dev, probes, il, k, maxc=mc2, CB=CB))
                rec = recall_k_at_k(np.asarray(out[1]), gt, k)
                emit({"section": "A",
                      "config": f"grid2d nprobe={nprobe} CB={CB} "
                                f"maxc={mc2}",
                      "qps": nq / t, "recall@10": float(rec)})
        del index
    except Exception:
        log("A FAILED:\n" + traceback.format_exc())

    # ---------- B: flat kernel tree merge ----------------------------------
    try:
        from tpu_ann.ops.flat_knn_pallas import flat_knn_fused

        log("B: flat kernel merge sweep")
        peak = 197e12
        configs = [
            ("grid", 512, 8192, 1024, "serial"),
            ("grid", 512, 8192, 1024, "tree"),
            ("grid", 512, 8192, 2048, "tree"),
            ("grid", 512, 16384, 2048, "tree"),
            ("grid", 256, 8192, 1024, "tree"),
            ("grid", 512, 16384, 1024, "tree"),
            ("fori", 512, 8192, 1024, "tree"),
        ]
        for sched, Q, R, W, merge in configs:
            tag = f"{sched} Q={Q} R={R} W={W} merge={merge}"
            try:
                t, out = time_device(lambda: flat_knn_fused(
                    xq_dev, xb_dev, k, Q=Q, R=R, W=W, refine=4,
                    schedule=sched, merge=merge))
                rec = recall_k_at_k(np.asarray(out[1]), gt, k)
                mfu = 2.0 * nq * nb * 128 / t / peak
                emit({"section": "B", "config": tag, "qps": nq / t,
                      "recall@10": float(rec), "mfu": mfu})
            except Exception as e:  # noqa: BLE001
                log(f"B config {tag} failed: {e!r}")
                emit({"section": "B", "config": tag, "error": repr(e)})
    except Exception:
        log("B FAILED:\n" + traceback.format_exc())

    log("r4_queue DONE")


if __name__ == "__main__":
    main()
