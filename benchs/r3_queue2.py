"""Round-3 queued on-chip measurements, part 2 (C/D from r3_queue.py plus
the vmem-unblocked flat-kernel sweep).

Sections (fenced; one failure cannot take down the rest):
  C. graph build phase profile at 1M vs the <=120 s target, plus the
     fused tile search recall/QPS checkpoint.
  D. polysemous ht trade-off curve (reference benchs/README.md:51-61
     table shape); ht is a dynamic arg now, so the sweep is one compile.
  B2. flat kernel occupancy sweep round 2: vmem_limit_bytes raised, so
     the U=4 / pipe / R=8192 / Q=512 configs compile; MFU target >=30%.

Protocol per .claude/skills/verify/SKILL.md: device-resident queries,
np.asarray to force, best of 3 after warm-up.
Results: human lines to stdout + JSON lines to benchs/logs/r3_queue.jsonl.
"""
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")
os.makedirs(LOG, exist_ok=True)
OUT = os.path.join(LOG, "r3_queue.jsonl")


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

    t0 = time.time()
    d, nb, nt, nq, k = 128, 1_000_000, 100_000, 10_000, 10
    rs = np.random.RandomState(123)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return (cents[which] + rs.randn(n, d).astype(np.float32)).astype(
            np.float32)

    xb, xt, xq = draw(nb), draw(nt), draw(nq)
    log(f"data generated in {time.time()-t0:.1f}s")

    t1 = time.time()
    gt = np.zeros((nq, k), np.int64)
    xb_dev = jnp.asarray(xb)
    for i in range(0, nq, 2000):
        _, I = D.knn(jnp.asarray(xq[i:i + 2000]), xb_dev, k, db_block=131072)
        gt[i:i + 2000] = np.asarray(I)
    log(f"ground truth in {time.time()-t1:.1f}s")
    xq_dev = jnp.asarray(xq)

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

    # ---------- D: polysemous ht curve -------------------------------------
    try:
        from tpu_ann.models.pq import IndexPQ
        log("D: polysemous ht curve (PQ16x8)")
        pq = IndexPQ(d, 16, 8)
        pq.do_polysemous_training = True
        td = time.time()
        pq.train(xt[:50_000])
        log(f"D: train (incl. polysemous reorder) {time.time()-td:.1f}s")
        pq.add(xb)
        from tpu_ann.ops.polysemous import polysemous_knn
        nbit_total = 16 * 8
        for ht in (0, 44, 50, 54, 58, 62, 68, nbit_total + 1):
            eff_ht = ht or (nbit_total + 1)
            t, out = time_device(lambda: polysemous_knn(
                xq_dev, pq._codes, pq._centroids_dev, k, eff_ht,
                jnp.int32(pq.ntotal)))
            rec = recall_k_at_k(np.asarray(out[1]), gt, k)
            npass = int(out[2])
            emit({"section": "D", "config": f"ht={ht}", "qps": nq / t,
                  "recall@10": float(rec),
                  "ham_pass_frac": npass / (nq * float(pq.ntotal))})
        del pq
    except Exception:
        log("D FAILED:\n" + traceback.format_exc())

    # ---------- B2: flat kernel sweep, vmem-unblocked ----------------------
    try:
        from tpu_ann.ops.flat_knn_pallas import flat_knn_fused
        log("B2: flat kernel schedule sweep (vmem_limit raised)")
        peak = 197e12  # v5e bf16
        configs = [
            ("grid", 1, 256, 4096, 1024),   # same-session baseline (best)
            ("grid", 1, 256, 8192, 1024),
            ("grid", 1, 512, 4096, 1024),
            ("grid", 1, 512, 8192, 1024),
            ("fori", 4, 256, 4096, 1024),   # was vmem-OOM
            ("pipe", 1, 256, 4096, 1024),   # was vmem-OOM
            ("fori", 2, 512, 4096, 1024),
        ]
        for sched, U, Q, R, W in configs:
            tag = f"{sched} U={U} Q={Q} R={R} W={W}"
            try:
                t, out = time_device(lambda: flat_knn_fused(
                    xq_dev, xb_dev, k, Q=Q, R=R, W=W, refine=4,
                    schedule=sched, unroll=U))
                rec = recall_k_at_k(np.asarray(out[1]), gt, k)
                mfu = 2.0 * nq * nb * 128 / t / peak
                emit({"section": "B2", "config": tag, "qps": nq / t,
                      "recall@10": float(rec), "mfu": mfu})
            except Exception as e:  # noqa: BLE001
                log(f"B2 config {tag} failed: {e!r}")
                emit({"section": "B2", "config": tag, "error": repr(e)})
    except Exception:
        log("B2 FAILED:\n" + traceback.format_exc())

    # ---------- C: graph build profile + tile search ----------------------
    try:
        from tpu_ann.ops.hnsw import build_graph_knn
        from tpu_ann.ops.hnsw_tiles import build_tiles_fused, \
            tile_search_fused
        log("C: graph build profile (1M, M=16, efC=40)")
        tb = time.time()
        graph, assign = build_graph_knn(xb, 16, 40, verbose=True)
        np.asarray(graph.neighbors0[:1, :1])
        t_build = time.time() - tb
        log(f"C: build total {t_build:.1f}s")
        tb = time.time()
        order = np.argsort(assign, kind="stable") if assign is not None \
            else None
        ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                                order=order, verbose=True)
        t_tiles = time.time() - tb
        t, out = time_device(lambda: tile_search_fused(
            ftg, xq_dev, k, nprobe0=12, hops=1, F=4))
        rec = recall_k_at_k(np.asarray(out[1]), gt, k)
        emit({"section": "C", "config": "build M=16 efC=40 @1M",
              "build_s": t_build, "tiles_s": t_tiles,
              "search_qps": nq / t, "recall@10": float(rec)})
    except Exception:
        log("C FAILED:\n" + traceback.format_exc())

    log("all sections done")


if __name__ == "__main__":
    main()
