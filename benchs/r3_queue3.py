"""Round-3 queued on-chip measurements, part 3: fixes for the two broken
rows of the part-2 run.

  D-fix. The polysemous ht curve ran on the tight-cluster synthetic,
     where PQ16x8 codes collapse inside clusters (recall@10 0.04 at every
     ht — a dataset artifact, not a code bug). Rerun on the calibrated
     SIFT surrogate, the dataset the reference's own table uses real
     SIFT1M for (benchs/README.md:51-61). Also fixes the n_pass counter
     overflow (int64 is silently int32 without jax x64).
  C-fix. The part-2 script computed recall on tile_search_fused's
     *positions* output (out[1]); ids are out[2]. Rerun the 1M graph
     build + fused tile search with the correct tuple element.

Protocol per .claude/skills/verify/SKILL.md: device-resident queries,
np.asarray to force, best of 3 after warm-up.
Results: JSON lines appended to benchs/logs/r3_queue.jsonl.
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

    def ground_truth(xq, xb_dev, k):
        nq = xq.shape[0]
        gt = np.zeros((nq, k), np.int64)
        for i in range(0, nq, 2000):
            _, I = D.knn(jnp.asarray(xq[i:i + 2000]), xb_dev, k,
                         db_block=131072)
            gt[i:i + 2000] = np.asarray(I)
        return gt

    k = 10

    # ---------- D-fix: polysemous ht curve on the SIFT surrogate -----------
    try:
        from tpu_ann.utils.datasets import sift_surrogate
        from tpu_ann.models.pq import IndexPQ
        from tpu_ann.ops.polysemous import polysemous_knn
        log("D-fix: SIFT surrogate generation (1.11M)")
        t0 = time.time()
        nt, nb, nq = 100_000, 1_000_000, 10_000
        x = sift_surrogate(nt + nb + nq, seed=7)
        xt, xb, xq = x[:nt], x[nt:nt + nb], x[nt + nb:]
        log(f"D-fix: data in {time.time()-t0:.1f}s; ground truth...")
        t0 = time.time()
        xb_dev = jnp.asarray(xb)
        gt = ground_truth(xq, xb_dev, k)
        xq_dev = jnp.asarray(xq)
        log(f"D-fix: GT in {time.time()-t0:.1f}s; train PQ16x8 polysemous")
        pq = IndexPQ(128, 16, 8)
        pq.do_polysemous_training = True
        td = time.time()
        pq.train(xt[:50_000])
        log(f"D-fix: train (incl. polysemous reorder) {time.time()-td:.1f}s")
        pq.add(xb)
        nbit_total = 16 * 8
        for ht in (0, 44, 50, 54, 58, 62, 68):
            eff_ht = ht or (nbit_total + 1)
            t, out = time_device(lambda: polysemous_knn(
                xq_dev, pq._codes, pq._centroids_dev, k, eff_ht,
                jnp.int32(pq.ntotal)))
            rec = recall_k_at_k(np.asarray(out[1]), gt, k)
            npass = float(out[2])
            emit({"section": "D2", "config": f"ht={ht}", "qps": nq / t,
                  "recall@10": float(rec),
                  "ham_pass_frac": npass / (nq * float(pq.ntotal))})
        del pq, xb_dev, xq_dev, x, xt, xb, xq
    except Exception:
        log("D-fix FAILED:\n" + traceback.format_exc())

    # ---------- C-fix: graph build + tile search, correct id column --------
    try:
        from tpu_ann.ops.hnsw import build_graph_knn
        from tpu_ann.ops.hnsw_tiles import build_tiles_fused, \
            tile_search_fused
        log("C-fix: clustered 1M dataset")
        d, nb, nq = 128, 1_000_000, 10_000
        rs = np.random.RandomState(123)
        ncent = 1024
        cents = rs.rand(ncent, d).astype(np.float32) * 10

        def draw(n):
            which = rs.randint(ncent, size=n)
            return (cents[which]
                    + rs.randn(n, d).astype(np.float32)).astype(np.float32)

        # same RandomState consumption order as r3_queue2 (xb, xt, xq)
        xb, _, xq = draw(nb), draw(100_000), draw(nq)
        xb_dev = jnp.asarray(xb)
        gt = ground_truth(xq, xb_dev, k)
        xq_dev = jnp.asarray(xq)
        log("C-fix: graph build (1M, M=16, efC=40)")
        tb = time.time()
        graph, assign = build_graph_knn(xb, 16, 40, verbose=True)
        np.asarray(graph.neighbors0[:1, :1])
        t_build = time.time() - tb
        log(f"C-fix: build total {t_build:.1f}s")
        tb = time.time()
        order = np.argsort(assign, kind="stable") if assign is not None \
            else None
        ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                                order=order, verbose=True)
        t_tiles = time.time() - tb
        for nprobe0, hops, F in ((12, 1, 4), (16, 1, 4), (8, 2, 8)):
            t, out = time_device(lambda: tile_search_fused(
                ftg, xq_dev, k, nprobe0=nprobe0, hops=hops, F=F))
            rec = recall_k_at_k(np.asarray(out[2]), gt, k)
            emit({"section": "C2",
                  "config": f"M=16 efC=40 np0={nprobe0} hops={hops} F={F}",
                  "build_s": t_build, "tiles_s": t_tiles,
                  "search_qps": nq / t, "recall@10": float(rec)})
    except Exception:
        log("C-fix FAILED:\n" + traceback.format_exc())

    log("all sections done")


if __name__ == "__main__":
    main()
