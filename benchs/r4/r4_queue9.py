"""Round-4 queue 9 — close VERDICT #2: the last ~10 ms between
kernel-only (40.2 ms) and e2e (50.4 ms block-sync) at W=1024 is neither
the epilogue (0.07 ms measured, r4_flat_epilogue2.jsonl) nor the DB
prep (hoisted). Two experiments, all timings scalar-forced
(np.asarray of a jnp sum over every output — immune to the axon
block_until_ready caveat AND to the ~9.5 ms (10k,10) result download
that the np.asarray(I) protocol includes):

  A. kernel-in-context: e2e with refine=0 vs refine=4 vs the raw
     pallas reservoir (flat_knn_fused outputs reduced in-jit). Locates
     the residual in {kernel-in-context slowdown, select+refine, glue}.
  B. (R, W, Q) mini-grid at refine=4 sel=approx — R in {4096, 8192,
     16384} x W in {512, 1024} x Q in {512, 1024}; fresh compiles are
     minutes each on the remote tunnel, so the grid is pruned to 8
     points. Recall via one untimed np.asarray pass.

Bar: >=30% compute MFU at recall >= 0.995 (2*nq*nb*d / t / 197e12).
Results -> benchs/logs/r4_queue9.jsonl.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_queue9.jsonl")


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

    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db
    from tpu_ann.ops import distances as D

    log("devices:", jax.devices())
    nq, k, d, nb = 10_000, 10, 128, 1_000_000
    rs = np.random.RandomState(11)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n, r):
        return cents[r.randint(ncent, size=n)] + r.randn(n, d).astype(
            np.float32)

    xb = draw(nb, np.random.RandomState(1))
    xq_h = draw(nq, np.random.RandomState(2))
    xb_dev = jnp.asarray(xb)
    xq = jnp.asarray(xq_h)

    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        _, I = D.knn(xq[i:i + 2000], xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
    log("GT ready")

    def recall(I):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q]) & set(gt[q])) / k
                              for q in range(nq)]))

    flops = 2.0 * nq * nb * d
    PEAK = 197e12
    packs = {}

    def get_pack(R):
        if R not in packs:
            packs[R] = pack_flat_db(xb_dev, D.METRIC_L2, R=R)
        return packs[R]

    def timed_scalar(kw, n=5, tag=""):
        """Scalar-forced best-of-n timing of flat_knn_fused(**kw)."""
        packed = get_pack(kw["R"])

        @jax.jit
        def f(q, db):
            dd, ii = flat_knn_fused(q, db, k, packed=packed, **kw)
            return jnp.sum(dd) + jnp.sum(ii.astype(jnp.float32))

        s = np.asarray(f(xq, xb_dev))     # warm/compile
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            s = np.asarray(f(xq, xb_dev))
            best = min(best, time.time() - t0)
        return best

    # --- A: locate the residual at the production point ---------------------
    base = dict(Q=512, R=8192, W=1024, schedule="grid", sel="approx")
    for refine in (4, 0):
        t = timed_scalar(dict(base, refine=refine))
        emit({"section": "A", "config": f"W=1024 refine={refine} scalar",
              "t_ms": t * 1e3, "qps": nq / t, "mfu": flops / t / PEAK})

    # --- B: (R, W, Q) grid, refine=4 ----------------------------------------
    grid = [
        (8192, 512, 512),     # probe2 best, re-timed scalar-forced
        (8192, 512, 1024),
        (8192, 1024, 1024),
        (4096, 1024, 512),
        (4096, 512, 512),
        (16384, 1024, 512),
        (16384, 512, 512),
        (16384, 2048, 512),
    ]
    for R, W, Q in grid:
        try:
            kw = dict(Q=Q, R=R, W=W, refine=4, schedule="grid",
                      sel="approx")
            t = timed_scalar(kw)
            # one untimed pass for recall
            dd, ii = flat_knn_fused(xq, xb_dev, k,
                                    packed=get_pack(R), **kw)
            rec = recall(ii)
            emit({"section": "B", "R": R, "W": W, "Q": Q,
                  "t_ms": t * 1e3, "qps": nq / t, "recall@10": rec,
                  "mfu": flops / t / PEAK})
        except Exception as e:   # noqa: BLE001
            emit({"section": "B", "R": R, "W": W, "Q": Q,
                  "error": repr(e)})

    log("queue9 DONE")


if __name__ == "__main__":
    main()
