"""Round-5 queue 3 — the joint flat bar with the in-kernel select.

r5_queue1 closed recall (refine=0 + exact select = 0.99516, bit-exact
scores on the integer surrogate) but lax.top_k over (10k, 1024)->10
costs ~5.5 ms (46.6 ms e2e, 27.9% MFU). `reservoir_topk` replaces it
with a k-round Pallas min-extraction (~50 VPU passes). Bar: recall@10
>= 0.995, QPS >= 230k, MFU >= 30%.

Results -> benchs/logs/r5_queue3.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue3.jsonl")


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
    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db
    from tpu_ann.utils.datasets import SIFT1M_CALIBRATED, sift_surrogate

    log("devices:", jax.devices())
    nq, k, d, nb = 10_000, 10, 128, 1_000_000
    allx = sift_surrogate(nb + nq, seed=7, **SIFT1M_CALIBRATED)
    xb = allx[:nb]
    xq_h = allx[nb:]
    del allx
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

    def timed_scalar(kw, n=5):
        packed = get_pack(kw["R"])

        @jax.jit
        def f(q, db):
            dd, ii = flat_knn_fused(q, db, k, packed=packed, **kw)
            return jnp.sum(dd) + jnp.sum(ii.astype(jnp.float32))

        np.asarray(f(xq, xb_dev))     # warm/compile
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            np.asarray(f(xq, xb_dev))
            best = min(best, time.time() - t0)
        return best

    grid = [
        dict(Q=512, R=8192, W=1024, refine=0, sel="kernel"),
        dict(Q=1024, R=8192, W=1024, refine=0, sel="kernel"),
        dict(Q=512, R=8192, W=2048, refine=0, sel="kernel"),
        dict(Q=1024, R=16384, W=2048, refine=0, sel="kernel"),
        dict(Q=512, R=8192, W=1024, refine=2, sel="kernel"),
    ]
    for kw in grid:
        kw = dict(kw, schedule="grid")
        try:
            t = timed_scalar(kw)
            _, ii = flat_knn_fused(xq, xb_dev, k,
                                   packed=get_pack(kw["R"]), **kw)
            rec = recall(ii)
            emit(dict(kw, section="grid", t_ms=t * 1e3, qps=nq / t,
                      **{"recall@10": rec}, mfu=flops / t / PEAK))
        except Exception as e:   # noqa: BLE001
            emit(dict(kw, section="grid", error=repr(e)))

    log("queue3 DONE")


if __name__ == "__main__":
    main()
