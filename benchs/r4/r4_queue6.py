"""Round-4 queue 6 — prepacked-DB flat e2e (the epilogue fix, measured).

r4_queue5 found the e2e/kernel MFU gap (20.8% vs 32.3%) is the per-call
DB prep: 24 ms of the 63 ms call is bf16 cast + pad + reshape + bias
build of the 1M-row database, redone every search. pack_flat_db now
hoists it to add-time (cached in IndexFlat). This measures the e2e
effect at production shapes. Bar (VERDICT #2): e2e >= 30% MFU at
recall >= 0.995 (~230k+ QPS at 1M x 128-d).

Results -> benchs/logs/r4_queue6.jsonl.
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
OUT = os.path.join(LOG, "r4_queue6.jsonl")


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
    from tpu_ann.utils.evaluation import recall_k_at_k

    log("devices:", jax.devices())
    rs = np.random.RandomState(11)
    d, nb, nq, k = 128, 1_000_000, 10_000, 10
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return cents[which] + rs.randn(n, d).astype(np.float32)

    xb = draw(nb)
    xq = draw(nq)
    xb_dev = jnp.asarray(xb)
    xq_dev = jnp.asarray(xq)
    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        _, I = D.knn(jnp.asarray(xq[i:i + 2000]), xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
    log("GT ready")
    peak = 197e12
    R, W = 8192, 1024

    t0 = time.time()
    packed = pack_flat_db(xb_dev, D.METRIC_L2, R=R)
    jax.block_until_ready(packed)
    np.asarray(packed[1][0, 0, :1])
    emit({"section": "A", "config": "pack_flat_db (one-time, incl compile)",
          "t_s": time.time() - t0})

    variants = [
        dict(Q=512, refine=4, sel="exact"),
        dict(Q=512, refine=4, sel="approx"),
        dict(Q=512, refine=2, sel="approx"),
        dict(Q=1024, refine=4, sel="approx"),
        dict(Q=512, refine=4, sel="approx", merge="tree"),
    ]
    for v in variants:
        try:
            kw = dict(Q=v["Q"], R=R, W=W, refine=v["refine"],
                      schedule="grid", merge=v.get("merge", "serial"),
                      sel=v["sel"], packed=packed)
            out = flat_knn_fused(xq_dev, xb_dev, k, **kw)
            np.asarray(out[1])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = flat_knn_fused(xq_dev, xb_dev, k, **kw)
                np.asarray(out[1])
                best = min(best, time.time() - t0)
            rec = recall_k_at_k(np.asarray(out[1]), gt, k)
            mfu = 2.0 * nq * nb * d / best / peak
            emit({"section": "A",
                  "config": (f"packed e2e Q={v['Q']} refine={v['refine']} "
                             f"sel={v['sel']} merge={v.get('merge','serial')}"),
                  "qps": nq / best, "recall@10": float(rec),
                  "t_ms": best * 1e3, "mfu": mfu})
        except Exception:
            traceback.print_exc()
            emit({"section": "A", "config": str(v), "error": "see log"})

    # the IndexFlat-level path (cache built on first search)
    try:
        from tpu_ann.models.flat import IndexFlat

        idx = IndexFlat(d)
        idx.compute_dtype = "bfloat16"
        idx.approx_topk = True
        idx.add(xb)
        idx.search(xq[:256], k)          # warm + build cache
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            _, I = idx.search(xq, k)
            best = min(best, time.time() - t0)
        rec = recall_k_at_k(np.asarray(I), gt, k)
        mfu = 2.0 * nq * nb * d / best / peak
        emit({"section": "A", "config": "IndexFlat e2e (cached pack, incl host copies)",
              "qps": nq / best, "recall@10": float(rec), "mfu": mfu})
    except Exception:
        traceback.print_exc()
        emit({"section": "A", "config": "IndexFlat e2e", "error": "see log"})

    log("r4_queue6 DONE")


if __name__ == "__main__":
    main()
