"""Round-5 queue 1 — close VERDICT #1 (joint flat bar: recall@10 >=
0.995 at >=30% MFU / >=230k QPS on the calibrated-hard surrogate)
WITHOUT the candidate-row gather.

The round-4 analysis assumed the 0.995 bar needs an exact-f32 re-rank
(random-row gather, 6-9.6 ms, the proven e2e ceiling of 29.6%). But
that analysis was measured on a FLOAT synthetic (r4_queue9.py draws
cents+randn), while the bar names the calibrated-hard surrogate — and
the surrogate, like the real SIFT/BigANN fvecs it models, is
INTEGER-VALUED (datasets.py:145 floor(v*512) capped at 255, the uint8
storage saturation of real descriptors). On integer data the fused
kernel's bf16 scores are bit-exact:

  * inputs: integers <= 255 need 8 significand bits = bf16's exactly;
    the -2x query pre-scale is a power of two (lossless);
  * MXU accumulation: products -2*q_i*x_i are integers <= 2*255^2 and
    every partial sum of 128 of them is an integer < 2^24, so each f32
    add is exact; the row-norm bias (integer < 2^23) and the final
    bias+ip (the true ||x||^2 - 2<q,x>, |.| < 2^24) are exact too.

So refine exists on this data ONLY to paper over the reservoir select:
r4_queue9's refine=0 point used sel='approx' = lax.approx_max_k at its
default recall_target=0.95, which alone explains recall 0.904 (~5%
select loss on top of the ~0.44% lane-collision floor 45/W). This
experiment measures refine=0 with exact (or near-exact) selection on
the right dataset, plus a W=2048 point for collision margin, and
asserts the bit-exactness claim directly (kernel distances == GT
distances on matched ids).

Bar: recall@10 >= 0.995, QPS >= 230k, MFU >= 30% (2*nq*nb*d/t/197e12).
Results -> benchs/logs/r5_queue1.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue1.jsonl")


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
    assert np.all(allx == np.floor(allx)) and allx.max() <= 255, (
        "surrogate must be integer-valued for the exactness claim")
    xb = allx[:nb]
    xq_h = allx[nb:]
    del allx
    xb_dev = jnp.asarray(xb)
    xq = jnp.asarray(xq_h)

    gt_d = np.zeros((nq, k), np.float32)
    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        Dd, I = D.knn(xq[i:i + 2000], xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
        gt_d[i:i + 2000] = np.asarray(Dd)
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

    # exactness assertion at the production shape: kernel distances on
    # matched ids must equal the GT integers exactly
    kw0 = dict(Q=512, R=8192, W=1024, refine=0, schedule="grid",
               sel="exact")
    dd, ii = flat_knn_fused(xq, xb_dev, k, packed=get_pack(8192), **kw0)
    dd, ii = np.asarray(dd), np.asarray(ii)
    n_match = n_exact = 0
    for q in range(0, nq, 7):
        m = {int(i): float(v) for i, v in zip(gt[q], gt_d[q])}
        for j in range(k):
            if int(ii[q, j]) in m:
                n_match += 1
                n_exact += int(dd[q, j] == m[int(ii[q, j])])
    emit({"section": "exactness", "matched": n_match,
          "bit_exact": n_exact,
          "frac_exact": n_exact / max(n_match, 1)})

    grid = [
        dict(Q=512, R=8192, W=1024, refine=0, sel="exact"),
        dict(Q=512, R=8192, W=1024, refine=0, sel="approx",
             sel_recall=0.999),
        dict(Q=1024, R=8192, W=1024, refine=0, sel="exact"),
        dict(Q=512, R=8192, W=2048, refine=0, sel="exact"),
        dict(Q=512, R=16384, W=2048, refine=0, sel="exact"),
        dict(Q=1024, R=8192, W=1024, refine=2, sel="approx"),
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

    log("queue1 DONE")


if __name__ == "__main__":
    main()
