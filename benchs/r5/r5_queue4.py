"""Round-5 queue 4 — cost of the fixed HNSW-quantizer coarse routing.

r5_queue2: the kp fix lifts quantizer-mode recall to 0.954 @ nprobe=64
(bar met) but e2e QPS is 10.5k vs auto's 28.9k. This sweeps the
extraction-width cap (fused_kp_max) and the beam (coarse_ef_factor)
with the search_stats phase split, to find the cheapest configuration
that keeps recall >= 0.95 and to report the quantizer-vs-exact coarse
cost ratio honestly. Results -> benchs/logs/r5_queue4.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue4.jsonl")


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
    idx.nprobe = 64

    def run(tag, mode, ef_factor, kp_max):
        idx.coarse_mode = mode
        idx.coarse_ef_factor = ef_factor
        idx.quantizer.hnsw.fused_kp_max = kp_max
        idx.search(xq[:256], k)       # warm/compile
        _, I, st = idx.search_stats(xq, k)
        # st is phase-synced; report per-query phase microseconds
        emit({"tag": tag, "mode": mode, "ef_factor": ef_factor,
              "kp_max": kp_max, "recall@10": recall(I),
              "quant_us_per_q": st.quantization_us / nq,
              "scan_us_per_q": st.list_scan_us / nq,
              "qps_stats": nq / (st.total_us / 1e6)})

    run("exact-coarse", "auto", 2, 128)
    for kp_max in (64, 32, 16):
        for eff in (2, 1):
            try:
                run("quantizer", "quantizer", eff, kp_max)
            except Exception as e:   # noqa: BLE001
                emit({"tag": "quantizer", "ef_factor": eff,
                      "kp_max": kp_max, "error": repr(e)})

    log("queue4 DONE")


if __name__ == "__main__":
    main()
