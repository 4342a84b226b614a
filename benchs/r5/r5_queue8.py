"""Round-5 queue 8 — single-query latency: where could the graph
quantizer actually win on TPU?

The batch-amortized analysis (BENCHMARKS round-5 quantizer-cost
section) shows an exact MXU coarse pass is ~free at practical nlist.
The remaining candidate regime for the graph quantizer is BATCH=1
serving, where the GEMM cannot amortize. This measures true per-query
latency (search_stats_per_query — the fork's per-query
QueryLatencyStats) for both coarse modes on the namesake hybrid at the
fork's config, on the calibrated-hard surrogate, also validating the
per-query API on real hardware.

Results -> benchs/logs/r5_queue8.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue8.jsonl")


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax

    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.utils.datasets import SIFT1M_CALIBRATED, sift_surrogate

    log("devices:", jax.devices())
    n, nq, k, d, nlist = 1_000_000, 200, 10, 128, 15625
    allx = sift_surrogate(n + nq, seed=7, **SIFT1M_CALIBRATED)
    xb = allx[:n]
    xq = allx[n:]
    del allx

    idx = IndexIVFHNSW(d, nlist, M=32)
    t0 = time.time()
    idx.train(xb)
    idx.add(xb)
    log(f"built in {time.time()-t0:.0f}s")
    idx.nprobe = 64

    for mode in ("auto", "quantizer"):
        idx.coarse_mode = mode
        try:
            _, _, st = idx.search_stats_per_query(xq, k)
            pq = st.per_query
            emit({
                "mode": mode, "nq": nq, "nprobe": 64,
                "total_us": pq.percentiles("total_us",
                                           (50.0, 99.0, 99.9)),
                "quantization_us": pq.percentiles("quantization_us",
                                                  (50.0, 99.0)),
                "list_scan_us": pq.percentiles("list_scan_us",
                                               (50.0, 99.0)),
                "mean_total_us": float(pq.total_us.mean()),
                "mean_quant_us": float(pq.quantization_us.mean()),
                "mean_ndis": float(pq.ndis.mean()),
            })
        except Exception as e:   # noqa: BLE001
            emit({"mode": mode, "error": repr(e)})

    log("queue8 DONE")


if __name__ == "__main__":
    main()
