"""BASELINE config #4 phase 2: load the saved Deep10M hybrid index in a
fresh process and sweep both coarse modes x nprobe (see
hybrid10m_build.py for why two processes)."""
import json
import time

import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print(jax.devices(), flush=True)
from tpu_ann.utils import index_io

nq, k, d = 10_000, 10, 96
rs = np.random.RandomState(3)
cents = rs.randn(2048, d).astype(np.float32) * 2.0


def gen(m, seed):
    r = np.random.RandomState(seed)
    return (cents[r.randint(2048, size=m)]
            + r.randn(m, d).astype(np.float32) * 0.8)


xq = gen(nq, 999)
gt = np.load("/root/repo/benchs/r4/hybrid10m_gt.npy")
with open("/root/repo/benchs/r4/hybrid10m_build.json") as f:
    build = json.load(f)

t0 = time.time()
idx = index_io.read_index("/root/repo/benchs/r4/hybrid10m.idx")
print(f"load {time.time()-t0:.1f}s ntotal={idx.ntotal}", flush=True)


def recall(I):
    I = np.asarray(I)
    return float(np.mean([len(set(I[q]) & set(gt[q])) / k
                          for q in range(nq)]))


rows = []
for mode in ("auto", "quantizer"):
    idx.coarse_mode = mode
    for nprobe in (8, 16, 32, 64):
        idx.nprobe = nprobe
        try:
            idx.search(xq[:256], k)              # warm/compile
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                Dv, Iv = idx.search(xq, k)
                np.asarray(Iv)
                best = min(best, time.time() - t0)
            r = recall(Iv)
            try:
                _, _, st = idx.search_stats(xq, k)
                split = dict(quant_us=float(st.quantization_us),
                             scan_us=float(st.list_scan_us))
            except Exception:  # noqa: BLE001
                split = {}
            row = dict(mode=mode, nprobe=nprobe, recall=r,
                       qps=nq / best, **build, **split)
        except Exception as e:  # noqa: BLE001
            row = dict(mode=mode, nprobe=nprobe, error=repr(e))
        rows.append(row)
        print(row, flush=True)
        with open("/root/repo/benchs/r4/results_hybrid10m.json", "w") as f:
            json.dump(rows, f, indent=1)
print("SEARCH DONE", flush=True)
