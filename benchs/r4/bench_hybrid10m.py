"""BASELINE config #4: HNSW coarse quantizer over IVF invlists at
Deep10M (BASELINE.md:33-34; 190-series end-to-end role). Measures BOTH
coarse modes (faithful HNSW-beam quantizer vs exact-GEMM auto) with an
nprobe sweep + build profile."""
import json
import time

import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
from tpu_ann.ops import distances as DD
from tpu_ann.ops.topk import merge_topk

n, d, nlist, nq, k = 10_000_000, 96, 16384, 10_000, 10
rs = np.random.RandomState(3)
cents = rs.randn(2048, d).astype(np.float32) * 2.0
def gen(m, seed):
    r = np.random.RandomState(seed)
    return (cents[r.randint(2048, size=m)]
            + r.randn(m, d).astype(np.float32) * 0.8)
x = np.concatenate([gen(2_000_000, 100 + i) for i in range(5)])
xq = gen(nq, 999)
print("gen done", flush=True)

def headroom(tag, step_gb=1.0, max_gb=16.0):
    """Rough free-HBM probe: bisect the largest single allocation that
    still succeeds (diagnostic for the round-4 pack OOM)."""
    lo, hi = 0.0, max_gb
    while hi - lo > step_gb:
        mid = (lo + hi) / 2
        try:
            a = jnp.zeros((int(mid * 1e9 / 4),), jnp.float32)
            a.block_until_ready()
            del a
            lo = mid
        except Exception:
            hi = mid
    print(f"[headroom] {tag}: ~{lo:.1f} GB allocatable", flush=True)


# exact GT by streamed brute force
t0 = time.time()
xq_d = jnp.asarray(xq)
bd = jnp.full((nq, k), jnp.inf); bi = jnp.full((nq, k), -1, jnp.int32)
for i in range(0, n, 2_000_000):
    dv, iv = DD.knn(xq_d, jnp.asarray(x[i:i + 2_000_000]), k)
    bd, bi = merge_topk(bd, bi, dv, iv + i, k, similarity=False)
gt = np.asarray(bi)
del bd, bi, dv, iv
print(f"GT {time.time()-t0:.0f}s", flush=True)
headroom("after GT")

idx = IndexIVFHNSW(d, nlist, M=32)
t0 = time.time(); idx.train(x[:1_600_000]); t_train = time.time() - t0
print(f"train (kmeans + HNSW quantizer build) {t_train:.1f}s", flush=True)
headroom("after train")
t0 = time.time(); idx.add(x); t_add = time.time() - t0
print(f"add {t_add:.1f}s", flush=True)
headroom("after add")

def recall(I):
    return float(np.mean([len(set(np.asarray(I)[q]) & set(gt[q])) / k
                          for q in range(nq)]))

rows = []
for mode in ("auto", "quantizer"):
    idx.coarse_mode = mode
    for nprobe in (8, 16, 32, 64):
        idx.nprobe = nprobe
        idx.search(xq[:256], k)              # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            Dv, Iv = idx.search(xq, k)
            np.asarray(Iv)
            best = min(best, time.time() - t0)
        r = recall(Iv)
        # one stats-instrumented rep for the coarse/scan split (feeds
        # the multi-chip projection cost model)
        try:
            _, _, st = idx.search_stats(xq, k)
            split = dict(quant_us=float(st.quantization_us),
                         scan_us=float(st.list_scan_us))
        except Exception:  # noqa: BLE001
            split = {}
        row = dict(mode=mode, nprobe=nprobe, recall=r,
                   qps=nq / best, train_s=t_train, add_s=t_add, **split)
        rows.append(row)
        print(row, flush=True)
        with open("/root/repo/benchs/r4/results_hybrid10m.json",
                  "w") as f:
            json.dump(rows, f, indent=1)
with open("/root/repo/benchs/r4/results_hybrid10m.json", "w") as f:
    json.dump(rows, f, indent=1)
print("DONE", flush=True)
