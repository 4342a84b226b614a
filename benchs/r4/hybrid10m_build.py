"""BASELINE config #4 phase 1: build the Deep10M namesake hybrid
(IVF16384 + HNSW coarse quantizer), compute exact GT, save both to disk.
Search runs in a fresh process (hybrid10m_search.py) — the first attempt
OOM'd on a 98 KB device_put right after `add` despite a 12 GB headroom
probe, i.e. allocator/runtime state, so the search phase gets a clean
process."""
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

# exact GT by streamed brute force
t0 = time.time()
xq_d = jnp.asarray(xq)
bd = jnp.full((nq, k), jnp.inf)
bi = jnp.full((nq, k), -1, jnp.int32)
for i in range(0, n, 2_000_000):
    dv, iv = DD.knn(xq_d, jnp.asarray(x[i:i + 2_000_000]), k)
    bd, bi = merge_topk(bd, bi, dv, iv + i, k, similarity=False)
gt = np.asarray(bi)
np.save("/root/repo/benchs/r4/hybrid10m_gt.npy", gt)
del bd, bi, dv, iv, xq_d
print(f"GT {time.time()-t0:.0f}s", flush=True)

idx = IndexIVFHNSW(d, nlist, M=32)
t0 = time.time()
idx.train(x[:1_600_000])
t_train = time.time() - t0
print(f"train (kmeans + HNSW quantizer build) {t_train:.1f}s", flush=True)
t0 = time.time()
idx.add(x)
t_add = time.time() - t0
print(f"add {t_add:.1f}s", flush=True)

t0 = time.time()
idx.save_to_disk("/root/repo/benchs/r4/hybrid10m.idx")
t_save = time.time() - t0
print(f"save {t_save:.1f}s", flush=True)
with open("/root/repo/benchs/r4/hybrid10m_build.json", "w") as f:
    json.dump(dict(train_s=t_train, add_s=t_add, save_s=t_save), f)
print("BUILD DONE", flush=True)
