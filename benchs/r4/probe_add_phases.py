"""Warm phase timings inside the NEW device-pack 1M add."""
import time
import numpy as np
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
from tpu_ann.models.ivf import make_ivf_flat
from tpu_ann.ops import distances as D
from tpu_ann.ops import ivf_scan

n, d, nlist = 1_000_000, 128, 4096
rs = np.random.RandomState(0)
x = rs.randn(n, d).astype(np.float32)
idx = make_ivf_flat(d, nlist=nlist)
idx.cp.niter = 4
idx.train(x[:100_000])
cent = idx._centroid_table()

def phases():
    t = {}
    t0 = time.time(); xc = x.copy(); t["host_copy"] = time.time() - t0
    t0 = time.time()
    dev = jnp.asarray(xc); dev.block_until_ready(); np.asarray(dev[0, :1])
    t["upload"] = time.time() - t0
    t0 = time.time()
    _, aa = D.knn(dev, cent, 1, idx.metric_type)
    a_np = np.asarray(aa, np.int64)[:, 0].copy()
    t["assign"] = time.time() - t0
    t0 = time.time()
    pil = ivf_scan.pack_invlists_device(dev, np.arange(n, dtype=np.int32), a_np, nlist, 128)
    np.asarray(pil.ids[0, :1])
    t["pack_dev"] = time.time() - t0
    t0 = time.time()
    idx._build_direct_map(a_np); t["direct_map"] = time.time() - t0
    return t

for it in range(2):
    print(it, {k: round(v, 2) for k, v in phases().items()}, flush=True)
