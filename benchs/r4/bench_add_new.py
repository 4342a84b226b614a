"""Measure the device-pack add path at 1M and 10M (item 5 'done' bars:
1M <= 10 s, Deep10M <= 300 s)."""
import time
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
from tpu_ann.models.ivf import make_ivf_flat
from tpu_ann.utils.evaluation import recall_at_r
from tpu_ann.ops import distances as D

def bench(n, d, nlist, nt):
    rs = np.random.RandomState(0)
    x = rs.randn(n, d).astype(np.float32)
    idx = make_ivf_flat(d, nlist=nlist)
    t0 = time.time(); idx.train(x[:nt]); t_train = time.time() - t0
    t0 = time.time()
    idx.add(x)
    t_add = time.time() - t0
    # sanity search
    idx.nprobe = 8
    xq = x[:256]
    Dv, Iv = idx.search(xq, 10)
    self_hit = float((np.asarray(Iv)[:, 0] == np.arange(256)).mean())
    print(f"n={n} d={d} nlist={nlist}: train {t_train:.1f}s  "
          f"ADD {t_add:.1f}s  self-hit {self_hit:.3f}", flush=True)
    return idx, x

idx, x = bench(1_000_000, 128, 4096, 200_000)
# warm second add on a fresh index (same shapes -> compiles cached)
idx2 = make_ivf_flat(128, nlist=4096)
idx2.quantizer = idx.quantizer; idx2.is_trained = True
t0 = time.time(); idx2.add(x); print(f"1M add warm: {time.time()-t0:.1f}s", flush=True)
del idx, idx2, x

bench(10_000_000, 96, 16384, 1_600_000)
