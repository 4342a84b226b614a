import time
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
from tpu_ann.models.ivf import make_ivf_flat

n, d, nlist = 10_000_000, 96, 16384
rs = np.random.RandomState(0)
x = rs.randn(n, d).astype(np.float32)
print("gen done", flush=True)
idx = make_ivf_flat(d, nlist=nlist)
t0 = time.time(); idx.train(x[:1_600_000]); print(f"train {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); idx.add(x); print(f"ADD 10M: {time.time()-t0:.1f}s", flush=True)
idx.nprobe = 8
Dv, Iv = idx.search(x[:256], 10)
print("self-hit", float((np.asarray(Iv)[:,0] == np.arange(256)).mean()), flush=True)
