import time
import numpy as np
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)

def live(tag):
    tot = 0
    big = []
    for a in jax.live_arrays():
        tot += a.nbytes
        if a.nbytes > 100e6:
            big.append((round(a.nbytes/1e9, 2), a.shape, str(a.dtype)))
    print(f"[{tag}] live {tot/1e9:.2f} GB; big: {sorted(big, reverse=True)[:6]}", flush=True)

from tpu_ann.models.ivf import make_ivf_flat
n, d, nlist = 10_000_000, 96, 16384
rs = np.random.RandomState(0)
x = rs.randn(n, d).astype(np.float32)
idx = make_ivf_flat(d, nlist=nlist)
idx.cp.niter = 6
idx.train(x[:1_600_000])
live("after train")
t0 = time.time()
idx.add(x)
print(f"ADD 10M: {time.time()-t0:.1f}s", flush=True)
live("after add")
idx.nprobe = 8
Dv, Iv = idx.search(x[:256], 10)
print("self-hit", float((np.asarray(Iv)[:,0] == np.arange(256)).mean()), flush=True)
live("after search")
