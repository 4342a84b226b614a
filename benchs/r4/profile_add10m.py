"""Phase-level profile of a one-shot Deep10M-scale add (item 5)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)
n, d, nlist = 10_000_000, 96, 16384
rs = np.random.RandomState(0)
x = rs.randn(n, d).astype(np.float32)
print("data generated", flush=True)

from tpu_ann.models.ivf import make_ivf_flat
from tpu_ann.ops import distances as D
from tpu_ann.utils import native as _native

idx = make_ivf_flat(d, nlist=nlist)
t0 = time.time(); idx.train(x[:1_600_000]); print(f"train {time.time()-t0:.1f}s", flush=True)
cent = idx._centroid_table()

t0 = time.time()
xd = jnp.asarray(x)
np.asarray(xd[0, :1])
print(f"upload x {x.nbytes/1e9:.1f}GB: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
_, a = D.knn(xd, cent, 1, idx.metric_type)
a_np = np.asarray(a)[:, 0].astype(np.int64)
print(f"assign knn k=1: {time.time()-t0:.1f}s", flush=True)
del xd

t0 = time.time()
nat = _native.pack_rows_native(x, np.arange(n, dtype=np.int32), a_np, nlist, 128)
print(f"native pack: {time.time()-t0:.1f}s", flush=True)
data, ids, sb, nb = nat
t0 = time.time()
norms = _native.norms_l2sqr_native(data)
print(f"norms: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
dd = jnp.asarray(data); ii = jnp.asarray(ids); nn = jnp.asarray(norms)
np.asarray(dd[0, 0, :1]); np.asarray(ii[0, :1]); np.asarray(nn[0, :1])
print(f"upload packed {data.nbytes/1e9:.1f}GB: {time.time()-t0:.1f}s", flush=True)
del dd, ii, nn, data, ids, norms, nat

# end-to-end through the model path
idx2 = make_ivf_flat(d, nlist=nlist)
idx2.quantizer = idx.quantizer; idx2.is_trained = True
t0 = time.time()
idx2.add(x)
print(f"model add(10M) end-to-end: {time.time()-t0:.1f}s", flush=True)
