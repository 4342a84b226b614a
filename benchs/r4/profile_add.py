"""Profile IVF add-path phases at 1M x 128d (VERDICT round-4 item 5).

Phases: coarse assignment (device GEMM), host concat, native pack
(counting sort), norms, device upload, direct map."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

n, d, nlist = 1_000_000, 128, 4096
rs = np.random.RandomState(0)
x = rs.randn(n, d).astype(np.float32)
xt = x[:200_000]

from tpu_ann.models.ivf import make_ivf_flat
from tpu_ann.ops import distances as D
from tpu_ann.ops.ivf_scan import pack_invlists
from tpu_ann.utils import native as _native

idx = make_ivf_flat(d, nlist=nlist)
t0 = time.time(); idx.train(xt); print(f"train {time.time()-t0:.1f}s", flush=True)

cent = idx._centroid_table()

# phase: assignment GEMM (chunked like _assign does? _assign does ONE knn call)
t0 = time.time()
_, a = D.knn(jnp.asarray(x), cent, 1, idx.metric_type)
a_np = np.asarray(a)[:, 0].astype(np.int64)
t_assign = time.time() - t0
print(f"assign(1M GEMM): {t_assign:.2f}s", flush=True)

# phase: native pack
t0 = time.time()
nat = _native.pack_rows_native(x, np.arange(n, dtype=np.int32), a_np, nlist, 128)
t_pack = time.time() - t0
print(f"native pack_rows: {t_pack:.2f}s (none? {nat is None})", flush=True)
if nat is not None:
    data, ids, sb, nb = nat
    t0 = time.time()
    norms = _native.norms_l2sqr_native(data)
    print(f"native norms: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    dd = jnp.asarray(data); ii = jnp.asarray(ids); nn = jnp.asarray(norms)
    dd.block_until_ready(); np.asarray(ii[0]);
    print(f"device upload {data.nbytes/1e9:.2f}GB: {time.time()-t0:.2f}s", flush=True)

# phase: full pack_invlists (includes all of the above except assign)
t0 = time.time()
pil = pack_invlists(x, np.arange(n, dtype=np.int32), a_np, nlist, 128)
np.asarray(pil.ids[0])
print(f"pack_invlists total: {time.time()-t0:.2f}s", flush=True)

# end-to-end add on a fresh index
idx2 = make_ivf_flat(d, nlist=nlist)
idx2.quantizer = idx.quantizer; idx2.is_trained = True
t0 = time.time()
idx2.add(x)
print(f"idx.add(1M) end-to-end: {time.time()-t0:.2f}s", flush=True)

# direct map cost
t0 = time.time()
idx2._build_direct_map(a_np)
print(f"build_direct_map: {time.time()-t0:.2f}s", flush=True)
