"""Build + benchmark the 100M x 96d out-of-core paged index (VERDICT
round-4 item 1 'done' criterion: ~2.4x v5e HBM in f32, built, saved,
mmap-loaded, searched on ONE chip, recall parity + QPS row).

Stages (each resumable via presence checks):
  1. generate 100M x 96 clustered synthetic to a memmap (disk)
  2. train nlist=65536 quantizer on a 2M sample
  3. two-pass streaming build into the paged directory
  4. exact GT for 1k queries by streaming brute force (device)
  5. paged search sweep: nprobe x {cold, resident-tier}; parity checks
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

ROOT = "/root/data100m"
DATA = os.path.join(ROOT, "x.f32")
GT = os.path.join(ROOT, "gt.npz")
PIDX = os.path.join(ROOT, "pidx")
N, D_, NLIST = 100_000_000, 96, 65536
NQ = 1024
SEED = 7
CHUNK = 2_000_000

os.makedirs(ROOT, exist_ok=True)
print(jax.devices(), flush=True)

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

# -- 1. dataset ------------------------------------------------------------
def gen_chunk(rs, n, cents, scale):
    a = rs.randint(len(cents), size=n)
    return (cents[a] + rs.randn(n, D_).astype(np.float32) * scale)

rs0 = np.random.RandomState(SEED)
CENTS = rs0.randn(4096, D_).astype(np.float32) * 2.0
if not os.path.exists(DATA) or os.path.getsize(DATA) != N * D_ * 4:
    log("generating 100M x 96 ...")
    mm = np.memmap(DATA, mode="w+", dtype=np.float32, shape=(N, D_))
    for i in range(0, N, CHUNK):
        rs = np.random.RandomState(SEED + 1 + i // CHUNK)
        mm[i:i + CHUNK] = gen_chunk(rs, min(CHUNK, N - i), CENTS, 0.8)
        if (i // CHUNK) % 10 == 0:
            log(f"  gen {i + CHUNK:,}/{N:,}")
    mm.flush(); del mm
x = np.memmap(DATA, mode="r", dtype=np.float32, shape=(N, D_))
rsq = np.random.RandomState(SEED + 999)
xq = gen_chunk(rsq, NQ, CENTS, 0.8).astype(np.float32)
log("dataset ready")

from tpu_ann.models.ivf_paged import IndexIVFFlatPaged
from tpu_ann.ops import distances as DD

# -- 2+3. build ------------------------------------------------------------
if not os.path.exists(os.path.join(PIDX, "index_meta.json")):
    idx = IndexIVFFlatPaged(D_, NLIST, PIDX)
    idx.verbose = True
    idx.assign_chunk = CHUNK
    idx.cp_niter = 8
    t0 = time.time()
    sample = np.ascontiguousarray(x[:2_000_000])
    idx.train(sample)
    log(f"train {time.time()-t0:.0f}s")
    t0 = time.time()
    idx.add(x)
    log(f"paged add(100M) {time.time()-t0:.0f}s")
else:
    log("paged index exists")

idx = IndexIVFFlatPaged.load(PIDX)
log(f"loaded: ntotal={idx.ntotal:,} nblocks={idx.invlists.nblocks:,} "
    f"stream {idx.invlists.nbytes_stream()/1e9:.1f}GB "
    f"f32 {idx.invlists.data_f32.nbytes/1e9:.1f}GB")

# -- 4. exact GT by streaming brute force ----------------------------------
if not os.path.exists(GT):
    log("computing streamed exact GT for 1k queries ...")
    from tpu_ann.ops.topk import merge_topk
    k = 10
    xq_d = jnp.asarray(xq)
    bd = jnp.full((NQ, k), jnp.inf); bi = jnp.full((NQ, k), -1, jnp.int32)
    t0 = time.time()
    for i in range(0, N, CHUNK):
        xb = jnp.asarray(np.ascontiguousarray(x[i:i + CHUNK]))
        dv, iv = DD.knn(xq_d, xb, k)
        bd, bi = merge_topk(bd, bi, dv, iv + i, k, similarity=False)
        if (i // CHUNK) % 5 == 0:
            log(f"  gt {i + CHUNK:,}/{N:,} ({time.time()-t0:.0f}s)")
    np.savez(GT, D=np.asarray(bd), I=np.asarray(bi))
    log(f"GT done {time.time()-t0:.0f}s")
gt = np.load(GT)["I"]
log("GT ready")

# -- 5. paged search sweep -------------------------------------------------
def recall(I):
    return float(np.mean([len(set(I[q]) & set(gt[q])) / 10
                          for q in range(NQ)]))

results = []
for resident_gb in (0, 10):
    if resident_gb:
        blocks = int(resident_gb * 1e9) // (128 * 128 * 2 + 128 * 8)
        idx.resident_blocks = blocks
        idx._resident = None
        t0 = time.time()
        from tpu_ann.ops import ivf_scan_paged as PS
        idx._resident = PS.upload_resident(idx.invlists, blocks)
        log(f"resident upload {resident_gb}GB-class "
            f"({idx._resident[0]:,} blocks): {time.time()-t0:.0f}s")
    for nprobe in (8, 16, 32):
        idx.nprobe = nprobe
        t0 = time.time()
        Dv, Iv, st = idx.search_stats(xq, 10)
        dt = time.time() - t0
        r = recall(Iv)
        row = dict(nprobe=nprobe, resident_gb=resident_gb,
                   recall=r, qps=NQ / dt, seconds=dt,
                   windows=st.extra.get("windows"),
                   gb_uploaded=st.extra.get("bytes_uploaded", 0) / 1e9)
        results.append(row)
        log(row)

# parity: brute force over probed lists for 16 queries
log("probed-list parity check ...")
idx.nprobe = 16
_, probes = DD.knn(jnp.asarray(xq[:16]), idx._cent_dev, 16, idx.metric_type)
probes = np.asarray(probes, np.int32)
Dv, Iv, _ = idx.search_stats(xq[:16], 10)
pil = idx.invlists
sstart = np.cumsum(pil.list_nblocks) - pil.list_nblocks
ok = 0; tot = 0
for q in range(16):
    rows_q = []
    ids_q = []
    for l in probes[q]:
        nb = int(pil.list_nblocks[l]); s0 = int(sstart[l])
        ids_b = np.asarray(pil.ids[s0:s0+nb]).reshape(-1)
        rows_b = np.asarray(pil.data_f32[s0:s0+nb]).reshape(-1, D_)
        keep = ids_b >= 0
        rows_q.append(rows_b[keep]); ids_q.append(ids_b[keep])
    rows_q = np.concatenate(rows_q); ids_q = np.concatenate(ids_q)
    dd = ((rows_q - xq[q]) ** 2).sum(1)
    topk = ids_q[np.argsort(dd, kind="stable")[:10]]
    tot += 10; ok += len(set(topk) & set(Iv[q][:10]))
log(f"probed-list parity: {ok}/{tot}")
results.append({"parity": f"{ok}/{tot}"})
with open("/root/repo/benchs/r4/results_100m.json", "w") as f:
    json.dump(results, f, indent=1)
log("DONE")
