"""Build + benchmark the 100M x 96d out-of-core paged index (VERDICT
round-4 item 1 'done' criterion: ~2.4x v5e HBM in f32, built, saved,
mmap-loaded, searched on ONE chip, recall parity + QPS row).

Single fused data pass (the tunnel is the bottleneck on this host —
1 CPU core, remote chip): each 2M chunk is generated in RAM, written to
the dataset memmap, uploaded ONCE, and that one device array serves BOTH
the coarse assignment GEMM and the exact-GT k-NN merge. Then the
host-only pack pass and the paged search sweep.

Stages (resumable via presence checks):
  1. train nlist=65536 quantizer on the first 2M chunk      -> cents.npy
  2. fused gen + assign + GT pass over 50 chunks            -> x.f32,
     assign.i32, gt.npz
  3. host-only streaming pack into the paged directory      -> pidx/
  4. paged search sweep: nprobe x {cold, resident-tier}; parity checks
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ROOT = "/root/data100m"
DATA = os.path.join(ROOT, "x.f32")
ASSIGN = os.path.join(ROOT, "assign.i32")
GT = os.path.join(ROOT, "gt.npz")
CENT = os.path.join(ROOT, "cents.npy")
PIDX = os.path.join(ROOT, "pidx")
N, D_, NLIST = 100_000_000, 96, 65536
NQ = 1024
SEED = 7
CHUNK = 2_000_000
NCHUNKS = N // CHUNK

os.makedirs(ROOT, exist_ok=True)
print(jax.devices(), flush=True)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


rs0 = np.random.RandomState(SEED)
CENTS_GEN = rs0.randn(4096, D_).astype(np.float32) * 2.0


def gen_chunk(i):
    rs = np.random.RandomState(SEED + 1 + i)
    m = min(CHUNK, N - i * CHUNK)
    a = rs.randint(4096, size=m)
    return CENTS_GEN[a] + rs.randn(m, D_).astype(np.float32) * 0.8


rsq = np.random.RandomState(SEED + 999)
aq = rsq.randint(4096, size=NQ)
xq = (CENTS_GEN[aq] + rsq.randn(NQ, D_).astype(np.float32) * 0.8)

from tpu_ann.models.ivf_paged import IndexIVFFlatPaged
from tpu_ann.ops import distances as DD
from tpu_ann.ops import ivf_scan_paged as PS
from tpu_ann.ops.topk import merge_topk

# -- 1. train ---------------------------------------------------------------
if not os.path.exists(CENT):
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans

    log("training 65536 centroids on the first 2M chunk ...")
    x0 = gen_chunk(0)
    t0 = time.time()
    cp = ClusteringParameters()
    cp.niter = 8
    cp.verbose = True
    cents, _ = kmeans(jnp.asarray(x0), NLIST, cp)
    np.save(CENT, np.asarray(cents, np.float32))
    log(f"train {time.time()-t0:.0f}s")
cent_dev = jnp.asarray(np.load(CENT))
log("quantizer ready")

# -- 2. fused gen + assign + GT pass ----------------------------------------
k = 10
done = (os.path.exists(DATA) and os.path.getsize(DATA) == N * D_ * 4
        and os.path.exists(ASSIGN) and os.path.exists(GT))
if not done:
    log("fused gen/assign/GT pass (50 chunks, one upload each) ...")
    xmm = np.memmap(DATA, mode="r+" if os.path.exists(DATA) else "w+",
                    dtype=np.float32, shape=(N, D_))
    amm = np.memmap(ASSIGN, mode="r+" if os.path.exists(ASSIGN) else "w+",
                    dtype=np.int32, shape=(N,))
    xq_d = jnp.asarray(xq)
    bd = jnp.full((NQ, k), jnp.inf)
    bi = jnp.full((NQ, k), -1, jnp.int32)
    t0 = time.time()
    for i in range(NCHUNKS):
        xc = gen_chunk(i)
        xmm[i * CHUNK:(i + 1) * CHUNK] = xc
        xc_d = jnp.asarray(xc)
        _, aa = DD.knn(xc_d, cent_dev, 1)
        dv, iv = DD.knn(xq_d, xc_d, k)
        bd, bi = merge_topk(bd, bi, dv, iv + i * CHUNK, k,
                            similarity=False)
        amm[i * CHUNK:(i + 1) * CHUNK] = np.asarray(aa)[:, 0]
        if i % 5 == 0:
            log(f"  chunk {i + 1}/{NCHUNKS} ({time.time()-t0:.0f}s)")
    np.savez(GT, D=np.asarray(bd), I=np.asarray(bi))
    xmm.flush(); amm.flush()
    del xmm, amm
    log(f"fused pass done {time.time()-t0:.0f}s")
x = np.memmap(DATA, mode="r", dtype=np.float32, shape=(N, D_))
assign = np.memmap(ASSIGN, mode="r", dtype=np.int32, shape=(N,))
gt = np.load(GT)["I"]
log("dataset + assignment + GT ready")

# -- 3. host-only pack -------------------------------------------------------
if not os.path.exists(os.path.join(PIDX, "index_meta.json")):
    idx = IndexIVFFlatPaged(D_, NLIST, PIDX)
    idx.verbose = True
    idx.centroids = np.asarray(cent_dev, np.float32)
    idx._cent_dev = cent_dev
    idx.is_trained = True
    idx.assign_chunk = CHUNK
    t0 = time.time()
    idx.add(x, assign=np.asarray(assign))
    log(f"paged pack(100M) {time.time()-t0:.0f}s")
else:
    log("paged index exists")

idx = IndexIVFFlatPaged.load(PIDX)
log(f"loaded: ntotal={idx.ntotal:,} nblocks={idx.invlists.nblocks:,} "
    f"stream {idx.invlists.nbytes_stream()/1e9:.1f}GB "
    f"f32 {idx.invlists.data_f32.nbytes/1e9:.1f}GB")


# -- 4. paged search sweep ---------------------------------------------------
def recall(I):
    return float(np.mean([len(set(np.asarray(I)[q][:10]) & set(gt[q]))
                          / 10 for q in range(NQ)]))


results = []
for resident_gb in (0, 10):
    if resident_gb:
        blocks = int(resident_gb * 1e9) // (128 * 128 * 2 + 128 * 8)
        idx.resident_blocks = blocks
        t0 = time.time()
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
        with open("/root/repo/benchs/r4/results_100m.json", "w") as f:
            json.dump(results, f, indent=1)

# parity: brute force over probed lists for 16 queries
log("probed-list parity check ...")
idx.nprobe = 16
_, probes = DD.knn(jnp.asarray(xq[:16]), idx._cent_dev, 16,
                   idx.metric_type)
probes = np.asarray(probes, np.int32)
Dv, Iv, _ = idx.search_stats(xq[:16], 10)
pil = idx.invlists
sstart = pil.list_block_start
ok = 0
tot = 0
for q in range(16):
    rows_q = []
    ids_q = []
    for l in probes[q]:
        nb = int(pil.list_nblocks[l])
        s0 = int(sstart[l])
        ids_b = np.asarray(pil.ids[s0:s0 + nb]).reshape(-1)
        rows_b = np.asarray(pil.data_f32[s0:s0 + nb]).reshape(-1, D_)
        keep = ids_b >= 0
        rows_q.append(rows_b[keep])
        ids_q.append(ids_b[keep])
    rows_q = np.concatenate(rows_q)
    ids_q = np.concatenate(ids_q)
    dd = ((rows_q - xq[q]) ** 2).sum(1)
    topk = ids_q[np.argsort(dd, kind="stable")[:10]]
    tot += 10
    ok += len(set(topk) & set(np.asarray(Iv)[q][:10]))
log(f"probed-list parity: {ok}/{tot}")
results.append({"parity": f"{ok}/{tot}"})
with open("/root/repo/benchs/r4/results_100m.json", "w") as f:
    json.dump(results, f, indent=1)
log("DONE")
