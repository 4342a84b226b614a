"""Resume the 100M out-of-core sweep from the on-disk paged index —
the original run (benchs/r4/build100m.py) was host-OOM-killed after the
resident_gb=0 nprobe=8/16 rows. This adds: the nprobe=16 row with a
~10 GB resident HBM tier (hot prefix pinned, remainder streamed) and
the probed-list parity check. Appends to benchs/r4/results_100m.json.
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
PIDX = os.path.join(ROOT, "pidx")
GT = os.path.join(ROOT, "gt.npz")
N, D_, NLIST = 100_000_000, 96, 65536
NQ = 1024
SEED = 7

print(jax.devices(), flush=True)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


rs0 = np.random.RandomState(SEED)
CENTS_GEN = rs0.randn(4096, D_).astype(np.float32) * 2.0
rsq = np.random.RandomState(SEED + 999)
aq = rsq.randint(4096, size=NQ)
xq = (CENTS_GEN[aq] + rsq.randn(NQ, D_).astype(np.float32) * 0.8)
gt = np.load(GT)["I"]

from tpu_ann.models.ivf_paged import IndexIVFFlatPaged
from tpu_ann.ops import distances as DD
from tpu_ann.ops import ivf_scan_paged as PS

idx = IndexIVFFlatPaged.load(PIDX)
log(f"loaded: ntotal={idx.ntotal:,} nblocks={idx.invlists.nblocks:,}")

with open("/root/repo/benchs/r4/results_100m.json") as f:
    results = json.load(f)


def recall(I):
    return float(np.mean([len(set(np.asarray(I)[q][:10]) & set(gt[q]))
                          / 10 for q in range(NQ)]))


# -- resident-tier row --------------------------------------------------------
resident_gb = 10
blocks = int(resident_gb * 1e9) // (128 * 128 * 2 + 128 * 8)
idx.resident_blocks = blocks
t0 = time.time()
idx._resident = PS.upload_resident(idx.invlists, blocks)
t_up = time.time() - t0
log(f"resident upload {resident_gb}GB-class ({idx._resident[0]:,} blocks): "
    f"{t_up:.0f}s")
for nprobe in (16,):
    idx.nprobe = nprobe
    t0 = time.time()
    Dv, Iv, st = idx.search_stats(xq, 10)
    dt = time.time() - t0
    row = dict(nprobe=nprobe, resident_gb=resident_gb, recall=recall(Iv),
               qps=NQ / dt, seconds=dt, upload_s=t_up,
               windows=st.extra.get("windows"),
               windows_resident=st.extra.get("windows_resident"),
               gb_uploaded=st.extra.get("bytes_uploaded", 0) / 1e9)
    results.append(row)
    log(row)
    with open("/root/repo/benchs/r4/results_100m.json", "w") as f:
        json.dump(results, f, indent=1)

# -- probed-list parity (16 queries, vs host brute force over probed lists) --
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
log("RESUME DONE")
