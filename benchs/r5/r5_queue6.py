"""Round-5 queue 6 — BASELINE #5 measured at ACTUAL 100M on one chip
(VERDICT #5), at hard difficulty (VERDICT #4).

Index: IVF65536,PQ32x4fs resident in HBM (100M x 16 B codes ~ 1.7 GB
packed) + exact-f32 refine tier reading the host memmap (the mmap/
OnDiskInvertedLists capability class: 38.4 GB of raw rows, 2.4x chip
HBM, served through the page cache). Dataset: the 96-d hard surrogate
(deep_surrogate recipe, per-chunk seeds, nproto=6400 keeping the
calibrated cloud size at 100M).

Stages are resumable via file presence in /root/data100m_r5:
  1. cents.npy   — kmeans 65536 on a 4M sample
  2. pq.npz      — PQ32x4 on residuals of the sample
  3. x.f32 / assign.i32 / codes.u8 / gt.npz — ONE fused pass per 2M
     chunk: gen (CPU) -> memmap write -> single upload -> assign GEMM
     -> PQ encode -> exact-GT merge (first 1024 queries)
  4. pack + search sweep: coarse GEMM -> 4-bit ADC scan (resident) ->
     memmap-gather f32 refine -> recall/QPS rows

Results -> benchs/logs/r5_queue6.jsonl.
"""
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue6.jsonl")
ROOT = "/root/data100m_r5"
DATA = os.path.join(ROOT, "x.f32")
ASSIGN = os.path.join(ROOT, "assign.i32")
CODES = os.path.join(ROOT, "codes.u8")
GT = os.path.join(ROOT, "gt.npz")
CENT = os.path.join(ROOT, "cents.npy")
PQF = os.path.join(ROOT, "pq.npz")

N, D_, NLIST, M, NBITS = 100_000_000, 96, 65536, 32, 4
NQ, NQ_GT, K = 10_000, 1024, 10
SEED, CHUNK = 31, 2_000_000
NPROTO, SIGMA, G = 256, 1.3, 8   # cells/cloud-matched (see datasets.py presets)

os.makedirs(ROOT, exist_ok=True)


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


# --- deterministic chunked generator (deep_surrogate math, per-chunk
# seeds so stage 3 is resumable) --------------------------------------
_PROTO = np.random.RandomState(SEED).randn(NPROTO, D_).astype(np.float32)


def gen_rows(m, seed):
    rs = np.random.RandomState(seed)
    which = rs.randint(NPROTO, size=m)
    jit = np.exp(SIGMA * rs.randn(m, D_ // G)).astype(np.float32)
    v = _PROTO[which] * np.repeat(jit, G, axis=1)
    v += 0.25 * rs.randn(m, D_).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
    return v


def gen_chunk(i):
    return gen_rows(min(CHUNK, N - i * CHUNK), SEED + 1 + i)


XQ = gen_rows(NQ, SEED + 777_777)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops import pq as PQ
    from tpu_ann.ops.topk import merge_topk

    log("devices:", jax.devices())

    # -- 1/2: train coarse + PQ on a 4M sample ---------------------------
    if not (os.path.exists(CENT) and os.path.exists(PQF)):
        from tpu_ann.ops.kmeans import ClusteringParameters, kmeans

        xs = np.concatenate([gen_chunk(0), gen_chunk(1)])
        t0 = time.time()
        cp = ClusteringParameters()
        cp.niter = 8
        cp.verbose = True
        cents, _ = kmeans(jnp.asarray(xs), NLIST, cp)
        cents = np.asarray(cents, np.float32)
        np.save(CENT, cents)
        log(f"kmeans {time.time()-t0:.0f}s")
        cd = jnp.asarray(cents)
        _, a = D.knn(jnp.asarray(xs), cd, 1)
        res = xs - cents[np.asarray(a)[:, 0]]
        pqc = PQ.train_pq(res[:2_000_000], M, NBITS)
        np.savez(PQF, centroids=pqc.centroids)
        del xs, res
        gc.collect()
        log("PQ trained")
    cents = np.load(CENT)
    cd = jnp.asarray(cents)
    books = jnp.asarray(np.load(PQF)["centroids"])

    # -- 3: fused gen + assign + encode + GT pass -------------------------
    CW = (M + 1) // 2
    stamp = os.path.join(ROOT, "pass.done")
    if not os.path.exists(stamp):
        xmm = np.memmap(DATA, "float32", "w+"
                        if not os.path.exists(DATA) else "r+",
                        shape=(N, D_))
        amm = np.memmap(ASSIGN, "int32", "w+"
                        if not os.path.exists(ASSIGN) else "r+",
                        shape=(N,))
        cmm = np.memmap(CODES, "uint8", "w+"
                        if not os.path.exists(CODES) else "r+",
                        shape=(N, CW))
        xq_d = jnp.asarray(XQ[:NQ_GT])
        bd = jnp.full((NQ_GT, K), jnp.inf)
        bi = jnp.full((NQ_GT, K), -1, jnp.int32)
        t0 = time.time()
        for i in range(N // CHUNK):
            lo = i * CHUNK
            xc = gen_chunk(i)
            xmm[lo:lo + len(xc)] = xc
            xd = jnp.asarray(xc)
            _, a = D.knn(xd, cd, 1)
            a = np.asarray(a)[:, 0].astype(np.int32)
            amm[lo:lo + len(xc)] = a
            resd = xd - cd[jnp.asarray(a)]
            codes = PQ.pq_encode(resd, books)
            cmm[lo:lo + len(xc)] = np.asarray(
                PQ.pack_codes_4bit(codes))
            dv, iv = D.knn(xq_d, xd, K)
            bd, bi = merge_topk(bd, bi, dv, iv + lo, K,
                                similarity=False)
            del xd, resd, codes
            if i % 5 == 0:
                el = time.time() - t0
                log(f"  chunk {i+1}/{N//CHUNK} ({el:.0f}s)")
        np.savez(GT, gt=np.asarray(bi))
        for mm in (xmm, amm, cmm):
            mm.flush()
        open(stamp, "w").write("ok")
        log(f"fused pass done in {time.time()-t0:.0f}s")
        del bd, bi
        gc.collect()
    gt = np.load(GT)["gt"]

    # -- 4: pack resident code invlists + search --------------------------
    from tpu_ann.ops import ivf_scan

    t0 = time.time()
    codes_h = np.fromfile(CODES, np.uint8).reshape(N, CW)
    assign_h = np.fromfile(ASSIGN, np.int32)
    il = ivf_scan.pack_code_invlists(
        codes_h, np.arange(N, dtype=np.int64), assign_h.astype(np.int64),
        NLIST, block_size=128)
    del codes_h, assign_h
    gc.collect()
    log(f"packed {il.nblocks} blocks in {time.time()-t0:.0f}s; "
        f"codes bytes on device ~"
        f"{(il.nblocks+1)*il.block_size*CW/2**30:.2f} GiB")
    mnb = il.max_nblocks_per_list
    xmm = np.memmap(DATA, "float32", "r", shape=(N, D_))
    xq_all = jnp.asarray(XQ)

    def search(nprobe, kf, qchunk=2048):
        """coarse -> resident 4-bit ADC scan -> memmap f32 refine."""
        outD = np.zeros((NQ, K), np.float32)
        outI = np.full((NQ, K), -1, np.int64)
        for q0 in range(0, NQ, qchunk):
            xq_d = xq_all[q0:q0 + qchunk]
            cdq, probes = D.knn(xq_d, cd, nprobe)
            dv, iv, _ = ivf_scan.scan_invlists_pq(
                xq_d, probes.astype(jnp.int32), cdq, il, books, cd,
                kf * K, max_nblocks=mnb, packed4=True)
            cand = np.asarray(iv)                     # (qc, kf*K)
            safe = np.maximum(cand, 0)
            rows = xmm[safe.reshape(-1)].reshape(
                cand.shape[0], cand.shape[1], D_)     # page-cache gather
            rd = jnp.asarray(rows)
            ip = jnp.einsum("qd,qcd->qc", xq_d, rd,
                            preferred_element_type=jnp.float32)
            qn = jnp.sum(xq_d * xq_d, axis=1, keepdims=True)
            vn = jnp.sum(rd * rd, axis=2)
            dis = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
            dis = jnp.where(jnp.asarray(cand) >= 0, dis, jnp.inf)
            nv, sel = jax.lax.top_k(-dis, K)
            outD[q0:q0 + len(cand)] = np.asarray(-nv)
            outI[q0:q0 + len(cand)] = np.take_along_axis(
                cand, np.asarray(sel), axis=1)
        return outD, outI

    def recall(I):
        return float(np.mean([
            len(set(I[q]) & set(gt[q])) / K for q in range(NQ_GT)]))

    for nprobe, kf in ((16, 4), (32, 4), (64, 4), (64, 8)):
        try:
            search(nprobe, kf, qchunk=256)      # warm/compile small
            t0 = time.time()
            Dv, Iv = search(nprobe, kf)
            dt = time.time() - t0
            emit({"section": "ivf65536_pq32x4fs_refine_mmap",
                  "n": N, "nprobe": nprobe, "k_factor": kf,
                  "recall@10": recall(Iv), "qps": NQ / dt,
                  "t_s": dt})
        except Exception as e:   # noqa: BLE001
            emit({"section": "ivf65536_pq32x4fs_refine_mmap",
                  "nprobe": nprobe, "k_factor": kf, "error": repr(e)})

    # PQ-only row (no refine) for the code-tier ceiling
    try:
        def search_noref(nprobe, qchunk=2048):
            outI = np.full((NQ, K), -1, np.int64)
            for q0 in range(0, NQ, qchunk):
                xq_d = xq_all[q0:q0 + qchunk]
                cdq, probes = D.knn(xq_d, cd, nprobe)
                _, iv, _ = ivf_scan.scan_invlists_pq(
                    xq_d, probes.astype(jnp.int32), cdq, il, books, cd,
                    K, max_nblocks=mnb, packed4=True)
                outI[q0:q0 + iv.shape[0]] = np.asarray(iv)
            return outI

        search_noref(64, qchunk=256)
        t0 = time.time()
        Iv = search_noref(64)
        dt = time.time() - t0
        emit({"section": "ivf65536_pq32x4fs_norefine", "nprobe": 64,
              "recall@10": recall(Iv), "qps": NQ / dt})
    except Exception as e:   # noqa: BLE001
        emit({"section": "ivf65536_pq32x4fs_norefine", "error": repr(e)})

    log("queue6 DONE")


if __name__ == "__main__":
    main()
