"""Round-5 queue 10 — BASELINE #5 measured at ACTUAL 100M on one chip.

VERDICT r4 #5: the round-4 100M row was IVF65536,Flat with the f32
rows streamed host->HBM per batch (tunnel-bound, 0.59-1.56 QPS). The
designed fix: PQ32x4fs codes for 100M x 96-d are ~1.6 GB packed — they
FIT IN HBM — so the first-pass scan runs at HBM speed and only the
refine tier touches anything bigger. Measured here, single v5e chip,
on the calibrated-hard DEEP100M surrogate (utils/datasets.deep_surrogate
**DEEP100M_CALIBRATED — cells-per-cloud matched to the SIFT1M-calibrated
recipe at nlist=65536; see datasets.py comment block):

  1. IVF65536,PQ32x4fs        — codes+ids resident (~2.0 GB HBM).
  2.   ...,RSQ8 (resident)    — TPU-native refine: an SQ8 row tier
       (100M x 96 uint8 = 9.6 GB) ALSO lives in HBM, so base scan +
       refine are both chip-speed: 100M vectors fully chip-resident
       in ~11.6 GB of a 16 GB v5e. No reference analog at this
       capacity class on one device (faiss gpu pages, GpuIndex.h:70+).
  3.   ...,RFlat (paged)      — the reference-shaped row
       (demos/offline_ivf config class): exact f32 refine served from
       the host-side memmap (page-cache-warm like the fork's mmap
       workflow, tutorial/cpp/performance_comparison.csv), candidates
       gathered host-side per batch.

Pipeline (resumable; artifacts in /root/data100m):
  gen+train: 2M-chunk fused pass — gen -> x.f32 memmap -> host SQ8
  encode -> sq8.u8 -> one upload -> coarse assign + PQ4 encode +
  exact-GT merge (the r4 build100m.py single-pass discipline: the
  38.4 GB dataset crosses the 29-43 MB/s tunnel exactly once).
  pack: host counting-sort into block-padded invlists -> one upload.
  search: chunked queries; scan_invlists_pq (in-kernel LUT one-hot
  ADC) -> k*k_factor candidates -> refine tier -> top-k.

Results -> benchs/logs/r5_queue10.jsonl.
"""
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue10.jsonl")

SMOKE = "--smoke" in sys.argv
ROOT = "/root/data100m_smoke" if SMOKE else "/root/data100m"
if SMOKE:
    N, D_, NLIST, NQ, CHUNK = 100_000, 96, 256, 500, 50_000
    NPROTO = 64
else:
    N, D_, NLIST, NQ, CHUNK = 100_000_000, 96, 65536, 10_000, 2_000_000
    NPROTO = 256
SEED, K, M_PQ = 11, 10, 32
SIGMA = 1.3
XF = os.path.join(ROOT, "x.f32")
SQF = os.path.join(ROOT, "sq8.u8")
CODEF = os.path.join(ROOT, "codes.u8")
ASSIGNF = os.path.join(ROOT, "assign.i32")
XQF = os.path.join(ROOT, "xq.npy")
GTF = os.path.join(ROOT, "gt.npy")
CENTF = os.path.join(ROOT, "cents.npy")
PQF = os.path.join(ROOT, "pq.npy")
SQPARF = os.path.join(ROOT, "sqpar.npz")
DONEF = os.path.join(ROOT, "pass.done")
os.makedirs(ROOT, exist_ok=True)


def emit(rec):
    rec = dict(rec, ts=time.time(), smoke=SMOKE)
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


G_ = 8


def _draw(rs, proto, m):
    which = rs.randint(NPROTO, size=m)
    jit = np.exp(SIGMA * rs.randn(m, D_ // G_)).astype(np.float32)
    v = proto[which] * np.repeat(jit, G_, axis=1)
    v += 0.25 * rs.randn(m, D_).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
    return v


def gen_proto():
    return np.random.RandomState(SEED).randn(NPROTO, D_).astype(
        np.float32)


def gen_chunks():
    """Yield (i0, chunk) of the DEEP100M-calibrated surrogate; same RNG
    discipline as utils.datasets.deep_surrogate (proto first, then
    per-chunk draws) so the data is the library distribution."""
    rs = np.random.RandomState(SEED)
    proto = rs.randn(NPROTO, D_).astype(np.float32)
    for i0 in range(0, N, CHUNK):
        yield i0, _draw(rs, proto, min(CHUNK, N - i0))


def gen_queries():
    """Same prototype clouds, disjoint RNG stream (not database rows)."""
    return _draw(np.random.RandomState(SEED + 999), gen_proto(), NQ)


def main():
    import jax

    if SMOKE:
        # the ambient sitecustomize already imported jax against the
        # remote chip; env vars are too late (tests/conftest.py note)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops import ivf_scan
    from tpu_ann.ops import pq as PQ
    from tpu_ann.ops import sq as SQ
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans
    from tpu_ann.ops.topk import merge_topk

    log("devices:", jax.devices())

    # ---- stage 1: train (coarse + PQ + SQ ranges) on a leading sample
    if not (os.path.exists(CENTF) and os.path.exists(PQF)
            and os.path.exists(SQPARF)):
        log("training on the leading sample ...")
        it = gen_chunks()
        _, x0 = next(it)
        if not SMOKE:
            _, x1 = next(it)
            x0 = np.concatenate([x0, x1])
        del it
        t0 = time.time()
        cp = ClusteringParameters()
        cp.niter = 8
        cp.verbose = True
        cents, _ = kmeans(jnp.asarray(x0), NLIST, cp)
        cents = np.asarray(cents, np.float32)
        np.save(CENTF, cents)
        log(f"coarse train {time.time()-t0:.0f}s")
        t0 = time.time()
        cents_dev = jnp.asarray(cents)
        xs = x0[:1_000_000]
        _, a = D.knn(jnp.asarray(xs), cents_dev, 1)
        resid = np.asarray(jnp.asarray(xs)
                           - cents_dev[jnp.asarray(a[:, 0])])
        codec = PQ.train_pq(resid, M_PQ, 4, verbose=True)
        np.save(PQF, codec.centroids)
        log(f"pq train {time.time()-t0:.0f}s")
        sqc = SQ.train_sq(x0, SQ.QT_8BIT)
        np.savez(SQPARF, vmin=sqc.vmin, vdiff=sqc.vdiff)
        del x0, xs, resid
        gc.collect()
    cents = np.load(CENTF)
    pq_cents = np.load(PQF)
    sqp = np.load(SQPARF)
    vmin, vdiff = sqp["vmin"], sqp["vdiff"]
    cents_dev = jnp.asarray(cents)
    pq_dev = jnp.asarray(pq_cents)
    log(f"trained: cents {cents.shape}, pq {pq_cents.shape}")

    # ---- stage 2: fused gen + sq8 + assign + pq-encode + GT pass -----
    if not os.path.exists(DONEF):
        log("fused pass ...")
        xmm = np.memmap(XF, mode="w+", dtype=np.float32, shape=(N, D_))
        smm = np.memmap(SQF, mode="w+", dtype=np.uint8, shape=(N, D_))
        cmm = np.memmap(CODEF, mode="w+", dtype=np.uint8,
                        shape=(N, M_PQ // 2))
        amm = np.memmap(ASSIGNF, mode="w+", dtype=np.int32, shape=(N,))
        xq = gen_queries()
        np.save(XQF, xq)
        xq_d = jnp.asarray(xq)
        bd = jnp.full((NQ, K), jnp.inf)
        bi = jnp.full((NQ, K), -1, jnp.int32)
        sc255 = (255.0 / vdiff).astype(np.float32)
        t0 = time.time()
        nch = (N + CHUNK - 1) // CHUNK
        for ci, (i0, xc) in enumerate(gen_chunks()):
            m = len(xc)
            xmm[i0:i0 + m] = xc
            q8 = np.clip((xc - vmin) * sc255, 0.0, 255.0)
            smm[i0:i0 + m] = np.round(q8).astype(np.uint8)
            xc_d = jnp.asarray(xc)              # the ONE upload
            _, aa = D.knn(xc_d, cents_dev, 1)
            aa = aa[:, 0].astype(jnp.int32)
            dv, iv = D.knn(xq_d, xc_d, K)       # exact-GT merge
            bd, bi = merge_topk(bd, bi, dv, iv + i0, K,
                                similarity=False)
            # PQ4 encode of residuals, in 1M sub-chunks (the ip
            # matrix is (n, M*ksub))
            for j0 in range(0, m, 1_000_000):
                res = (xc_d[j0:j0 + 1_000_000]
                       - cents_dev[aa[j0:j0 + 1_000_000]])
                codes = PQ.pq_encode(res, pq_dev)
                packed = PQ.pack_codes_4bit(codes)
                cmm[i0 + j0:i0 + j0 + len(res)] = np.asarray(packed)
            amm[i0:i0 + m] = np.asarray(aa)
            del xc_d
            if ci % 5 == 0 or i0 + m >= N:
                log(f"  chunk {ci + 1}/{nch} ({time.time()-t0:.0f}s)")
        np.save(GTF, np.asarray(bi))
        xmm.flush(); smm.flush(); cmm.flush(); amm.flush()
        del xmm, smm, cmm, amm, bd, bi
        gc.collect()
        with open(DONEF, "w") as f:
            f.write("ok")
        emit({"section": "build", "fused_pass_s": time.time() - t0})
        log(f"fused pass total {time.time()-t0:.0f}s")

    xq = np.load(XQF)
    gt = np.load(GTF)
    xmm = np.memmap(XF, mode="r", dtype=np.float32, shape=(N, D_))

    # ---- stage 3: pack + upload ---------------------------------------
    t0 = time.time()
    codes = np.asarray(np.memmap(CODEF, mode="r", dtype=np.uint8,
                                 shape=(N, M_PQ // 2)))
    assign = np.asarray(np.memmap(ASSIGNF, mode="r", dtype=np.int32,
                                  shape=(N,)))
    ids = np.arange(N, dtype=np.int32)
    pil = ivf_scan.pack_code_invlists(codes, ids, assign, NLIST, 128)
    del codes, assign, ids
    gc.collect()
    hbm_codes = (pil.codes.nbytes + pil.ids.nbytes) / 1e9
    log(f"packed+uploaded invlists in {time.time()-t0:.0f}s: "
        f"{pil.nblocks:,} blocks, {hbm_codes:.2f} GB HBM")

    t0 = time.time()
    sq8_dev = jnp.asarray(np.memmap(SQF, mode="r", dtype=np.uint8,
                                    shape=(N, D_)))
    sq8_dev.block_until_ready()
    log(f"sq8 tier uploaded in {time.time()-t0:.0f}s "
        f"({sq8_dev.nbytes/1e9:.1f} GB HBM)")
    emit({"section": "resident", "hbm_codes_gb": round(hbm_codes, 2),
          "hbm_sq8_gb": round(sq8_dev.nbytes / 1e9, 2),
          "nblocks": int(pil.nblocks)})

    vmin_d = jnp.asarray(vmin)
    vscale_d = jnp.asarray(vdiff / 255.0)
    mnb = int(pil._max_nblocks)
    log(f"max nblocks/list = {mnb}")

    import functools

    # NOTE: sq8 (9.6 GB) is an ARGUMENT, not a closure — a closed-over
    # device array is baked into the remote-compile request on axon
    # (HTTP 413; see .claude/skills/verify gotcha list).
    @functools.partial(jax.jit, static_argnames=("k",))
    def refine_sq8(xq_dev, rows, sq8, k):
        safe = jnp.clip(rows, 0, N - 1)
        rec = sq8[safe].astype(jnp.float32) * vscale_d + vmin_d
        ip = jnp.einsum("qd,qcd->qc", xq_dev, rec,
                        preferred_element_type=jnp.float32)
        qn = jnp.sum(xq_dev * xq_dev, axis=1, keepdims=True)
        vn = jnp.sum(rec * rec, axis=2)
        sc = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
        sc = jnp.where(rows >= 0, sc, jnp.inf)
        import jax.lax as lax
        neg, pos = lax.top_k(-sc, k)
        return -neg, jnp.take_along_axis(rows, pos, axis=1)

    def refine_flat_host(xq_np, rows):
        """Exact f32 re-rank from the paged (memmap) tier — vectorized
        one gather per query batch (the reference's RFlat pass against
        a page-cache-warm mmap)."""
        nqb, kk = rows.shape
        safe = np.clip(rows, 0, N - 1)
        v = xmm[safe.ravel()].reshape(nqb, kk, D_)   # paged gather
        dd = ((v - xq_np[:, None, :]) ** 2).sum(2)
        dd[rows < 0] = np.inf
        pos = np.argsort(dd, axis=1, kind="stable")[:, :K]
        return np.take_along_axis(safe, pos, axis=1)

    def recall_of(I, n):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q][:K]) & set(gt[q])) / K
                              for q in range(n)]))

    QCH = 500 if not SMOKE else 250

    def run(tier, nprobe, kf, limit=None):
        nq_run = min(limit or NQ, NQ)
        kk = max(K * kf, K)
        tq = ts = tr = 0.0
        Iout = np.empty((nq_run, K), np.int32)
        for i0 in range(0, nq_run, QCH):
            xb_np = xq[i0:i0 + QCH]
            xq_dev = jnp.asarray(xb_np)
            ta = time.time()
            cd, probes = D.knn(xq_dev, cents_dev, nprobe)
            np.asarray(probes[:1, :1])       # real fence (axon)
            tq += time.time() - ta
            ta = time.time()
            Dv, Iv, _ = ivf_scan.scan_invlists_pq(
                xq_dev, probes.astype(jnp.int32),
                cd.astype(jnp.float32), pil, pq_dev, cents_dev,
                kk, D.METRIC_L2, by_residual=True, max_nblocks=mnb,
                packed4=True)
            np.asarray(Iv[:1, :1])
            ts += time.time() - ta
            ta = time.time()
            if tier == "pq":
                Iout[i0:i0 + len(xb_np)] = np.asarray(Iv[:, :K])
            elif tier == "rsq8":
                _, Ir = refine_sq8(xq_dev, Iv, sq8_dev, K)
                Iout[i0:i0 + len(xb_np)] = np.asarray(Ir)
            else:                            # rflat paged
                Iout[i0:i0 + len(xb_np)] = refine_flat_host(
                    xb_np, np.asarray(Iv))
            tr += time.time() - ta
        tot = tq + ts + tr
        return recall_of(Iout, nq_run), nq_run / tot, dict(
            coarse_s=round(tq, 2), scan_s=round(ts, 2),
            refine_s=round(tr, 2))

    grids = [("pq", 16, 1), ("pq", 32, 1),
             ("rsq8", 16, 8), ("rsq8", 32, 8),
             ("rsq8", 16, 32), ("rsq8", 32, 32),
             ("rflat", 16, 8), ("rflat", 32, 32)]
    for tier, nprobe, kf in grids:
        try:
            run(tier, nprobe, kf, limit=QCH)   # compile at REAL shapes
            r, qps, phases = run(tier, nprobe, kf)
            emit({"section": f"ivf65536_pq32x4fs_{tier}",
                  "nprobe": nprobe, "k_factor": kf,
                  "recall@10": r, "qps": qps, **phases})
        except Exception as e:   # noqa: BLE001
            emit({"section": f"ivf65536_pq32x4fs_{tier}",
                  "nprobe": nprobe, "k_factor": kf, "error": repr(e)})
    log("queue10 DONE")


if __name__ == "__main__":
    main()
