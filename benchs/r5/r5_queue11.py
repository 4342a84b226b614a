"""Round-5 queue 11 — the 100M chip-resident SQ8 refine tier, proven
on hardware after /root/data100m was reclaimed.

The queue10b fix (aligned u8[9_375_000, 1024] gather view, module
docstring there) was validated for FIDELITY in CPU smoke runs
(r5_queue10.jsonl smoke rows: recall 0.9848/0.9862 at 100k) but the
38.4 GB dataset was gone before the full-scale hardware run. This
script closes the remaining two claims with what one chip can prove
without the dataset:

A. EXACTNESS on TPU at 1M: the two-line aligned gather returns
   bit-identical scores and indices to the naive sq8[rows] gather
   (the one XLA relayouts at 100M). If A holds, the 100M recall is
   the smoke-validated recall — the kernel computes the same bytes.

B. FIT + THROUGHPUT at full 100M shapes: synthesize content on
   device/host at the exact shapes of the real build (nlist=65536,
   packed PQ4 codes ~2.1 GB, aligned SQ8 tier 9.6 GB, per-list
   imbalance matched to the real build's max 76 blocks/list), run
   the complete coarse->scan->refine pipeline, and record phase
   times. Content is random, so NO recall is claimed for B — it
   proves the 21.1G->fits relayout fix and times the program the
   real data would run.

Reference role: BASELINE config #5 (IVF65536,PQ32x4fs + refine at
100M, /root/reference/demos/offline_ivf/offline_ivf.py capability
class). Results -> benchs/logs/r5_queue11.jsonl.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
OUT = "/root/repo/benchs/logs/r5_queue11.jsonl"
SMOKE = "--smoke" in sys.argv

K, D_, M_PQ, LW = 10, 96, 32, 1024


def emit(rec):
    rec = dict(rec, ts=time.time(), smoke=SMOKE)
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def two_line_refine(xq_dev, rows, sq8v, vmin_d, vscale_d, n, k):
    """The queue10b aligned two-line gather (see its docstring)."""
    import jax.numpy as jnp
    from jax import lax

    nlines = sq8v.shape[0]
    safe = jnp.clip(rows, 0, n - 1)
    line = (3 * safe) >> 5
    m = safe & 31
    off = 96 * m - LW * ((3 * m) >> 5)
    two = jnp.stack([line, jnp.minimum(line + 1, nlines - 1)], axis=-1)
    g = sq8v[two].reshape(*safe.shape, 2 * LW)
    idx2 = off[..., None] + jnp.arange(D_, dtype=jnp.int32)
    bytes_ = jnp.take_along_axis(g, idx2, axis=-1)
    rec = (bytes_.astype(jnp.float32) * vscale_d[None, None, :]
           + vmin_d[None, None, :])
    xqf = xq_dev.astype(jnp.float32)
    ip = jnp.einsum("qd,qcd->qc", xqf, rec,
                    preferred_element_type=jnp.float32)
    qn = jnp.sum(xqf * xqf, axis=1, keepdims=True)
    vn = jnp.sum(rec * rec, axis=2)
    sc = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
    sc = jnp.where(rows >= 0, sc, jnp.inf)
    neg, pos = lax.top_k(-sc, k)
    return -neg, jnp.take_along_axis(rows, pos, axis=1)


def part_a_exactness():
    """1M x 96 on the real chip: two-line gather vs naive row gather."""
    import jax
    import jax.numpy as jnp

    n = 1_000_000
    log("part A: exactness at", n)
    rng = np.random.default_rng(0)
    sq8_np = rng.integers(0, 256, size=(n, D_), dtype=np.uint8)
    vmin = jnp.asarray(rng.normal(size=(D_,)).astype(np.float32))
    vscale = jnp.asarray(
        (0.01 + rng.random(D_)).astype(np.float32) / 255.0)
    xq = jnp.asarray(rng.normal(size=(256, D_)).astype(np.float32))
    rows = jnp.asarray(
        rng.integers(0, n, size=(256, 80), dtype=np.int32))
    # some masked (negative) candidates, as the scan emits for padding
    rows = rows.at[:, 77:].set(-1)

    sq8_direct = jnp.asarray(sq8_np)
    nlines = n * D_ // LW
    sq8_lines = jnp.asarray(sq8_np.reshape(nlines, LW))

    @functools.partial(jax.jit, static_argnames=("k",))
    def naive(xq_dev, rr, sq8, k):
        from jax import lax
        safe = jnp.clip(rr, 0, n - 1)
        rec = (sq8[safe].astype(jnp.float32) * vscale[None, None, :]
               + vmin[None, None, :])
        xqf = xq_dev.astype(jnp.float32)
        ip = jnp.einsum("qd,qcd->qc", xqf, rec,
                        preferred_element_type=jnp.float32)
        qn = jnp.sum(xqf * xqf, axis=1, keepdims=True)
        vn = jnp.sum(rec * rec, axis=2)
        sc = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
        sc = jnp.where(rr >= 0, sc, jnp.inf)
        neg, pos = lax.top_k(-sc, k)
        return -neg, jnp.take_along_axis(rr, pos, axis=1)

    # the claim that matters: the two-line gather reads the SAME BYTES
    # as the naive row gather (the one XLA relayout-copies at 100M)
    @jax.jit
    def gather_two(rr, sq8v):
        nlines = sq8v.shape[0]
        safe = jnp.clip(rr, 0, n - 1)
        line = (3 * safe) >> 5
        m = safe & 31
        off = 96 * m - LW * ((3 * m) >> 5)
        two = jnp.stack(
            [line, jnp.minimum(line + 1, nlines - 1)], axis=-1)
        g = sq8v[two].reshape(*safe.shape, 2 * LW)
        idx2 = off[..., None] + jnp.arange(D_, dtype=jnp.int32)
        return jnp.take_along_axis(g, idx2, axis=-1)

    @jax.jit
    def gather_naive(rr, sq8):
        return sq8[jnp.clip(rr, 0, n - 1)]

    b0 = gather_naive(rows, sq8_direct)
    b1 = gather_two(rows, sq8_lines)
    bytes_eq = bool(jnp.all(b0 == b1))

    two_jit = jax.jit(functools.partial(two_line_refine, n=n, k=K))
    d0, i0 = naive(xq, rows, sq8_direct, K)
    d1, i1 = two_jit(xq, rows, sq8_lines, vmin, vscale)
    d_max = float(jnp.max(jnp.abs(d0 - d1)))
    ids_eq = bool(jnp.all(i0 == i1))
    emit({"section": "rsq8f_exactness_1m", "n": n,
          "gathered_bytes_bitexact": bytes_eq,
          "max_abs_score_diff_fusion_order": d_max,
          "indices_equal": ids_eq})
    assert bytes_eq and ids_eq, (bytes_eq, d_max, ids_eq)
    log("part A OK: gathered bytes bit-identical, indices equal")


def part_b_fullshape():
    """100M-shape fit + throughput, content-synthetic."""
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as Dst
    from tpu_ann.ops import ivf_scan
    from tpu_ann.ops import pq as PQ

    if SMOKE:
        N, NLIST, NQ, QCH = 2_097_152, 2048, 500, 250
    else:
        N, NLIST, NQ, QCH = 100_000_000, 65536, 10_000, 500
    log(f"part B: full-shape run N={N} nlist={NLIST}")
    rng = np.random.default_rng(1)

    # per-list imbalance matched to the real queue10 build: mean
    # 1526 rows/list, max 76 blocks (9728 rows) -> lognormal sigma .42
    w = rng.lognormal(mean=0.0, sigma=0.42, size=NLIST)
    cdf = np.cumsum(w / w.sum())
    t0 = time.time()
    assign = np.searchsorted(
        cdf, rng.random(N), side="right").astype(np.int32)
    np.clip(assign, 0, NLIST - 1, out=assign)
    codes = rng.integers(0, 256, size=(N, M_PQ // 2), dtype=np.uint8)
    log(f"host content synthesized in {time.time()-t0:.0f}s")

    t0 = time.time()
    ids = np.arange(N, dtype=np.int32)
    pil = ivf_scan.pack_code_invlists(codes, ids, assign, NLIST, 128)
    mnb = int(pil._max_nblocks)
    del codes, assign, ids
    log(f"packed invlists uploaded in {time.time()-t0:.0f}s; "
        f"max blocks/list={mnb} (real build: 76)")

    cents_dev = jnp.asarray(
        rng.normal(size=(NLIST, D_)).astype(np.float32))
    codec = PQ.train_pq(
        rng.normal(size=(4096, D_)).astype(np.float32), M_PQ, 4)
    pq_dev = jnp.asarray(codec.centroids, jnp.float32)
    vmin_d = jnp.asarray(np.zeros(D_, np.float32))
    vscale_d = jnp.asarray(np.full(D_, 1.0 / 255.0, np.float32))
    xq = rng.normal(size=(NQ, D_)).astype(np.float32)

    # the 9.6 GB aligned SQ8 tier, generated ON DEVICE (no tunnel)
    t0 = time.time()
    nlines = N * D_ // LW
    assert nlines * LW == N * D_ and nlines % 8 == 0

    @jax.jit
    def gen_tier(key):
        return jax.random.randint(
            key, (nlines, LW), 0, 256, dtype=jnp.uint8)

    sq8_lines = gen_tier(jax.random.PRNGKey(0))
    sq8_lines.block_until_ready()
    log(f"SQ8 tier resident in {time.time()-t0:.0f}s "
        f"({sq8_lines.nbytes/1e9:.1f} GB HBM, {nlines}x{LW})")
    try:
        ms = jax.local_devices()[0].memory_stats()
        emit({"section": "rsq8f_fullshape_hbm",
              "bytes_in_use": int(ms.get("bytes_in_use", -1)),
              "bytes_limit": int(ms.get("bytes_limit", -1))})
    except Exception as e:  # noqa: BLE001
        log("memory_stats unavailable:", repr(e))

    refine = jax.jit(
        functools.partial(two_line_refine, n=N, k=K),
        static_argnames=())

    def run(nprobe, kf, limit=None):
        nq_run = min(limit or NQ, NQ)
        kk = max(K * kf, K)
        tq = ts = tr = 0.0
        for i0 in range(0, nq_run, QCH):
            xq_dev = jnp.asarray(xq[i0:i0 + QCH], jnp.float32)
            ta = time.time()
            cd, probes = Dst.knn(xq_dev, cents_dev, nprobe)
            np.asarray(probes[:1, :1])
            tq += time.time() - ta
            ta = time.time()
            Dv, Iv, _ = ivf_scan.scan_invlists_pq(
                xq_dev, probes.astype(jnp.int32),
                cd.astype(jnp.float32), pil, pq_dev, cents_dev,
                kk, Dst.METRIC_L2, by_residual=True,
                max_nblocks=mnb, packed4=True)
            np.asarray(Iv[:1, :1])
            ts += time.time() - ta
            ta = time.time()
            _, Ir = refine(xq_dev, Iv.astype(jnp.int32), sq8_lines,
                           vmin_d, vscale_d)
            np.asarray(Ir[:1, :1])
            tr += time.time() - ta
        tot = tq + ts + tr
        return nq_run / tot, dict(coarse_s=round(tq, 2),
                                  scan_s=round(ts, 2),
                                  refine_s=round(tr, 2))

    for nprobe, kf in ((16, 8), (32, 32)):
        try:
            run(nprobe, kf, limit=QCH)   # compile at real shapes
            qps, phases = run(nprobe, kf)
            emit({"section": "rsq8f_fullshape", "n": N,
                  "nprobe": nprobe, "k_factor": kf,
                  "max_nblocks": mnb, "qps": qps, **phases,
                  "note": "content-synthetic: fit+throughput only, "
                          "recall proven by smoke rows + exactness A"})
        except Exception as e:  # noqa: BLE001
            emit({"section": "rsq8f_fullshape", "n": N,
                  "nprobe": nprobe, "k_factor": kf,
                  "error": repr(e)})
    log("part B DONE")


def main():
    import jax
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    log("devices:", jax.devices())
    part_a_exactness()
    part_b_fullshape()


if __name__ == "__main__":
    main()
