"""Round-4 queue 5 — flat-kernel epilogue sweep + tile-search recall fix.

  A. Epilogue sweep for VERDICT #2: the kernel-only probe sits at 32.3%
     MFU (40.2 ms / 10k q at 1M x 128-d) but e2e flat_knn_fused lands at
     20.8% (62.6 ms) — the ~22 ms gap is the post-kernel epilogue
     (lax.top_k full sort over W=1024 lanes + the refine gather). Sweep
     sel='exact' vs 'approx' (lax.approx_max_k) x refine, plus a probe
     of the per-call prep cost (bf16 cast + pad + reshape of the DB).
     Bar: an e2e row >= 30% MFU at recall >= 0.995 (~230k+ QPS).
  B. Tile-search recall at 1M after the warm graph build — queue 4 read
     out[1] (positions) instead of out[2] (ids), reporting recall 0.0.

Results -> benchs/logs/r4_queue5.jsonl.
"""
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
os.makedirs(LOG, exist_ok=True)
OUT = os.path.join(LOG, "r4_queue5.jsonl")


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused
    from tpu_ann.utils.evaluation import recall_k_at_k

    log("devices:", jax.devices())
    rs = np.random.RandomState(11)
    d, nb, nq, k = 128, 1_000_000, 10_000, 10
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return cents[which] + rs.randn(n, d).astype(np.float32)

    xb = draw(nb)
    xq = draw(nq)
    xb_dev = jnp.asarray(xb)
    xq_dev = jnp.asarray(xq)
    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        _, I = D.knn(jnp.asarray(xq[i:i + 2000]), xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
    log("GT ready")
    peak = 197e12
    R, W = 8192, 1024

    # ---------- A: epilogue sweep ------------------------------------------
    try:
        # prep-cost probe: what does the in-jit bf16 cast + pad + reshape
        # of the 1M x 128 DB cost per call?
        dp = 128
        nchunks = -(-nb // R)
        pad = nchunks * R - nb

        @jax.jit
        def prep(xb_):
            data = jnp.pad(xb_.astype(jnp.bfloat16),
                           ((0, pad), (0, 0))).reshape(nchunks, R, dp)
            bias = jnp.pad(jnp.sum(xb_.astype(jnp.float32) ** 2, axis=1),
                           (0, pad),
                           constant_values=np.inf).reshape(nchunks, 1, R)
            return data, bias

        out = prep(xb_dev)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = prep(xb_dev)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        del out
        emit({"section": "A", "config": "prep probe (cast+pad+reshape 1M db)",
              "t_ms": best * 1e3})

        variants = [
            dict(Q=512, refine=4, sel="exact"),   # production baseline
            dict(Q=512, refine=4, sel="approx"),
            dict(Q=512, refine=2, sel="approx"),
            dict(Q=512, refine=1, sel="approx"),
            dict(Q=512, refine=1, sel="exact"),
            dict(Q=256, refine=4, sel="approx"),
        ]
        for v in variants:
            try:
                kw = dict(Q=v["Q"], R=R, W=W, refine=v["refine"],
                          schedule="grid", merge="serial", sel=v["sel"])
                out = flat_knn_fused(xq_dev, xb_dev, k, **kw)
                np.asarray(out[1])
                best = np.inf
                for _ in range(3):
                    t0 = time.time()
                    out = flat_knn_fused(xq_dev, xb_dev, k, **kw)
                    np.asarray(out[1])
                    best = min(best, time.time() - t0)
                rec = recall_k_at_k(np.asarray(out[1]), gt, k)
                mfu = 2.0 * nq * nb * dp / best / peak
                emit({"section": "A",
                      "config": (f"e2e Q={v['Q']} refine={v['refine']} "
                                 f"sel={v['sel']}"),
                      "qps": nq / best, "recall@10": float(rec),
                      "t_ms": best * 1e3, "mfu": mfu})
            except Exception:
                log(f"A variant {v} FAILED:\n" + traceback.format_exc())
    except Exception:
        log("A FAILED:\n" + traceback.format_exc())

    # ---------- B: tile-search recall (ids, not positions) -----------------
    try:
        from tpu_ann.ops.hnsw import build_graph_knn
        from tpu_ann.ops.hnsw_tiles import build_tiles_fused, \
            tile_search_fused

        t0 = time.time()
        graph, assign = build_graph_knn(xb, 16, 40, verbose=False)
        np.asarray(graph.neighbors0[:1, :1])
        log(f"B: graph build {time.time() - t0:.1f}s")
        order = (np.argsort(assign, kind="stable")
                 if assign is not None else None)
        ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                                order=order)
        for nprobe0, hops in ((12, 1), (12, 2), (24, 2)):
            out = tile_search_fused(ftg, xq_dev, k,
                                    nprobe0=nprobe0, hops=hops)
            np.asarray(out[2])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = tile_search_fused(ftg, xq_dev, k,
                                        nprobe0=nprobe0, hops=hops)
                np.asarray(out[2])
                best = min(best, time.time() - t0)
            I = np.asarray(out[2])
            rec = float(np.mean([len(set(I[q]) & set(gt[q])) / k
                                 for q in range(nq)]))
            emit({"section": "B",
                  "config": f"tile search nprobe0={nprobe0} hops={hops}",
                  "qps": nq / best, "recall@10": rec})
    except Exception:
        log("B FAILED:\n" + traceback.format_exc())

    log("r4_queue5 DONE")


if __name__ == "__main__":
    main()
