"""Round-4 queue 4 — finish what queue 3 started.

  A. tile-search recall after the warm 1M graph build (queue 3's call
     used the wrong signature; the build itself measured 58.2 s warm).
     Completes item 6's bar: <=90 s warm at recall >= 0.997.
  B. flat-kernel MFU ceiling decomposition, remaining probes. queue 3's
     minall probe hit the 16 MB scoped-vmem limit at Q=512 (the f32
     (Q, R) score block alone is 16 MB); re-run the whole probe ladder
     at Q=256 where every variant fits, so the comparison is
     apples-to-apples:
       (i)   min1    — dot + 1/8 fold (near the pure-MXU ceiling)
       (ii)  minall  — full fold, 1 VPU op/score, no provenance
       (iii) serial  — production merge (4 ops/score, provenance)
     plus end-to-end flat_knn_fused with refine=4 / refine=1 at the
     production shape (Q=512) for the headline row.

Results -> benchs/logs/r4_queue4.jsonl.
"""
import functools
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
os.makedirs(LOG, exist_ok=True)
OUT = os.path.join(LOG, "r4_queue4.jsonl")


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

    log("devices:", jax.devices())
    rs = np.random.RandomState(11)
    d, nb, nq, k = 128, 1_000_000, 10_000, 10
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return cents[which] + rs.randn(n, d).astype(np.float32)

    xb = draw(nb)

    # ---------- A: graph build + tile-search recall ------------------------
    try:
        from tpu_ann.ops.hnsw import build_graph_knn
        from tpu_ann.ops.hnsw_tiles import build_tiles_fused, tile_search_fused

        xq = draw(nq)
        gt = np.zeros((nq, k), np.int64)
        xb_dev = jnp.asarray(xb)
        for i in range(0, nq, 2000):
            _, I = D.knn(jnp.asarray(xq[i:i + 2000]), xb_dev, k)
            gt[i:i + 2000] = np.asarray(I)
        del xb_dev
        log("A: GT ready; graph build run 1 (includes any cold compiles)")
        for run in (1, 2):
            t0 = time.time()
            graph, assign = build_graph_knn(xb, 16, 40, verbose=True)
            np.asarray(graph.neighbors0[:1, :1])
            t_build = time.time() - t0
            log(f"A: build run {run}: {t_build:.1f}s")
            emit({"section": "A", "config": f"build run{run} 1M M=16 efC=40",
                  "build_s": t_build})
        order = (np.argsort(assign, kind="stable")
                 if assign is not None else None)
        ftg = build_tiles_fused(xb, np.asarray(graph.neighbors0),
                                order=order)
        xq_dev = jnp.asarray(xq)
        for nprobe0, hops in ((12, 1), (12, 2)):
            out = tile_search_fused(ftg, xq_dev, k,
                                    nprobe0=nprobe0, hops=hops)
            np.asarray(out[1])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = tile_search_fused(ftg, xq_dev, k,
                                        nprobe0=nprobe0, hops=hops)
                np.asarray(out[1])
                best = min(best, time.time() - t0)
            I = np.asarray(out[1])
            rec = float(np.mean([len(set(I[q]) & set(gt[q])) / k
                                 for q in range(nq)]))
            emit({"section": "A",
                  "config": f"tile search nprobe0={nprobe0} hops={hops}",
                  "qps": nq / best, "recall@10": rec})
        del ftg, graph, xq_dev
    except Exception:
        log("A FAILED:\n" + traceback.format_exc())

    # ---------- B: flat-kernel ceiling decomposition (Q=256 ladder) --------
    try:
        import jax.experimental.pallas as pl
        from tpu_ann.ops import flat_knn_pallas as FK
        from tpu_ann.ops.flat_knn_pallas import flat_knn_fused
        from tpu_ann.utils.evaluation import recall_k_at_k

        try:
            from jax.experimental.pallas import tpu as pltpu
        except ImportError:
            import jax.experimental.pallas.tpu as pltpu

        peak = 197e12
        R, W = 8192, 1024
        xq2 = draw(nq)
        xb_dev = jnp.asarray(xb)
        xq_dev = jnp.asarray(xq2)
        gt2 = np.zeros((nq, k), np.int64)
        for i in range(0, nq, 2000):
            _, I = D.knn(jnp.asarray(xq2[i:i + 2000]), xb_dev, k)
            gt2[i:i + 2000] = np.asarray(I)
        log("B: GT ready")

        def merge_min1(dis, av, ap, base, W_, lane):
            # touch only the first W-slice: ~dot-only, merge cost ~1/(R/W)
            return jnp.minimum(av, dis[:, :W_]), ap

        def merge_minall(dis, av, ap, base, W_, lane):
            # full fold, 1 VPU op per score, no provenance
            for g in range(dis.shape[1] // W_):
                av = jnp.minimum(av, dis[:, g * W_:(g + 1) * W_])
            return av, ap

        def probe(merge_fn, tag, Q):
            nqp, dd = xq_dev.shape
            dp = -(-dd // 128) * 128
            ntiles = -(-nqp // Q)
            nchunks = -(-nb // R)
            qv = jnp.pad(xq_dev.astype(jnp.bfloat16) * -2.0,
                         ((0, ntiles * Q - nqp), (0, dp - dd)))
            qv_t = qv.reshape(ntiles, Q, dp)
            data = jnp.pad(xb_dev.astype(jnp.bfloat16),
                           ((0, nchunks * R - nb), (0, dp - dd))
                           ).reshape(nchunks, R, dp)
            bias = jnp.pad(jnp.sum(xb_dev.astype(jnp.float32) ** 2, axis=1),
                           (0, nchunks * R - nb),
                           constant_values=np.inf).reshape(nchunks, 1, R)
            kern = pl.pallas_call(
                functools.partial(FK._flat_kernel_grid, R=R, W=W,
                                  merge_fn=merge_fn),
                grid=(ntiles, nchunks),
                in_specs=[
                    pl.BlockSpec((1, Q, dp), lambda t, c: (t, 0, 0)),
                    pl.BlockSpec((1, 1, R), lambda t, c: (c, 0, 0)),
                    pl.BlockSpec((1, R, dp), lambda t, c: (c, 0, 0)),
                ],
                out_specs=[pl.BlockSpec((1, Q, W), lambda t, c: (t, 0, 0)),
                           pl.BlockSpec((1, Q, W), lambda t, c: (t, 0, 0))],
                out_shape=[
                    jax.ShapeDtypeStruct((ntiles, Q, W), jnp.float32),
                    jax.ShapeDtypeStruct((ntiles, Q, W), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )
            out = kern(qv_t, bias, data)
            np.asarray(out[0][:1, :1, :1])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = kern(qv_t, bias, data)
                np.asarray(out[0][:1, :1, :1])
                best = min(best, time.time() - t0)
            mfu = 2.0 * nqp * nb * dp / best / peak
            emit({"section": "B", "config": f"probe {tag} Q={Q}",
                  "t_ms": best * 1e3, "mfu": mfu})
            return best

        for Q in (256,):
            try:
                probe(merge_min1, "min1 (dot + 1/8 fold)", Q)
                probe(merge_minall, "minall (1 op/score, no provenance)", Q)
                probe(FK._merge_groups, "serial production merge", Q)
            except Exception:
                log(f"B probe ladder Q={Q} FAILED:\n"
                    + traceback.format_exc())

        for refine, tag in ((4, "e2e refine=4"), (1, "e2e no-refine")):
            out = flat_knn_fused(xq_dev, xb_dev, k, Q=512, R=R, W=W,
                                 refine=refine, schedule="grid",
                                 merge="serial")
            np.asarray(out[1])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = flat_knn_fused(xq_dev, xb_dev, k, Q=512, R=R, W=W,
                                     refine=refine, schedule="grid",
                                     merge="serial")
                np.asarray(out[1])
                best = min(best, time.time() - t0)
            rec = recall_k_at_k(np.asarray(out[1]), gt2, k)
            mfu = 2.0 * nq * nb * 128 / best / peak
            emit({"section": "B", "config": tag, "qps": nq / best,
                  "recall@10": float(rec), "mfu": mfu})
    except Exception:
        log("B FAILED:\n" + traceback.format_exc())

    log("r4_queue4 DONE")


if __name__ == "__main__":
    main()
