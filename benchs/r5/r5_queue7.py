"""Round-5 queue 7 — flat-path speed hunt past the queue3 point, plus
the DMA-issue microbenchmark that settles the float-data in-kernel
refine design.

A. merge='packed' x sel='kernel' grid: the packed lane-min merge costs
   3 VPU ops/score with a 1-op dependence chain (vs 4 ops / 3-op chain
   serial) — the round-4 table never measured it with the in-kernel
   select. Bar context: queue3's best joint point.

B. DMA-issue cost: one Pallas kernel issues N single-row HBM->VMEM
   copies back-to-back (waits at the end). Per-issue core cost decides
   whether a candidate-row gather refine (400k rows / 10k queries) can
   ever be folded into the kernel: at >= 30 cycles/issue the fold costs
   more than the XLA gather it replaces (BENCHMARKS.md round-4 written
   proof lever).

Results -> benchs/logs/r5_queue7.jsonl.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue7.jsonl")


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def dma_issue_microbench():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, dp = 1_000_000, 128
    xb = jnp.zeros((nb, dp), jnp.float32)

    for NR in (4096, 16384, 65536):
        NS = 16
        rows = jnp.asarray(
            np.random.RandomState(0).randint(0, nb, size=(1, NR)),
            jnp.int32)

        # NOTE: semaphores count multiple signals; fori re-arms slots —
        # each start must pair with a wait. Simplify: wait immediately
        # every NS-th issue by pairing slot reuse with a wait first.
        def kern2(rows_ref, xb_hbm, out_ref, buf, sems, *, NR=NR,
                  NS=NS):
            def body(i, _):
                slot = jax.lax.rem(i, NS)
                r = rows_ref[0, i]
                cp = pltpu.make_async_copy(
                    xb_hbm.at[pl.ds(r, 1)], buf.at[pl.ds(slot, 1)],
                    sems.at[slot])

                @pl.when(i >= NS)
                def _():
                    cp.wait()   # retire the previous copy in this slot

                cp.start()
                return 0

            jax.lax.fori_loop(0, NR, body, 0)

            def wdone(s, _):
                pltpu.make_async_copy(
                    xb_hbm.at[pl.ds(0, 1)], buf.at[pl.ds(s, 1)],
                    sems.at[s]).wait()
                return 0

            jax.lax.fori_loop(0, NS, wdone, 0)
            out_ref[0, 0] = buf[0, 0]

        f = pl.pallas_call(
            functools.partial(kern2),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, NR), lambda t: (t, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NS, dp), jnp.float32),
                pltpu.SemaphoreType.DMA((NS,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True),
        )
        try:
            np.asarray(f(rows, xb))       # compile + warm
            best = float("inf")
            for _ in range(5):
                t0 = time.time()
                np.asarray(f(rows, xb))
                best = min(best, time.time() - t0)
            ns_per = best * 1e9 / NR
            emit({"section": "dma_issue", "n_rows": NR,
                  "t_ms": best * 1e3, "ns_per_dma": ns_per,
                  "cycles_per_dma_at_940MHz": ns_per * 0.94})
        except Exception as e:   # noqa: BLE001
            emit({"section": "dma_issue", "n_rows": NR,
                  "error": repr(e)})
            break


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db
    from tpu_ann.utils.datasets import SIFT1M_CALIBRATED, sift_surrogate

    log("devices:", jax.devices())
    dma_issue_microbench()

    nq, k, d, nb = 10_000, 10, 128, 1_000_000
    allx = sift_surrogate(nb + nq, seed=7, **SIFT1M_CALIBRATED)
    xb = allx[:nb]
    xq_h = allx[nb:]
    del allx
    xb_dev = jnp.asarray(xb)
    xq = jnp.asarray(xq_h)

    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        _, I = D.knn(xq[i:i + 2000], xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)
    log("GT ready")

    def recall(I):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q]) & set(gt[q])) / k
                              for q in range(nq)]))

    flops = 2.0 * nq * nb * d
    PEAK = 197e12
    packs = {}

    def get_pack(R, unroll=1):
        if (R, unroll) not in packs:
            packs[(R, unroll)] = pack_flat_db(xb_dev, D.METRIC_L2, R=R,
                                              unroll=unroll)
        return packs[(R, unroll)]

    def timed_scalar(kw, n=5):
        packed = get_pack(kw["R"], kw.get("unroll", 1))

        @jax.jit
        def f(q, db):
            dd, ii = flat_knn_fused(q, db, k, packed=packed, **kw)
            return jnp.sum(dd) + jnp.sum(ii.astype(jnp.float32))

        np.asarray(f(xq, xb_dev))
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            np.asarray(f(xq, xb_dev))
            best = min(best, time.time() - t0)
        return best

    grid = [
        dict(Q=512, R=8192, W=1024, refine=0, sel="kernel",
             schedule="grid", merge="packed"),
        dict(Q=1024, R=8192, W=1024, refine=0, sel="kernel",
             schedule="grid", merge="packed"),
        dict(Q=512, R=16384, W=2048, refine=0, sel="kernel",
             schedule="grid", merge="packed"),
        dict(Q=512, R=8192, W=1024, refine=0, sel="kernel",
             schedule="fori", unroll=4, merge="packed"),
        dict(Q=512, R=8192, W=1024, refine=0, sel="kernel",
             schedule="grid", merge="tree"),
    ]
    for kw in grid:
        try:
            t = timed_scalar(kw)
            _, ii = flat_knn_fused(
                xq, xb_dev, k,
                packed=get_pack(kw["R"], kw.get("unroll", 1)), **kw)
            rec = recall(ii)
            emit(dict(kw, section="grid", t_ms=t * 1e3, qps=nq / t,
                      **{"recall@10": rec}, mfu=flops / t / PEAK))
        except Exception as e:   # noqa: BLE001
            emit(dict(kw, section="grid", error=repr(e)))

    log("queue7 DONE")


if __name__ == "__main__":
    main()
