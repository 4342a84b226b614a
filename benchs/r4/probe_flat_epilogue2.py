"""VERDICT #2 attribution, fixed: probe_flat_epilogue.py embedded the
1M-row DB as a jit constant (closure), which the remote-compile path
rejects (HTTP 413) — here every stage takes the DB as an argument.

Findings from the first run stand for the select stage: top_k and
approx_max_k over (10k, 1024) are ~0.03 ms — selection is NOT the
kernel->e2e gap. Remaining suspects: the refine gather (205 MB
scattered rows), the batched einsum rescore, and the final merge.

Also sweeps e2e W x refine and two rescore formulations.
Results -> benchs/logs/r4_flat_epilogue2.jsonl.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_flat_epilogue2.jsonl")


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timed(fn, *args, n=5):
    import jax
    r = jax.block_until_ready(fn(*args))   # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        r = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best, r


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db
    from tpu_ann.ops import distances as D

    log("devices:", jax.devices())
    nq, W, k, d, nb = 10_000, 1024, 10, 128, 1_000_000
    Rk = 4 * k
    rs = np.random.RandomState(11)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n, r):
        return cents[r.randint(ncent, size=n)] + r.randn(n, d).astype(
            np.float32)

    xb = draw(nb, np.random.RandomState(1))
    xq_h = draw(nq, np.random.RandomState(2))
    xb_dev = jnp.asarray(xb)
    xq = jnp.asarray(xq_h)
    resv = jnp.asarray(rs.randn(nq, W).astype(np.float32))
    resp = jnp.asarray(rs.randint(0, nb, size=(nq, W)).astype(np.int32))
    cand = resp[:, :Rk]

    # B. the refine gather alone (DB as an argument)
    @jax.jit
    def gather(db, c):
        return db[jnp.maximum(c, 0)]

    t, vecs = timed(gather, xb_dev, cand)
    emit({"stage": "gather (nq,40,128) f32 rows", "t_ms": t * 1e3})
    vecs = jax.block_until_ready(vecs)

    # C. rescore variants given gathered vecs
    @jax.jit
    def rescore_einsum(q, v, c):
        ip = jnp.einsum("qd,qrd->qr", q, v,
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        vn = jnp.sum(v * v, axis=2)
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        dis = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
        nv, s = lax.top_k(-dis, k)
        return -nv, jnp.take_along_axis(c, s, axis=1)

    t, _ = timed(rescore_einsum, xq, vecs, cand)
    emit({"stage": "rescore einsum+topk(40->10)", "t_ms": t * 1e3})

    @jax.jit
    def rescore_diff(q, v, c):
        dlt = v - q[:, None, :]
        dis = jnp.sum(dlt * dlt, axis=2)
        nv, s = lax.top_k(-dis, k)
        return -nv, jnp.take_along_axis(c, s, axis=1)

    t, _ = timed(rescore_diff, xq, vecs, cand)
    emit({"stage": "rescore diff^2+topk(40->10)", "t_ms": t * 1e3})

    # D. the whole epilogue fused (select + gather + rescore), both sels
    def epi(selfn):
        @jax.jit
        def f(db, v, p, q):
            nv, sidx = selfn(-v)
            c = jnp.take_along_axis(p, sidx, axis=1)
            vv = db[jnp.maximum(c, 0)]
            ip = jnp.einsum("qd,qrd->qr", q, vv,
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            vn = jnp.sum(vv * vv, axis=2)
            qn = jnp.sum(q * q, axis=1, keepdims=True)
            dis = jnp.maximum(qn + vn - 2.0 * ip, 0.0)
            nv2, s2 = lax.top_k(-dis, k)
            return -nv2, jnp.take_along_axis(c, s2, axis=1)
        return f

    t, _ = timed(epi(lambda v: lax.top_k(v, Rk)), xb_dev, resv, resp, xq)
    emit({"stage": "fused epilogue sel=exact", "t_ms": t * 1e3})
    t, _ = timed(epi(lambda v: lax.approx_max_k(v, Rk)),
                 xb_dev, resv, resp, xq)
    emit({"stage": "fused epilogue sel=approx", "t_ms": t * 1e3})

    # E. e2e sweep: W x refine (prepacked DB, production protocol)
    gt = np.zeros((nq, k), np.int64)
    for i in range(0, nq, 2000):
        _, I = D.knn(xq[i:i + 2000], xb_dev, k)
        gt[i:i + 2000] = np.asarray(I)

    packed = pack_flat_db(xb_dev, D.METRIC_L2, R=8192)
    flops = 2.0 * nq * nb * d
    PEAK = 197e12
    for Wt in (256, 512, 1024):
        for refine in (4, 8):
            try:
                fn = functools.partial(
                    flat_knn_fused, k=k, Q=512, R=8192, W=Wt,
                    refine=refine, schedule="grid", sel="approx",
                    packed=packed)
                t, (dd, ii) = timed(lambda q: fn(q, xb_dev), xq)
                I = np.asarray(ii)
                rec = float(np.mean([len(set(I[q]) & set(gt[q])) / k
                                     for q in range(nq)]))
                emit({"stage": "e2e", "W": Wt, "refine": refine,
                      "t_ms": t * 1e3, "qps": nq / t, "recall@10": rec,
                      "mfu": flops / t / PEAK})
            except Exception as e:   # noqa: BLE001
                emit({"stage": "e2e", "W": Wt, "refine": refine,
                      "error": repr(e)})

    log("flat epilogue2 DONE")


if __name__ == "__main__":
    main()
