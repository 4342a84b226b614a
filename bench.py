"""Headline benchmark — prints ONE JSON line.

Measurement protocol mirrors the fork's benchmark_advanced.cpp: build,
sweep search configs, report QPS at the recall@10 >= 0.9 operating point.
Workload: SIFT1M-scale synthetic (1M x 128-d, clustered) since no dataset
files ship with the image. Baseline to beat: the fork's best CPU operating
point — 10 511 QPS @ recall@10 0.92 (BASELINE.md).

Configs swept (fastest wins the headline):
  1. IndexFlatL2, bf16 GEMM + TPU approx top-k (BASELINE config #1 —
     exact distances, hardware partial top-k, measured recall reported)
  2. IVF4096,Flat nprobe sweep (BASELINE config #2)
vs_baseline = QPS / 10511.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_devices(timeout_s: float = 180.0):
    """Fail fast (exit 1, no JSON) if the accelerator backend does not
    answer — a dead remote-TPU tunnel makes jax.devices() hang forever,
    which would stall the whole bench run."""
    import os
    import threading

    out: dict = {}

    def probe():
        import jax

        out["devices"] = jax.devices()

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" not in out:
        log(f"bench: backend unreachable after {timeout_s:.0f}s "
            "(remote TPU tunnel down?) — aborting without a result")
        os._exit(1)   # a hung jax.devices() thread would block sys.exit
    return out["devices"]


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ann.models.flat import IndexFlatL2
    from tpu_ann.models.ivf import SearchParametersIVF, make_ivf_flat
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.evaluation import recall_k_at_k

    devices = _probe_devices()
    log(f"backend ok: {devices}")

    t0 = time.time()
    d, nb, nt, nq, k = 128, 1_000_000, 100_000, 10_000, 10
    nlist = 4096
    rs = np.random.RandomState(123)
    ncent = 1024
    cents = rs.rand(ncent, d).astype(np.float32) * 10

    def draw(n):
        which = rs.randint(ncent, size=n)
        return (cents[which] + rs.randn(n, d).astype(np.float32)).astype(
            np.float32
        )

    xb = draw(nb)
    xt = draw(nt)
    xq = draw(nq)
    log(f"data generated in {time.time()-t0:.1f}s; devices={jax.devices()}")

    # exact f32 ground truth on device
    t1 = time.time()
    gt = np.zeros((nq, k), np.int64)
    xb_dev = jnp.asarray(xb)
    for i in range(0, nq, 2000):
        _, I = D.knn(jnp.asarray(xq[i : i + 2000]), xb_dev, k,
                     db_block=131072)
        gt[i : i + 2000] = np.asarray(I)
    del xb_dev
    log(f"ground truth in {time.time()-t1:.1f}s")

    results = []
    xq_dev = jnp.asarray(xq)

    def time_device(fn, reps=3):
        """Steady-state device-resident throughput: queries live in HBM
        (the serving model), one sync at the end. The remote-tunnel
        host<->device copy of this environment would otherwise dominate
        (it is NOT part of a production TPU host's search path)."""
        out = fn()
        jax.block_until_ready(out)
        np.asarray(out[0])
        best = np.inf
        for _ in range(reps):
            ta = time.time()
            out = fn()
            np.asarray(out[0])   # force
            best = min(best, time.time() - ta)
        return best

    # --- config 1: Flat bf16 + approx top-k + f32 refine -------------------
    # each config is fenced: one config failing (e.g. a kernel-compile
    # regression on a fresh toolchain) must not take the headline down
    try:
        flat = IndexFlatL2(d)
        flat.compute_dtype = "bfloat16"
        flat.approx_topk = True
        flat.refine_factor = 2
        t2 = time.time()
        flat.add(xb)
        t_build_flat = time.time() - t2
        Dv, Iv = flat.search(xq, k)  # compile + warm (incl. transfers)
        rec = recall_k_at_k(Iv, gt, k)
        t_dev = time_device(lambda: flat.search_device(xq_dev, k))
        qps = nq / t_dev
        ta = time.time()
        flat.search(xq, k)
        t_e2e = time.time() - ta
        log(f"Flat(bf16,approx,refine2): recall@10={rec:.4f} "
            f"qps(device)={qps:.0f} qps(incl-tunnel-copies)={nq/t_e2e:.0f} "
            f"build={t_build_flat:.1f}s")
        if rec >= 0.9:
            results.append(("FlatL2 bf16+approx+refine2", rec, qps,
                            t_build_flat))
        flat.reset()
        del flat
    except Exception as e:  # noqa: BLE001
        log(f"Flat config failed: {e!r}")

    # --- config 2: IVF4096,Flat sweep --------------------------------------
    try:
        t3 = time.time()
        index = make_ivf_flat(d, nlist)
        index.approx_topk = True     # hardware approx_max_k chunk selection
        index.cp.niter = 10
        index.train(xt)
        t_train = time.time() - t3
        t4 = time.time()
        index.add(xb)
        t_add = time.time() - t4
        log(f"IVF train {t_train:.1f}s add {t_add:.1f}s "
            f"imbalance {index.imbalance_factor():.2f}")
        _, mnb = index._effective_params(None)
        for nprobe in (4, 8, 16):
            p = SearchParametersIVF(nprobe=nprobe)
            Dv, Iv = index.search(xq, k, params=p)
            rec = recall_k_at_k(Iv, gt, k)
            t_dev = time_device(
                lambda: index._search_device(xq_dev, k, nprobe, mnb))
            qps = nq / t_dev
            log(f"IVF nprobe={nprobe}: recall@10={rec:.4f} "
                f"qps(device)={qps:.0f}")
            if rec >= 0.9:
                results.append((f"IVF{nlist},Flat nprobe={nprobe}", rec,
                                qps, t_train + t_add))
    except Exception as e:  # noqa: BLE001
        log(f"IVF config failed: {e!r}")

    if not results:
        results.append(("none-reached-0.9", 0.0, 0.0, 0.0))
    name, rec, qps, tb = max(results, key=lambda r: r[2])
    baseline = 10511.0
    print(json.dumps({
        "metric": f"QPS/chip @ recall@10>=0.9, SIFT1M-scale synthetic "
                  f"(best config: {name}, recall={rec:.4f}, "
                  f"build={tb:.1f}s)",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
