"""Headline benchmark — prints ONE JSON line.

Measurement protocol mirrors the fork's benchmark_advanced.cpp: build,
sweep search configs, report QPS at the recall@10 >= 0.9 operating
point. Workload: the CALIBRATED-HARD SIFT1M surrogate
(utils/datasets.sift_surrogate **SIFT1M_CALIBRATED — integer-valued
like real SIFT fvecs, IVF recall-vs-probe-ratio fit to the fork's
published SIFT1M anchors within RMSE 0.0215; BENCHMARKS.md calibration
appendix). Round 4's bench used an easy clustered synthetic; VERDICT
r4 #3 required the driver headline to be measured at real-SIFT
difficulty, which this is.

Baseline to beat: the fork's best CPU operating point on real SIFT1M —
10 511 QPS @ recall@10 0.9194 (BASELINE.md). vs_baseline = QPS/10511.

Configs swept (fastest at recall >= 0.9 wins the headline):
  1. Fused flat Pallas kernel (BASELINE config #1): bit-exact scores on
     integer data (see ops/flat_knn_pallas + r5_queue1 exactness check),
     in-kernel reservoir top-k; recall loss = lane collisions only.
  2. IVF4096,Flat nprobe sweep (BASELINE config #2).
  3. The namesake hybrid IndexIVFHNSW nlist=15625 (fork's config).
Also measured + logged: host-path QPS incl. tunnel copies via the
dispatch-all/one-drain loop (BENCHMARKS.md round-3 host-path study).
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

    from tpu_ann.models.ivf import SearchParametersIVF, make_ivf_flat
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.datasets import SIFT1M_CALIBRATED, sift_surrogate
    from tpu_ann.utils.evaluation import recall_k_at_k

    devices = _probe_devices()
    log(f"backend ok: {devices}")

    t0 = time.time()
    d, nb, nt, nq, k = 128, 1_000_000, 100_000, 10_000, 10
    allx = sift_surrogate(nb + nt + nq, seed=123, **SIFT1M_CALIBRATED)
    xb, xt, xq = allx[:nb], allx[nb:nb + nt], allx[nb + nt:]
    del allx
    log(f"calibrated-hard surrogate generated in {time.time()-t0:.1f}s; "
        f"devices={jax.devices()}")

    # exact ground truth on device (bit-exact on this integer data)
    t1 = time.time()
    gt = np.zeros((nq, k), np.int64)
    xb_dev = jnp.asarray(xb)
    for i in range(0, nq, 2000):
        _, I = D.knn(jnp.asarray(xq[i : i + 2000]), xb_dev, k,
                     db_block=131072)
        gt[i : i + 2000] = np.asarray(I)
    log(f"ground truth in {time.time()-t1:.1f}s")

    results = []
    xq_dev = jnp.asarray(xq)

    def time_device(fn, reps=3):
        """Steady-state device-resident throughput: queries live in HBM
        (the serving model) and the timer forces completion through an
        in-jit scalar reduction (4-byte download). Downloading the
        (nq, k) results through THIS environment's ~30 MB/s tunnel
        would add ~13 ms/batch — an artifact a host-attached TPU
        (PCIe) does not pay; the host-path row below reports the
        number INCLUDING all tunnel copies."""
        @jax.jit
        def red(out):
            return jnp.sum(out[0]) + jnp.sum(out[1].astype(jnp.float32))

        np.asarray(red(fn()))
        best = np.inf
        for _ in range(reps):
            ta = time.time()
            np.asarray(red(fn()))
            best = min(best, time.time() - ta)
        return best

    # --- config 1: fused flat Pallas kernel --------------------------------
    # each config is fenced: one config failing (e.g. a kernel-compile
    # regression on a fresh toolchain) must not take the headline down
    flat_fn = None
    try:
        from tpu_ann.ops.flat_knn_pallas import (flat_knn_fused,
                                                 pack_flat_db)

        t2 = time.time()
        packed = pack_flat_db(xb_dev, D.METRIC_L2, R=8192)
        jax.block_until_ready(packed[0])
        t_build_flat = time.time() - t2
        kw = dict(Q=512, R=8192, W=2048, refine=0, sel="kernel",
                  schedule="grid")

        def flat_fn():
            return flat_knn_fused(xq_dev, xb_dev, k, D.METRIC_L2,
                                  packed=packed, **kw)

        # Timing: kernel + scalar fence jitted TOGETHER (the r5_queue3
        # protocol). time_device's separate red() call costs a second
        # dispatch round-trip + an HBM materialization of the full
        # (nq, k) outputs between the two programs — measured ~13 ms on
        # this link, 180.6k vs the same kernel's 236k (r5_queue3.jsonl
        # W=2048 row).
        @jax.jit
        def flat_once(q, db):
            dd, ii = flat_knn_fused(q, db, k, D.METRIC_L2,
                                    packed=packed, **kw)
            return jnp.sum(dd) + jnp.sum(ii.astype(jnp.float32))

        Dv, Iv = flat_fn()
        rec = recall_k_at_k(np.asarray(Iv), gt, k)
        np.asarray(flat_once(xq_dev, xb_dev))    # warm/compile
        t_dev = np.inf
        for _ in range(5):
            ta = time.time()
            np.asarray(flat_once(xq_dev, xb_dev))
            t_dev = min(t_dev, time.time() - ta)
        qps = nq / t_dev
        log(f"FusedFlat(W=2048,selK,refine0): recall@10={rec:.4f} "
            f"qps(device)={qps:.0f} pack={t_build_flat:.1f}s")
        if rec >= 0.9:
            results.append(("FusedFlat bit-exact W2048", rec, qps,
                            t_build_flat))
    except Exception as e:  # noqa: BLE001
        log(f"FusedFlat config failed: {e!r}")
        flat_fn = None

    # --- config 2: IVF4096,Flat sweep ---------------------------------------
    try:
        t3 = time.time()
        index = make_ivf_flat(d, 4096)
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
        for nprobe in (16, 32, 64):
            p = SearchParametersIVF(nprobe=nprobe)
            Dv, Iv = index.search(xq, k, params=p)
            rec = recall_k_at_k(Iv, gt, k)
            t_dev = time_device(
                lambda: index._search_device(xq_dev, k, nprobe, mnb))
            qps = nq / t_dev
            log(f"IVF4096 nprobe={nprobe}: recall@10={rec:.4f} "
                f"qps(device)={qps:.0f}")
            if rec >= 0.9:
                results.append((f"IVF4096,Flat nprobe={nprobe}", rec,
                                qps, t_train + t_add))
    except Exception as e:  # noqa: BLE001
        log(f"IVF config failed: {e!r}")

    # --- config 3: the namesake hybrid at the fork's config -----------------
    try:
        from tpu_ann.models.ivf_hnsw import IndexIVFHNSW

        t5 = time.time()
        hyb = IndexIVFHNSW(d, 15625, M=16)
        hyb.set_hnsw_parameters(efConstruction=40)
        hyb.train(xt)
        hyb.add(xb)
        t_hyb = time.time() - t5
        log(f"hybrid built in {t_hyb:.1f}s")
        _, hmnb = hyb._effective_params(None)
        for nprobe in (32, 64):
            p = SearchParametersIVF(nprobe=nprobe)
            Dv, Iv = hyb.search(xq, k, params=p)
            rec = recall_k_at_k(Iv, gt, k)
            t_dev = time_device(
                lambda: hyb._search_device(xq_dev, k, nprobe, hmnb))
            qps = nq / t_dev
            log(f"hybrid(15625) nprobe={nprobe}: recall@10={rec:.4f} "
                f"qps(device)={qps:.0f}")
            if rec >= 0.9:
                results.append((f"IVFHNSW15625 nprobe={nprobe}", rec,
                                qps, t_hyb))
    except Exception as e:  # noqa: BLE001
        log(f"hybrid config failed: {e!r}")

    # --- host path: full host->device->host loop, dispatch-all/one-drain
    # (BENCHMARKS.md round-3: 42k vs 30.6k naive; VERDICT r4 #10) ----------
    host_qps = 0.0
    try:
        if flat_fn is not None:
            from tpu_ann.ops.flat_knn_pallas import flat_knn_fused

            B = 2048     # 4+ batches -> steadier pipeline number
            kwh = dict(Q=512, R=8192, W=2048, refine=0, sel="kernel",
                       schedule="grid")
            # warm the batch shape
            packed_h = packed
            w = flat_knn_fused(jnp.asarray(xq[:B]), xb_dev, k,
                               D.METRIC_L2, packed=packed_h, **kwh)
            np.asarray(w[0])
            ta = time.time()
            outs = []
            for i0 in range(0, nq - B + 1, B):
                xu = jnp.asarray(xq[i0:i0 + B])      # async upload
                outs.append(flat_knn_fused(xu, xb_dev, k, D.METRIC_L2,
                                           packed=packed_h, **kwh))
            hostD = [np.asarray(o[0]) for o in outs]  # one drain
            n_done = B * len(outs)
            host_qps = n_done / (time.time() - ta)
            log(f"host-path dispatch-all: qps(incl-tunnel-copies)="
                f"{host_qps:.0f} over {n_done} queries")
    except Exception as e:  # noqa: BLE001
        log(f"host-path loop failed: {e!r}")

    if not results:
        results.append(("none-reached-0.9", 0.0, 0.0, 0.0))
    name, rec, qps, tb = max(results, key=lambda r: r[2])
    baseline = 10511.0
    print(json.dumps({
        "metric": f"QPS/chip @ recall@10>=0.9, calibrated-hard SIFT1M "
                  f"surrogate (best: {name}, recall={rec:.4f}, "
                  f"build={tb:.1f}s, host-path={host_qps:.0f} qps)",
        "value": round(qps, 1),
        "unit": "QPS",
        "vs_baseline": round(qps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
