"""Item 7 (real-data substitute): calibrate the SIFT surrogate's
difficulty knobs (nproto, sigma) so its IVF recall-vs-probe-ratio curve
sits on the reference's PUBLISHED SIFT1M points, then record the match.

Anchors (all exact-coarse routing, so the comparison isolates dataset
difficulty, not quantizer quality):
  - benchs/README.md:235-241 — GPU IVF16384,Flat SIFT1M nprobe=32:
    R@1 0.8957 (probe ratio 0.195%).
  - tutorial/cpp/benchmark_search_results_1761730741.csv — fork
    HNSW-IVF nlist=15625: nprobe=64 -> R@10 0.9194, nprobe=128 ->
    0.9662, nprobe=256 -> 0.9899, nprobe=512 -> 0.9970 (HNSW routing
    with efSearch=nprobe/2 — a lower bound on exact-routing recall).

Protocol: 500k database / 5k queries at nlist=7812 (same 64
points/list as the fork's 1M/15625), recall measured at probe ratios
0.195% / 0.41% / 0.82% / 1.64% / 3.3%.  Results ->
benchs/logs/r4_calibrate.jsonl; the chosen (nproto, sigma) becomes the
documented `sift_surrogate` calibration for the BENCHMARKS.md appendix.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r4_calibrate.jsonl")


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
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans
    from tpu_ann.ops import ivf_scan as IV
    from tpu_ann.utils.datasets import sift_surrogate

    log("devices:", jax.devices())
    nt, nb, nq, k = 60_000, 500_000, 5_000, 10
    nlist = 7812
    # fork anchors: (probe_ratio, published recall, which metric)
    anchors = [(32 / 16384, 0.8957, "R@1"),
               (64 / 15625, 0.9194, "R@10"),
               (128 / 15625, 0.9662, "R@10"),
               (256 / 15625, 0.9899, "R@10"),
               (512 / 15625, 0.9970, "R@10")]

    grid = [(0, 0.35),        # current default (nproto=n//64 auto)
            (4096, 0.35),
            (2048, 0.35),
            (2048, 0.50),
            (1024, 0.50),
            (1024, 0.65)]

    for nproto, sigma in grid:
        tag = f"nproto={nproto or 'auto'} sigma={sigma}"
        log("config", tag)
        allx = sift_surrogate(nt + nb + nq, seed=7, nproto=nproto,
                              sigma=sigma)
        xt = allx[:nt]
        xb = allx[nt:nt + nb]
        xq = allx[nt + nb:]
        del allx
        xb_dev = jnp.asarray(xb)
        gt = np.zeros((nq, k), np.int64)
        for i in range(0, nq, 1000):
            _, I = D.knn(jnp.asarray(xq[i:i + 1000]), xb_dev, k)
            gt[i:i + 1000] = np.asarray(I)
        cp = ClusteringParameters(niter=10, seed=3,
                                  max_points_per_centroid=96)
        cents, _ = kmeans(xt, nlist, params=cp)
        cent_dev = jnp.asarray(cents)
        _, assign = D.knn(xb_dev, cent_dev, 1)
        pil = IV.pack_invlists_device(
            xb_dev, np.arange(nb, dtype=np.int64),
            np.asarray(assign)[:, 0].astype(np.int64), nlist)
        xq_dev = jnp.asarray(xq)
        row = {"config": tag, "points": []}
        for ratio, ref, which in anchors:
            nprobe = max(1, round(ratio * nlist))
            _, probes = D.knn(xq_dev, cent_dev, nprobe)
            dd, ii, _ = IV.scan_invlists(
                xq_dev, probes.astype(jnp.int32), pil, k,
                max_nblocks=pil._max_nblocks)
            I = np.asarray(ii)
            r10 = float(np.mean([len(set(I[q]) & set(gt[q])) / k
                                 for q in range(nq)]))
            r1 = float(np.mean(I[:, 0] == gt[:, 0]))
            got = r1 if which == "R@1" else r10
            row["points"].append(
                {"nprobe": nprobe, "ratio": ratio, "ref": ref,
                 "which": which, "got": got, "r@10": r10, "r@1": r1,
                 "delta": got - ref})
            log(f"  nprobe={nprobe} ({which}) got {got:.4f} vs "
                f"ref {ref:.4f}")
        row["rmse"] = float(np.sqrt(np.mean(
            [p["delta"] ** 2 for p in row["points"]])))
        emit(row)

    log("calibrate DONE")


if __name__ == "__main__":
    main()
