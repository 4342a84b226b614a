"""Round-5 queue 9c — clean re-run of the two queue9b sections that
hit ResourceExhausted.

Timeline evidence for the retry: queue9b's fastscan build finished at
07:09:09 and every search errored at 07:10:36, while a killed
smoke-test process that had (wrongly) grabbed the real chip was being
cleaned up — HBM contention, not a genuine 10M footprint problem (the
same config ran at 1M in queue5 and the packed codes at 10M are only
~0.2 GB). Re-measures with the chip exclusive:

  - ivf65536_pq32x4fs_rflat @ 10M hard (DEEP10M_CALIBRATED)
  - save_path_fixed (hybrid build -> save -> free -> load -> search)

GT reused from /root/data_r9/gt10m.npz. Results append to
r5_queue9.jsonl.
"""
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
LOG = "/root/repo/benchs/logs"
OUT = os.path.join(LOG, "r5_queue9.jsonl")
GTF = "/root/data_r9/gt10m.npz"


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.utils.datasets import DEEP10M_CALIBRATED, deep_surrogate

    log("devices:", jax.devices())
    n, d, nq, k = 10_000_000, 96, 10_000, 10
    t0 = time.time()
    allx = deep_surrogate(n + nq, seed=11, **DEEP10M_CALIBRATED)
    xb, xq = allx[:n], allx[n:]
    del allx
    log(f"hard 10M surrogate generated in {time.time()-t0:.0f}s")
    gt = np.load(GTF)["gt"]
    log("GT loaded from cache")

    def recall_of(I, gtv):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q]) & set(gtv[q])) / k
                              for q in range(len(gtv))]))

    # ---- IVF65536,PQ32x4fs,RFlat at 10M ---------------------------------
    try:
        from tpu_ann.utils.factory import index_factory

        fs = index_factory(d, "IVF65536,PQ32x4fs,RFlat")
        fs.base_index.cp.niter = 8
        t0 = time.time()
        fs.train(xb[:2_000_000])
        fs.add(xb)
        t_build = time.time() - t0
        log(f"fastscan built in {t_build:.0f}s")
        base = fs.base_index
        QCH = 2048   # bound scan buffers (queue5 lesson)

        def fs_search_chunked(xs):
            outs = [fs.search(xs[i:i + QCH], k)
                    for i in range(0, len(xs), QCH)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))

        for nprobe, kf in ((32, 4), (64, 4), (128, 4)):
            base.nprobe = nprobe
            fs.k_factor = kf
            try:
                fs_search_chunked(xq[:QCH])
                best = float("inf")
                for _ in range(3):
                    ta = time.time()
                    _, Iv = fs_search_chunked(xq)
                    best = min(best, time.time() - ta)
                emit({"section": "ivf65536_pq32x4fs_rflat",
                      "nprobe": nprobe, "k_factor": kf,
                      "recall@10": recall_of(Iv, gt),
                      "qps": nq / best, "build_s": t_build})
            except Exception as e:   # noqa: BLE001
                emit({"section": "ivf65536_pq32x4fs_rflat",
                      "nprobe": nprobe, "error": repr(e)})
        fs.base_index.reset()
        del fs
        gc.collect()
    except Exception as e:   # noqa: BLE001
        emit({"section": "ivf65536_pq32x4fs_rflat", "error": repr(e)})

    # ---- save path, with the builder freed before the reload ------------
    try:
        from tpu_ann.utils import index_io

        hyb = IndexIVFHNSW(d, 16384, M=32)
        t0 = time.time()
        hyb.train(xb[:1_600_000])
        hyb.add(xb)
        t_build = time.time() - t0
        log(f"hybrid (save-path stage) built in {t_build:.0f}s")
        path = "/tmp/r9_hyb10m.bin"
        ta = time.time()
        index_io.write_index(hyb, path)
        t_save = time.time() - ta
        sz = os.path.getsize(path) / 2**30
        hyb.reset()          # free HBM BEFORE loading the copy
        del hyb
        gc.collect()
        ta = time.time()
        h2 = index_io.read_index(path)
        h2.nprobe = 32
        _, I2 = h2.search(xq[:1000], k)
        t_load = time.time() - ta
        emit({"section": "save_path_fixed", "save_s": t_save,
              "file_gib": sz, "build_s": t_build,
              "load_plus_first_search_s": t_load,
              "reload_recall@10": float(np.mean(
                  [len(set(np.asarray(I2)[q]) & set(gt[q])) / k
                   for q in range(1000)]))})
        os.remove(path)
        del h2
        gc.collect()
    except Exception as e:   # noqa: BLE001
        emit({"section": "save_path_fixed", "error": repr(e)})

    log("queue9c DONE")


if __name__ == "__main__":
    main()
