"""Round-5 queue 9b — remainder of the corrected-difficulty 10M sweep.

r5_queue9's hybrid sweep completed, but its save-path stage loaded the
serialized 10M index while the builder was still HBM-resident (two
~4 GB packed stores + scratch on a 16 GB chip -> ResourceExhausted),
and the dangling loaded index then OOM'd the two remaining sections.
This runs them in a fresh process with the fix:

  - save_path_fixed: build hybrid -> write_index (host-store path, no
    device download) -> reset/del the builder BEFORE read_index ->
    first search on the loaded copy.
  - ivf16384_flat and ivf65536_pq32x4fs_rflat as in queue9.

GT for the 10k queries is cached to /root/data_r9/gt10m.npz so reruns
skip the streamed exact pass. Results append to r5_queue9.jsonl.
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
os.makedirs("/root/data_r9", exist_ok=True)


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

    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.ops import distances as D
    from tpu_ann.ops.topk import merge_topk
    from tpu_ann.utils.datasets import DEEP10M_CALIBRATED, deep_surrogate

    log("devices:", jax.devices())
    n, d, nq, k = 10_000_000, 96, 10_000, 10
    t0 = time.time()
    allx = deep_surrogate(n + nq, seed=11, **DEEP10M_CALIBRATED)
    xb, xq = allx[:n], allx[n:]
    del allx
    log(f"hard 10M surrogate generated in {time.time()-t0:.0f}s")
    xq_d = jnp.asarray(xq)

    def recall_of(I, gt):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q]) & set(gt[q])) / k
                              for q in range(len(gt))]))

    if os.path.exists(GTF):
        gt = np.load(GTF)["gt"]
        log("GT loaded from cache")
    else:
        t0 = time.time()
        bd = jnp.full((nq, k), jnp.inf)
        bi = jnp.full((nq, k), -1, jnp.int32)
        for i in range(0, n, 2_000_000):
            dv, iv = D.knn(xq_d, jnp.asarray(xb[i:i + 2_000_000]), k)
            bd, bi = merge_topk(bd, bi, dv, iv + i, k, similarity=False)
        gt = np.asarray(bi)
        np.savez(GTF, gt=gt)
        del bd, bi, dv, iv
        gc.collect()
        log(f"GT {time.time()-t0:.0f}s")

    def sweep(idx, tag, modes, nprobes, build_s):
        for mode in modes:
            idx.coarse_mode = mode
            for nprobe in nprobes:
                idx.nprobe = nprobe
                try:
                    idx.search(xq[:256], k)
                    best = float("inf")
                    for _ in range(3):
                        ta = time.time()
                        _, Iv = idx.search(xq, k)
                        np.asarray(Iv)
                        best = min(best, time.time() - ta)
                    emit({"section": tag, "mode": mode, "nprobe": nprobe,
                          "recall@10": recall_of(Iv, gt),
                          "qps": nq / best, "build_s": build_s})
                except Exception as e:   # noqa: BLE001
                    emit({"section": tag, "mode": mode,
                          "nprobe": nprobe, "error": repr(e)})

    # ---- IVF16384,Flat ---------------------------------------------------
    try:
        ivf = make_ivf_flat(d, 16384)
        ivf.cp.niter = 10
        t0 = time.time()
        ivf.train(xb[:1_600_000])
        ivf.add(xb)
        t_build = time.time() - t0
        log(f"ivf-flat built in {t_build:.0f}s")
        sweep(ivf, "ivf16384_flat", ("auto",), (16, 32, 64, 128), t_build)
        ivf.reset()
        del ivf
        gc.collect()
    except Exception as e:   # noqa: BLE001
        emit({"section": "ivf16384_flat", "error": repr(e)})

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
        QCH = 2048   # bound scan buffers: 10k-query batch OOM'd in queue5

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

    log("queue9b DONE")


if __name__ == "__main__":
    main()
