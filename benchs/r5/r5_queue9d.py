"""Round-5 queue 9d — instrumented retry of the 10M fastscan tier.

queue9/9b/9c all hit ResourceExhausted on the FIRST search of
IVF65536,PQ32x4fs,RFlat at 10M (corrected DEEP10M_CALIBRATED
difficulty) even with the chip exclusive and 2048-query chunks, while
the hybrid/IVF16384 rows at the same scale pass. Static buffer math
says the compacted PQ scan is small (mnb<=64 under
max_list_scan_factor, qt=256, cb=8), so this run localizes the
allocation empirically:

  --build    gen data, build the index once, SAVE it
             (/root/data_r9/fs10m.bin) so retries never pay the
             ~27 min build again; print device memory stats.
  --search   fresh process: load the index, then a QCH ladder
             (256 -> 1024 -> 2048) with the search split into
             coarse / scan / refine phases, a real fence and a
             memory_stats() snapshot after each — the failing phase
             and the HBM level right before it land in the log.
             Then measure the three queue9c rows at the largest safe
             QCH (emit() to r5_queue9.jsonl, same sections).
  --savepath fresh process: the queue9c hybrid save->load->search
             section, which never got a clean chip.

Reference role: IVF65536,PQ32x4fs,RFlat is BASELINE config #5's 10M
form (reference demos/offline_ivf config class).
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
IDXF = "/root/data_r9/fs10m.bin"
N, D_, NQ, K = 10_000_000, 96, 10_000, 10


def emit(rec):
    rec = dict(rec, ts=time.time())
    print("RESULT " + json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def memstat(tag):
    import jax

    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        used = ms.get("bytes_in_use", ms.get("bytes_used", -1))
        peak = ms.get("peak_bytes_in_use", -1)
        log(f"mem[{tag}]: in_use={used/2**30:.2f} GiB "
            f"peak={peak/2**30:.2f} GiB")
    except Exception as e:   # noqa: BLE001
        log(f"mem[{tag}]: unavailable ({e!r})")


def gen_data():
    from tpu_ann.utils.datasets import DEEP10M_CALIBRATED, deep_surrogate

    t0 = time.time()
    allx = deep_surrogate(N + NQ, seed=11, **DEEP10M_CALIBRATED)
    log(f"hard 10M surrogate generated in {time.time()-t0:.0f}s")
    return allx[:N], allx[N:]


def do_build():
    import jax

    from tpu_ann.utils import index_io
    from tpu_ann.utils.factory import index_factory

    log("devices:", jax.devices())
    xb, _ = gen_data()
    fs = index_factory(D_, "IVF65536,PQ32x4fs,RFlat")
    fs.base_index.cp.niter = 8
    t0 = time.time()
    fs.train(xb[:2_000_000])
    fs.add(xb)
    t_build = time.time() - t0
    log(f"fastscan built in {t_build:.0f}s")
    memstat("after build")
    t0 = time.time()
    index_io.write_index(fs, IDXF)
    log(f"saved {os.path.getsize(IDXF)/2**30:.2f} GiB "
        f"in {time.time()-t0:.0f}s")
    emit({"section": "fs10m_build", "build_s": round(t_build, 1),
          "file_gib": round(os.path.getsize(IDXF) / 2**30, 2)})


def do_search():
    import jax
    import jax.numpy as jnp

    from tpu_ann.utils import index_io

    log("devices:", jax.devices())
    _, xq = gen_data()
    gt = np.load(GTF)["gt"]
    t0 = time.time()
    fs = index_io.read_index(IDXF)
    base = fs.base_index
    base._maybe_repack()
    jnp.zeros(()).block_until_ready()
    log(f"index loaded in {time.time()-t0:.0f}s; "
        f"ntotal={fs.ntotal}, nblocks={base.invlists.nblocks}, "
        f"max_nblocks/list={base.invlists.max_nblocks_per_list}")
    memstat("after load")

    kk = K * 4
    nprobe0 = 32
    ladder_ok = 0
    for QCH in (256, 1024, 2048):
        try:
            xq_dev = jnp.asarray(xq[:QCH])
            nprobe, mnb = base._effective_params(None)
            ta = time.time()
            cd, probes = base._coarse_search_device(xq_dev, nprobe0)
            np.asarray(probes[:1, :1])
            log(f"QCH={QCH} coarse ok ({time.time()-ta:.1f}s, mnb={mnb})")
            memstat(f"QCH={QCH} coarse")
            ta = time.time()
            Dv, Iv, _ = base._scan_device(
                xq_dev, probes.astype(jnp.int32), cd, kk, mnb)
            np.asarray(Iv[:1, :1])
            log(f"QCH={QCH} scan ok ({time.time()-ta:.1f}s)")
            memstat(f"QCH={QCH} scan")
            ta = time.time()
            fs._refine(xq[:QCH], np.asarray(Iv), K)
            log(f"QCH={QCH} refine ok ({time.time()-ta:.1f}s)")
            memstat(f"QCH={QCH} refine")
            ladder_ok = QCH
        except Exception as e:   # noqa: BLE001
            log(f"QCH={QCH} FAILED: {e!r}")
            emit({"section": "fs10m_ladder", "qch": QCH,
                  "error": repr(e)})
            break
    if not ladder_ok:
        # deepest fallback: drive the compacted scan directly with a
        # smaller query tile / block chunk than the model defaults
        # (qt=256, cb=8 — static args the model API does not expose)
        log("model path failed at QCH=256; trying direct scan qt=64")
        try:
            from tpu_ann.ops import ivf_scan

            xq_dev = jnp.asarray(xq[:256])
            nprobe, mnb = base._effective_params(None)
            cd, probes = base._coarse_search_device(xq_dev, nprobe0)
            Dv, Iv, _ = ivf_scan.scan_invlists_pq(
                xq_dev, probes.astype(jnp.int32),
                cd.astype(jnp.float32), base.invlists,
                base._pq_cent_dev, base._coarse_centroids(),
                kk, base.metric_type, by_residual=True,
                max_nblocks=mnb, chunk_blocks=4, qt=64, packed4=True)
            np.asarray(Iv[:1, :1])
            log("direct scan qt=64 OK")
            memstat("direct qt=64")
        except Exception as e:   # noqa: BLE001
            log(f"direct scan qt=64 also failed: {e!r}")
            emit({"section": "fs10m_ladder", "qch": "direct-qt64",
                  "error": repr(e)})
        return
    log(f"largest safe QCH = {ladder_ok}; measuring rows")

    def fs_search_chunked(xs):
        outs = [fs.search(xs[i:i + ladder_ok], K)
                for i in range(0, len(xs), ladder_ok)]
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))

    def recall_of(I):
        I = np.asarray(I)
        return float(np.mean([len(set(I[q]) & set(gt[q])) / K
                              for q in range(len(gt))]))

    for nprobe, kf in ((32, 4), (64, 4), (128, 4)):
        base.nprobe = nprobe
        fs.k_factor = kf
        try:
            fs_search_chunked(xq[:ladder_ok])
            best = float("inf")
            for _ in range(3):
                ta = time.time()
                _, Iv = fs_search_chunked(xq)
                best = min(best, time.time() - ta)
            emit({"section": "ivf65536_pq32x4fs_rflat",
                  "nprobe": nprobe, "k_factor": kf,
                  "recall@10": recall_of(Iv),
                  "qps": NQ / best, "qch": ladder_ok})
        except Exception as e:   # noqa: BLE001
            emit({"section": "ivf65536_pq32x4fs_rflat",
                  "nprobe": nprobe, "error": repr(e)})
            memstat(f"row nprobe={nprobe} failed")
            break


def do_savepath():
    import jax

    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
    from tpu_ann.utils import index_io

    log("devices:", jax.devices())
    xb, xq = gen_data()
    gt = np.load(GTF)["gt"]
    hyb = IndexIVFHNSW(D_, 16384, M=32)
    t0 = time.time()
    hyb.train(xb[:1_600_000])
    hyb.add(xb)
    t_build = time.time() - t0
    log(f"hybrid built in {t_build:.0f}s")
    path = "/tmp/r9_hyb10m.bin"
    ta = time.time()
    index_io.write_index(hyb, path)
    t_save = time.time() - ta
    sz = os.path.getsize(path) / 2**30
    hyb.reset()
    del hyb
    gc.collect()
    ta = time.time()
    h2 = index_io.read_index(path)
    h2.nprobe = 32
    _, I2 = h2.search(xq[:1000], K)
    t_load = time.time() - ta
    emit({"section": "save_path_fixed", "save_s": round(t_save, 1),
          "file_gib": round(sz, 2), "build_s": round(t_build, 1),
          "load_plus_first_search_s": round(t_load, 1),
          "reload_recall@10": float(np.mean(
              [len(set(np.asarray(I2)[q]) & set(gt[q])) / K
               for q in range(1000)]))})
    os.remove(path)


if __name__ == "__main__":
    if "--build" in sys.argv:
        do_build()
    elif "--search" in sys.argv:
        do_search()
    elif "--savepath" in sys.argv:
        do_savepath()
    else:
        print("usage: r5_queue9d.py --build | --search | --savepath")
