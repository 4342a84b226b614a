"""IndexIVFFlatPaged — single-chip IVF search over invlists BIGGER than
HBM (the fork's signature workflow: build, save, mmap-load, search
without residency — tutorial/python/190-hnsw-ivf-test.py:1404-1427,
faiss/invlists/OnDiskInvertedLists.h, impl/index_read.cpp:214-226
IO_FLAG_MMAP).

The index lives in a DIRECTORY: block-stream memmaps
(ops/ivf_scan_paged.PagedInvLists) plus the trained quantizer and meta.
HBM holds only the coarse centroids, two scan windows, and results —
independent of ntotal. Search = device coarse GEMM -> out-of-core fused
window scan (see ops/ivf_scan_paged docstring for the pipeline).

Build is STREAMING and two-pass (never holds the dataset in RAM or HBM):
  pass 1: chunked device assignment (upload chunk -> coarse GEMM ->
          download int32 assignment; list sizes from the counts);
  pass 2: host-only scatter of each chunk into the on-disk layout using
          the cached pass-1 assignment (no second upload).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import ivf_scan_paged as PS
from .base import Index, SearchStats


def _chunks(x, chunk: int) -> Iterator[Tuple[int, np.ndarray]]:
    for a in range(0, len(x), chunk):
        yield a, np.asarray(x[a:a + chunk])


class IndexIVFFlatPaged(Index):
    """IVF,Flat with host/disk-resident invlists and windowed search.

    Usage (190-series shape)::

        idx = IndexIVFFlatPaged(d, nlist, path="/big/index.paged")
        idx.train(xt)                    # in-HBM kmeans on a sample
        idx.add(x_memmap)                # streaming two-pass build
        idx.save()                       # metadata (arrays already on disk)
        ...
        idx = IndexIVFFlatPaged.load(path)    # mmap, O(MB) resident
        idx.nprobe = 32
        D_, I = idx.search(xq, 10)
    """

    def __init__(self, d: int, nlist: int, path: str,
                 metric: int = D.METRIC_L2, block_size: int = 128,
                 keep_f32: bool = True):
        super().__init__(d, metric)
        self.nlist = int(nlist)
        self.path = path
        self.block_size = int(block_size)
        self.keep_f32 = bool(keep_f32)
        self.nprobe = 8
        self.centroids: Optional[np.ndarray] = None
        self._cent_dev = None
        self.invlists: Optional[PS.PagedInvLists] = None
        self.is_trained = False
        # scan-tuning knobs (scan_invlists_paged kwargs)
        self.window_blocks = 8192
        self.tile_batch = 64
        self.refine = 4
        # Pallas interpret mode: forced on for CPU backends (no Mosaic),
        # so mmap-loaded instances work in CPU tests without flags
        self.scan_interpret = False
        # hot tier: first `resident_blocks` of the stream uploaded once
        # and served by device slices (GpuIndex.h:70+ minPagedSize role)
        self.resident_blocks = 0
        self._resident = None
        # build knobs
        self.assign_chunk = 1_000_000
        self.cp_niter = 10

    # --- training ----------------------------------------------------------
    def train(self, x) -> None:
        from ..ops.kmeans import ClusteringParameters, kmeans

        x = self._check_input(x)
        cp = ClusteringParameters()
        cp.niter = self.cp_niter
        cp.verbose = self.verbose
        cents, _ = kmeans(jnp.asarray(x), self.nlist, cp,
                          metric=self.metric_type)
        self.centroids = np.asarray(cents, np.float32)
        self._cent_dev = jnp.asarray(self.centroids)
        self.is_trained = True

    # --- streaming build ---------------------------------------------------
    def add(self, x, ids: Optional[np.ndarray] = None,
            assign: Optional[np.ndarray] = None) -> None:
        """Two-pass streaming build. `x` may be a np.memmap; rows are
        read in `assign_chunk` chunks. A paged index is built ONCE (the
        on-disk layout is sized from the full assignment); incremental
        adds go through the mutable on-disk container path
        (utils/invlists_io.py) or a rebuild."""
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        if self.invlists is not None and self.ntotal:
            raise RuntimeError(
                "IndexIVFFlatPaged.add builds once from the full set; "
                "for incremental mutation use the in-HBM IndexIVFFlat "
                "or rebuild")
        n = len(x)
        d = self.d
        t0 = time.time()
        if assign is None:
            assign = np.empty(n, np.int32)
            for a, xc in _chunks(x, self.assign_chunk):
                _, aa = D.knn(jnp.asarray(np.asarray(xc, np.float32)),
                              self._cent_dev, 1, self.metric_type)
                assign[a:a + len(xc)] = np.asarray(aa)[:, 0]
                if self.verbose:
                    print(f"[paged add] assigned {a + len(xc)}/{n} "
                          f"({time.time() - t0:.0f}s)", flush=True)
        else:
            assign = np.asarray(assign, np.int32)
        sizes = np.bincount(assign.astype(np.int64), minlength=self.nlist)
        pil = PS.create_paged_invlists(
            self.path, self.nlist, sizes, d,
            block_size=self.block_size, keep_f32=self.keep_f32)
        fill = np.zeros(self.nlist, np.int64)
        t1 = time.time()
        for a, xc in _chunks(x, self.assign_chunk):
            cid = (np.arange(a, a + len(xc), dtype=np.int64)
                   if ids is None else np.asarray(ids[a:a + len(xc)]))
            PS.paged_add_chunk(pil, fill, np.asarray(xc, np.float32),
                               cid, assign[a:a + len(xc)])
            if self.verbose:
                print(f"[paged add] packed {a + len(xc)}/{n} "
                      f"({time.time() - t1:.0f}s)", flush=True)
        self.invlists = pil
        self.ntotal = n
        self.save()

    # --- persistence -------------------------------------------------------
    def save(self) -> None:
        meta = {
            "d": self.d, "nlist": self.nlist, "metric": self.metric_type,
            "ntotal": self.ntotal, "nprobe": self.nprobe,
            "block_size": self.block_size,
        }
        with open(os.path.join(self.path, "index_meta.json"), "w") as f:
            json.dump(meta, f)
        if self.centroids is not None:
            np.save(os.path.join(self.path, "centroids.npy"),
                    self.centroids)

    @classmethod
    def load(cls, path: str) -> "IndexIVFFlatPaged":
        """mmap-load: resident cost = centroids + list metadata only."""
        with open(os.path.join(path, "index_meta.json")) as f:
            meta = json.load(f)
        idx = cls(int(meta["d"]), int(meta["nlist"]), path,
                  int(meta["metric"]), int(meta["block_size"]))
        idx.centroids = np.load(os.path.join(path, "centroids.npy"))
        idx._cent_dev = jnp.asarray(idx.centroids)
        idx.invlists = PS.open_paged_invlists(path)
        idx.ntotal = int(meta["ntotal"])
        idx.nprobe = int(meta["nprobe"])
        idx.is_trained = True
        return idx

    # --- search ------------------------------------------------------------
    def search(self, x, k: int, *, params=None):
        D_, I, _ = self.search_stats(x, k, params=params)
        return D_, I

    def search_stats(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nprobe = getattr(params, "nprobe", 0) or self.nprobe
        t0 = time.time()
        _, probes = D.knn(jnp.asarray(x), self._cent_dev,
                          min(nprobe, self.nlist), self.metric_type)
        probes = np.asarray(probes, np.int32)
        t_coarse = time.time() - t0
        stats_d: dict = {}
        t0 = time.time()
        import jax

        interpret = self.scan_interpret or jax.default_backend() == "cpu"
        if self.resident_blocks and self._resident is None:
            self._resident = PS.upload_resident(self.invlists,
                                                self.resident_blocks)
        Dv, Iv, ndis = PS.scan_invlists_paged(
            x, probes, self.invlists, k, self.metric_type,
            window_blocks=self.window_blocks, TB=self.tile_batch,
            refine=self.refine, interpret=interpret,
            resident=self._resident, stats=stats_d)
        t_scan = time.time() - t0
        st = SearchStats(
            nq=len(x), ndis=int(ndis),
            nlist_visited=int((probes >= 0).sum()),
            quantization_us=t_coarse * 1e6,
            list_scan_us=t_scan * 1e6,
            total_us=(t_coarse + t_scan) * 1e6,
        )
        st.extra = stats_d
        return Dv, Iv.astype(np.int64), st

    def reset(self) -> None:
        self.invlists = None
        self.ntotal = 0

    def reconstruct(self, key: int) -> np.ndarray:
        """Row lookup by id — linear probe over the id memmap is
        avoided: ids are positions for the default trivial-id build."""
        pil = self.invlists
        if pil.data_f32 is None:
            raise RuntimeError("reconstruct needs the f32 store")
        ids = np.asarray(pil.ids).reshape(-1)
        pos = np.nonzero(ids == key)[0]
        if not len(pos):
            raise KeyError(key)
        B = pil.block_size
        return np.asarray(
            pil.data_f32[pos[0] // B, pos[0] % B], np.float32)
