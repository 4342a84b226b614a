"""IndexIVFHNSW — the fork's namesake hybrid: an IVF index whose coarse
quantizer is an HNSW graph over the centroids, with chunked-add and
save/load lifecycle management.

Mirrors the archived first-class index type
(tutorial/cpp/archive/IndexIVFHNSW.h:26-126): owns an `IndexHNSWFlat`
quantizer, exposes `set_hnsw_parameters(M, efConstruction, efSearch)`, and
disk lifecycle knobs (`index_file_path`, `add_chunk_size`, `auto_save`,
`load_from_disk`/`save_to_disk`/static `load`). Query-time stats keep the
fork's `QueryLatencyStats` split (quantization vs list scan,
faiss/IndexIVF.h:28-32).

Training note: faiss's default k-means over an HNSW quantizer rebuilds the
graph every iteration (Clustering.cpp:453 add/search per iter). Here
training always runs Lloyd's with exact (flat GEMM) assignment and builds
the HNSW graph over the final centroids once — the reference's
`quantizer_trains_alone=2` semantics (IndexIVF.cpp:96-130), same recall,
far cheaper.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import distances as D
from .hnsw import IndexHNSWFlat
from .ivf import IndexIVF, SearchParametersIVF


class IndexIVFHNSW(IndexIVF):
    """IVF-Flat with an HNSW coarse quantizer (archive/IndexIVFHNSW.h)."""

    def __init__(
        self,
        d: int,
        nlist: int,
        metric: int = D.METRIC_L2,
        M: int = 32,
        block_size: int = 128,
    ):
        quantizer = IndexHNSWFlat(d, M, metric)
        super().__init__(quantizer, d, nlist, metric, block_size)
        # disk lifecycle (archive/IndexIVFHNSW.h:32-95)
        self.index_file_path: Optional[str] = None
        self.add_chunk_size = 100000
        self.auto_save = False

    # --- parameters (archive/IndexIVFHNSW.h set_hnsw_parameters) ----------
    def set_hnsw_parameters(self, M: int = 0, efConstruction: int = 0,
                            efSearch: int = 0) -> None:
        if M:
            self.quantizer.hnsw.M = int(M)
        if efConstruction:
            self.quantizer.hnsw.efConstruction = int(efConstruction)
        if efSearch:
            self.quantizer.hnsw.efSearch = int(efSearch)

    @property
    def efSearch(self) -> int:
        return self.quantizer.hnsw.efSearch

    @efSearch.setter
    def efSearch(self, v: int) -> None:
        self.quantizer.hnsw.efSearch = int(v)

    # --- chunked add (archive .h add_chunk_size; fork's RW-reopen loop) ----
    def add(self, x) -> None:
        x = self._check_input(x)
        n0 = self.ntotal
        for i0 in range(0, len(x), self.add_chunk_size):
            chunk = x[i0 : i0 + self.add_chunk_size]
            ids = np.arange(n0 + i0, n0 + i0 + len(chunk), dtype=np.int64)
            # defer the repack: repacking after EVERY chunk is O(n^2)
            # in total rows (the fork pays the same via its
            # read-modify-write loop; we pack once at the end)
            self.add_with_ids(chunk, ids, repack=False)
        self._maybe_repack()
        if self.auto_save and self.index_file_path:
            self.save_to_disk(self.index_file_path)

    # --- persistence -------------------------------------------------------
    def save_to_disk(self, path: Optional[str] = None) -> None:
        from ..utils import index_io

        path = path or self.index_file_path
        if not path:
            raise ValueError("no index_file_path set")
        index_io.write_index(self, path)

    def load_from_disk(self, path: Optional[str] = None) -> None:
        from ..utils import index_io

        path = path or self.index_file_path
        loaded = index_io.read_index(path)
        self.__dict__.update(loaded.__dict__)

    @staticmethod
    def load(path: str) -> "IndexIVFHNSW":
        from ..utils import index_io

        idx = index_io.read_index(path)
        if not isinstance(idx, IndexIVFHNSW):
            raise TypeError(f"{path} is not an IndexIVFHNSW")
        return idx
