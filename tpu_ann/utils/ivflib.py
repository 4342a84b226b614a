"""IVF surgery + online rebalancing — faiss `IVFlib.{h,cpp}` plus the
fork's `ClusterManager` balance/split experiments
(tutorial/python/20-hnsw-ivf-balance.py:69-186).

IVFlib: `extract_index_ivf` (unwrap PreTransform/IDMap/Refine),
`replace_ivf_quantizer` (contrib/ivf_tools.py:98), and
`SlidingIndexWindow` (streaming day-slices, IVFlib.h:85).

ClusterManager: the fork's online rebalancing of oversized IVF cells —
when a list exceeds `max_cell_size`, split it with a sub-k-means and add
the new centroids to the coarse quantizer (the HNSW quantizer grows).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..models.idmap import IndexIDMap
from ..models.ivf import IndexIVF
from ..models.refine import IndexRefine
from ..models.transforms import IndexPreTransform
from ..ops.kmeans import ClusteringParameters, kmeans


def extract_index_ivf(index) -> IndexIVF:
    """Unwrap composite layers down to the IndexIVF (IVFlib.h
    extract_index_ivf)."""
    while True:
        if isinstance(index, IndexIVF):
            return index
        if isinstance(index, (IndexPreTransform, IndexIDMap)):
            index = index.index
        elif isinstance(index, IndexRefine):
            index = index.base_index
        else:
            raise TypeError(f"no IndexIVF inside {type(index).__name__}")


def replace_ivf_quantizer(index_ivf: IndexIVF, new_quantizer) -> None:
    """Swap the coarse quantizer; reassign + repack all vectors
    (contrib/ivf_tools.py:98)."""
    if new_quantizer.ntotal != index_ivf.nlist:
        raise ValueError("new quantizer must hold exactly nlist centroids")
    index_ivf.quantizer = new_quantizer
    index_ivf.invalidate_assign()  # centroids changed; reassign everything
    if index_ivf.ntotal:
        index_ivf._repack()


class SlidingIndexWindow:
    """Streaming day-slice window over an IVF index (IVFlib.h:85):
    step(new_slice) appends today's vectors and drops the oldest slice
    once `nslice` slices are live."""

    def __init__(self, index_ivf: IndexIVF, nslice: int):
        self.index = index_ivf
        self.nslice = int(nslice)
        self._slices: List[int] = []  # chunk counts per slice

    def step(self, x: Optional[np.ndarray], ids: Optional[np.ndarray] = None
             ) -> None:
        idx = self.index
        if x is not None and len(x):
            if ids is None:
                ids = np.arange(idx.ntotal, idx.ntotal + len(x),
                                dtype=np.int64)
            idx._append_chunk(np.ascontiguousarray(x, np.float32),
                              np.asarray(ids, np.int64))
            self._slices.append(1)
        while len(self._slices) > self.nslice:
            ndrop = self._slices.pop(0)
            for _ in range(ndrop):
                dropped = idx._xb_host.pop(0)
                idx._ids_host.pop(0)
                if idx._assign_host:
                    idx._assign_host.pop(0)
                idx.ntotal -= len(dropped)
        if idx.ntotal:
            idx._repack()
        else:
            idx.invlists = None
            idx._ids_flat = None
            idx._dirty = False


class ClusterManager:
    """Online IVF cell rebalancing (fork's ClusterManager,
    20-hnsw-ivf-balance.py:69-186): split any list over `max_cell_size`
    into `split_k` sub-clusters and grow the quantizer."""

    def __init__(self, index_ivf: IndexIVF, max_cell_size: int,
                 split_k: int = 2):
        self.index = index_ivf
        self.max_cell_size = int(max_cell_size)
        self.split_k = int(split_k)

    def oversized_lists(self) -> np.ndarray:
        sizes = self.index.list_sizes
        return np.nonzero(sizes > self.max_cell_size)[0]

    def split_partition(self, list_no: int) -> int:
        """Split one list: sub-k-means over its members, replace its
        centroid with the first sub-centroid, append the rest to the
        quantizer, reassign. Returns number of new lists created."""
        from .contrib import get_invlist

        idx = self.index
        ids, vecs = get_invlist(idx, int(list_no))
        if len(vecs) < self.split_k * 2:
            return 0
        cp = ClusteringParameters(niter=8, seed=1234,
                                  min_points_per_centroid=1)
        sub_cent, _ = kmeans(np.asarray(vecs, np.float32), self.split_k, cp)
        # grow the centroid set: old centroid replaced by sub_cent[0],
        # sub_cent[1:] appended
        q = idx.quantizer
        cents = np.asarray(q.vectors if hasattr(q, "vectors")
                           else q.storage.vectors).copy()
        cents[list_no] = sub_cent[0]
        cents = np.concatenate([cents, sub_cent[1:]], axis=0)
        new_nlist = len(cents)
        # rebuild quantizer over the grown centroid set
        q.reset()
        q.add(cents)
        idx.nlist = new_nlist
        idx.invalidate_assign()  # centroid set changed
        idx._repack()
        return self.split_k - 1

    def balance(self, max_rounds: int = 8) -> int:
        """Split all oversized lists until none remain (or max_rounds).
        Returns total new lists created."""
        created = 0
        for _ in range(max_rounds):
            over = self.oversized_lists()
            if len(over) == 0:
                break
            # split the largest first (fork uses a size heap)
            sizes = self.index.list_sizes
            for l in sorted(over, key=lambda i: -sizes[i]):
                created += self.split_partition(int(l))
        return created
