"""IndexIVF / IndexIVFFlat — faiss/IndexIVF.{h,cpp} + IndexIVFFlat.{h,cpp}.

`Level1Quantizer::train_q1` (faiss/IndexIVF.cpp:66-130) trains the coarse
quantizer with k-means (niter=10, IndexIVF.cpp:55) unless
`quantizer_trains_alone` says otherwise; search runs coarse quantization then
`search_preassigned` over the probed lists (faiss/IndexIVF.cpp:303-723).

Here the coarse quantizer is any `Index` (Flat now, HNSW for the namesake
hybrid), invlists live in the block-padded device layout of
`ops.ivf_scan.PackedInvLists`, and both phases are jitted device programs.
Per-query stats mirror the fork's `QueryLatencyStats` split
(quantization_us vs list_scan_us, faiss/IndexIVF.h:28-32).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import ivf_scan
from ..ops.kmeans import ClusteringParameters, kmeans
from . import base
from .base import Index, SearchStats, Timer
from .flat import IndexFlat


@dataclasses.dataclass
class SearchParametersIVF:
    """faiss SearchParametersIVF (faiss/IndexIVF.h:77-88)."""

    nprobe: int = 0          # 0 = use index default
    max_codes: int = 0       # 0 = unlimited; cap on scanned codes per query
    sel: object = None       # IDSelector (SearchParameters.sel)


class IndexIVF(Index):
    """Base IVF index: coarse quantizer + packed invlists.

    Subclasses define the list codec (Flat stores raw vectors; PQ/SQ store
    codes). This base implements the Flat storage path directly since the
    packed layout is shared.
    """

    def __init__(
        self,
        quantizer: Index,
        d: int,
        nlist: int,
        metric: int = D.METRIC_L2,
        block_size: int = 128,
    ):
        super().__init__(d, metric)
        if quantizer.d != d:
            raise ValueError("quantizer dimension mismatch")
        self.quantizer = quantizer
        self.nlist = int(nlist)
        self.nprobe = 1
        self.block_size = int(block_size)
        self.is_trained = False
        # quantizer_trains_alone semantics (faiss/IndexIVF.h Level1Quantizer):
        # 0 = kmeans on this level; 1 = quantizer trained as-is; 2 = kmeans
        # with flat assignment then add centroids to quantizer.
        self.quantizer_trains_alone = 0
        self.cp = ClusteringParameters(niter=10)
        self.clustering_stats: list = []
        # host-side raw store for rebuilds/reconstruct (role of DirectMap +
        # ArrayInvertedLists' host copy)
        self._xb_host: list[np.ndarray] = []
        self._ids_host: list[np.ndarray] = []
        # per-chunk cached coarse assignments (None = not yet computed), so
        # a repack after chunked adds costs O(new chunk) device work, not a
        # reassignment of every stored row (InvertedLists::add_entries is
        # O(chunk) in the reference)
        self._assign_host: list[Optional[np.ndarray]] = []
        # device mirrors of _xb_host chunks: each chunk is uploaded ONCE
        # (for its assignment GEMM) and reused by the device-side pack
        # gather, so adds never move row data host->device twice (the
        # measured double-upload cost dominated the 10M add; the host
        # pack path remains the fallback after removals/updates).
        # None entries = not yet uploaded; the whole attr set to None =
        # mirrors invalidated (removal filtering changed host rows).
        self._xdev_chunks: Optional[list] = []
        # mirror HBM budget: above this the mirrors drop after a repack
        self.dev_mirror_budget = 2 << 30
        # device invlists store int32 ROW indices (positions in the packed
        # host order); user ids are int64 host-side (`_ids_flat`) and results
        # are remapped on exit. This keeps device ids at 32 bits (the GPU
        # backend's INDICES_32_BIT move) while supporting the full int64
        # id space of the reference (idx_t, faiss/Index.h).
        self._ids_flat: Optional[np.ndarray] = None
        self._ids_trivial = True
        self.invlists: Optional[ivf_scan.PackedInvLists] = None
        self.by_residual = False  # Flat path; PQ subclasses override
        # scan strategy: 'query' (query-major compacted gather; measured
        # fastest on-chip at every batch size tried), 'grouped' (list-major
        # shared block loads — wins only when step-count, not bandwidth,
        # stops being the bound), or 'auto' (currently = query)
        self.scan_mode = "auto"
        self.group_size = 32
        # per-chunk candidate selection via the TPU's approx_max_k
        # (exact merges; ~0.999 top-10 fidelity, large speedup)
        self.approx_topk = False

    # --- training ---------------------------------------------------------
    def train(self, x) -> None:
        x = self._check_input(x)
        self.train_q1(x)
        self.train_encoder(x)
        self.is_trained = True

    def train_q1(self, x: np.ndarray) -> None:
        """Level1Quantizer::train_q1 (faiss/IndexIVF.cpp:66-130)."""
        if self.quantizer_trains_alone == 1:
            if self.quantizer.ntotal != self.nlist:
                self.quantizer.train(x)
                if self.quantizer.ntotal != self.nlist:
                    raise ValueError(
                        "quantizer_trains_alone=1 requires a pre-built "
                        f"quantizer with ntotal == nlist ({self.nlist})"
                    )
            return
        centroids, self.clustering_stats = kmeans(
            x, self.nlist, self.cp, self.metric_type
        )
        self.quantizer.reset()
        self.quantizer.train(centroids)
        self.quantizer.add(centroids)

    def train_encoder(self, x: np.ndarray) -> None:
        """No-op for Flat (faiss IndexIVF::train_encoder default)."""

    # --- add ----------------------------------------------------------------
    def add(self, x) -> None:
        x = self._check_input(x)
        ids = np.arange(self.ntotal, self.ntotal + len(x), dtype=np.int64)
        self.add_with_ids(x, ids)

    def add_with_ids(self, x, ids, *, repack: bool = True) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        x = self._check_input(x)
        ids = np.asarray(ids, np.int64)
        if len(ids) != len(x):
            raise ValueError("ids / x length mismatch")
        self._append_chunk(x.copy(), ids.copy())
        if repack:
            self._repack()

    def _check_mutable(self) -> None:
        """Indexes loaded without a host vector store (e.g. coded
        merge_ondisk outputs) are search-only: a repack from the partial
        host store would silently drop the mmapped rows."""
        pending = (int(self._removed_mask.sum())
                   if self._removed_mask is not None else 0)
        if self.ntotal and \
                sum(len(c) for c in self._xb_host) - pending != self.ntotal:
            raise RuntimeError(
                "index is search-only (loaded without its host vector "
                "store); add/remove/update are unavailable")

    def _append_chunk(self, x: np.ndarray, ids: np.ndarray,
                      assign: Optional[np.ndarray] = None) -> None:
        """Append one host chunk (+ optional precomputed assignment) and
        mark the device invlists stale."""
        self._check_mutable()
        self._xb_host.append(x)
        self._ids_host.append(np.asarray(ids, np.int64))
        self._assign_host.append(
            None if assign is None else np.asarray(assign, np.int64))
        if self._xdev_chunks is not None:
            self._xdev_chunks.append(None)   # uploaded lazily at repack
        if self._removed_mask is not None:
            # keep the deferred-removal mask aligned with the host store
            self._removed_mask = np.concatenate(
                [self._removed_mask, np.zeros(len(x), bool)])
        self.ntotal += len(x)
        self._dirty = True

    def invalidate_assign(self) -> None:
        """Drop cached coarse assignments (call after the quantizer's
        centroids change, e.g. replace_ivf_quantizer / cluster splits)."""
        self._assign_host = [None] * len(self._xb_host)

    _dirty = False

    def _maybe_repack(self) -> None:
        if self._dirty:
            self._repack()

    # Coarse quantization strategy. On TPU, exact GEMM assignment over the
    # centroid table costs milliseconds up to nlist ~ 10^5 (one MXU matmul),
    # while a graph traversal is gather-bound — so 'auto' uses the exact
    # path whenever the quantizer exposes its centroids and nlist is below
    # the crossover, and the quantizer's own search (e.g. the HNSW beam of
    # the namesake hybrid) above it. 'quantizer' forces faiss-faithful
    # behavior; 'flat' forces exact.
    coarse_mode = "auto"
    _COARSE_EXACT_MAX_NLIST = 262144

    def _centroid_table(self):
        q = self.quantizer
        vecs = getattr(q, "vectors", None)
        if vecs is None and hasattr(q, "storage"):
            vecs = q.storage.vectors
        return vecs

    def _use_exact_coarse(self) -> bool:
        if self.coarse_mode == "quantizer":
            return False
        if self.coarse_mode == "flat":
            return True
        return (self._centroid_table() is not None
                and self.nlist <= self._COARSE_EXACT_MAX_NLIST)

    # graph-quantizer beam coupling: a beam of ef candidates can rank at
    # most ~ef lists, so asking an HNSW quantizer for nprobe lists with
    # efSearch < nprobe silently starves recall. The reference couples
    # them the same way (tutorial/python/190-…test.py:1404-1427 sweeps
    # quantizer efSearch alongside nprobe); factor 2 recovers >=0.99
    # coarse fidelity on the surrogate without manual tuning.
    coarse_ef_factor = 2

    def _coarse_search_device(self, xq_dev, nprobe: int):
        if self._use_exact_coarse():
            return D.knn(xq_dev, self._centroid_table(), nprobe,
                         self.metric_type)
        q = self.quantizer
        if hasattr(q, "hnsw"):
            from .hnsw import SearchParametersHNSW

            ef = max(q.hnsw.efSearch, self.coarse_ef_factor * nprobe)
            return q.search_device(xq_dev, nprobe,
                                   params=SearchParametersHNSW(efSearch=ef))
        if hasattr(q, "search_device"):
            return q.search_device(xq_dev, nprobe)
        # host-API quantizer (e.g. an AdditiveCoarseQuantizer whose
        # "database" is virtual): round-trip through its search()
        import jax.numpy as _jnp

        cd, probes = q.search(np.asarray(xq_dev), nprobe)
        return _jnp.asarray(cd), _jnp.asarray(probes, _jnp.int32)

    def _assign(self, x: np.ndarray) -> np.ndarray:
        if self._use_exact_coarse():
            import jax.numpy as _jnp

            _, a = D.knn(_jnp.asarray(x), self._centroid_table(), 1,
                         self.metric_type)
            return np.asarray(a)[:, 0]
        _, a = self.quantizer.search(x, 1)
        return np.asarray(a)[:, 0]

    def _repack(self) -> None:
        """Rebuild packed device invlists from the host store.

        Coarse assignments are computed only for chunks without a cached
        one, so a repack after a chunked add costs O(new rows) device work
        (the reference's add path is likewise O(chunk),
        InvertedLists::add_entries). The host-side counting sort over all
        rows is native memcpy-bound."""
        if not self._xb_host:
            self.invlists = None
            self._ids_flat = None
            self._ids_trivial = True
            self._dirty = False
            return
        # backfill missing per-chunk assignments (device GEMM per new
        # chunk); each chunk uploads ONCE and the device mirror feeds the
        # pack gather below (no second data upload)
        while len(self._assign_host) < len(self._xb_host):
            self._assign_host.append(None)
        if self._xdev_chunks is not None:
            while len(self._xdev_chunks) < len(self._xb_host):
                self._xdev_chunks.append(None)
        for j, a in enumerate(self._assign_host):
            dev = None
            if self._xdev_chunks is not None:
                dev = self._xdev_chunks[j]
                if dev is None:
                    import jax.numpy as _jnp

                    dev = _jnp.asarray(self._xb_host[j])
                    self._xdev_chunks[j] = dev
            if a is None:
                if dev is not None and self._use_exact_coarse():
                    _, aa = D.knn(dev, self._centroid_table(), 1,
                                  self.metric_type)
                    self._assign_host[j] = np.asarray(
                        aa, np.int64)[:, 0].copy()
                else:
                    self._assign_host[j] = np.asarray(
                        self._assign(self._xb_host[j]), np.int64)
        # apply deferred incremental removals to the host store
        if self._removed_mask is not None and self._removed_mask.any():
            mask = self._removed_mask
            off = 0
            nx, ni, na = [], [], []
            for xs, ids_c, a in zip(self._xb_host, self._ids_host,
                                    self._assign_host):
                keep = ~mask[off:off + len(xs)]
                off += len(xs)
                if keep.all():
                    nx.append(xs)
                    ni.append(ids_c)
                    na.append(a)
                elif keep.any():
                    nx.append(xs[keep])
                    ni.append(ids_c[keep])
                    na.append(None if a is None else a[keep])
            self._xb_host, self._ids_host, self._assign_host = nx, ni, na
            # host rows changed shape: device mirrors are stale
            self._xdev_chunks = [None] * len(nx)
            if not self._xb_host:
                self._removed_mask = None
                self._repack()
                return
        self._removed_mask = None
        ids = np.concatenate(self._ids_host, axis=0)
        assign = np.concatenate(self._assign_host)
        self._ids_flat = ids
        n = len(ids)
        self._ids_trivial = bool(
            n == 0 or (ids[0] == 0 and ids[-1] == n - 1
                       and np.array_equal(ids, np.arange(n, dtype=np.int64))))
        rows = np.arange(n, dtype=np.int64)
        use_dev = (
            type(self)._pack is IndexIVF._pack     # Flat storage only
            and self._xdev_chunks is not None
            and len(self._xdev_chunks) == len(self._xb_host)
            and all(c is not None for c in self._xdev_chunks)
        )
        if use_dev:
            # the chunk list goes straight to the pack (per-chunk masked
            # gathers) — concatenating mirrors would double peak HBM.
            # Mirrors above the HBM budget are handed over: the pack
            # frees them the moment the gathers are done, BEFORE the
            # packed buffer is materialized (a later chunked add
            # re-uploads; one-shot big adds — the case that matters at
            # 10M+ — never pay the double residency)
            release = None
            if (sum(c.nbytes for c in self._xdev_chunks)
                    > self.dev_mirror_budget):
                mirrors = self._xdev_chunks

                def release():
                    for j in range(len(mirrors)):
                        mirrors[j] = None

            self.invlists = ivf_scan.pack_invlists_device(
                list(self._xdev_chunks), rows, assign, self.nlist,
                self.block_size, release=release)
        else:
            x = np.concatenate(self._xb_host, axis=0)
            self.invlists = self._pack(x, rows, assign)
        self._build_direct_map(assign)
        self._dirty = False

    # --- DirectMap (invlists/DirectMap.h): row -> packed slot -------------
    # Built at repack time from the assignment; gives O(affected) device
    # mutation instead of a full repack (the reference's DirectMap update/
    # remove path edits only the touched list entries).
    _row_slot: Optional[np.ndarray] = None     # row -> flat slot in packed
    _row_list: Optional[np.ndarray] = None     # row -> owning list
    _list_fill: Optional[np.ndarray] = None    # list -> used slots
    _id_order: Optional[np.ndarray] = None     # argsort(_ids_flat)
    _removed_mask: Optional[np.ndarray] = None  # row -> removed (deferred)
    _holes = 0

    def _build_direct_map(self, assign: np.ndarray) -> None:
        il = self.invlists
        if il is None:
            self._row_slot = self._row_list = self._list_fill = None
            self._id_order = None
            self._holes = 0
            return
        n = len(assign)
        B = self.block_size
        starts = np.asarray(il.list_block_start, np.int64)
        sizes = np.bincount(assign, minlength=self.nlist)
        order = np.argsort(assign, kind="stable")
        src_starts = np.zeros(self.nlist + 1, np.int64)
        np.cumsum(sizes, out=src_starts[1:])
        rank = np.arange(n, dtype=np.int64) - src_starts[assign[order]]
        slot_sorted = starts[assign[order]] * B + rank
        self._row_slot = np.empty(n, np.int64)
        self._row_slot[order] = slot_sorted
        self._row_list = np.asarray(assign, np.int64).copy()
        self._list_fill = sizes.astype(np.int64)
        self._id_order = np.argsort(self._ids_flat, kind="stable")
        self._removed_mask = np.zeros(n, bool)
        self._holes = 0

    def _rows_of_ids(self, ids: np.ndarray) -> np.ndarray:
        """User ids -> packed rows via the sorted-id index (missing -> -1).
        O(affected * log n): the DirectMap hash lookup, vectorized."""
        ids = np.asarray(ids, np.int64)
        if self._ids_trivial:
            rows = ids.copy()
            rows[(rows < 0) | (rows >= len(self._ids_flat))] = -1
            return rows
        so = self._id_order
        sids = self._ids_flat[so]
        pos = np.searchsorted(sids, ids)
        pos_c = np.minimum(pos, len(sids) - 1)
        hit = (pos < len(sids)) & (sids[pos_c] == ids)
        rows = np.where(hit, so[pos_c], -1)
        return rows

    def _chunk_positions(self, rows: np.ndarray):
        """rows -> (chunk index, offset) in the host store."""
        lens = np.asarray([len(c) for c in self._xb_host], np.int64)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        cj = np.searchsorted(bounds, rows, side="right") - 1
        return cj, rows - bounds[cj]

    def _incremental_capable(self) -> bool:
        return (self._row_slot is not None and self.invlists is not None
                and not self._dirty)

    def _map_ids(self, I) -> np.ndarray:
        """Map device row indices back to user int64 ids (-1 preserved)."""
        I = np.asarray(I, np.int64)
        if self._ids_trivial or self._ids_flat is None:
            return I
        safe = np.clip(I, 0, len(self._ids_flat) - 1)
        out = self._ids_flat[safe]
        out[I < 0] = -1
        return out

    def _pack(self, x, ids, assign) -> ivf_scan.PackedInvLists:
        return ivf_scan.pack_invlists(
            x, ids, assign, self.nlist, self.block_size
        )

    # --- search -------------------------------------------------------------
    # index-level scan budget (IndexIVF.h:79 max_codes; 0 = unlimited);
    # per-call SearchParametersIVF.max_codes overrides
    max_codes = 0
    # per-LIST scan budget as a multiple of the average list length
    # (0 = unlimited). With a badly imbalanced quantizer (train set far
    # below 39 points/centroid) the longest list can reach hundreds of
    # blocks; the compacted scan then runs that many SEQUENTIAL chunk
    # steps per probe, which on this environment outlives the TPU
    # watchdog. 16x the average truncates only pathological lists
    # (the reference handles the same pathology with max_codes budgets
    # and ClusterManager splits).
    max_list_scan_factor = 16

    def _default_capped_mnb(self) -> int:
        """max blocks scanned per list under the watchdog-safety cap
        (no explicit max_codes). Shared by _effective_params and the
        fused-dispatch gate so they can never disagree."""
        mnb = self.invlists.max_nblocks_per_list
        if self.max_list_scan_factor:
            avg_nb = max(1, -(-self.ntotal // (self.nlist
                                               * self.block_size)))
            mnb = min(mnb, max(64, self.max_list_scan_factor * avg_nb))
        return mnb

    def _effective_params(self, params):
        nprobe = self.nprobe
        max_codes = self.max_codes
        if params is not None:
            if params.nprobe:
                nprobe = params.nprobe
            if params.max_codes:
                max_codes = params.max_codes
        nprobe = min(max(int(nprobe), 1), self.nlist)
        mnb = self._default_capped_mnb()
        if max_codes:
            mnb = min(mnb, max(1, -(-int(max_codes) // self.block_size)))
        return nprobe, mnb

    def _sel_mask(self, params) -> Optional[jnp.ndarray]:
        """Lower params.sel (IDSelector) to a device bitmap over stored
        ROWS (impl/IDSelector.h -> one gather in the scan kernel): the
        user-id bitmap is gathered at each row's id on host, so the device
        filter indexes by the same row ids the invlists store."""
        sel = getattr(params, "sel", None) if params is not None else None
        if sel is None:
            return None
        ids = self._ids_flat
        if ids is None or not len(ids):
            return None
        return jnp.asarray(sel.member_array(ids).astype(np.uint8))

    def coarse_assign(self, x, nprobe: int) -> np.ndarray:
        """(nq, nprobe) probed list ids for each query — the coarse phase
        alone (quantizer assign, faiss Index::assign / Level1Quantizer).
        Used by the analyzers and by search_preassigned callers."""
        x = self._check_input(x)
        _, probes = self._coarse_search_device(jnp.asarray(x), nprobe)
        return np.asarray(probes)

    def list_of_ids(self, ids) -> np.ndarray:
        """The inverted list each stored id lives in (-1 if absent) —
        the DirectMap id->list lookup (invlists/DirectMap.h)."""
        self._maybe_repack()
        if self.invlists is None or self._row_list is None:
            return np.full(len(np.atleast_1d(ids)), -1, np.int64)
        rows = self._rows_of_ids(np.atleast_1d(ids))
        out = np.where(rows >= 0, self._row_list[np.maximum(rows, 0)], -1)
        removed = self._removed_mask[np.maximum(rows, 0)] & (rows >= 0)
        return np.where(removed, -1, out)

# query-batch paging: scan scratch scales with nq * nprobe * list
    # sizes, and one 10k-query batch OOM'd a 16 GB chip at 10M scale
    # (r5_queue5 fastscan rows). 0 = off; set to page big batches
    # transparently, the role of the reference's GpuIndex auto-paging
    # (gpu/GpuIndex.h:70+ minPagedSize).
    search_chunk = 0

    def search(self, x, k: int, *, params: Optional[SearchParametersIVF] = None):
        """Fast path: both phases stay on device, one sync at the end
        (unlike search_stats, which syncs between phases to time them)."""
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        if self.search_chunk and len(x) > self.search_chunk:
            outs = [self.search(x[i:i + self.search_chunk], k,
                                params=params)
                    for i in range(0, len(x), self.search_chunk)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        nprobe, mnb = self._effective_params(params)
        xq_dev = jnp.asarray(x)
        Dv, Iv = self._search_device(xq_dev, k, nprobe, mnb,
                                     id_mask=self._sel_mask(params))
        return np.asarray(Dv), self._map_ids(Iv)

    def search_device(self, xq_dev, k: int):
        """Device-in/device-out search with the index's current settings —
        results stay un-materialized so callers can pipeline batches
        (big_batch_search's prepare/compute/finalize overlap). Returned
        Iv holds device row indices; map with `_map_ids` after
        materializing."""
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        nprobe, mnb = self._effective_params(None)
        return self._search_device(xq_dev, k, nprobe, mnb)

    def _use_fused(self, nq: int, nprobe: int, mnb: int, id_mask,
                   invlists=None) -> bool:
        """Dispatch to the Pallas list-major fused scan
        (ops/ivf_scan_pallas.py) when it applies: raw-vector invlists, L2,
        no search-time selector, no max_codes cap, and a batch large
        enough to amortize the pair sort. Measured on v5e (SIFT1M,
        IVF4096): 2.4-3.1x the query-major scan at nprobe 16-64.

        `invlists` defaults to the index's own; coded subclasses pass
        their decoded cache instead."""
        if self.scan_mode == "fused":
            return True
        if self.scan_mode != "auto":
            return False
        import jax as _jax

        if invlists is None:
            invlists = self.invlists
        # the fused kernel streams whole lists (CB blocks at a time), so
        # the watchdog-safety cap doesn't apply to it; only an EXPLICIT
        # max_codes budget (mnb below the default-capped value) forces
        # the truncating query-major scan
        default_mnb = self._default_capped_mnb()
        return (
            id_mask is None
            and hasattr(invlists, "data")
            and mnb >= default_mnb
            and nq * nprobe >= 4096
            and _jax.default_backend() not in ("cpu",)  # Mosaic target only
        )

    def _use_grouped(self, nq: int, nprobe: int, id_mask) -> bool:
        if id_mask is not None or self.scan_mode in ("query", "auto"):
            # measured on v5e: the query-major compacted scan beats the
            # grouped scan at every (nq, nprobe) tried — both are bound by
            # sequential chunk steps, and grouped adds scatter overhead
            return False
        return self.scan_mode == "grouped"

    def _search_device(self, xq_dev, k: int, nprobe: int, mnb: int,
                       id_mask=None):
        """coarse quantization + invlist scan, all on device."""
        _, probes = self._coarse_search_device(xq_dev, nprobe)
        probes = probes.astype(jnp.int32)
        if self._use_fused(xq_dev.shape[0], nprobe, mnb, id_mask):
            from ..ops.ivf_scan_pallas import scan_invlists_fused

            try:
                Dv, Iv, _ = scan_invlists_fused(
                    xq_dev, probes, self.invlists, k, self.metric_type,
                )
                return Dv, Iv
            except Exception:
                if self.scan_mode == "fused":
                    raise     # explicit request: surface the error
                # auto mode: fall back to the query-major scan (e.g.
                # Mosaic constraint violations on exotic shapes)
        if self._use_grouped(xq_dev.shape[0], nprobe, id_mask):
            Dv, Iv, _ = ivf_scan.scan_invlists_grouped(
                xq_dev, probes, self.invlists, k, self.metric_type,
                max_nblocks=mnb, group=self.group_size,
                approx=self.approx_topk,
            )
        else:
            Dv, Iv, _ = ivf_scan.scan_invlists(
                xq_dev, probes, self.invlists, k,
                self.metric_type, max_nblocks=mnb, id_mask=id_mask,
                approx=self.approx_topk,
            )
        return Dv, Iv

    def search_stats(self, x, k: int, *,
                     params: Optional[SearchParametersIVF] = None):
        """search + QueryLatencyStats split (fork's IndexIVF::search_stats,
        faiss/IndexIVF.cpp:727-860). Syncs between phases for the timing
        split; use search() for throughput."""
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        nprobe, mnb = self._effective_params(params)

        xq_dev = jnp.asarray(x)
        with Timer() as t_q:
            cd, probes = self._coarse_search_device(xq_dev, nprobe)
            probes = probes.astype(jnp.int32)
            # scalar readback: jax.block_until_ready does not
            # reliably block on the axon platform (verify-skill
            # caveat), which mis-attributed the phase split
            # (r5_queue4); a 4-byte download is a real fence
            np.asarray(probes[:1, :1])
        with Timer() as t_s:
            # same dispatch as search() so the timing split reflects the
            # production scan (fused kernel on Mosaic backends)
            fused_done = False
            if self._use_fused(xq_dev.shape[0], nprobe, mnb, None):
                from ..ops.ivf_scan_pallas import scan_invlists_fused

                try:
                    Dv, Iv, ndis = scan_invlists_fused(
                        xq_dev, probes, self.invlists, k,
                        self.metric_type)
                    fused_done = True
                except Exception:
                    if self.scan_mode == "fused":
                        raise
            if not fused_done:
                Dv, Iv, ndis = ivf_scan.scan_invlists(
                    xq_dev,
                    probes,
                    self.invlists,
                    k,
                    self.metric_type,
                    max_nblocks=mnb,
                )
            Dv = np.asarray(Dv)
            Iv = self._map_ids(Iv)
        stats = SearchStats(
            nq=len(x),
            total_us=t_q.us + t_s.us,
            quantization_us=t_q.us,
            list_scan_us=t_s.us,
            ndis=int(ndis),
            nlist_visited=len(x) * nprobe,
        )
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats

    def _list_sizes_host(self) -> np.ndarray:
        """(nlist,) exact per-list valid-entry counts (the reference's
        InvertedLists::list_size), derived from the packed ids; cached
        per invlists generation."""
        if getattr(self, "_lsizes_for", None) is self.invlists and \
                self._lsizes is not None:
            return self._lsizes
        ids = np.asarray(self.invlists.ids)
        per_block = (ids >= 0).sum(1)
        start = np.asarray(self.invlists.list_block_start)
        nb = np.asarray(self.invlists.list_nblocks)
        csum = np.concatenate([[0], np.cumsum(per_block)])
        self._lsizes = (csum[start + nb] - csum[start]).astype(np.int64)
        self._lsizes_for = self.invlists
        return self._lsizes

    _lsizes = None
    _lsizes_for = None

    def search_stats_per_query(self, x, k: int, *,
                               params: Optional[SearchParametersIVF] = None):
        """search + PER-QUERY QueryLatencyStats — the fork's central C++
        addition (faiss/IndexIVF.h:28-32; arrays filled per query at
        faiss/IndexIVF.cpp:1064-1105, consumed by the per-query P99.9
        analyses of tutorial/python/192-hnsw-ivf-latency.py:338-392).

        Each query runs batch-1 with a device sync between the coarse
        and scan phases, so the arrays are true per-query wall-clock
        (the fork's 192 harness loops queries the same way; its
        quantization_us is merely batch-amortized, IndexIVF.cpp:761-771
        — this is strictly more faithful). ndis is the exact scanned
        entry count of the probe set. Throughput callers should use
        search(); this is the tail-latency surface."""
        from .base import QueryLatencyStats

        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        nprobe, mnb = self._effective_params(params)
        nq = len(x)
        xq_dev = jnp.asarray(x)
        lsizes = self._list_sizes_host()
        q_us = np.zeros(nq, np.float64)
        s_us = np.zeros(nq, np.float64)
        ndis = np.zeros(nq, np.int64)
        outs = []
        # warm/compile the batch-1 shapes outside the timed loop
        cd, probes = self._coarse_search_device(xq_dev[:1], nprobe)
        np.asarray(self._scan_probes_device(
            xq_dev[:1], probes.astype(jnp.int32), cd, k, mnb)[0])
        for q in range(nq):
            with Timer() as t_q:
                cd, probes = self._coarse_search_device(
                    xq_dev[q:q + 1], nprobe)
                probes_h = np.asarray(probes, np.int64)  # forces sync
            with Timer() as t_s:
                Dq, Iq = self._scan_probes_device(
                    xq_dev[q:q + 1], jnp.asarray(probes_h, jnp.int32),
                    cd, k, mnb)
                Dq = np.asarray(Dq)
            outs.append((Dq, Iq))
            q_us[q] = t_q.us
            s_us[q] = t_s.us
            valid = probes_h[(probes_h >= 0) & (probes_h < self.nlist)]
            ndis[q] = int(lsizes[valid].sum())
        Dv = np.concatenate([o[0] for o in outs])
        Iv = self._map_ids(np.concatenate(
            [np.asarray(o[1]) for o in outs]))
        pq = QueryLatencyStats(total_us=q_us + s_us, quantization_us=q_us,
                               list_scan_us=s_us, ndis=ndis)
        stats = SearchStats(
            nq=nq, total_us=float((q_us + s_us).sum()),
            quantization_us=float(q_us.sum()),
            list_scan_us=float(s_us.sum()), ndis=int(ndis.sum()),
            nlist_visited=nq * nprobe, per_query=pq)
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats

    def range_search(self, x, radius: float):
        """faiss IndexIVF::range_search over the probed lists. Uses the
        same coarse-quantization path as search() so both report identical
        probes for a given index configuration."""
        from ..ops.range_search import range_search_ivf

        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        nprobe, mnb = self._effective_params(None)
        _, probes = self._coarse_search_device(jnp.asarray(x), nprobe)
        res = range_search_ivf(
            x, np.asarray(probes, np.int32), self.invlists, radius,
            self.metric_type, max_nblocks=mnb,
        )
        return res.lims, res.distances, self._map_ids(res.labels)

    def _scan_probes_device(self, xq_dev, probes, cd, k: int, mnb: int,
                            id_mask=None):
        """Phase-2 scan with given probes — the codec-dispatch point
        (IVFFlat raw scan here; PQ/SQ/hash subclasses override)."""
        Dv, Iv, _ = ivf_scan.scan_invlists(
            xq_dev, probes, self.invlists, k, self.metric_type,
            max_nblocks=mnb, id_mask=id_mask, approx=self.approx_topk,
        )
        return Dv, Iv

    def search_preassigned(self, x, k: int, probes: np.ndarray):
        """Scan given precomputed coarse assignment
        (faiss/IndexIVF.cpp:399, contrib/ivf_tools.search_preassigned)."""
        Dv, Iv, _ = self.search_preassigned_stats(x, k, probes)
        return Dv, Iv

    def search_preassigned_stats(self, x, k: int, probes: np.ndarray):
        """search_preassigned + QueryLatencyStats (the fork's
        IndexIVF::search_preassigned_stats, faiss/IndexIVF.h:306-317,
        IndexIVF.cpp:862-1110 — quantization phase is external, so the
        split reports scan time only)."""
        self._maybe_repack()
        if self.invlists is None:
            raise RuntimeError("empty index")
        x = self._check_input(x)
        mnb = self._default_capped_mnb()
        probes_dev = jnp.asarray(probes, dtype=jnp.int32)
        cd = jnp.zeros(probes_dev.shape, jnp.float32)
        with Timer() as t_s:
            Dv, Iv = self._scan_probes_device(jnp.asarray(x), probes_dev,
                                              cd, k, mnb)
            Dv = np.asarray(Dv)
            Iv = self._map_ids(Iv)
        stats = SearchStats(
            nq=len(x), total_us=t_s.us, quantization_us=0,
            list_scan_us=t_s.us,
            nlist_visited=len(x) * probes_dev.shape[1])
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats

    def merge_from(self, other, add_id: int = 0) -> None:
        """List-level merge (IndexIVF::merge_from): moves other's chunks
        into self without re-encoding; both must share the trained
        quantizer. add_id is unsupported at the list level (the
        reference applies it to flat codes only) — re-add with offset
        ids instead."""
        if add_id:
            raise ValueError("IndexIVF.merge_from: add_id unsupported; "
                             "use add_with_ids with offset ids")
        from ..utils.contrib import merge_indexes

        merge_indexes(self, [other])
        other.reset()

    def remove_ids(self, sel) -> int:
        """Remove stored ids matching an IDSelector
        (IndexIVF::remove_ids via DirectMap). O(affected) device work:
        affected slots get their id set to -1 (scans mask them); the host
        store is compacted lazily at the next full repack. Holes above
        25% of ntotal trigger a compaction (the amortized contract of the
        reference's DirectMap + occasional rebuilds)."""
        self._check_mutable()
        self._maybe_repack()
        if self.invlists is None:
            return 0
        # explicit-id selectors get the O(affected log n) DirectMap lookup;
        # predicate selectors fall back to one vectorized host scan
        sel_ids = getattr(sel, "ids", None)
        if sel_ids is not None and self._incremental_capable():
            cand = np.unique(self._rows_of_ids(np.asarray(sel_ids,
                                                          np.int64)))
            cand = cand[cand >= 0]
            if self._removed_mask is not None:
                cand = cand[~self._removed_mask[cand]]
            rows = cand
        else:
            removed_mask_ids = sel.member_array(self._ids_flat)
            if self._removed_mask is not None:
                removed_mask_ids &= ~self._removed_mask
            rows = np.nonzero(removed_mask_ids)[0]
        removed = len(rows)
        if removed == 0:
            return 0
        if not self._incremental_capable():
            # legacy fallback: full host filter + repack
            self._removed_mask = removed_mask_ids
            self.ntotal -= removed
            if self.ntotal:
                self._repack()
            else:
                self._xb_host, self._ids_host = [], []
                self._assign_host = []
                self.invlists = None
                self._ids_flat = None
                self._dirty = False
            return removed
        slots = self._row_slot[rows]
        il = self.invlists
        flat_ids = il.ids.reshape(-1)
        flat_ids = flat_ids.at[jnp.asarray(slots)].set(-1)
        il.ids = flat_ids.reshape(il.ids.shape)
        dl = getattr(self, "_decoded", None)
        if dl is not None:
            dl.ids = il.ids                  # cache shares the id plane
        self._removed_mask[rows] = True
        self._holes += removed
        self.ntotal -= removed
        if self.ntotal == 0:
            self.reset()
        elif self._holes > max(1024, self.ntotal // 4):
            self._dirty = True               # amortized compaction
        return removed

    def update_vectors(self, ids, x) -> None:
        """Replace vectors in place (IndexIVF::update_vectors): same ids,
        new data, reassigned to their new lists.

        Flat storage takes the DirectMap path (O(affected) device work):
        same-list updates overwrite their slot; cross-list moves append
        into the target list's block padding when it has room. Only when
        a target list's blocks are full does the index fall back to a
        deferred full repack (the std::vector amortization). Coded
        storages (PQ/SQ) re-encode via the repack path."""
        self._check_mutable()
        self._maybe_repack()
        x = self._check_input(x)
        ids = np.asarray(ids, np.int64)

        # host store update (shared by both paths)
        rows = self._rows_of_ids(ids)
        ok = rows >= 0
        if not ok.any():
            return
        rows_u = rows[ok]
        x_u = x[ok]
        cj, off = self._chunk_positions(rows_u)
        for j in np.unique(cj):
            m = cj == j
            self._xb_host[j][off[m]] = x_u[m]
            if self._xdev_chunks is not None and j < len(self._xdev_chunks):
                self._xdev_chunks[j] = None     # mirror stale

        flat = self._incremental_capable() and hasattr(self.invlists,
                                                       "data")
        if not flat:
            for j in np.unique(cj):
                self._assign_host[j] = None
            self._repack()
            return

        new_assign = np.asarray(self._assign(x_u), np.int64)
        il = self.invlists
        B = self.block_size
        old_list = self._row_list[rows_u]
        same = new_assign == old_list

        # cross-list moves: append into target-list padding when it fits
        cross = np.nonzero(~same)[0]
        dst_slot = np.empty(len(rows_u), np.int64)
        dst_slot[same] = self._row_slot[rows_u[same]]
        need_repack = False
        starts = np.asarray(il.list_block_start, np.int64)
        nblk = np.asarray(il.list_nblocks, np.int64)
        for i in cross:
            lst = new_assign[i]
            if self._list_fill[lst] < nblk[lst] * B:
                dst_slot[i] = starts[lst] * B + self._list_fill[lst]
                self._list_fill[lst] += 1
                # the source slot becomes a mid-list hole (fill tracks the
                # append end, so it cannot be handed out again)
                self._holes += 1
            else:
                need_repack = True
                break
        if need_repack:
            for j in np.unique(cj):
                self._assign_host[j] = None
            self._repack()
            return

        xd = jnp.asarray(x_u)
        d = xd.shape[1]
        norms = jnp.sum(xd.astype(jnp.float32) ** 2, axis=1)
        sl = jnp.asarray(dst_slot)
        il.data = il.data.reshape(-1, d).at[sl].set(xd).reshape(
            il.data.shape)
        il.norms = il.norms.reshape(-1).at[sl].set(norms).reshape(
            il.norms.shape)
        flat_ids = il.ids.reshape(-1)
        if len(cross):
            old_slots = jnp.asarray(self._row_slot[rows_u[cross]])
            flat_ids = flat_ids.at[old_slots].set(-1)
        flat_ids = flat_ids.at[sl].set(jnp.asarray(rows_u, jnp.int32))
        il.ids = flat_ids.reshape(il.ids.shape)
        # bookkeeping + cached per-chunk assignments stay correct
        self._row_slot[rows_u] = dst_slot
        self._row_list[rows_u] = new_assign
        for j in np.unique(cj):
            m = cj == j
            a = self._assign_host[j]
            if a is not None:
                a[off[m]] = new_assign[m]

    # --- misc ----------------------------------------------------------------
    def reset(self) -> None:
        self._xb_host, self._ids_host, self._assign_host = [], [], []
        self._xdev_chunks = []
        self.invlists = None
        self._ids_flat = None
        self._ids_trivial = True
        self._dirty = False
        self.ntotal = 0
        self._row_slot = self._row_list = self._list_fill = None
        self._id_order = None
        self._removed_mask = None
        self._holes = 0

    def reconstruct(self, key: int) -> np.ndarray:
        self._maybe_repack()
        for xs, ids in zip(self._xb_host, self._ids_host):
            hit = np.nonzero(ids == key)[0]
            if hit.size:
                return xs[hit[0]]
        raise KeyError(key)

    # --- standalone codec (faiss/IndexIVF.cpp sa_encode/sa_decode:
    #     codes = encode_listno(list id, little-endian coarse_code_size
    #     bytes) + the subclass's list payload) --------------------------
    def coarse_code_size(self) -> int:
        """Bytes needed to store a list id (IndexIVF::coarse_code_size)."""
        nl, nbyte = self.nlist - 1, 0
        while nl > 0:
            nbyte += 1
            nl >>= 8
        return nbyte

    def encode_listno(self, listnos) -> np.ndarray:
        nbyte = self.coarse_code_size()
        listnos = np.asarray(listnos, np.int64)
        out = np.zeros((len(listnos), nbyte), np.uint8)
        for b in range(nbyte):
            out[:, b] = (listnos >> (8 * b)) & 0xFF
        return out

    def decode_listno(self, codes) -> np.ndarray:
        codes = np.asarray(codes, np.uint8)
        out = np.zeros(len(codes), np.int64)
        for b in range(codes.shape[1]):
            out |= codes[:, b].astype(np.int64) << (8 * b)
        return out

    def _sa_payload_size(self) -> int:
        # Flat storage: raw little-endian f32 rows (IndexIVFFlat's
        # code_size = 4*d; sa_decode is a memcpy in the reference too)
        return 4 * self.d

    def _sa_encode_payload(self, x: np.ndarray,
                           assign: np.ndarray) -> np.ndarray:
        raw = np.ascontiguousarray(np.asarray(x, dtype="<f4"))
        return raw.view(np.uint8).reshape(len(x), 4 * self.d)

    def _sa_decode_payload(self, payload: np.ndarray,
                           listno: np.ndarray) -> np.ndarray:
        raw = np.ascontiguousarray(payload).view("<f4")
        return raw.reshape(len(payload), self.d).astype(np.float32)

    def sa_code_size(self) -> int:
        return self.coarse_code_size() + self._sa_payload_size()

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        assign = np.asarray(self.coarse_assign(x, 1))[:, 0]
        return np.concatenate(
            [self.encode_listno(assign),
             self._sa_encode_payload(x, assign)], axis=1)

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(np.asarray(codes, np.uint8))
        cs = self.coarse_code_size()
        listno = self.decode_listno(codes[:, :cs])
        return self._sa_decode_payload(codes[:, cs:], listno)

    @property
    def list_sizes(self) -> np.ndarray:
        """Per-list entry counts (InvertedLists::list_size for all lists).
        One segment-sum over per-block valid counts (lists own contiguous
        block ranges), no Python loop over nlist."""
        self._maybe_repack()
        if self.invlists is None:
            return np.zeros(self.nlist, np.int64)
        ids = np.asarray(self.invlists.ids[:-1])
        valid_per_block = (ids >= 0).sum(axis=1).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(valid_per_block)])
        starts = np.asarray(self.invlists.list_block_start, np.int64)
        nblk = np.asarray(self.invlists.list_nblocks, np.int64)
        # empty lists point their start at the dummy block with nblk == 0
        lo = np.minimum(starts, len(valid_per_block))
        hi = np.minimum(starts + nblk, len(valid_per_block))
        return csum[hi] - csum[lo]

    def imbalance_factor(self) -> float:
        from ..ops.kmeans import imbalance_factor

        return imbalance_factor(self.list_sizes)


class IndexIVFFlat(IndexIVF):
    """IVF with raw float storage (faiss/IndexIVFFlat.{h,cpp})."""

    def __init__(self, quantizer: Index, d: int, nlist: int,
                 metric: int = D.METRIC_L2, block_size: int = 128):
        super().__init__(quantizer, d, nlist, metric, block_size)


class IndexIVFFlatDedup(IndexIVFFlat):
    """IVF-Flat that stores each distinct vector once
    (faiss IndexIVFFlatDedup, IndexIVFFlat.h:57): exact duplicates of a
    stored vector are recorded in `instances` (stored id -> duplicate
    ids) instead of re-stored; search expands duplicates back into the
    result lists (IndexIVFFlat.cpp:346-400); remove_ids promotes a
    surviving duplicate when a stored representative is removed.

    Duplicate detection keys on (coarse list, exact vector bytes) — the
    reference likewise only dedups within the assigned list."""

    def __init__(self, quantizer: Index, d: int, nlist: int,
                 metric: int = D.METRIC_L2, block_size: int = 128):
        super().__init__(quantizer, d, nlist, metric, block_size)
        self.instances: dict[int, list[int]] = {}
        self._keys: Optional[dict] = None

    # --- dup bookkeeping --------------------------------------------------
    def _ensure_keys(self) -> dict:
        """(list, vector-bytes) -> stored id, rebuilt from the host store
        (derived state; survives load/merge)."""
        if self._keys is None:
            keys: dict = {}
            while len(self._assign_host) < len(self._xb_host):
                self._assign_host.append(None)
            for j, (xs, ids) in enumerate(
                    zip(self._xb_host, self._ids_host)):
                a = self._assign_host[j]
                if a is None:
                    a = np.asarray(self._assign(xs), np.int64)
                    self._assign_host[j] = a
                for i in range(len(xs)):
                    keys[(int(a[i]), xs[i].tobytes())] = int(ids[i])
            self._keys = keys
        return self._keys

    def train(self, x) -> None:
        # the reference also dedups the training set
        x = self._check_input(x)
        x = np.unique(x, axis=0)
        super().train(x)

    def add_with_ids(self, x, ids, *, repack: bool = True) -> None:
        if not self.is_trained:
            raise RuntimeError("train() before add()")
        x = self._check_input(x)
        ids = np.asarray(ids, np.int64)
        if len(ids) != len(x):
            raise ValueError("ids / x length mismatch")
        keys = self._ensure_keys()
        assign = np.asarray(self._assign(x), np.int64)
        keep = np.ones(len(x), bool)
        for i in range(len(x)):
            key = (int(assign[i]), x[i].tobytes())
            rep = keys.get(key)
            if rep is None:
                keys[key] = int(ids[i])
            else:
                self.instances.setdefault(rep, []).append(int(ids[i]))
                keep[i] = False
        if keep.any():
            self._append_chunk(x[keep].copy(), ids[keep].copy(),
                               assign[keep])
        if repack:
            self._repack()

    def search(self, x, k: int, *,
               params: Optional[SearchParametersIVF] = None):
        Dv, Iv = super().search(x, k, params=params)
        if not self.instances:
            return Dv, Iv
        # expand duplicates into the ranked lists (same distance as their
        # representative), truncating at k — IndexIVFFlat.cpp:360-400
        Dv = np.array(Dv)
        Iv = np.array(Iv)
        for q in range(len(Iv)):
            if not any(int(i) in self.instances for i in Iv[q] if i >= 0):
                continue
            dd, ii = [], []
            for dist, i in zip(Dv[q], Iv[q]):
                dd.append(dist)
                ii.append(i)
                for dup in self.instances.get(int(i), ()):
                    dd.append(dist)
                    ii.append(dup)
                if len(ii) >= k:
                    break
            Dv[q] = dd[:k]
            Iv[q] = ii[:k]
        return Dv, Iv

    def remove_ids(self, sel) -> int:
        self._check_mutable()
        self._maybe_repack()
        removed = 0
        new_instances: dict[int, list[int]] = {}
        promote: dict[int, int] = {}
        for rep, dups in self.instances.items():
            da = np.asarray(dups, np.int64)
            gone = sel.member_array(da)
            keep_dups = [int(v) for v in da[~gone]]
            removed += int(gone.sum())
            if bool(sel.member_array(np.asarray([rep], np.int64))[0]):
                removed += 1
                if keep_dups:
                    # promote: the stored ROW survives under a dup's id
                    promote[int(rep)] = keep_dups[0]
                    if keep_dups[1:]:
                        new_instances[keep_dups[0]] = keep_dups[1:]
                # else the base pass below removes the row itself
            elif keep_dups:
                new_instances[int(rep)] = keep_dups
        self.instances = new_instances
        if promote:
            pk = np.asarray(list(promote.keys()), np.int64)
            for ids in self._ids_host:
                m = np.isin(ids, pk)
                if m.any():
                    ids[m] = [promote[int(v)] for v in ids[m]]
            # promoted ids invalidate the packed row->id map; rebuild
            # before the base removal runs its DirectMap lookups
            self._dirty = True
        removed += super().remove_ids(sel)
        self._keys = None
        return removed

    def update_vectors(self, ids, x) -> None:
        raise RuntimeError(
            "update_vectors not implemented for IndexIVFFlatDedup "
            "(faiss parity, IndexIVFFlat.cpp:484)")

    def range_search(self, x, radius: float):
        raise RuntimeError(
            "range_search not implemented for IndexIVFFlatDedup "
            "(faiss parity)")

    def reset(self) -> None:
        super().reset()
        self.instances = {}
        self._keys = None


def make_ivf_flat(d: int, nlist: int, metric: int = D.METRIC_L2
                  ) -> IndexIVFFlat:
    """Convenience: IVF with a flat coarse quantizer (= factory "IVFx,Flat")."""
    quant = IndexFlat(d, metric)
    return IndexIVFFlat(quant, d, nlist, metric)
