"""IndexHNSW — graph index over flat storage (faiss/IndexHNSW.{h,cpp}).

The reference wraps any flat `storage` index with an `HNSW` struct and
exposes `hnsw.efSearch/efConstruction/M` knobs plus
`SearchParametersHNSW{efSearch}` per-call overrides. `IndexHNSWFlat` is the
raw-float variant (IndexHNSW.h:111). The fork's `search_stats` adds
per-batch timing and hop/distance counters (IndexHNSW.h:68-76,
HNSWStats at impl/HNSW.h:234-256).

Build happens lazily in waves on device (ops.hnsw.build_graph); add()
accumulates and extends the graph with new waves on the next search/build
boundary, mirroring the incremental `hnsw_add_vertices` contract.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from ..ops import hnsw as H
from . import base
from .base import Index, SearchStats, Timer
from .flat import IndexFlat


@dataclasses.dataclass
class SearchParametersHNSW:
    """faiss SearchParametersHNSW (IndexHNSW.h)."""

    efSearch: int = 0    # 0 = use index default
    expand: int = 0      # TPU-specific: nodes expanded per hop (0 = default)
    sel: object = None   # IDSelector, applied at result extraction


class HNSWParams:
    """Knob bag matching faiss `HNSW` public fields (impl/HNSW.h:152-170),
    plus the TPU-specific build/traversal knobs."""

    def __init__(self, M: int = 32):
        self.M = int(M)
        self.efConstruction = 40
        self.efSearch = 16
        # TPU-specific batching knobs (legacy per-node beam)
        self.expand = 2
        self.wave_size = 1024
        # build strategy: "knn" = batch kNN-graph + diversity prune (fast,
        # MXU-friendly; ops.hnsw.build_graph_knn), "insert" = wave
        # insertion (ops.hnsw.build_graph), "auto" = knn
        self.build_mode = "auto"
        # tile-granular traversal (ops.hnsw_tiles) — used when
        # ntotal >= tile_threshold
        self.tile_threshold = 8192
        self.tile_size = 32        # rows per contiguous gather block
        self.expand_tiles = 4      # vectors expanded per hop
        self.scan_tiles = 0        # fresh tiles scanned per hop (0 = auto)
        self.tile_max_hops = 0     # 0 = scaled from ef/expand
        self.tile_seeds = 0        # 0 = scaled from expand
        self.stop_frac = 0.15      # slack on the tile stop rule
        self.tile_refine = True    # exact f32 re-score of ef candidates
        # tile traversal engine: "fused" = Pallas list-major scans with
        # centroid hop-0 routing + graph hops (TPU), "beam" = lockstep
        # XLA beam, "auto" = fused on Mosaic backends
        self.tile_mode = "auto"
        # measured knee on v5e (1M): nprobe0=12, 1 hop, F=4 ->
        # 63.3k QPS @ 0.991 recall; more hops trade QPS for recall
        self.fused_hops = 1        # graph hops after the hop-0 route
        self.fused_F = 4           # fresh tiles scanned per graph hop
        self.fused_kp = 8          # per-(query, tile) extraction width
        self.fused_kp_max = 64     # cap of the wide-k (coarse-quantizer)
                                   # kp scaling. Extraction rounds are
                                   # SERIAL, so kp=128 is pathological
                                   # (213 QPS at nprobe=128, r5_queue5)
                                   # while 64 keeps recall equal to 128
                                   # at nprobe=64 (r5_queue4: 0.954 both)
        # Mosaic's DMA/reshape tiling wants 128-row blocks; the fused
        # path therefore uses its own (coarser) tile size
        self.fused_tile_size = 128


class IndexHNSW(Index):
    """HNSW over an owned flat storage index."""

    def __init__(self, d: int, M: int = 32, metric: int = D.METRIC_L2,
                 storage: Optional[IndexFlat] = None):
        super().__init__(d, metric)
        self.hnsw = HNSWParams(M)
        self.storage = storage if storage is not None else IndexFlat(d, metric)
        self.graph: Optional[H.HNSWGraph] = None
        self._built_n = 0        # vectors already in the graph
        self._level_seed = 1234
        # tile-granular search structures (derived from the graph; see
        # ops/hnsw_tiles.py) + the coarse assignment used as spatial order
        self._tiles = None
        self._coarse_assign = None
        # reduced-precision device copy of the vectors (IndexHNSWSQ role:
        # graph distances on compressed storage); None = f32
        self.storage_dtype: Optional[str] = None
        self._vec_dev: Optional[jnp.ndarray] = None

    def _search_vectors(self) -> jnp.ndarray:
        if self.storage_dtype is None:
            return self.storage.vectors
        # "sq8" is the coded-tile storage format; the small-n per-node
        # beam (no tiles yet) searches at bf16
        dt = ("bfloat16" if self.storage_dtype == "sq8"
              else self.storage_dtype)
        if self._vec_dev is None or self._vec_dev.shape[0] != self.ntotal:
            self._vec_dev = self.storage.vectors.astype(jnp.dtype(dt))
        return self._vec_dev

    # --- add / build ------------------------------------------------------
    def add(self, x) -> None:
        x = self._check_input(x)
        self.storage.add(x)
        self.ntotal = self.storage.ntotal
        self._build_pending()

    def _build_pending(self) -> None:
        """Extend the graph to cover all stored vectors.

        Default ("auto"/"knn") is the batch kNN-graph build
        (ops.hnsw.build_graph_knn — see its section comment for the
        mapping onto the reference's insertion loop); "insert" keeps the
        wave-insertion rebuild."""
        n = self.storage.ntotal
        if n == self._built_n:
            return
        self._tiles = None
        self._tiles_fused = None
        vectors = self.storage.vectors
        if self.storage.ntotal != int(vectors.shape[0]):
            vectors = vectors[: self.storage.ntotal]
        if (self.graph is not None and self._built_n > 0
                and n - self._built_n <= self.incremental_frac
                * self._built_n):
            # incremental continuation (hnsw_add_vertices on a non-empty
            # index): new points wave-insert into the existing level 0
            self.graph = H.extend_graph(
                vectors, self.graph, self._built_n,
                m=self.hnsw.M,
                ef_construction=self.hnsw.efConstruction,
                seed=self._level_seed,
                wave_size=self.hnsw.wave_size,
                metric=self.metric_type,
                verbose=self.verbose,
            )
            self._coarse_assign = None
            self._built_n = n
            return
        levels = H.random_levels(n, self.hnsw.M, self._level_seed)
        if self.hnsw.build_mode == "insert":
            self.graph = H.build_graph(
                vectors,
                self.hnsw.M,
                self.hnsw.efConstruction,
                levels=levels,
                wave_size=self.hnsw.wave_size,
                metric=self.metric_type,
                verbose=self.verbose,
            )
            self._coarse_assign = None
        else:
            self.graph, self._coarse_assign = H.build_graph_knn(
                vectors,
                self.hnsw.M,
                self.hnsw.efConstruction,
                levels=levels,
                metric=self.metric_type,
                verbose=self.verbose,
            )
        self._built_n = n

    def _ensure_tiles(self):
        """Build (and cache) the tile-granular search structures."""
        if self._tiles is not None:
            return self._tiles
        from ..ops import hnsw_tiles as HT

        n = self.ntotal
        vectors = self.storage.vectors
        if n != int(vectors.shape[0]):
            vectors = vectors[:n]
        assign = None
        if self._coarse_assign is not None and \
                len(self._coarse_assign) == n:
            assign = self._coarse_assign
        order = HT.spatial_order(np.asarray(vectors), self.hnsw.tile_size,
                                 assign=assign, seed=self._level_seed)
        self._tiles = HT.build_tiles(
            np.asarray(vectors),
            np.asarray(self.graph.neighbors0),
            order=order,
            b=self.hnsw.tile_size,
        )
        return self._tiles

    def _use_tiles(self) -> bool:
        return (self.graph is not None
                and self.ntotal >= self.hnsw.tile_threshold)

    def reset(self) -> None:
        self.storage.reset()
        self.graph = None
        self.ntotal = 0
        self._built_n = 0
        self._tiles = None
        self._tiles_fused = None
        self._coarse_assign = None

    # --- search -----------------------------------------------------------
    def _effective(self, k: int, params):
        ef = self.hnsw.efSearch
        expand = self.hnsw.expand
        if params is not None:
            if params.efSearch:
                ef = params.efSearch
            if params.expand:
                expand = params.expand
        ef = max(int(ef), int(k))
        return ef, expand

    # beam-search footprint scales with nq * expand * 2M * d — big batches
    # (e.g. a 1M-vector add assigning through an HNSW quantizer) are tiled
    search_chunk = 8192
    # adds up to this fraction of the built graph extend it incrementally
    # (wave insertion); larger adds trigger a fresh batch-kNN build
    incremental_frac = 0.5

    def _use_fused_tiles(self) -> bool:
        if self.hnsw.tile_mode == "fused":
            return True
        if self.hnsw.tile_mode != "auto":
            return False
        import jax as _jax

        return (_jax.default_backend() not in ("cpu",)
                and not D.is_similarity_metric(self.metric_type))

    def _ensure_tiles_fused(self):
        if self._tiles_fused is not None:
            return self._tiles_fused
        from ..ops import hnsw_tiles as HT

        n = self.ntotal
        vectors = self.storage.vectors
        if n != int(vectors.shape[0]):
            vectors = vectors[:n]
        assign = (self._coarse_assign
                  if self._coarse_assign is not None
                  and len(self._coarse_assign) == n else None)
        b = self.hnsw.fused_tile_size
        order = HT.spatial_order(np.asarray(vectors), b,
                                 assign=assign, seed=self._level_seed)
        self._tiles_fused = HT.build_tiles_fused(
            np.asarray(vectors),
            np.asarray(self.graph.neighbors0),
            order=order,
            b=b,
        )
        if self.storage_dtype == "sq8":
            # int8 storage: tiles as SQ8 codes + folded dequant affine —
            # QUARTER the f32 stream bytes through the fused kernel
            # (ops/ivf_scan_pallas.py); refine runs at storage precision
            # (the HNSWSQ semantic). The raw f32 storage is then DROPPED
            # (HNSWPQ's pattern): the codes are the authority, restored
            # by dequantization when a later add rebuilds the graph.
            from ..ops.ivf_scan import sq8_requantize_invlists

            self._tiles_fused.il = sq8_requantize_invlists(
                self._tiles_fused.il)
            self.storage.reset()
            self.storage.ntotal = self.ntotal
        elif self.storage_dtype is not None:
            # honor the SQ storage contract in the fused path too: tiles
            # live at the compressed dtype (half the HBM); the kernel's
            # "exact" refine then re-ranks at storage precision, which
            # is the HNSWSQ semantic (distances on compressed storage).
            # Norms must be recomputed FROM the compressed values or the
            # refine would mix quantized inner products with unquantized
            # norms.
            il = self._tiles_fused.il
            il.data = il.data.astype(jnp.dtype(self.storage_dtype))
            il.norms = jnp.sum(
                il.data.astype(jnp.float32) ** 2, axis=-1)
        return self._tiles_fused

    _tiles_fused = None

    def _fused_search_chunk(self, xq_dev, k: int, ef: int):
        """Fused tile traversal (ops/hnsw_tiles.tile_search_fused):
        efSearch maps onto the scanned-tile budget — hop-0 probes grow
        with ef, graph hops refine (the role of the candidate beam)."""
        from ..ops import hnsw_tiles as HT

        ftg = self._ensure_tiles_fused()
        hp = self.hnsw
        nprobe0 = max(8, ef // 2)
        rk = max(2 * k, min(ef, 64))
        # per-tile extraction width must scale with k: tiles are built
        # spatially coherent (HT.spatial_order), so one tile can hold
        # MANY of a query's true top-k — at the default kp=8 a
        # wide-k search (an HNSW coarse quantizer asked for nprobe
        # lists) silently truncates to ~8 hits per tile and recall
        # freezes regardless of ef (measured: 0.816 for efSearch
        # 128..2048 at nprobe=64 on the calibrated-hard surrogate,
        # benchs/logs/r4_queue10.jsonl — the round-4 "saturation").
        kp = max(hp.fused_kp, min(ftg.b, k, hp.fused_kp_max))
        Dv, Pv, Iv = HT.tile_search_fused(
            ftg, xq_dev, k,
            nprobe0=nprobe0,
            hops=hp.fused_hops,
            expand=hp.expand_tiles * 2,
            F=hp.fused_F,
            kp=kp,
            rk=rk,
            metric=self.metric_type,
        )
        ndis = (nprobe0 + hp.fused_hops * hp.fused_F) * ftg.b
        return Dv, Iv, {"nhops": hp.fused_hops,
                        "ndis": xq_dev.shape[0] * ndis}

    def _tile_search_chunk(self, xq_dev, k: int, ef: int):
        """One tile-granular search call (ops/hnsw_tiles.tile_search)."""
        from ..ops import hnsw_tiles as HT

        if self._use_fused_tiles():
            try:
                return self._fused_search_chunk(xq_dev, k, ef)
            except Exception:
                if self.hnsw.tile_mode == "fused":
                    raise
                # auto mode: fall back to the XLA beam traversal
        tg = self._ensure_tiles()
        hp = self.hnsw
        refine = None
        if hp.tile_refine:
            refine = self.storage.vectors
            if self.ntotal != int(refine.shape[0]):
                refine = refine[: self.ntotal]
        return HT.tile_search(
            tg, xq_dev, k,
            ef=ef,
            expand=hp.expand_tiles,
            scan_tiles=hp.scan_tiles,
            max_hops=hp.tile_max_hops,
            seed_count=hp.tile_seeds,
            metric=self.metric_type,
            stop_frac=hp.stop_frac,
            refine_vectors=refine,
        )

    def _search_device_stats(self, xq_dev, k: int, ef: int, expand: int):
        """Device search returning (D, I, {nhops, ndis}) via the tile path
        when the index is large enough, else the per-node beam."""
        if self._use_tiles():
            return self._tile_search_chunk(xq_dev, k, ef)
        return H.hnsw_search(
            self._search_vectors(), self.graph, xq_dev,
            ef=ef, k=k, expand=expand, metric=self.metric_type,
        )

    def search_device(self, xq_dev: jnp.ndarray, k: int,
                      params: Optional[SearchParametersHNSW] = None):
        """Device-in/device-out search (no host sync)."""
        ef, expand = self._effective(k, params)
        nq = xq_dev.shape[0]
        if nq > self.search_chunk:
            outs = [
                self._search_device_stats(
                    xq_dev[i : i + self.search_chunk], k, ef, expand)[:2]
                for i in range(0, nq, self.search_chunk)
            ]
            return (jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
        Dv, Iv, _ = self._search_device_stats(xq_dev, k, ef, expand)
        return Dv, Iv

    def search(self, x, k: int, *, params: Optional[SearchParametersHNSW] = None):
        Dv, Iv, _ = self.search_stats(x, k, params=params)
        return Dv, Iv

    def search_stats(self, x, k: int, *,
                     params: Optional[SearchParametersHNSW] = None):
        """search + HNSWStats/QueryLatencyStats (fork's
        IndexHNSW::search_stats, faiss/IndexHNSW.h:68-76)."""
        x = self._check_input(x)
        if self.graph is None:
            bad = -np.inf if self.is_similarity else np.inf
            nq = x.shape[0]
            return (np.full((nq, k), bad, np.float32),
                    np.full((nq, k), -1, np.int64),
                    SearchStats(nq=nq))
        ef, expand = self._effective(k, params)
        sel = getattr(params, "sel", None) if params is not None else None
        with Timer() as t:
            # with a selector: traverse unfiltered, over-fetch ef results,
            # filter at extraction (the reference's traverse-all /
            # emit-filtered behavior, faiss HNSW + SearchParameters.sel)
            kk = ef if sel is not None else k
            xq_all = jnp.asarray(x)
            nq_all = xq_all.shape[0]
            parts = []
            st = {"ndis": 0, "nhops": 0}
            for i0 in range(0, nq_all, self.search_chunk):
                Dc, Ic, stc = self._search_device_stats(
                    xq_all[i0 : i0 + self.search_chunk], kk,
                    max(ef, kk), expand,
                )
                parts.append((Dc, Ic))
                st = {"ndis": st["ndis"] + int(stc["ndis"]),
                      "nhops": st["nhops"] + int(stc["nhops"])}
            Dv = np.concatenate([np.asarray(p[0]) for p in parts])
            Iv = np.concatenate([np.asarray(p[1], np.int64) for p in parts])
            if sel is not None:
                allow = sel.make_bitmap(self.ntotal)
                bad = -np.inf if self.is_similarity else np.inf
                ok = (Iv >= 0) & (allow[np.clip(Iv, 0, self.ntotal - 1)] > 0)
                Dv = np.where(ok, Dv, bad)
                Iv = np.where(ok, Iv, -1)
                order = np.argsort(-Dv if self.is_similarity else Dv,
                                   axis=1)[:, :k]
                Dv = np.take_along_axis(Dv, order, axis=1)
                Iv = np.take_along_axis(Iv, order, axis=1)
        stats = SearchStats(
            nq=len(x), total_us=t.us, quantization_us=0.0, list_scan_us=t.us,
            ndis=int(st["ndis"]), nlist_visited=int(st["nhops"]),
        )
        base.indexIVF_stats.accumulate(stats)
        return Dv, Iv, stats

    def range_search(self, x, radius: float):
        """Approximate range search (faiss IndexHNSW::range_search,
        IndexHNSW.h:78): the reference radius-filters the points scored
        by a beam of width efSearch; here the beam's top-ef results are
        radius-filtered — same candidate budget, same approximation
        class (hits beyond the beam are missed in both). Returns the
        (lims, D, I) CSR triple."""
        from ..ops.range_search import csr_from_hits

        x = self._check_input(x)
        nq = len(x)
        if self.graph is None or self.ntotal == 0:
            return (np.zeros(nq + 1, np.int64), np.zeros(0, np.float32),
                    np.zeros(0, np.int64))
        ef, expand = self._effective(1, None)
        kk = min(max(ef, 16), self.ntotal)
        keep_gt = self.is_similarity
        hits_d = [[] for _ in range(nq)]
        hits_i = [[] for _ in range(nq)]
        xq_all = jnp.asarray(x)
        for i0 in range(0, nq, self.search_chunk):
            Dc, Ic, _ = self._search_device_stats(
                xq_all[i0:i0 + self.search_chunk], kk, ef, expand)
            Dc, Ic = np.asarray(Dc), np.asarray(Ic, np.int64)
            ok = (Ic >= 0) & (Dc > radius if keep_gt else Dc < radius)
            for r in range(len(Dc)):
                if ok[r].any():
                    hits_d[i0 + r].append(Dc[r][ok[r]])
                    hits_i[i0 + r].append(Ic[r][ok[r]])
        res = csr_from_hits(nq, hits_d, hits_i)
        return res.lims, res.distances, res.labels

    def reconstruct(self, key: int) -> np.ndarray:
        return self.storage.reconstruct(key)

    def reconstruct_n(self, i0: int, ni: int) -> np.ndarray:
        return self.storage.reconstruct_n(i0, ni)

    # --- introspection -----------------------------------------------------
    def degree_histogram(self) -> np.ndarray:
        """Level-0 out-degree histogram (graph quality diagnostic)."""
        nb = np.asarray(self.graph.neighbors0)
        return np.bincount((nb >= 0).sum(1), minlength=nb.shape[1] + 1)


class IndexHNSWFlat(IndexHNSW):
    """faiss IndexHNSWFlat(d, M, metric) — raw-vector storage."""

    def __init__(self, d: int, M: int = 32, metric: int = D.METRIC_L2):
        super().__init__(d, M, metric)


class IndexHNSWSQ(IndexHNSW):
    """faiss IndexHNSWSQ(d, qtype, M): graph over compressed storage —
    bf16/fp16 device storage (half the HBM of Flat), or int8 ("sq8"):
    tile storage as uint8 codes + per-dim affine, QUARTER the f32 bytes,
    with the raw storage dropped once the coded tiles exist (the codes
    become the authority, like IndexHNSWPQ; reconstruct dequantizes)."""

    def __init__(self, d: int, qtype: str = "bfloat16", M: int = 32,
                 metric: int = D.METRIC_L2):
        super().__init__(d, M, metric)
        if qtype in ("int8", "uint8"):
            qtype = "sq8"
        if qtype not in ("bfloat16", "float16", "sq8"):
            raise ValueError(
                "IndexHNSWSQ supports bfloat16/float16/int8 storage")
        self.storage_dtype = qtype

    # --- sq8 coded-storage plumbing --------------------------------------
    def _storage_dropped(self) -> bool:
        return (self.ntotal > 0 and self.storage.ntotal == self.ntotal
                and getattr(self.storage, "_xb", None) is None)

    def _sq8_rows(self) -> np.ndarray:
        """Original-order f32 rows dequantized from the SQ8 tiles."""
        ftg = self._tiles_fused
        il = ftg.il
        d = self.d
        data = np.asarray(il.data, np.uint8).reshape(-1, d)
        ids_flat = np.asarray(il.ids).reshape(-1)
        bias = np.asarray(il.sq_bias, np.float32)
        scale = np.asarray(il.sq_scale, np.float32)
        orig = np.asarray(ftg.orig_ids)
        rows = np.empty((self.ntotal, d), np.float32)
        valid = ids_flat >= 0
        pos = ids_flat[valid]                # packed slot -> position
        rows[orig[pos]] = bias + data[valid].astype(np.float32) * scale
        return rows

    def add(self, x) -> None:
        if self.storage_dtype == "sq8" and self._storage_dropped():
            # restore dequantized rows so the graph rebuild sees every
            # old vector (the HNSWPQ restore-on-add pattern)
            dec = self._sq8_rows()
            self.storage.reset()
            self.storage.add(dec)
            self._built_n = 0
        super().add(x)

    def reconstruct(self, key: int) -> np.ndarray:
        if self.storage_dtype == "sq8" and self._storage_dropped():
            ftg = self._tiles_fused
            pos = int(np.nonzero(
                np.asarray(ftg.orig_ids) == int(key))[0][0])
            il = ftg.il
            code = np.asarray(il.data, np.uint8).reshape(-1, self.d)
            ids_flat = np.asarray(il.ids).reshape(-1)
            slot = int(np.nonzero(ids_flat == pos)[0][0])
            return (np.asarray(il.sq_bias, np.float32)
                    + code[slot].astype(np.float32)
                    * np.asarray(il.sq_scale, np.float32))
        return super().reconstruct(key)


class IndexHNSW2Level(IndexHNSW):
    """faiss IndexHNSW2Level(quantizer, nlist, pq_m, M): graph over
    Index2Layer codes (coarse id + PQ residual). The 2-layer codec is the
    persistent/IO representation (sa_encode/sa_decode, codes kept);
    search runs the standard tile/beam paths over a decoded bf16 device
    cache — on TPU a decoded bf16 tile costs the same HBM read as a
    same-width code tile would cost in gather traffic, so the codec is a
    storage format here, not a scan format (documented TPU deviation;
    the reference scans codes directly)."""

    def __init__(self, d: int, nlist: int, pq_m: int, M: int = 32,
                 nbits: int = 8, metric: int = D.METRIC_L2):
        super().__init__(d, M, metric)
        from .extra import Index2Layer
        from .flat import IndexFlat

        self.codec = Index2Layer(IndexFlat(d, metric), nlist, pq_m, nbits)
        self.storage_dtype = "bfloat16"
        self.is_trained = False

    def train(self, x) -> None:
        self.codec.train(self._check_input(x))
        self.is_trained = True

    def add(self, x) -> None:
        if not self.is_trained:
            raise RuntimeError("train first (IndexHNSW2Level)")
        x = self._check_input(x)
        self.codec.add(x)
        # graph + search storage hold the codec's reconstruction, so
        # search ranking matches the stored codes exactly
        dec = self.codec.sa_decode(self.codec.sa_encode(x))
        super().add(dec)

    def sa_encode(self, x):
        return self.codec.sa_encode(x)

    def sa_decode(self, codes):
        return self.codec.sa_decode(codes)


class IndexHNSWPQ(IndexHNSW):
    """faiss IndexHNSWPQ(d, pq_m, M): graph over PQ-coded storage
    (IndexHNSW.h; storage = IndexPQ). Search-time distances are ADC on
    the codes (the storage codec's distance, like the reference) — tile
    scans run scan_invlists_pq over code tiles (ops/hnsw_tiles
    PQTileGraph), so resident vector memory is pq_m bytes/vector.
    The graph itself is built from the exact vectors passed to add()
    (better links than code-space build; raw vectors are then dropped)."""

    def __init__(self, d: int, pq_m: int, M: int = 32,
                 nbits: int = 8, metric: int = D.METRIC_L2):
        super().__init__(d, M, metric)
        self.pq_m = int(pq_m)
        self.nbits = int(nbits)
        self.pq = None
        self._codes = np.zeros((0, pq_m), np.uint8)
        self._ptiles = None
        self.is_trained = False
        # PQ-coded path supports tile search only above this size;
        # below it, search decodes everything (small n)
        self.hnsw.tile_threshold = 4096

    def train(self, x) -> None:
        from ..ops import pq as PQ

        x = self._check_input(x)
        self.pq = PQ.train_pq(x, self.pq_m, self.nbits,
                              verbose=self.verbose)
        self.is_trained = True

    def add(self, x) -> None:
        from ..ops import pq as PQ

        if not self.is_trained:
            raise RuntimeError("train first (IndexHNSWPQ)")
        x = self._check_input(x)
        codes = PQ.pq_encode_chunked(x, jnp.asarray(self.pq.centroids))
        # if a previous add dropped the raw storage (coded-tiles mode),
        # restore an ADC-accuracy reconstruction so the graph/centroid
        # rebuild sees the old rows (a zeroed storage would silently
        # poison routing for them)
        if self.ntotal and self.storage.ntotal == self.ntotal and \
                getattr(self.storage, "_xb", None) is None:
            dec = np.asarray(PQ.pq_decode_chunked(
                self._codes, jnp.asarray(self.pq.centroids)))
            self.storage.reset()
            self.storage.add(dec)
            self._built_n = 0        # rebuild over reconstructed rows
        self._codes = np.concatenate([self._codes, codes])
        # graph build wants the exact vectors; storage keeps only codes
        self.storage.add(x)
        self.ntotal = self.storage.ntotal
        self._build_pending()
        self._ptiles = None
        if self._use_tiles():
            from ..ops import hnsw_tiles as HT

            vectors = np.asarray(self.storage.vectors)[: self.ntotal]
            order = HT.spatial_order(
                vectors, self.hnsw.fused_tile_size,
                assign=self._coarse_assign, seed=self._level_seed)
            self._ptiles = HT.build_tiles_pq(
                vectors, self._codes, self.pq.centroids,
                np.asarray(self.graph.neighbors0), order=order,
                b=self.hnsw.fused_tile_size)
            # drop the raw storage: search runs on codes from here on
            self.storage.reset()
            self.storage.ntotal = self.ntotal

    def reconstruct(self, key: int) -> np.ndarray:
        from ..ops import pq as PQ

        return np.asarray(PQ.pq_decode(
            jnp.asarray(self._codes[key:key + 1]),
            jnp.asarray(self.pq.centroids)))[0]

    def _search_device_stats(self, xq_dev, k: int, ef: int, expand: int):
        from ..ops import hnsw_tiles as HT

        if (self._ptiles is None and self.graph is not None
                and self.ntotal >= self.hnsw.tile_threshold):
            # deserialized index: rebuild the coded tiles from decoded
            # codes (ADC-accuracy centroids/order, codes stored as-is)
            from ..ops import pq as PQ

            dec = np.asarray(PQ.pq_decode_chunked(
                self._codes, jnp.asarray(self.pq.centroids)))
            order = HT.spatial_order(dec, self.hnsw.fused_tile_size,
                                     seed=self._level_seed)
            self._ptiles = HT.build_tiles_pq(
                dec, self._codes, self.pq.centroids,
                np.asarray(self.graph.neighbors0), order=order,
                b=self.hnsw.fused_tile_size)
        if self._ptiles is not None:
            nprobe0 = max(4, ef // 8)
            Dv, Pv, Iv = HT.tile_search_pq(
                self._ptiles, xq_dev, k,
                nprobe0=nprobe0,
                hops=self.hnsw.fused_hops,
                expand=self.hnsw.expand_tiles * 2,
                F=self.hnsw.fused_F,
                rk=max(2 * k, min(ef, 64)),
                metric=self.metric_type,
            )
            return Dv, Iv, {"nhops": self.hnsw.fused_hops, "ndis": 0}
        # small index: decode everything, per-node beam on decoded vectors
        from ..ops import pq as PQ

        dec = PQ.pq_decode(jnp.asarray(self._codes),
                           jnp.asarray(self.pq.centroids))
        return H.hnsw_search(
            dec, self.graph, xq_dev, ef=ef, k=k, expand=expand,
            metric=self.metric_type)
