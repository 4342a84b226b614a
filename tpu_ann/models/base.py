"""Index base API — TPU counterpart of faiss `Index` (faiss/Index.h:77-317).

The reference's `Index` is a mutable C++ object with
train/add/search/range_search/reconstruct and int64 ids. Here the same
surface is a thin stateful Python shell over immutable device arrays: every
search path is a jitted pure function over capacity-padded static shapes, so
repeated calls hit the XLA compile cache (adds grow storage by power-of-two
capacity doubling, the moral equivalent of std::vector growth in
IndexFlatCodes).

Per-query timing stats mirror the fork's `QueryLatencyStats`
(faiss/IndexIVF.h:28-32): searches can return a `SearchStats` pytree with the
coarse-quantization and list-scan split.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.distances import METRIC_INNER_PRODUCT, METRIC_L2, is_similarity_metric


@dataclasses.dataclass
class SearchParameters:
    """Base per-call search parameters (faiss/Index.h:64-69
    SearchParameters{sel}); subclasses add index-specific knobs."""

    sel: Optional[Any] = None   # IDSelector


@dataclasses.dataclass
class QueryLatencyStats:
    """PER-QUERY latency/work arrays — the fork's core C++ contribution
    (`QueryLatencyStats {total_us, quantization_us, list_scan_us}`,
    faiss/IndexIVF.h:28-32, filled per query at IndexIVF.cpp:1064-1105
    and consumed by the per-query P99.9 analyses of
    tutorial/python/192-hnsw-ivf-latency.py:338-392).

    All arrays are (nq,). Times come from looped batch-1 searches (the
    only honest per-query latency on a batched accelerator — the fork's
    192 harness loops queries one at a time the same way); `ndis` is the
    exact per-query scanned-code count derived from the probe set."""

    total_us: np.ndarray = None
    quantization_us: np.ndarray = None
    list_scan_us: np.ndarray = None
    ndis: np.ndarray = None

    def percentiles(self, field: str = "total_us",
                    qs=(50.0, 99.0, 99.9)) -> dict:
        a = getattr(self, field)
        return {f"p{q:g}": float(np.percentile(a, q)) for q in qs}


@dataclasses.dataclass
class SearchStats:
    """Per-search timing/counters (fork's QueryLatencyStats + IndexIVFStats).

    Times are host-measured wall-clock in microseconds for the whole batch
    (the fork amortizes quantization over the batch the same way,
    faiss/IndexIVF.cpp:761-771). Counters are exact and device-computed.
    `per_query`, when filled (search_stats_per_query), carries the
    fork-parity per-query arrays."""

    nq: int = 0
    total_us: float = 0.0
    quantization_us: float = 0.0
    list_scan_us: float = 0.0
    ndis: int = 0          # number of distances evaluated
    nlist_visited: int = 0  # number of invlists scanned (IVF) / hops (HNSW)
    per_query: Optional[QueryLatencyStats] = None

    def as_dict(self):
        d = dataclasses.asdict(self)
        d.pop("per_query", None)
        return d

    def accumulate(self, other: "SearchStats") -> None:
        for f in dataclasses.fields(self):
            if f.name == "per_query":
                continue
            setattr(self, f.name,
                    getattr(self, f.name) + getattr(other, f.name))

    def reset(self) -> None:
        for f in dataclasses.fields(self):
            if f.name == "per_query":
                self.per_query = None
                continue
            setattr(self, f.name, type(getattr(self, f.name))(0))


# Global cumulative counters, the role of faiss's `indexIVF_stats`
# singleton read via faiss.cvar (IndexIVF.h:567-583; the fork's
# 190-series harness reads it after each batch, 190-...test.py:1530).
# Every *_stats search accumulates into it; reset() between phases.
indexIVF_stats = SearchStats()


class Timer:
    """Context-manager wall timer in microseconds (fork's Timer struct,
    faiss/IndexIVF.cpp:32). Calls `block_until_ready` hooks are the caller's
    job — used around already-materialized results."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.us = (time.perf_counter() - self.t0) * 1e6
        return False


def _as_f32(x) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2:
        raise ValueError(f"expected (n, d) array, got shape {x.shape}")
    return np.ascontiguousarray(x)


def next_pow2(n: int) -> int:
    n = max(int(n), 1)
    return 1 << (n - 1).bit_length()


class Index:
    """Abstract base. Subclasses implement train/add/search.

    Mirrors faiss/Index.h:77: `d`, `ntotal`, `metric_type`, `is_trained`,
    plus the numpy-facing `search(x, k) -> (D, I)` convention from the SWIG
    wrappers (python/class_wrappers.py).
    """

    def __init__(self, d: int, metric: int = METRIC_L2):
        if d <= 0:
            raise ValueError("d must be positive")
        self.d = int(d)
        self.metric_type = int(metric)
        self.metric_arg = 0.0   # Lp exponent etc. (faiss Index::metric_arg)
        self.ntotal = 0
        self.is_trained = True
        self.verbose = False

    # --- core API -------------------------------------------------------
    def train(self, x) -> None:  # noqa: D401 - faiss parity
        """Default: no training needed (faiss/Index.cpp Index::train)."""

    def add(self, x) -> None:
        raise NotImplementedError

    def add_with_ids(self, x, ids) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not support add_with_ids; "
            "wrap it in IndexIDMap (faiss/IndexIDMap.h)"
        )

    def search(
        self, x, k: int, *, params: Optional[Any] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def search_stats(self, x, k: int, *, params: Optional[Any] = None):
        """search() + SearchStats — the fork's search_stats API
        (faiss/IndexIVF.h:329-337). Default implementation times the whole
        search as list_scan."""
        with Timer() as t:
            D, I = self.search(x, k, params=params)
        stats = SearchStats(nq=len(np.atleast_2d(x)), total_us=t.us,
                            list_scan_us=t.us)
        indexIVF_stats.accumulate(stats)
        return D, I, stats

    def search_stats_per_query(self, x, k: int, *,
                               params: Optional[Any] = None):
        """search + PER-QUERY QueryLatencyStats (the fork's per-query
        stats array, faiss/IndexIVF.h:28-32). The generic version loops
        batch-1 searches and fills total_us only; IndexIVF overrides
        with the quantization/list_scan phase split."""
        x = np.atleast_2d(np.asarray(x, np.float32))
        nq = len(x)
        tot = np.zeros(nq, np.float64)
        outs = []
        self.search(x[:1], k, params=params)    # warm/compile batch-1
        for q in range(nq):
            with Timer() as t:
                outs.append(self.search(x[q:q + 1], k, params=params))
            tot[q] = t.us
        Dv = np.concatenate([o[0] for o in outs])
        Iv = np.concatenate([o[1] for o in outs])
        pq = QueryLatencyStats(
            total_us=tot, quantization_us=np.zeros(nq),
            list_scan_us=tot.copy(), ndis=np.zeros(nq, np.int64))
        stats = SearchStats(nq=nq, total_us=float(tot.sum()),
                            list_scan_us=float(tot.sum()), per_query=pq)
        indexIVF_stats.accumulate(stats)
        stats.per_query = pq
        return Dv, Iv, stats

    def assign(self, x, k: int = 1) -> np.ndarray:
        """Labels only (faiss/Index.h:104 Index::assign)."""
        _, labels = self.search(x, k)
        return labels

    def reset(self) -> None:
        raise NotImplementedError

    def reconstruct(self, key: int) -> np.ndarray:
        raise NotImplementedError

    def reconstruct_n(self, i0: int, ni: int) -> np.ndarray:
        return np.stack([self.reconstruct(i) for i in range(i0, i0 + ni)])

    def reconstruct_batch(self, keys) -> np.ndarray:
        """Reconstruct arbitrary keys (faiss/Index.h:231). Default loops
        reconstruct(), like the reference's fallback."""
        keys = np.asarray(keys, np.int64).reshape(-1)
        if len(keys) == 0:
            return np.zeros((0, self.d), np.float32)
        return np.stack([self.reconstruct(int(kk)) for kk in keys])

    def compute_residual(self, x, key: int) -> np.ndarray:
        """x - reconstruct(key) (faiss Index::compute_residual,
        Index.h:245 — the quantization residual used by IVF encoders)."""
        return np.asarray(x, np.float32) - self.reconstruct(int(key))

    def compute_residual_n(self, x, keys) -> np.ndarray:
        """Batched residuals (faiss Index::compute_residual_n)."""
        x = np.asarray(x, np.float32)
        return x - self.reconstruct_batch(keys)

    def search_and_reconstruct(self, x, k: int):
        """(D, I, R) with R (nq, k, d) reconstructed result vectors;
        R rows for -1 labels are zero (faiss/Index.h:244)."""
        D_, I_ = self.search(x, k)
        flat = np.asarray(I_, np.int64).reshape(-1)
        ok = flat >= 0
        R = np.zeros((len(flat), self.d), np.float32)
        if ok.any():
            R[ok] = self.reconstruct_batch(flat[ok])
        return D_, I_, R.reshape(len(I_), k, self.d)

    def merge_from(self, other, add_id: int = 0) -> None:
        """Move other's vectors into self (faiss Index::merge_from).
        Default: reconstruct-and-re-add (valid for any index that can
        reconstruct); IVF indexes override with a list-level merge."""
        if type(other) is not type(self):
            raise ValueError("merge_from: index types differ")
        if other.ntotal:
            x = other.reconstruct_n(0, other.ntotal)
            if hasattr(self, "add_with_ids") and add_id:
                self.add_with_ids(
                    x, np.arange(add_id, add_id + len(x), dtype=np.int64))
            else:
                self.add(x)
        other.reset()

    # --- codec API (faiss/Index.h:217-244) ------------------------------
    def sa_code_size(self) -> int:
        raise NotImplementedError

    def sa_encode(self, x) -> np.ndarray:
        raise NotImplementedError

    def sa_decode(self, codes) -> np.ndarray:
        raise NotImplementedError

    # --- helpers ---------------------------------------------------------
    @property
    def is_similarity(self) -> bool:
        return is_similarity_metric(self.metric_type)

    def _check_input(self, x) -> np.ndarray:
        x = _as_f32(x)
        if x.shape[1] != self.d:
            raise ValueError(f"input dim {x.shape[1]} != index dim {self.d}")
        return x

    def __repr__(self):
        m = "IP" if self.metric_type == METRIC_INNER_PRODUCT else "L2"
        return f"{type(self).__name__}(d={self.d}, ntotal={self.ntotal}, metric={m})"


__all__ = [
    "Index",
    "SearchStats",
    "QueryLatencyStats",
    "Timer",
    "METRIC_L2",
    "METRIC_INNER_PRODUCT",
    "next_pow2",
]
