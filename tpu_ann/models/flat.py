"""IndexFlat — exact brute-force search (faiss/IndexFlat.{h,cpp}).

The reference stores raw float vectors and dispatches to
`knn_L2sqr`/`knn_inner_product` (faiss/IndexFlat.cpp:38-55), with
`IndexFlatL2` caching database norms (faiss/IndexFlat.h:108-110). Here the
database lives as one capacity-padded device array; search is the blocked
MXU GEMM + fused top-k from `ops.distances.knn`. This index doubles as the
exact ground-truth oracle for all tests (role of
contrib/exhaustive_search.knn_ground_truth).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import distances as D
from .base import Index, METRIC_INNER_PRODUCT, METRIC_L2, next_pow2


def _int_exact_stats(x):
    """(all non-negative integers?, max value) — one cheap device pass
    feeding the integer-exactness gate of the fused flat path."""
    import jax

    @jax.jit
    def f(a):
        ints = jnp.all(a == jnp.round(a)) & jnp.all(a >= 0)
        return ints, jnp.max(a)

    return f(x)


class IndexFlat(Index):
    """Exact index over raw float32 vectors on device."""

    def __init__(self, d: int, metric: int = METRIC_L2):
        super().__init__(d, metric)
        self._xb: Optional[jnp.ndarray] = None   # (capacity, d) device array
        self._norms: Optional[jnp.ndarray] = None  # (capacity,) cached ||y||^2
        self._capacity = 0
        # cached pack_flat_db layout for the fused kernel (bf16 chunks +
        # bias plane); rebuilt lazily after any mutation — the per-call
        # prep it replaces was 38% of fused search time (BENCHMARKS.md
        # round-4 epilogue probe)
        self._fused_packed = None
        # TPU throughput knobs: bf16 GEMM + hardware approx top-k
        # (~0.997+ top-10 recall, ~10x faster; see ops.distances.knn)
        self.compute_dtype = "float32"
        self.approx_topk = False
        self.refine_factor = 1   # >1: fast-pass candidates re-scored in f32
        # "auto": route big approx searches through the fused Pallas scan
        # (ops/flat_knn_pallas.py — scores never leave VMEM); "xla":
        # always the blocked-GEMM path; "fused": always the kernel
        self.scan_mode = "auto"
        # chunk-loop strategy of the fused kernel (see flat_knn_fused):
        # 'fori' | 'grid' | 'pipe'. The v5e occupancy sweep
        # (benchs/r3_queue2.py B2) measured grid fastest at every point
        # tried (149k vs 132k QPS at 1M x 128-d): Mosaic's own BlockSpec
        # double-buffering pipelines chunk DMAs better than the manual
        # in-kernel fori loop.
        self.fused_schedule = "grid"
        # Integer-exactness fast path. Real SIFT/BigANN descriptors are
        # uint8-valued; for non-negative integer inputs small enough
        # that every MXU partial sum stays under 2^24, the bf16 kernel's
        # scores are BIT-EXACT (inputs lossless in bf16, f32 integer
        # accumulation exact — proven + measured 14218/14218 identical
        # to f32 GT, benchs/logs/r5_queue1.jsonl "exactness"), so the
        # exact-f32 refine pass is pure overhead and the fused search
        # runs refine=0 with a wider reservoir instead.
        #   None  = auto: DB checked at pack time (one device reduction),
        #           queries checked per call (costs one scalar sync —
        #           latency-critical pipelines should pin True/False)
        #   True  = caller guarantees integer-exact data
        #   False = always use the bf16+refine discipline
        self.exact_kernel: Optional[bool] = None
        self._db_int_max: Optional[float] = None  # None = not integer

    # --- storage ----------------------------------------------------------
    def _ensure_capacity(self, n_new: int) -> None:
        need = self.ntotal + n_new
        if need <= self._capacity:
            return
        # pow2 growth up to 4M rows; beyond that pad to 1M-row granularity
        # (pow2 would waste up to 2x HBM at Deep10M scale)
        if need <= (1 << 22):
            cap = max(next_pow2(need), 1024)
        else:
            GRAN = 1 << 20
            cap = -(-need // GRAN) * GRAN
        xb = jnp.zeros((cap, self.d), jnp.float32)
        norms = jnp.zeros((cap,), jnp.float32)
        if self._xb is not None and self.ntotal:
            xb = xb.at[: self.ntotal].set(self._xb[: self.ntotal])
            norms = norms.at[: self.ntotal].set(self._norms[: self.ntotal])
        self._xb, self._norms, self._capacity = xb, norms, cap

    def add(self, x) -> None:
        x = self._check_input(x)
        n = x.shape[0]
        if n == 0:
            return
        if self.ntotal == 0 and n > (1 << 22):
            # large first add: pad on host and upload once — the
            # functional .at[].set path would hold old+new+source buffers
            # (3x) on device at once, which OOMs at Deep10M scale
            GRAN = 1 << 20
            cap = -(-n // GRAN) * GRAN
            buf = np.zeros((cap, self.d), np.float32)
            buf[:n] = x
            self._xb = jnp.asarray(buf)
            del buf
            self._norms = D.l2_norms(self._xb)
            self._capacity = cap
            self.ntotal = n
            self._fused_packed = None
            return
        self._ensure_capacity(n)
        xj = jnp.asarray(x)
        self._xb = jnp.asarray(self._xb).at[self.ntotal : self.ntotal + n].set(xj)
        self._norms = self._norms.at[self.ntotal : self.ntotal + n].set(
            D.l2_norms(xj)
        )
        self.ntotal += n
        self._fused_packed = None

    def reset(self) -> None:
        self._xb = None
        self._norms = None
        self._capacity = 0
        self.ntotal = 0
        self._fused_packed = None

    # --- search -----------------------------------------------------------
    def _use_fused(self, k: int) -> bool:
        """Fused-kernel dispatch: only on the opted-in approximate path
        (bf16 + approx top-k — the exact default must stay the blocked
        exact GEMM: IndexFlat is the ground-truth oracle), on a real
        accelerator, at sizes where the XLA path's HBM score traffic
        dominates (measured 5.7% MFU at 1M rows on v5e)."""
        if self.scan_mode == "fused":
            return True
        if self.scan_mode != "auto":
            return False
        if not (self.approx_topk and self.compute_dtype == "bfloat16"):
            return False
        if self.ntotal < 65536 or k > 256:
            return False
        import jax as _jax

        return _jax.default_backend() != "cpu"

    # reservoir width of the integer-exact refine-0 path: W=2048 halves
    # the lane-collision loss vs 1024 — measured on the calibrated-hard
    # 1M surrogate (benchs/logs/r5_queue3.jsonl, scalar-forced):
    #   W=1024: recall@10 0.99516 @ 258.4k QPS (33.6% MFU)
    #   W=2048: recall@10 0.99749 @ 236.3k QPS (30.7% MFU)  <- default
    fused_W_exact = 2048

    def _use_exact_kernel(self, xq_dev) -> bool:
        """True when BOTH sides are integer-valued in a range where the
        bf16 kernel is bit-exact (see the exact_kernel knob): inputs
        non-negative integers, losslessly bf16-representable (<= 256),
        and every f32 partial sum an exact integer
        (2 * d * max_q * max_x <= 2^24)."""
        if self.exact_kernel is not None:
            return bool(self.exact_kernel)
        if self.metric_type != METRIC_L2 or self._db_int_max is None:
            return False
        q_int, q_max = _int_exact_stats(xq_dev)
        if not bool(np.asarray(q_int)):
            return False
        q_max = float(np.asarray(q_max))
        return (q_max <= 256.0 and
                2.0 * self.d * q_max * self._db_int_max <= 2.0 ** 24)

    def _fused_search_device(self, xq_dev, k: int, id_mask=None):
        from ..ops.flat_knn_pallas import flat_knn_fused, pack_flat_db

        # R=8192/W=1024 won the v5e occupancy sweep (r3) and held
        # across the r4 scalar-forced (R, W, Q) grid
        # (benchs/logs/r4_queue9.jsonl); Q=1024 on large batches won
        # ~3-4% at identical recall. k<=256 is guarded upstream. The
        # packed layout (with valid_n baked in) is cached across
        # searches and invalidated on mutation.
        if self._fused_packed is None:
            self._fused_packed = pack_flat_db(
                self._xb, self.metric_type,
                xb_norms=(self._norms
                          if self.metric_type == METRIC_L2 else None),
                valid_n=jnp.int32(self.ntotal), R=8192)
            db_int, db_max = _int_exact_stats(self.vectors)
            db_max = float(np.asarray(db_max))
            self._db_int_max = (
                db_max if bool(np.asarray(db_int)) and db_max <= 256.0
                else None)
        Q = 1024 if xq_dev.shape[0] >= 2048 else 512
        if k <= 128 and self._use_exact_kernel(xq_dev):
            # bit-exact scores: skip the refine, select in-kernel, widen
            # the reservoir for collision margin. Q=512 measured faster
            # than 1024 under the in-kernel select (258k vs 249k QPS,
            # r5_queue3)
            return flat_knn_fused(
                xq_dev, self._xb, k, self.metric_type,
                id_mask=id_mask, packed=self._fused_packed,
                Q=512, R=8192, W=self.fused_W_exact,
                refine=0, sel="kernel", schedule=self.fused_schedule,
            )
        return flat_knn_fused(
            xq_dev, self._xb, k, self.metric_type,
            id_mask=id_mask, packed=self._fused_packed,
            Q=Q, R=8192, W=1024,
            refine=max(4, self.refine_factor),
            sel="kernel" if 4 * k <= 128 else "approx",
            schedule=self.fused_schedule,
        )

    def search_device(self, xq_dev: jnp.ndarray, k: int):
        """Device-in/device-out search (no host sync) — lets composite
        indexes (IVF) chain coarse+fine phases without round-trips."""
        if self._use_fused(k):
            return self._fused_search_device(xq_dev, k)
        return D.knn(
            xq_dev,
            self._xb,
            k,
            self.metric_type,
            xb_norms=self._norms if self.metric_type == METRIC_L2 else None,
            valid_n=jnp.int32(self.ntotal),
            compute_dtype=self.compute_dtype,
            approx=self.approx_topk,
            refine_factor=self.refine_factor,
        )

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        if self.ntotal == 0:
            nq = x.shape[0]
            bad = -np.inf if self.is_similarity else np.inf
            return (np.full((nq, k), bad, np.float32),
                    np.full((nq, k), -1, np.int64))
        from ..ops import extra_distances as XD

        if self.metric_type in XD.EXTRA_METRICS:
            # L1/Linf/Lp/Canberra/... have no GEMM form; blocked VPU scan
            # (utils/extra_distances.cpp knn_extra_metrics role)
            Dv, Iv = XD.knn_extra_metrics(
                jnp.asarray(x), self._xb[: self.ntotal], k,
                self.metric_type, jnp.float32(self.metric_arg),
                valid_n=jnp.int32(self.ntotal))
            return np.asarray(Dv), np.asarray(Iv, np.int64)
        id_mask = None
        sel = getattr(params, "sel", None) if params is not None else None
        if sel is not None:
            m = np.zeros(self._capacity, np.uint8)
            m[: self.ntotal] = sel.make_bitmap(self.ntotal)
            id_mask = jnp.asarray(m)
        if self._use_fused(k):
            Dv, Iv = self._fused_search_device(jnp.asarray(x), k,
                                               id_mask=id_mask)
            return np.asarray(Dv), np.asarray(Iv, dtype=np.int64)
        Dv, Iv = D.knn(
            jnp.asarray(x),
            self._xb,
            k,
            self.metric_type,
            xb_norms=self._norms if self.metric_type == METRIC_L2 else None,
            valid_n=jnp.int32(self.ntotal),
            id_mask=id_mask,
            compute_dtype=self.compute_dtype,
            approx=self.approx_topk,
            refine_factor=self.refine_factor,
        )
        return np.asarray(Dv), np.asarray(Iv, dtype=np.int64)

    def range_search(self, x, radius: float):
        """faiss Index::range_search -> (lims, D, I) CSR triple."""
        from ..ops.range_search import range_search_blocked

        x = self._check_input(x)
        if self.ntotal == 0:
            import numpy as _np

            n = len(x)
            return (_np.zeros(n + 1, _np.int64), _np.zeros(0, _np.float32),
                    _np.zeros(0, _np.int64))
        res = range_search_blocked(
            x, self._xb, radius, self.metric_type, valid_n=self.ntotal
        )
        return res.lims, res.distances, res.labels

    def remove_ids(self, sel) -> int:
        """Remove vectors matching an IDSelector (faiss
        Index::remove_ids); remaining vectors are renumbered sequentially
        like IndexFlatCodes::remove_ids."""
        if self.ntotal == 0:
            return 0
        keep = sel.make_bitmap(self.ntotal) == 0
        kept = np.asarray(self.vectors)[keep]
        removed = self.ntotal - len(kept)
        self.reset()
        if len(kept):
            self.add(kept)
        return removed

    # --- reconstruction / codec -------------------------------------------
    def reconstruct(self, key: int) -> np.ndarray:
        if not (0 <= key < self.ntotal):
            raise IndexError(key)
        return np.asarray(self._xb[key])

    def reconstruct_n(self, i0: int, ni: int) -> np.ndarray:
        if not (0 <= i0 and i0 + ni <= self.ntotal):
            raise IndexError((i0, ni))
        return np.asarray(self._xb[i0 : i0 + ni])

    def sa_code_size(self) -> int:
        return 4 * self.d

    def sa_encode(self, x) -> np.ndarray:
        return self._check_input(x).view(np.uint8).reshape(len(x), -1)

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, dtype=np.uint8)
        return codes.view(np.float32).reshape(len(codes), self.d)

    # --- internals exposed for composition (quantizer use, serialization) --
    @property
    def vectors(self) -> jnp.ndarray:
        """(ntotal, d) valid rows (device array view)."""
        if self._xb is None:
            return jnp.zeros((0, self.d), jnp.float32)
        return self._xb[: self.ntotal]

    def state_dict(self) -> dict:
        return {
            "d": self.d,
            "metric": self.metric_type,
            "ntotal": self.ntotal,
            "xb": np.asarray(self.vectors),
        }

    @classmethod
    def from_state(cls, st: dict) -> "IndexFlat":
        idx = cls(int(st["d"]), int(st["metric"]))
        if st["ntotal"]:
            idx.add(st["xb"])
        return idx


class IndexFlatL2(IndexFlat):
    def __init__(self, d: int):
        super().__init__(d, METRIC_L2)


class IndexFlatIP(IndexFlat):
    def __init__(self, d: int):
        super().__init__(d, METRIC_INNER_PRODUCT)


class IndexFlat1D(IndexFlat):
    """1-D specialization (faiss IndexFlat1D): search by binary search in
    the sorted values instead of GEMM."""

    def __init__(self):
        super().__init__(1, METRIC_L2)
        self._sorted: Optional[np.ndarray] = None
        self._perm: Optional[np.ndarray] = None

    def update_permutation(self) -> None:
        vals = np.asarray(self.vectors)[:, 0]
        self._perm = np.argsort(vals)
        self._sorted = vals[self._perm]

    def add(self, x) -> None:
        super().add(x)
        self.update_permutation()

    def search(self, x, k: int, *, params=None):
        x = np.asarray(x, np.float32).reshape(-1)
        if self.ntotal == 0:
            return (np.full((len(x), k), np.inf, np.float32),
                    np.full((len(x), k), -1, np.int64))
        pos = np.searchsorted(self._sorted, x)
        n = self.ntotal
        kk = min(k, n)
        # expand a window around the insertion point
        offs = np.arange(-kk, kk + 1)
        cand = np.clip(pos[:, None] + offs[None, :], 0, n - 1)
        dis = (self._sorted[cand] - x[:, None]) ** 2
        # clipping at the array ends duplicates candidates; candidates are
        # sorted, so mask adjacent repeats
        dup = np.zeros_like(dis, dtype=bool)
        dup[:, 1:] = cand[:, 1:] == cand[:, :-1]
        dis[dup] = np.inf
        order = np.argsort(dis, axis=1)[:, :k]
        Dv = np.take_along_axis(dis, order, axis=1).astype(np.float32)
        Iv = self._perm[np.take_along_axis(cand, order, axis=1)]
        if kk < k:
            Dv[:, kk:] = np.inf
            Iv = Iv.astype(np.int64)
            Iv[:, kk:] = -1
        return Dv, Iv.astype(np.int64)
