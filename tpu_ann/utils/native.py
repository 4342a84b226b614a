"""ctypes bindings for the native host runtime (native/tpu_ann_native.cpp).

The reference's host-side hot loops are C++ with OpenMP; ours live in a
small C ABI library loaded here (no pybind11 in the image — ctypes is the
binding layer, like the reference's C API c_api/*_c.h is for C callers).
Every entry point has a numpy fallback so the package works without the
compiled library; `HAVE_NATIVE` says which path is active.

Build: `make -C native` at the repo root (done automatically on first use
if a compiler is available)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _try_load() -> None:
    global _LIB, HAVE_NATIVE
    if os.environ.get("TPU_ANN_DISABLE_NATIVE"):
        return     # numpy fallbacks everywhere (debug / bisection aid)
    so = os.path.join(_repo_root(), "native", "libtpu_ann_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_repo_root(), "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return
    lib.fbin_header.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int32)]
    lib.fbin_read.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_void_p]
    lib.fvecs_read.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int32),
                               ctypes.c_void_p]
    lib.fvecs_read.restype = ctypes.c_int64
    lib.pack_layout.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
    lib.pack_layout.restype = ctypes.c_int64
    lib.pack_scatter.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_void_p]
    lib.fvec_norms_l2sqr.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_void_p]
    if hasattr(lib, "reverse_edges"):
        lib.reverse_edges.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_void_p,
                                      ctypes.c_void_p]
    _LIB = lib
    HAVE_NATIVE = True


_try_load()


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def read_fbin_native(path: str, start: int = 0,
                     count: Optional[int] = None) -> np.ndarray:
    """Parallel fbin reader; falls back to utils.datasets.read_fbin."""
    if _LIB is None:
        from .datasets import read_fbin

        return read_fbin(path, start, count)
    n = ctypes.c_int32()
    d = ctypes.c_int32()
    if _LIB.fbin_header(path.encode(), ctypes.byref(n),
                        ctypes.byref(d)) != 0:
        raise IOError(f"cannot read {path}")
    total = n.value - start
    if count is not None:
        total = min(total, count)
    out = np.empty((total, d.value), np.float32)
    if _LIB.fbin_read(path.encode(), start, total, _ptr(out)) != 0:
        raise IOError(f"short read on {path}")
    return out


def read_fvecs_native(path: str, max_rows: int = -1) -> np.ndarray:
    if _LIB is None:
        from .datasets import fvecs_read

        x = fvecs_read(path)
        return x if max_rows < 0 else x[:max_rows]
    d = ctypes.c_int32()
    rows = _LIB.fvecs_read(path.encode(), max_rows, ctypes.byref(d), None)
    if rows < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((rows, d.value), np.float32)
    got = _LIB.fvecs_read(path.encode(), rows, ctypes.byref(d), _ptr(out))
    if got != rows:
        raise IOError(f"short read on {path}")
    return out


def pack_rows_native(
    x: np.ndarray,
    xids: np.ndarray,
    assign: np.ndarray,
    nlist: int,
    block: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Counting-sort rows into the block-padded invlist layout with the
    native scatter. Returns (data, ids, starts_blocks, nblocks_per_list)
    or None when the native lib is unavailable (caller uses numpy path).

    `x` may be float32 vectors or uint8 code rows — any row-contiguous
    2-D array."""
    if _LIB is None:
        return None
    x = np.ascontiguousarray(x)
    n = len(x)
    row_bytes = x.strides[0]
    xids = np.ascontiguousarray(xids, np.int32)
    assign = np.ascontiguousarray(assign, np.int64)
    sizes = np.zeros(nlist, np.int64)
    nblocks = np.zeros(nlist, np.int64)
    starts = np.zeros(nlist, np.int64)
    nb_total = _LIB.pack_layout(_ptr(assign), n, nlist, block, _ptr(sizes),
                                _ptr(nblocks), _ptr(starts))
    data = np.zeros((nb_total + 1) * block * row_bytes, np.uint8)
    ids = np.full((nb_total + 1) * block, -1, np.int32)
    _LIB.pack_scatter(_ptr(x), row_bytes, _ptr(xids), _ptr(assign), n,
                      block, _ptr(starts), _ptr(data), _ptr(ids))
    data = data.view(x.dtype).reshape(nb_total + 1, block, x.shape[1])
    ids = ids.reshape(nb_total + 1, block)
    starts = starts.copy()
    starts[nblocks == 0] = nb_total  # empty lists -> dummy block
    return data, ids, starts, nblocks


def norms_l2sqr_native(x: np.ndarray) -> np.ndarray:
    if _LIB is None:
        return (x.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    x = np.ascontiguousarray(x, np.float32)
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty(len(flat), np.float32)
    _LIB.fvec_norms_l2sqr(_ptr(flat), len(flat), flat.shape[-1], _ptr(out))
    return out.reshape(x.shape[:-1])


def reverse_edges_native(fwd: np.ndarray, fwd_dis: np.ndarray, cap: int):
    """Reverse-edge table (first `cap` sources per destination, ascending
    source): native parallel counting scatter, or None if the library is
    unavailable (caller falls back to the numpy sort path)."""
    if _LIB is None or not hasattr(_LIB, "reverse_edges"):
        return None
    fwd = np.ascontiguousarray(fwd, np.int32)
    fwd_dis = np.ascontiguousarray(fwd_dis, np.float32)
    n, m = fwd.shape
    rev_ids = np.full((n, cap), -1, np.int32)
    rev_dis = np.full((n, cap), np.inf, np.float32)
    _LIB.reverse_edges(_ptr(fwd), _ptr(fwd_dis), n, m, cap,
                       _ptr(rev_ids), _ptr(rev_dis))
    return rev_ids, rev_dis
