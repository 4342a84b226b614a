"""Python side of the C API (c_api/tpu_ann_c.{h,c}).

The reference exposes its index API to C callers through hand-written
wrappers per class (`c_api/Index_c.h:72-128`, `index_factory_c.h:24`).
Here the C library embeds CPython and marshals flat buffers through this
module: every function takes/returns only ints, floats, str, and
writable memoryviews, so the C side stays a thin, class-agnostic
marshalling layer — the whole index zoo (everything `index_factory`
spells) is reachable from C through one handle type.

Buffers cross the boundary as memoryviews over caller-owned C memory;
results are written in place (np.frombuffer gives a zero-copy view).
"""

from __future__ import annotations

import numpy as np

_handles: dict[int, object] = {}
_next_id = [1]


def _new_handle(obj) -> int:
    h = _next_id[0]
    _next_id[0] += 1
    _handles[h] = obj
    return h


def _get(h: int):
    try:
        return _handles[h]
    except KeyError:
        raise ValueError(f"invalid or freed index handle {h}") from None


def _as_f32(buf, n: int, d: int) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.float32, count=n * d)
    return a.reshape(n, d)


def configure_platform() -> str:
    """Translate JAX_PLATFORMS (if set) into jax.config before any
    backend init — same reason as demos/_bootstrap.py: the embedded
    interpreter may run a sitecustomize that would otherwise pick the
    remote backend. Returns the selected backend name."""
    import os

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    return jax.default_backend()


def factory(d: int, description: str, metric: int) -> int:
    from .utils.factory import index_factory

    return _new_handle(index_factory(int(d), description, int(metric)))


def free(h: int) -> None:
    _handles.pop(int(h), None)


def train(h: int, x, n: int, d: int) -> None:
    _get(h).train(_as_f32(x, n, d))


def add(h: int, x, n: int, d: int) -> None:
    _get(h).add(_as_f32(x, n, d))


def add_with_ids(h: int, x, n: int, d: int, ids) -> None:
    xs = _as_f32(x, n, d)
    idv = np.frombuffer(ids, dtype=np.int64, count=n)
    _get(h).add_with_ids(xs, idv)


def search(h: int, x, n: int, d: int, k: int, out_d, out_i) -> None:
    D, I = _get(h).search(_as_f32(x, n, d), int(k))
    np.frombuffer(out_d, dtype=np.float32, count=n * k)[:] = (
        np.ascontiguousarray(D, np.float32).reshape(-1))
    np.frombuffer(out_i, dtype=np.int64, count=n * k)[:] = (
        np.ascontiguousarray(I, np.int64).reshape(-1))


def range_search(h: int, x, n: int, d: int, radius: float) -> int:
    """Stage a range search; returns a result handle. Fetch sizes with
    range_result_lims, payload with range_result_fetch, then free with
    free()."""
    res = _get(h).range_search(_as_f32(x, n, d), float(radius))
    return _new_handle(res)


def range_result_nnz(rh: int) -> int:
    lims, _D, _I = _get(rh)
    return int(lims[-1])


def range_result_fetch(rh: int, nq: int, out_lims, out_d, out_i) -> None:
    lims, D, I = _get(rh)
    nnz = int(lims[-1])
    np.frombuffer(out_lims, dtype=np.int64, count=nq + 1)[:] = (
        np.asarray(lims, np.int64))
    np.frombuffer(out_d, dtype=np.float32, count=nnz)[:] = (
        np.asarray(D, np.float32))
    np.frombuffer(out_i, dtype=np.int64, count=nnz)[:] = (
        np.asarray(I, np.int64))


def reconstruct(h: int, key: int, out) -> None:
    idx = _get(h)
    np.frombuffer(out, dtype=np.float32, count=idx.d)[:] = (
        np.asarray(idx.reconstruct(int(key)), np.float32).reshape(-1))


def remove_ids(h: int, ids, n: int) -> int:
    from .models.selectors import IDSelectorBatch

    sel = IDSelectorBatch(np.frombuffer(ids, dtype=np.int64, count=n))
    return int(_get(h).remove_ids(sel))


def ntotal(h: int) -> int:
    return int(_get(h).ntotal)


def dim(h: int) -> int:
    return int(_get(h).d)


def is_trained(h: int) -> int:
    return 1 if _get(h).is_trained else 0


def metric_type(h: int) -> int:
    return int(_get(h).metric_type)


def set_parameter(h: int, name: str, value: float) -> None:
    from .utils.autotune import set_index_parameter

    set_index_parameter(_get(h), name, value)


def write_index(h: int, path: str) -> None:
    from .utils.index_io import write_index as _w

    _w(_get(h), path)


def read_index(path: str, mmap: int) -> int:
    from .utils.index_io import read_index as _r

    return _new_handle(_r(path, mmap=bool(mmap)))


def sa_code_size(h: int) -> int:
    return int(_get(h).sa_code_size())


def sa_encode(h: int, x, n: int, d: int, out) -> None:
    codes = _get(h).sa_encode(_as_f32(x, n, d))
    buf = np.frombuffer(out, dtype=np.uint8,
                        count=n * _get(h).sa_code_size())
    buf[:] = np.ascontiguousarray(codes, np.uint8).reshape(-1)


def sa_decode(h: int, codes, n: int, out) -> None:
    idx = _get(h)
    cs = idx.sa_code_size()
    cv = np.frombuffer(codes, dtype=np.uint8, count=n * cs).reshape(n, cs)
    np.frombuffer(out, dtype=np.float32, count=n * idx.d)[:] = (
        np.ascontiguousarray(idx.sa_decode(cv), np.float32).reshape(-1))
