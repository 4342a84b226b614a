"""Index (de)serialization — counterpart of faiss `impl/index_write.cpp` /
`impl/index_read.cpp` / `index_io.h`.

The reference uses a fourcc-tagged binary stream with an mmap load path
(`IO_FLAG_MMAP` reads list sizes only and maps the codes region,
impl/index_read.cpp:185-230). Same idea here: one file =

    magic "TANN0001" | u64 header_len | JSON header | aligned raw blobs

The JSON header carries the index type, scalar metadata, and an array
table (dtype/shape/offset). `read_index(path, mmap=True)` maps every
array with np.memmap instead of reading it — the fork's
bigger-than-RAM search workflow (tutorial/python/190-…test.py:1404-1427);
arrays are then uploaded to HBM lazily as the index touches them.

Every index type registers (state_dict -> meta+arrays, from_state).
Nested indexes (IVF's coarse quantizer) nest under a name prefix the way
the reference recursively writes the quantizer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

MAGIC = b"TANN0001"
ALIGN = 64


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _write_container(path: str, meta: Dict[str, Any],
                     arrays: Dict[str, np.ndarray]) -> None:
    table = {}
    offset = 0
    blobs = []
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        pad = (-offset) % ALIGN
        offset += pad
        # extension dtypes (ml_dtypes bfloat16 etc.) stringify to void
        # ('<V2') — store the registered NAME instead, which np.dtype()
        # resolves back through ml_dtypes on read
        dstr = arr.dtype.str
        if np.dtype(dstr) != arr.dtype:
            dstr = arr.dtype.name
        table[name] = {
            "dtype": dstr,
            "shape": list(arr.shape),
            "offset": offset,
        }
        blobs.append((pad, arr))
        offset += arr.nbytes
    header = json.dumps({"meta": meta, "arrays": table}).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(np.uint64(len(header)).tobytes())
        f.write(header)
        base = f.tell()
        pad0 = (-base) % ALIGN
        f.write(b"\0" * pad0)
        for pad, arr in blobs:
            f.write(b"\0" * pad)
            f.write(arr.tobytes())


def _read_container(path: str, mmap: bool = False
                    ) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    with open(path, "rb") as f:
        if f.read(8) != MAGIC:
            raise ValueError(f"{path}: not a tpu_ann index file")
        (hlen,) = np.frombuffer(f.read(8), np.uint64)
        header = json.loads(f.read(int(hlen)).decode())
        base = f.tell()
        base += (-base) % ALIGN
        arrays = {}
        for name, spec in header["arrays"].items():
            dtype = np.dtype(spec["dtype"])
            shape = tuple(spec["shape"])
            off = base + spec["offset"]
            if mmap:
                arrays[name] = np.memmap(path, dtype=dtype, mode="r",
                                         offset=off, shape=shape)
            else:
                f.seek(off)
                count = int(np.prod(shape)) if shape else 1
                arrays[name] = np.fromfile(
                    f, dtype=dtype, count=count).reshape(shape)
    return header["meta"], arrays


# ---------------------------------------------------------------------------
# per-type (de)serializers. fourcc-style type tags.
# ---------------------------------------------------------------------------

def _flatten(prefix: str, meta: dict, arrays: dict, out_m: dict, out_a: dict):
    out_m[prefix] = meta
    for k, v in arrays.items():
        out_a[f"{prefix}/{k}"] = v


def _sub(prefix: str, meta: dict, arrays: dict):
    m = meta[prefix]
    a = {k[len(prefix) + 1:]: v for k, v in arrays.items()
         if k.startswith(prefix + "/")}
    return m, a


def _dump_flat(index) -> Tuple[dict, dict]:
    return (
        {"tag": "IxFl", "d": index.d, "metric": index.metric_type,
         "ntotal": index.ntotal},
        {"xb": np.asarray(index.vectors)},
    )


def _load_flat(meta, arrays):
    from ..models.flat import IndexFlat

    idx = IndexFlat(int(meta["d"]), int(meta["metric"]))
    if meta["ntotal"]:
        idx.add(np.asarray(arrays["xb"]))
    return idx


def _dump_hnsw(index) -> Tuple[dict, dict]:
    meta = {
        "tag": "IHNf", "d": index.d, "metric": index.metric_type,
        "ntotal": index.ntotal, "M": index.hnsw.M,
        "efConstruction": index.hnsw.efConstruction,
        "efSearch": index.hnsw.efSearch,
    }
    arrays = {"xb": np.asarray(index.storage.vectors)}
    _graph_meta_arrays(index, meta, arrays)
    return meta, arrays


def _load_hnsw(meta, arrays):
    import jax.numpy as jnp

    from ..models.hnsw import IndexHNSWFlat

    idx = IndexHNSWFlat(int(meta["d"]), int(meta["M"]), int(meta["metric"]))
    idx.hnsw.efConstruction = int(meta["efConstruction"])
    idx.hnsw.efSearch = int(meta["efSearch"])
    if meta["ntotal"]:
        # restore storage without triggering a rebuild
        idx.storage.add(np.asarray(arrays["xb"]))
        idx.ntotal = idx.storage.ntotal
    _restore_graph(idx, meta, arrays)
    return idx


def _graph_meta_arrays(index, meta, arrays):
    g = index.graph
    meta["has_graph"] = g is not None
    if g is not None:
        meta["max_level"] = g.max_level
        meta["entry"] = int(np.asarray(g.entry))
        arrays.update(
            neighbors0=np.asarray(g.neighbors0),
            upper_ids=np.asarray(g.upper_ids),
            upper_neighbors=np.asarray(g.upper_neighbors),
            levels=np.asarray(g.levels),
        )


def _restore_graph(idx, meta, arrays):
    import jax.numpy as jnp

    from ..ops.hnsw import HNSWGraph

    if meta.get("has_graph"):
        idx.graph = HNSWGraph(
            neighbors0=jnp.asarray(np.asarray(arrays["neighbors0"])),
            upper_ids=jnp.asarray(np.asarray(arrays["upper_ids"])),
            upper_neighbors=jnp.asarray(
                np.asarray(arrays["upper_neighbors"])),
            levels=jnp.asarray(np.asarray(arrays["levels"])),
            entry=jnp.int32(meta["entry"]),
            max_level=int(meta["max_level"]),
        )
        idx._built_n = idx.ntotal


def _dump_hnswsq(index):
    if getattr(index, "storage_dtype", None) == "sq8" and \
            index._storage_dropped():
        # coded-tile mode dropped the raw storage: serialize the
        # dequantized rows (storage precision IS the index's precision)
        meta = {
            "tag": "IHNs", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "M": index.hnsw.M,
            "efConstruction": index.hnsw.efConstruction,
            "efSearch": index.hnsw.efSearch, "qtype": "sq8",
        }
        arrays = {"xb": index._sq8_rows()}
        _graph_meta_arrays(index, meta, arrays)
        return meta, arrays
    meta, arrays = _dump_hnsw(index)
    meta["tag"] = "IHNs"
    meta["qtype"] = index.storage_dtype
    return meta, arrays


def _load_hnswsq(meta, arrays):
    from ..models.hnsw import IndexHNSWSQ

    idx = IndexHNSWSQ(int(meta["d"]), meta["qtype"], int(meta["M"]),
                      int(meta["metric"]))
    idx.hnsw.efConstruction = int(meta["efConstruction"])
    idx.hnsw.efSearch = int(meta["efSearch"])
    if meta["ntotal"]:
        idx.storage.add(np.asarray(arrays["xb"]))
        idx.ntotal = idx.storage.ntotal
    _restore_graph(idx, meta, arrays)
    return idx


def _dump_hnswpq(index):
    meta = {
        "tag": "IHNq", "d": index.d, "metric": index.metric_type,
        "ntotal": index.ntotal, "M": index.hnsw.M,
        "pq_m": index.pq_m, "nbits": index.nbits,
        "efConstruction": index.hnsw.efConstruction,
        "efSearch": index.hnsw.efSearch,
        "is_trained": index.is_trained,
    }
    arrays = {"codes": index._codes}
    if index.pq is not None:
        arrays["pq_centroids"] = np.asarray(index.pq.centroids)
    _graph_meta_arrays(index, meta, arrays)
    return meta, arrays


def _load_hnswpq(meta, arrays):
    from ..models.hnsw import IndexHNSWPQ
    from ..ops.pq import PQCodec

    idx = IndexHNSWPQ(int(meta["d"]), int(meta["pq_m"]), int(meta["M"]),
                      int(meta["nbits"]), int(meta["metric"]))
    idx.hnsw.efConstruction = int(meta["efConstruction"])
    idx.hnsw.efSearch = int(meta["efSearch"])
    if "pq_centroids" in arrays:
        idx.pq = PQCodec(
            centroids=np.asarray(arrays["pq_centroids"]),
            d=int(meta["d"]), M=int(meta["pq_m"]),
            nbits=int(meta["nbits"]))
    idx.is_trained = bool(meta["is_trained"])
    idx._codes = np.asarray(arrays["codes"])
    idx.ntotal = int(meta["ntotal"])
    idx.storage.ntotal = idx.ntotal
    _restore_graph(idx, meta, arrays)
    # coded tiles are rebuilt lazily from decoded codes on first search
    return idx


def _dump_ivf_common(index) -> Tuple[dict, dict]:
    # flush any deferred (repack=False) adds so the serialized invlists
    # match ntotal — otherwise a loaded index would silently miss rows
    index._maybe_repack()
    meta = {
        "d": index.d, "metric": index.metric_type, "ntotal": index.ntotal,
        "nlist": index.nlist, "nprobe": index.nprobe,
        "block_size": index.block_size,
        "has_invlists": index.invlists is not None,
    }
    arrays = {}
    qm, qa = dump_index(index.quantizer)
    _flatten("quantizer", qm, qa, meta, arrays)
    # Raw-float invlists whose content is fully recoverable from the
    # host store are NOT downloaded: the device arrays are a reordered
    # copy of _xb_host, and pulling them back through a remote-TPU
    # tunnel dominated save time (Deep10M: 526 s for 7.9 GB, ~15 MB/s —
    # BENCHMARKS.md round-4 build profile). Instead the per-chunk coarse
    # assignments are saved (tiny) and the packed layout is rebuilt by
    # the native counting sort on first use after load (_maybe_repack).
    # Coded invlists (PQ/SQ) still download their codes — re-encoding at
    # load would cost device GEMMs, and codes are ~16-96 B/vector.
    host_n = sum(len(c) for c in index._xb_host) if index._xb_host else 0
    coded_il = index.invlists is not None and \
        not hasattr(index.invlists, "data")
    rmask = getattr(index, "_removed_mask", None)
    il_from_host = (index.invlists is not None and not coded_il
                    and host_n == index.ntotal
                    and (rmask is None or not rmask.any()))
    meta["il_from_host"] = il_from_host
    if index.invlists is not None and not il_from_host:
        il = index.invlists
        meta["max_nblocks"] = il.max_nblocks_per_list
        meta["il_coded"] = coded_il
        arrays.update({
            "il_data": np.asarray(il.codes if coded_il else il.data),
            "il_ids": np.asarray(il.ids),
            "il_start": np.asarray(il.list_block_start),
            "il_nblocks": np.asarray(il.list_nblocks),
        })
        if not coded_il:
            arrays["il_norms"] = np.asarray(il.norms)
    if index._xb_host:
        arrays["xb_host"] = np.concatenate(index._xb_host, axis=0)
        arrays["ids_host"] = np.concatenate(index._ids_host, axis=0)
        if il_from_host and all(a is not None
                                for a in index._assign_host):
            arrays["assign_host"] = np.concatenate(
                [np.asarray(a, np.int32) for a in index._assign_host])
    return meta, arrays


def _restore_ivf_common(idx, meta, arrays):
    import jax.numpy as jnp

    from ..ops.ivf_scan import PackedInvLists

    qm, qa = _sub("quantizer", meta, arrays)
    idx.quantizer = load_index(qm, qa)
    idx.nprobe = int(meta["nprobe"])
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
    if meta.get("il_from_host"):
        # packed invlists were not serialized (see _dump_ivf_common):
        # restore the host store + assignments and let the first use
        # rebuild the device layout via the normal repack path
        idx._xb_host = [np.asarray(arrays["xb_host"])]
        idx._ids_host = [np.asarray(arrays["ids_host"])]
        idx._assign_host = [np.asarray(arrays["assign_host"], np.int64)
                            if "assign_host" in arrays else None]
        idx._dirty = True
        idx.invlists = None
        return idx
    if meta.get("has_invlists"):
        if meta.get("il_coded"):
            from ..ops.ivf_scan import PackedCodeInvLists

            pil = PackedCodeInvLists(
                codes=jnp.asarray(np.asarray(arrays["il_data"])),
                ids=jnp.asarray(np.asarray(arrays["il_ids"])),
                list_block_start=jnp.asarray(np.asarray(arrays["il_start"])),
                list_nblocks=jnp.asarray(np.asarray(arrays["il_nblocks"])),
            )
        else:
            pil = PackedInvLists(
                data=jnp.asarray(np.asarray(arrays["il_data"])),
                ids=jnp.asarray(np.asarray(arrays["il_ids"])),
                norms=jnp.asarray(np.asarray(arrays["il_norms"])),
                list_block_start=jnp.asarray(np.asarray(arrays["il_start"])),
                list_nblocks=jnp.asarray(np.asarray(arrays["il_nblocks"])),
            )
        pil._max_nblocks = int(meta["max_nblocks"])
        idx.invlists = pil
    if "ids_host" in arrays:
        ids = np.asarray(arrays["ids_host"])
        # packed invlists store row indices; rebuild the row->id map
        # (present even for search-only files without a host vector store,
        # e.g. coded merge_ondisk outputs)
        idx._ids_flat = ids
        n = len(ids)
        idx._ids_trivial = bool(
            n == 0 or (ids[0] == 0 and ids[-1] == n - 1
                       and np.array_equal(ids, np.arange(n,
                                                         dtype=np.int64))))
        if "xb_host" in arrays:
            idx._xb_host = [np.asarray(arrays["xb_host"])]
            idx._ids_host = [ids]
            idx._assign_host = [None]
    return idx


def _dump_ivfflat(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwFl"
    return meta, arrays


def _load_ivfflat(meta, arrays):
    from ..models.flat import IndexFlat
    from ..models.ivf import IndexIVFFlat

    idx = IndexIVFFlat(IndexFlat(int(meta["d"]), int(meta["metric"])),
                       int(meta["d"]), int(meta["nlist"]),
                       int(meta["metric"]), int(meta["block_size"]))
    return _restore_ivf_common(idx, meta, arrays)


def _dump_ivfdedup(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwFD"
    if index.instances:
        reps, dups = [], []
        for rep, ds in index.instances.items():
            for dd in ds:
                reps.append(rep)
                dups.append(dd)
        arrays["dedup_reps"] = np.asarray(reps, np.int64)
        arrays["dedup_dups"] = np.asarray(dups, np.int64)
    return meta, arrays


def _load_ivfdedup(meta, arrays):
    from ..models.flat import IndexFlat
    from ..models.ivf import IndexIVFFlatDedup

    idx = IndexIVFFlatDedup(IndexFlat(int(meta["d"]), int(meta["metric"])),
                            int(meta["d"]), int(meta["nlist"]),
                            int(meta["metric"]), int(meta["block_size"]))
    if "dedup_reps" in arrays:
        for rep, dup in zip(np.asarray(arrays["dedup_reps"]),
                            np.asarray(arrays["dedup_dups"])):
            idx.instances.setdefault(int(rep), []).append(int(dup))
    return _restore_ivf_common(idx, meta, arrays)


def _dump_ivfhnsw(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwHn"
    meta["add_chunk_size"] = index.add_chunk_size
    return meta, arrays


def _load_ivfhnsw(meta, arrays):
    from ..models.ivf_hnsw import IndexIVFHNSW

    idx = IndexIVFHNSW(int(meta["d"]), int(meta["nlist"]),
                       int(meta["metric"]), block_size=int(meta["block_size"]))
    idx.add_chunk_size = int(meta.get("add_chunk_size", 100000))
    return _restore_ivf_common(idx, meta, arrays)


_DUMPERS = {}
_LOADERS = {}


def _register(cls_name: str, tag: str, dump, load):
    _DUMPERS[cls_name] = dump
    _LOADERS[tag] = load


_register("IndexFlat", "IxFl", _dump_flat, _load_flat)
_register("IndexFlatL2", "IxFl", _dump_flat, _load_flat)
_register("IndexFlatIP", "IxFl", _dump_flat, _load_flat)
_register("IndexHNSW", "IHNf", _dump_hnsw, _load_hnsw)
_register("IndexHNSWFlat", "IHNf", _dump_hnsw, _load_hnsw)
_register("IndexHNSWSQ", "IHNs", _dump_hnswsq, _load_hnswsq)
_register("IndexHNSWPQ", "IHNq", _dump_hnswpq, _load_hnswpq)
_register("IndexIVF", "IwFl", _dump_ivfflat, _load_ivfflat)
_register("IndexIVFFlat", "IwFl", _dump_ivfflat, _load_ivfflat)
_register("IndexIVFFlatDedup", "IwFD", _dump_ivfdedup, _load_ivfdedup)
_register("IndexIVFHNSW", "IwHn", _dump_ivfhnsw, _load_ivfhnsw)


def dump_index(index) -> Tuple[dict, dict]:
    name = type(index).__name__
    if name not in _DUMPERS:
        raise TypeError(f"don't know how to serialize {name}")
    return _DUMPERS[name](index)


def load_index(meta: dict, arrays: dict):
    tag = meta["tag"]
    if tag not in _LOADERS:
        raise ValueError(f"unknown index tag {tag!r}")
    return _LOADERS[tag](meta, arrays)


# ---------------------------------------------------------------------------
# public API (index_io.h:39-70)
# ---------------------------------------------------------------------------

def write_index(index, path: str) -> None:
    meta, arrays = dump_index(index)
    _write_container(path, meta, arrays)


def read_index(path: str, mmap: bool = False):
    """Load an index. mmap=True maps array blobs (IO_FLAG_MMAP analog) —
    host RAM stays proportional to touched pages, device upload unchanged."""
    meta, arrays = _read_container(path, mmap=mmap)
    return load_index(meta, arrays)


def clone_index(index):
    """Deep-copy an index through its serialized state, entirely in
    memory (faiss clone_index, clone_index.cpp) — the clone shares no
    mutable arrays with the original."""
    import copy

    meta, arrays = dump_index(index)
    arrays = {k: np.array(v, copy=True) for k, v in arrays.items()}
    return load_index(copy.deepcopy(meta), arrays)


# ---------------------------------------------------------------------------
# codec / composite index serializers
# ---------------------------------------------------------------------------

def _dump_pq(index):
    return (
        {"tag": "IxPQ", "d": index.d, "metric": index.metric_type,
         "ntotal": index.ntotal, "M": index.M, "nbits": index.nbits},
        {"centroids": index.pq.centroids,
         "codes": (np.asarray(index._codes[: index.ntotal])
                   if index.ntotal else
                   np.zeros((0, 0), np.uint8))},
    )


def _load_pq(meta, arrays):
    import jax.numpy as jnp

    from ..models.pq import IndexPQ
    from ..ops.pq import PQCodec

    idx = IndexPQ(int(meta["d"]), int(meta["M"]), int(meta["nbits"]),
                  int(meta["metric"]))
    cents = np.asarray(arrays["centroids"])
    idx.pq = PQCodec(centroids=cents, d=idx.d, M=idx.M, nbits=idx.nbits)
    idx._centroids_dev = jnp.asarray(cents)
    idx.is_trained = True
    if meta["ntotal"]:
        codes = np.asarray(arrays["codes"])
        idx._codes = jnp.asarray(codes)
        idx._capacity = codes.shape[0]
        idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_sq(index):
    from ..ops.sq import QT_8BIT, QT_8BIT_UNIFORM

    meta = {"tag": "IxSQ", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "qtype": index.qtype}
    arrays = {}
    if index.sq is not None and index.sq.vmin is not None:
        arrays["vmin"] = index.sq.vmin
        arrays["vdiff"] = index.sq.vdiff
    if index.ntotal:
        arrays["codes"] = np.asarray(index._codes)
    return meta, arrays


def _load_sq(meta, arrays):
    import jax.numpy as jnp

    from ..models.pq import IndexScalarQuantizer
    from ..ops.sq import SQCodec

    idx = IndexScalarQuantizer(int(meta["d"]), int(meta["qtype"]),
                               int(meta["metric"]))
    idx.sq = SQCodec(qtype=int(meta["qtype"]), d=int(meta["d"]),
                     vmin=(np.asarray(arrays["vmin"])
                           if "vmin" in arrays else None),
                     vdiff=(np.asarray(arrays["vdiff"])
                            if "vdiff" in arrays else None))
    idx.is_trained = True
    if "codes" in arrays:
        idx._codes = jnp.asarray(np.asarray(arrays["codes"]))
        idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_ivfpq(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwPQ"
    meta.update(M=index.M, nbits=index.nbits,
                by_residual=bool(index.by_residual))
    arrays["pq_centroids"] = index.pq.centroids
    return meta, arrays


def _load_ivfpq(meta, arrays):
    import jax.numpy as jnp

    from ..models.flat import IndexFlat
    from ..models.ivf_pq import IndexIVFPQ
    from ..ops.pq import PQCodec

    idx = IndexIVFPQ(IndexFlat(int(meta["d"]), int(meta["metric"])),
                     int(meta["d"]), int(meta["nlist"]), int(meta["M"]),
                     int(meta["nbits"]), int(meta["metric"]),
                     int(meta["block_size"]))
    idx.by_residual = bool(meta["by_residual"])
    cents = np.asarray(arrays["pq_centroids"])
    idx.pq = PQCodec(centroids=cents, d=idx.d, M=idx.M, nbits=idx.nbits)
    idx._pq_cent_dev = jnp.asarray(cents)
    return _restore_ivf_common(idx, meta, arrays)


def _dump_ivfsq(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwSQ"
    meta["qtype"] = index.qtype
    if index.sq.vmin is not None:
        arrays["sq_vmin"] = index.sq.vmin
        arrays["sq_vdiff"] = index.sq.vdiff
    return meta, arrays


def _load_ivfsq(meta, arrays):
    from ..models.flat import IndexFlat
    from ..models.ivf_pq import IndexIVFScalarQuantizer
    from ..ops.sq import SQCodec

    idx = IndexIVFScalarQuantizer(
        IndexFlat(int(meta["d"]), int(meta["metric"])), int(meta["d"]),
        int(meta["nlist"]), int(meta["qtype"]), int(meta["metric"]),
        int(meta["block_size"]))
    idx.sq = SQCodec(qtype=int(meta["qtype"]), d=int(meta["d"]),
                     vmin=(np.asarray(arrays["sq_vmin"])
                           if "sq_vmin" in arrays else None),
                     vdiff=(np.asarray(arrays["sq_vdiff"])
                            if "sq_vdiff" in arrays else None))
    return _restore_ivf_common(idx, meta, arrays)


def _dump_pretransform(index):
    from ..models.transforms import LinearTransform

    meta = {"tag": "IxPT", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "nchain": len(index.chain),
            "chain_types": [type(t).__name__ for t in index.chain]}
    arrays = {}
    for i, t in enumerate(index.chain):
        if not isinstance(t, LinearTransform):
            raise TypeError(
                f"cannot serialize transform {type(t).__name__}")
        arrays[f"vt{i}_A"] = t.A
        if t.b is not None:
            arrays[f"vt{i}_b"] = t.b
        meta[f"vt{i}_din"] = t.d_in
        meta[f"vt{i}_dout"] = t.d_out
        meta[f"vt{i}_ortho"] = bool(t.is_orthonormal)
    sm, sa = dump_index(index.index)
    _flatten("sub", sm, sa, meta, arrays)
    return meta, arrays


def _load_pretransform(meta, arrays):
    from ..models.transforms import IndexPreTransform, LinearTransform

    chain = []
    for i in range(int(meta["nchain"])):
        t = LinearTransform(int(meta[f"vt{i}_din"]),
                            int(meta[f"vt{i}_dout"]))
        t.A = np.asarray(arrays[f"vt{i}_A"])
        if f"vt{i}_b" in arrays:
            t.b = np.asarray(arrays[f"vt{i}_b"])
        t.is_orthonormal = bool(meta[f"vt{i}_ortho"])
        t.is_trained = True
        chain.append(t)
    sm, sa = _sub("sub", meta, arrays)
    sub = load_index(sm, sa)
    idx = IndexPreTransform(*chain, sub)
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
    return idx


def _dump_idmap(index):
    from ..models.idmap import IndexIDMap2

    tag = "IxM2" if isinstance(index, IndexIDMap2) else "IxMp"
    meta = {"tag": tag, "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal}
    arrays = {"id_map": np.asarray(index.id_map, np.int64)}
    sm, sa = dump_index(index.index)
    _flatten("sub", sm, sa, meta, arrays)
    return meta, arrays


def _load_idmap(meta, arrays):
    from ..models.idmap import IndexIDMap, IndexIDMap2

    sm, sa = _sub("sub", meta, arrays)
    cls = IndexIDMap2 if meta["tag"] == "IxM2" else IndexIDMap
    idx = cls(load_index(sm, sa))
    idx.id_map = np.asarray(arrays["id_map"]).tolist()
    idx.ntotal = int(meta["ntotal"])
    if isinstance(idx, IndexIDMap2):
        idx.construct_rev_map()
    return idx


def _dump_refine(index):
    meta = {"tag": "IxRF", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "k_factor": index.k_factor}
    arrays = {}
    bm, ba = dump_index(index.base_index)
    _flatten("base", bm, ba, meta, arrays)
    rm, ra = dump_index(index.refine_index)
    _flatten("refine", rm, ra, meta, arrays)
    return meta, arrays


def _load_refine(meta, arrays):
    from ..models.refine import IndexRefineFlat

    bm, ba = _sub("base", meta, arrays)
    rm, ra = _sub("refine", meta, arrays)
    idx = IndexRefineFlat(load_index(bm, ba), load_index(rm, ra))
    idx.k_factor = int(meta["k_factor"])
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
    return idx


def _dump_refine_sq8_tier(index):
    meta = {"tag": "IxRT", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "k_factor": index.k_factor,
            "qtype": index.codec.qtype}
    arrays = {"vmin": np.asarray(index.codec.vmin, np.float32),
              "vdiff": np.asarray(index.codec.vdiff, np.float32)}
    if index._host_codes:
        arrays["codes"] = (
            index._host_codes[0] if len(index._host_codes) == 1
            else np.concatenate(index._host_codes))
    bm, ba = dump_index(index.base_index)
    _flatten("base", bm, ba, meta, arrays)
    return meta, arrays


def _load_refine_sq8_tier(meta, arrays):
    from ..models.refine import IndexRefineSQ8Tier
    from ..ops.sq import SQCodec

    bm, ba = _sub("base", meta, arrays)
    idx = IndexRefineSQ8Tier(load_index(bm, ba))
    idx.codec = SQCodec(qtype=int(meta["qtype"]), d=int(meta["d"]),
                        vmin=np.asarray(arrays["vmin"]),
                        vdiff=np.asarray(arrays["vdiff"]))
    if "codes" in arrays:
        idx._host_codes = [np.asarray(arrays["codes"], np.uint8)]
    idx.k_factor = int(meta["k_factor"])
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
    return idx


def _dump_qinco(index):
    meta = {"tag": "IxQN", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "K": index.K, "L": index.L,
            "M": index.M, "h": index.h, "nbits": index.nbits}
    arrays = {"codes": index._codes,
              "codebook0": np.asarray(index.qinco.codebook0)}
    for i, st in enumerate(index.qinco.steps):
        for name in ("codebook", "w_cb", "w_xh", "b", "ffn_w1", "ffn_w2"):
            arrays[f"step{i}/{name}"] = np.asarray(getattr(st, name))
    return meta, arrays


def _load_qinco(meta, arrays):
    import jax.numpy as jnp

    from ..models.qinco import IndexQINCo
    from ..ops.qinco import QINCoParams, QINCoStepParams

    steps = []
    for i in range(int(meta["M"]) - 1):
        steps.append(QINCoStepParams(*[
            jnp.asarray(np.asarray(arrays[f"step{i}/{name}"]))
            for name in ("codebook", "w_cb", "w_xh", "b", "ffn_w1",
                         "ffn_w2")]))
    params = QINCoParams(
        codebook0=jnp.asarray(np.asarray(arrays["codebook0"])),
        steps=steps)
    idx = IndexQINCo(int(meta["d"]), K=int(meta["K"]), L=int(meta["L"]),
                     M=int(meta["M"]), h=int(meta["h"]),
                     metric=int(meta["metric"]), params=params)
    idx._codes = np.asarray(arrays["codes"])
    idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_lattice(index):
    meta = {"tag": "IxLt", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "nsq": index.nsq,
            "scale_nbit": index.scale_nbit, "r2": index.zn.r2,
            "is_trained": index.is_trained}
    arrays = {"codes": index._codes}
    if index.trained is not None:
        arrays["trained"] = index.trained
    return meta, arrays


def _load_lattice(meta, arrays):
    from ..models.lattice import IndexLattice

    idx = IndexLattice(int(meta["d"]), nsq=int(meta["nsq"]),
                       scale_nbit=int(meta["scale_nbit"]),
                       r2=int(meta["r2"]), metric=int(meta["metric"]))
    if "trained" in arrays:
        idx.trained = np.asarray(arrays["trained"])
    idx.is_trained = bool(meta["is_trained"])
    idx._codes = np.asarray(arrays["codes"])
    idx.ntotal = int(meta["ntotal"])
    return idx


# ---------------------------------------------------------------------------
# round-3 breadth: every remaining index class registers
# (the reference's index_write.cpp:391 dispatches ALL types; the
# parametrized sweep in tests/test_io_sweep.py enforces the same here)
# ---------------------------------------------------------------------------

def _aq_subtype_meta(index) -> dict:
    """Shared scalar state of the additive-quantizer family."""
    m = {"M": index.M, "nbits": index.nbits, "beam_size": index.beam_size}
    for f in ("train_iters", "icm_iters", "nperts", "lambd",
              "nsplits", "Msub"):
        if hasattr(index, f):
            m[f] = getattr(index, f)
    return m


def _aq_restore_scalars(idx, meta):
    for f in ("beam_size", "train_iters", "icm_iters", "nperts", "lambd"):
        if f in meta:
            setattr(idx, f, meta[f])


def _make_aq_flat(meta):
    from ..models import rq as RQM

    cls = {
        "IndexResidualQuantizer": RQM.IndexResidualQuantizer,
        "IndexLocalSearchQuantizer": RQM.IndexLocalSearchQuantizer,
        "IndexProductResidualQuantizer": RQM.IndexProductResidualQuantizer,
        "IndexProductLocalSearchQuantizer":
            RQM.IndexProductLocalSearchQuantizer,
    }[meta["cls"]]
    if "nsplits" in meta:
        idx = cls(int(meta["d"]), int(meta["nsplits"]), int(meta["Msub"]),
                  int(meta["nbits"]), int(meta["metric"]))
    else:
        idx = cls(int(meta["d"]), int(meta["M"]), int(meta["nbits"]),
                  int(meta["metric"]))
    return idx


def _dump_rq(index):
    meta = {"tag": "IxRQ", "cls": type(index).__name__, "d": index.d,
            "metric": index.metric_type, "ntotal": index.ntotal,
            "is_trained": index.is_trained}
    meta.update(_aq_subtype_meta(index))
    arrays = {}
    if index.rq is not None:
        arrays["codebooks"] = np.asarray(index.rq.codebooks)
    if index.ntotal:
        arrays["codes"] = np.asarray(index._codes)
        arrays["norms"] = np.asarray(index._norms)
    return meta, arrays


def _load_rq(meta, arrays):
    import jax.numpy as jnp

    from ..ops.rq import RQCodec

    idx = _make_aq_flat(meta)
    _aq_restore_scalars(idx, meta)
    if "codebooks" in arrays:
        books = np.asarray(arrays["codebooks"])
        idx.rq = RQCodec(codebooks=books, d=idx.d, M=int(meta["M"]),
                         nbits=int(meta["nbits"]))
        idx.M = idx.rq.M
        idx._books = jnp.asarray(books)
        idx.is_trained = True
    if "codes" in arrays:
        idx._codes = jnp.asarray(np.asarray(arrays["codes"]))
        idx._norms = jnp.asarray(np.asarray(arrays["norms"]))
        idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_ivfrq(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwRQ"
    meta["cls"] = type(index).__name__
    meta.update(_aq_subtype_meta(index))
    if index.rq is not None:
        arrays["codebooks"] = np.asarray(index.rq.codebooks)
    return meta, arrays


def _load_ivfrq(meta, arrays):
    import jax.numpy as jnp

    from ..models import rq as RQM
    from ..models.flat import IndexFlat
    from ..ops.rq import RQCodec

    cls = {
        "IndexIVFResidualQuantizer": RQM.IndexIVFResidualQuantizer,
        "IndexIVFLocalSearchQuantizer": RQM.IndexIVFLocalSearchQuantizer,
        "IndexIVFProductResidualQuantizer":
            RQM.IndexIVFProductResidualQuantizer,
        "IndexIVFProductLocalSearchQuantizer":
            RQM.IndexIVFProductLocalSearchQuantizer,
    }[meta["cls"]]
    q = IndexFlat(int(meta["d"]), int(meta["metric"]))
    if "nsplits" in meta:
        idx = cls(q, int(meta["d"]), int(meta["nlist"]),
                  int(meta["nsplits"]), int(meta["Msub"]),
                  int(meta["nbits"]), int(meta["metric"]),
                  int(meta["block_size"]))
    else:
        idx = cls(q, int(meta["d"]), int(meta["nlist"]), int(meta["M"]),
                  int(meta["nbits"]), int(meta["metric"]),
                  int(meta["block_size"]))
    _aq_restore_scalars(idx, meta)
    if "codebooks" in arrays:
        books = np.asarray(arrays["codebooks"])
        idx.rq = RQCodec(codebooks=books, d=idx.d, M=int(meta["M"]),
                         nbits=int(meta["nbits"]))
        idx.M = idx.rq.M
        idx._books = jnp.asarray(books)
    return _restore_ivf_common(idx, meta, arrays)


def _dump_ivfpqr(index):
    meta, arrays = _dump_ivfpq(index)
    meta["tag"] = "IwPR"
    meta.update(M_refine=index.M_refine, nbits_refine=index.nbits_refine,
                k_factor=index.k_factor)
    arrays["refine_centroids"] = np.asarray(index.refine_pq.centroids)
    # row-indexed side tables the re-rank pass gathers from
    if index._row_codes is not None:
        arrays["row_codes"] = np.asarray(index._row_codes)
        arrays["row_refine"] = np.asarray(index._row_refine)
        arrays["row_assign"] = np.asarray(index._row_assign)
    return meta, arrays


def _load_ivfpqr(meta, arrays):
    import jax.numpy as jnp

    from ..models.flat import IndexFlat
    from ..models.ivf_pq import IndexIVFPQR
    from ..ops.pq import PQCodec

    idx = IndexIVFPQR(IndexFlat(int(meta["d"]), int(meta["metric"])),
                      int(meta["d"]), int(meta["nlist"]), int(meta["M"]),
                      int(meta["nbits"]), int(meta["M_refine"]),
                      int(meta["nbits_refine"]), int(meta["metric"]),
                      int(meta["block_size"]))
    idx.by_residual = bool(meta["by_residual"])
    idx.k_factor = int(meta["k_factor"])
    cents = np.asarray(arrays["pq_centroids"])
    idx.pq = PQCodec(centroids=cents, d=idx.d, M=idx.M, nbits=idx.nbits)
    idx._pq_cent_dev = jnp.asarray(cents)
    rcents = np.asarray(arrays["refine_centroids"])
    idx.refine_pq = PQCodec(centroids=rcents, d=idx.d, M=idx.M_refine,
                            nbits=idx.nbits_refine)
    idx._refine_cent_dev = jnp.asarray(rcents)
    if "row_codes" in arrays:
        idx._row_codes = jnp.asarray(np.asarray(arrays["row_codes"]))
        idx._row_refine = jnp.asarray(np.asarray(arrays["row_refine"]))
        idx._row_assign = jnp.asarray(np.asarray(arrays["row_assign"]))
    return _restore_ivf_common(idx, meta, arrays)


# --- binary family ---------------------------------------------------------

def _dump_binflat(index):
    meta = {"tag": "BxFl", "d": index.d, "ntotal": index.ntotal}
    arrays = {}
    if index.ntotal:
        arrays["codes"] = np.asarray(index._codes)
    return meta, arrays


def _load_binflat(meta, arrays):
    from ..models.binary import IndexBinaryFlat

    idx = IndexBinaryFlat(int(meta["d"]))
    if "codes" in arrays:
        idx.add(np.asarray(arrays["codes"]))
    return idx


def _dump_binivf(index):
    meta = {"tag": "BwFl", "d": index.d, "ntotal": index.ntotal,
            "nlist": index.nlist, "nprobe": index.nprobe,
            "is_trained": index.is_trained}
    arrays = {}
    qm, qa = dump_index(index.quantizer)
    _flatten("quantizer", qm, qa, meta, arrays)
    if index.ntotal:
        arrays["codes"] = np.concatenate(index._codes_host, axis=0)
        arrays["ids"] = np.concatenate(index._ids_host, axis=0)
    return meta, arrays


def _load_binivf(meta, arrays):
    from ..models.binary import IndexBinaryIVF

    qm, qa = _sub("quantizer", meta, arrays)
    idx = IndexBinaryIVF(load_index(qm, qa), int(meta["d"]),
                         int(meta["nlist"]))
    idx.nprobe = int(meta["nprobe"])
    idx.is_trained = bool(meta["is_trained"])
    if "codes" in arrays:
        # re-assignment through the restored quantizer reproduces the
        # original packing deterministically
        idx._codes_host = [np.asarray(arrays["codes"])]
        idx._ids_host = [np.asarray(arrays["ids"])]
        idx.ntotal = int(meta["ntotal"])
        idx._repack()
    return idx


def _dump_binhnsw(index):
    meta = {"tag": "BxHN", "d": index.d, "ntotal": index.ntotal}
    arrays = {}
    if index._codes:
        arrays["codes"] = np.concatenate(index._codes, axis=0)
    sm, sa = dump_index(index.index)
    _flatten("sub", sm, sa, meta, arrays)
    return meta, arrays


def _load_binhnsw(meta, arrays):
    from ..models.binary import IndexBinaryHNSW

    idx = IndexBinaryHNSW(int(meta["d"]))
    sm, sa = _sub("sub", meta, arrays)
    idx.index = load_index(sm, sa)
    if "codes" in arrays:
        idx._codes = [np.asarray(arrays["codes"])]
    idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_binhash(index):
    meta = {"tag": "BxHs", "d": index.d, "ntotal": index.ntotal,
            "b": index.b, "nflip": index.nflip}
    arrays = {}
    if index._codes is not None:
        arrays["codes"] = np.asarray(index._codes)
    return meta, arrays


def _load_binhash(meta, arrays):
    from ..models.binary import IndexBinaryHash

    idx = IndexBinaryHash(int(meta["d"]), int(meta["b"]))
    idx.nflip = int(meta["nflip"])
    if "codes" in arrays:
        idx.add(np.asarray(arrays["codes"]))  # rebuilds the buckets
    return idx


def _dump_binmultihash(index):
    meta = {"tag": "BxMH", "d": index.d, "ntotal": index.ntotal,
            "nhash": index.nhash, "b": index.b, "nflip": index.nflip}
    arrays = {}
    if index.storage._codes is not None:
        arrays["codes"] = np.asarray(index.storage._codes)
    return meta, arrays


def _load_binmultihash(meta, arrays):
    from ..models.binary import IndexBinaryMultiHash

    idx = IndexBinaryMultiHash(int(meta["d"]), int(meta["nhash"]),
                               int(meta["b"]))
    idx.nflip = int(meta["nflip"])
    if "codes" in arrays:
        idx.add(np.asarray(arrays["codes"]))  # rebuilds the maps
    return idx


def _dump_binfromfloat(index):
    meta = {"tag": "BxFF", "d": index.d, "ntotal": index.ntotal}
    arrays = {}
    sm, sa = dump_index(index.index)
    _flatten("sub", sm, sa, meta, arrays)
    return meta, arrays


def _load_binfromfloat(meta, arrays):
    from ..models.binary import IndexBinaryFromFloat

    sm, sa = _sub("sub", meta, arrays)
    idx = IndexBinaryFromFloat(load_index(sm, sa))
    idx.ntotal = int(meta["ntotal"])
    return idx


# --- long-tail float types -------------------------------------------------

def _dump_lsh(index):
    meta = {"tag": "IxLs", "d": index.d, "ntotal": index.ntotal,
            "nbits": index.nbits, "rotate_data": bool(index.rotate_data),
            "train_thresholds": bool(index.train_thresholds),
            "is_trained": index.is_trained}
    arrays = {"P": index.P, "thresholds": index.thresholds}
    if index.ntotal:
        arrays["codes"] = np.asarray(index._bin._codes)
    return meta, arrays


def _load_lsh(meta, arrays):
    from ..models.extra import IndexLSH

    idx = IndexLSH(int(meta["d"]), int(meta["nbits"]),
                   bool(meta["rotate_data"]),
                   bool(meta["train_thresholds"]))
    idx.P = np.asarray(arrays["P"])
    idx.thresholds = np.asarray(arrays["thresholds"])
    idx.is_trained = bool(meta["is_trained"])
    if "codes" in arrays:
        idx._bin.add(np.asarray(arrays["codes"]))
        idx.ntotal = idx._bin.ntotal
    return idx


def _dump_minmax(index):
    meta = {"tag": "IxMM", "d": index.d, "ntotal": index.ntotal}
    arrays = {}
    if index._mins:
        arrays["mins"] = np.concatenate(index._mins)
        arrays["scales"] = np.concatenate(index._scales)
    sm, sa = dump_index(index.index)
    _flatten("sub", sm, sa, meta, arrays)
    return meta, arrays


def _load_minmax(meta, arrays):
    from ..models.extra import IndexRowwiseMinMax

    sm, sa = _sub("sub", meta, arrays)
    idx = IndexRowwiseMinMax(load_index(sm, sa))
    if "mins" in arrays:
        idx._mins = [np.asarray(arrays["mins"])]
        idx._scales = [np.asarray(arrays["scales"])]
    idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_imi(index):
    meta = {"tag": "IxMI", "d": index.d, "ntotal": index.ntotal,
            "M": index.M, "nbits": index.nbits,
            "is_trained": index.is_trained}
    arrays = {}
    if index.pq is not None:
        arrays["centroids"] = np.asarray(index.pq.centroids)
    return meta, arrays


def _load_imi(meta, arrays):
    import jax.numpy as jnp

    from ..models.extra import MultiIndexQuantizer
    from ..ops.pq import PQCodec

    idx = MultiIndexQuantizer(int(meta["d"]), int(meta["M"]),
                              int(meta["nbits"]))
    if "centroids" in arrays:
        cents = np.asarray(arrays["centroids"])
        idx.pq = PQCodec(centroids=cents, d=idx.d, M=idx.M,
                         nbits=idx.nbits)
        idx._cent = jnp.asarray(cents)
        idx.ntotal = int(meta["ntotal"])
        idx.is_trained = True
    return idx


def _dump_2layer(index):
    meta = {"tag": "Ix2L", "d": index.d, "ntotal": index.ntotal,
            "nlist": index.nlist, "M": index.M, "nbits": index.nbits,
            "is_trained": index.is_trained}
    arrays = {}
    qm, qa = dump_index(index.q1)
    _flatten("q1", qm, qa, meta, arrays)
    if index.pq is not None:
        arrays["pq_centroids"] = np.asarray(index.pq.centroids)
    if index.ntotal:
        arrays["list_ids"] = np.concatenate(index._list_ids)
        arrays["codes"] = np.concatenate(index._codes)
    return meta, arrays


def _load_2layer(meta, arrays):
    import jax.numpy as jnp

    from ..models.extra import Index2Layer
    from ..ops.pq import PQCodec

    qm, qa = _sub("q1", meta, arrays)
    idx = Index2Layer(load_index(qm, qa), int(meta["nlist"]),
                      int(meta["M"]), int(meta["nbits"]))
    if "pq_centroids" in arrays:
        cents = np.asarray(arrays["pq_centroids"])
        idx.pq = PQCodec(centroids=cents, d=idx.d, M=idx.M,
                         nbits=idx.nbits)
        idx._cent = jnp.asarray(cents)
    idx.is_trained = bool(meta["is_trained"])
    if "codes" in arrays:
        idx._list_ids = [np.asarray(arrays["list_ids"])]
        idx._codes = [np.asarray(arrays["codes"])]
        idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_split(index):
    meta = {"tag": "IxSV", "d": index.d, "ntotal": index.ntotal,
            "nsub": len(index.sub_indexes)}
    arrays = {}
    for i, sub in enumerate(index.sub_indexes):
        sm, sa = dump_index(sub)
        _flatten(f"sub{i}", sm, sa, meta, arrays)
    return meta, arrays


def _load_split(meta, arrays):
    from ..models.extra import IndexSplitVectors

    idx = IndexSplitVectors(int(meta["d"]))
    for i in range(int(meta["nsub"])):
        sm, sa = _sub(f"sub{i}", meta, arrays)
        idx.add_sub_index(load_index(sm, sa))
    idx.ntotal = int(meta["ntotal"])
    return idx


def _dump_random(index):
    return ({"tag": "IxRn", "d": index.d, "ntotal": index.ntotal,
             "seed": index.seed}, {})


def _load_random(meta, arrays):
    from ..models.extra import IndexRandom

    return IndexRandom(int(meta["d"]), int(meta["ntotal"]),
                       int(meta["seed"]))


def _dump_flat1d(index):
    return ({"tag": "IxF1", "d": 1, "ntotal": index.ntotal},
            {"xb": np.asarray(index.vectors)} if index.ntotal else {})


def _load_flat1d(meta, arrays):
    from ..models.flat import IndexFlat1D

    idx = IndexFlat1D()
    if "xb" in arrays:
        idx.add(np.asarray(arrays["xb"]))
    return idx


# --- graph types -----------------------------------------------------------

def _dump_nsg(index):
    meta = {"tag": "IxNS", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "R": index.R, "GK": index.GK,
            "efSearch": index.efSearch, "medoid": index.medoid}
    arrays = {}
    if index.ntotal:
        arrays["xb"] = np.asarray(index.storage.vectors)
    if index.graph is not None:
        arrays["graph"] = np.asarray(index.graph)
    return meta, arrays


def _load_nsg(meta, arrays):
    import jax.numpy as jnp

    from ..models.nsg import IndexNSGFlat

    idx = IndexNSGFlat(int(meta["d"]), int(meta["R"]),
                       int(meta["metric"]))
    idx.GK = int(meta["GK"])
    idx.efSearch = int(meta["efSearch"])
    idx.medoid = int(meta["medoid"])
    if "xb" in arrays:
        idx.storage.add(np.asarray(arrays["xb"]))
        idx.ntotal = idx.storage.ntotal
    if "graph" in arrays:
        idx.graph = jnp.asarray(np.asarray(arrays["graph"]))
    return idx


def _dump_nsg_coded(index):
    from ..models.nsg import IndexNSGPQ

    meta = {"d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "R": index.R, "GK": index.GK,
            "efSearch": index.efSearch, "medoid": index.medoid,
            "is_trained": index.is_trained}
    arrays = {}
    if isinstance(index, IndexNSGPQ):
        meta["tag"] = "IxNP"
        meta["pq_m"], meta["nbits"] = index.pq_m, index.nbits
        if index.pq is not None:
            arrays["centroids"] = np.asarray(index.pq.centroids)
    else:
        meta["tag"] = "IxNQ"
        meta["qtype"] = index.qtype
        if index.sq is not None and index.sq.vmin is not None:
            arrays["sq_vmin"] = np.asarray(index.sq.vmin, np.float32)
            arrays["sq_vdiff"] = np.asarray(index.sq.vdiff, np.float32)
    if index._codes is not None:
        arrays["codes"] = np.asarray(index._codes)
    if index.graph is not None:
        arrays["graph"] = np.asarray(index.graph)
    return meta, arrays


def _load_nsg_coded(meta, arrays):
    import jax.numpy as jnp

    from ..models.nsg import IndexNSGPQ, IndexNSGSQ

    if meta["tag"] == "IxNP":
        idx = IndexNSGPQ(int(meta["d"]), int(meta["pq_m"]),
                         int(meta["R"]), int(meta["nbits"]),
                         int(meta["metric"]))
        if "centroids" in arrays:
            from ..ops.pq import PQCodec

            c = np.asarray(arrays["centroids"], np.float32)
            idx.pq = PQCodec(centroids=c, d=idx.d, M=idx.pq_m,
                             nbits=idx.nbits)
    else:
        idx = IndexNSGSQ(int(meta["d"]), int(meta["qtype"]),
                         int(meta["R"]), int(meta["metric"]))
        if "sq_vmin" in arrays:
            from ..ops.sq import SQCodec

            idx.sq = SQCodec(qtype=idx.qtype, d=idx.d,
                             vmin=np.asarray(arrays["sq_vmin"]),
                             vdiff=np.asarray(arrays["sq_vdiff"]))
    idx.GK = int(meta["GK"])
    idx.efSearch = int(meta["efSearch"])
    idx.medoid = int(meta["medoid"])
    idx.is_trained = bool(meta["is_trained"])
    if "codes" in arrays:
        idx._codes = np.asarray(arrays["codes"])
        idx.storage.add(np.asarray(idx._decode(idx._codes), np.float32))
        idx.ntotal = idx.storage.ntotal
    if "graph" in arrays:
        idx.graph = jnp.asarray(np.asarray(arrays["graph"]))
    return idx


def _dump_ivf_paged(index):
    # like faiss OnDiskInvertedLists: the index file stores the
    # DIRECTORY of the block-stream memmaps, not the streams themselves
    # (invlists/OnDiskInvertedLists.h filename member)
    meta = {"tag": "IwPG", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "nlist": index.nlist,
            "nprobe": index.nprobe, "block_size": index.block_size,
            "path": index.path}
    arrays = {}
    if index.centroids is not None:
        arrays["centroids"] = np.asarray(index.centroids, np.float32)
    return meta, arrays


def _load_ivf_paged(meta, arrays):
    import jax.numpy as jnp

    from ..models.ivf_paged import IndexIVFFlatPaged
    from ..ops import ivf_scan_paged as PS

    idx = IndexIVFFlatPaged(int(meta["d"]), int(meta["nlist"]),
                            meta["path"], int(meta["metric"]),
                            int(meta["block_size"]))
    idx.nprobe = int(meta["nprobe"])
    idx.ntotal = int(meta["ntotal"])
    if "centroids" in arrays:
        idx.centroids = np.asarray(arrays["centroids"])
        idx._cent_dev = jnp.asarray(idx.centroids)
        idx.is_trained = True
    if os.path.exists(os.path.join(meta["path"], "paged_meta.json")):
        idx.invlists = PS.open_paged_invlists(meta["path"])
    return idx


def _dump_nnd(index):
    meta = {"tag": "IxND", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "K": index.K,
            "efSearch": index.efSearch}
    arrays = {}
    if index.ntotal:
        arrays["xb"] = np.asarray(index.storage.vectors)
    if index.graph is not None:
        arrays["graph"] = np.asarray(index.graph)
    return meta, arrays


def _load_nnd(meta, arrays):
    import jax.numpy as jnp

    from ..models.nsg import IndexNNDescentFlat

    idx = IndexNNDescentFlat(int(meta["d"]), int(meta["K"]),
                             int(meta["metric"]))
    idx.efSearch = int(meta["efSearch"])
    if "xb" in arrays:
        idx.storage.add(np.asarray(arrays["xb"]))
        idx.ntotal = idx.storage.ntotal
    if "graph" in arrays:
        idx.graph = jnp.asarray(np.asarray(arrays["graph"]))
    return idx


def _dump_hnsw2level(index):
    meta = {
        "tag": "IHN2", "d": index.d, "metric": index.metric_type,
        "ntotal": index.ntotal, "M": index.hnsw.M,
        "efConstruction": index.hnsw.efConstruction,
        "efSearch": index.hnsw.efSearch, "is_trained": index.is_trained,
    }
    arrays = {}
    cm, ca = dump_index(index.codec)
    _flatten("codec", cm, ca, meta, arrays)
    if index.ntotal:
        arrays["xb"] = np.asarray(index.storage.vectors)
    _graph_meta_arrays(index, meta, arrays)
    return meta, arrays


def _load_hnsw2level(meta, arrays):
    from ..models.hnsw import IndexHNSW2Level

    cm, ca = _sub("codec", meta, arrays)
    codec = load_index(cm, ca)
    idx = IndexHNSW2Level(int(meta["d"]), codec.nlist, codec.M,
                          int(meta["M"]), codec.nbits,
                          int(meta["metric"]))
    idx.codec = codec
    idx.hnsw.efConstruction = int(meta["efConstruction"])
    idx.hnsw.efSearch = int(meta["efSearch"])
    idx.is_trained = bool(meta["is_trained"])
    if "xb" in arrays:
        idx.storage.add(np.asarray(arrays["xb"]))
        idx.ntotal = idx.storage.ntotal
    _restore_graph(idx, meta, arrays)
    return idx


# --- IVF couplings ---------------------------------------------------------

def _dump_vt(vt, prefix, meta, arrays):
    """LinearTransform state under a prefix (spectral-hash /
    independent-quantizer vt)."""
    meta[f"{prefix}_cls"] = type(vt).__name__
    meta[f"{prefix}_din"] = vt.d_in
    meta[f"{prefix}_dout"] = vt.d_out
    meta[f"{prefix}_ortho"] = bool(getattr(vt, "is_orthonormal", False))
    arrays[f"{prefix}_A"] = np.asarray(vt.A)
    if getattr(vt, "b", None) is not None:
        arrays[f"{prefix}_b"] = np.asarray(vt.b)


def _load_vt(prefix, meta, arrays):
    from ..models.transforms import LinearTransform

    vt = LinearTransform(int(meta[f"{prefix}_din"]),
                         int(meta[f"{prefix}_dout"]))
    vt.A = np.asarray(arrays[f"{prefix}_A"])
    if f"{prefix}_b" in arrays:
        vt.b = np.asarray(arrays[f"{prefix}_b"])
    vt.is_orthonormal = bool(meta[f"{prefix}_ortho"])
    vt.is_trained = True
    return vt


def _dump_spectralhash(index):
    meta, arrays = _dump_ivf_common(index)
    meta["tag"] = "IwSH"
    meta.update(nbit=index.nbit, period=index.period,
                threshold_type=index.threshold_type)
    _dump_vt(index.vt, "vt", meta, arrays)
    if index.trained is not None:
        arrays["trained"] = np.asarray(index.trained)
    return meta, arrays


def _load_spectralhash(meta, arrays):
    from ..models.flat import IndexFlat
    from ..models.ivf_extra import IndexIVFSpectralHash

    idx = IndexIVFSpectralHash(
        IndexFlat(int(meta["d"]), int(meta["metric"])), int(meta["d"]),
        int(meta["nlist"]), int(meta["nbit"]), float(meta["period"]),
        int(meta["metric"]), int(meta["block_size"]))
    idx.threshold_type = meta["threshold_type"]
    idx.vt = _load_vt("vt", meta, arrays)
    if "trained" in arrays:
        idx.trained = np.asarray(arrays["trained"])
    return _restore_ivf_common(idx, meta, arrays)


def _dump_independent(index):
    meta = {"tag": "IwIQ", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "is_trained": index.is_trained,
            "has_vt": index.vt is not None}
    arrays = {}
    qm, qa = dump_index(index.quantizer)
    _flatten("quantizer", qm, qa, meta, arrays)
    im, ia = dump_index(index.index_ivf)
    _flatten("payload", im, ia, meta, arrays)
    if index.vt is not None:
        _dump_vt(index.vt, "vt", meta, arrays)
    return meta, arrays


def _load_independent(meta, arrays):
    from ..models.ivf_extra import IndexIVFIndependentQuantizer

    qm, qa = _sub("quantizer", meta, arrays)
    im, ia = _sub("payload", meta, arrays)
    vt = _load_vt("vt", meta, arrays) if meta.get("has_vt") else None
    idx = IndexIVFIndependentQuantizer(load_index(qm, qa),
                                       load_index(im, ia), vt)
    idx.is_trained = bool(meta["is_trained"])
    idx.ntotal = int(meta["ntotal"])
    return idx


# --- composites ------------------------------------------------------------

def _dump_shards(index):
    meta = {"tag": "IxSh", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "nshard": index.count,
            "successive_ids": bool(index.successive_ids),
            "id_bases": [int(b) for b in index._id_bases]}
    arrays = {}
    for i, sub in enumerate(index.shard_indexes):
        sm, sa = dump_index(sub)
        _flatten(f"shard{i}", sm, sa, meta, arrays)
    return meta, arrays


def _load_shards(meta, arrays):
    from ..models.idmap import IndexShards

    idx = IndexShards(int(meta["d"]), int(meta["metric"]),
                      successive_ids=bool(meta["successive_ids"]))
    for i in range(int(meta["nshard"])):
        sm, sa = _sub(f"shard{i}", meta, arrays)
        idx.add_shard(load_index(sm, sa))
    idx._id_bases = [int(b) for b in meta["id_bases"]]
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
    return idx


def _dump_replicas(index):
    meta = {"tag": "IxRp", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal, "nrep": len(index.replicas)}
    arrays = {}
    for i, sub in enumerate(index.replicas):
        sm, sa = dump_index(sub)
        _flatten(f"rep{i}", sm, sa, meta, arrays)
    return meta, arrays


def _load_replicas(meta, arrays):
    from ..models.idmap import IndexReplicas

    idx = IndexReplicas(int(meta["d"]), int(meta["metric"]))
    for i in range(int(meta["nrep"])):
        sm, sa = _sub(f"rep{i}", meta, arrays)
        idx.add_replica(load_index(sm, sa))
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
    return idx


def _dump_coarse_aq(index):
    meta = {"tag": "IxCQ", "cls": type(index).__name__, "d": index.d,
            "metric": index.metric_type, "M": index.M,
            "nbits": index.nbits, "beam_factor": index.beam_factor,
            "is_trained": index.is_trained}
    arrays = {}
    if index.rq is not None:
        arrays["codebooks"] = np.asarray(index.rq.codebooks)
    return meta, arrays


def _load_coarse_aq(meta, arrays):
    import jax.numpy as jnp

    from ..models import rq as rqm
    from ..ops.rq import RQCodec

    cls = getattr(rqm, meta["cls"])
    idx = cls(int(meta["d"]), int(meta["M"]), int(meta["nbits"]),
              int(meta["metric"]))
    idx.beam_factor = float(meta["beam_factor"])
    if "codebooks" in arrays:
        books = np.asarray(arrays["codebooks"])
        idx.rq = RQCodec(codebooks=books, d=idx.d, M=idx.M,
                         nbits=idx.nbits)
        idx._books = jnp.asarray(books)
        idx.ntotal = idx.ksub ** idx.M
        idx.is_trained = True
    return idx


for _cls in ("IndexResidualQuantizer", "IndexAdditiveQuantizer",
             "IndexLocalSearchQuantizer", "IndexProductResidualQuantizer",
             "IndexProductLocalSearchQuantizer"):
    _register(_cls, "IxRQ", _dump_rq, _load_rq)
for _cls in ("IndexIVFResidualQuantizer", "IndexIVFLocalSearchQuantizer",
             "IndexIVFProductResidualQuantizer",
             "IndexIVFProductLocalSearchQuantizer"):
    _register(_cls, "IwRQ", _dump_ivfrq, _load_ivfrq)
_register("IndexIVFPQR", "IwPR", _dump_ivfpqr, _load_ivfpqr)
_register("ResidualCoarseQuantizer", "IxCQ", _dump_coarse_aq,
          _load_coarse_aq)
_register("LocalSearchCoarseQuantizer", "IxCQ", _dump_coarse_aq,
          _load_coarse_aq)
_register("IndexBinaryFlat", "BxFl", _dump_binflat, _load_binflat)
_register("IndexBinaryIVF", "BwFl", _dump_binivf, _load_binivf)
_register("IndexBinaryHNSW", "BxHN", _dump_binhnsw, _load_binhnsw)
_register("IndexBinaryHash", "BxHs", _dump_binhash, _load_binhash)
_register("IndexBinaryMultiHash", "BxMH", _dump_binmultihash,
          _load_binmultihash)
_register("IndexBinaryFromFloat", "BxFF", _dump_binfromfloat,
          _load_binfromfloat)
_register("IndexLSH", "IxLs", _dump_lsh, _load_lsh)
_register("IndexRowwiseMinMax", "IxMM", _dump_minmax, _load_minmax)
_register("MultiIndexQuantizer", "IxMI", _dump_imi, _load_imi)
_register("Index2Layer", "Ix2L", _dump_2layer, _load_2layer)
_register("IndexSplitVectors", "IxSV", _dump_split, _load_split)
_register("IndexRandom", "IxRn", _dump_random, _load_random)
_register("IndexFlat1D", "IxF1", _dump_flat1d, _load_flat1d)
_register("IndexNSGFlat", "IxNS", _dump_nsg, _load_nsg)
_register("IndexNSGPQ", "IxNP", _dump_nsg_coded, _load_nsg_coded)
_register("IndexIVFFlatPaged", "IwPG", _dump_ivf_paged, _load_ivf_paged)
_register("IndexNSGSQ", "IxNQ", _dump_nsg_coded, _load_nsg_coded)
_register("IndexNNDescentFlat", "IxND", _dump_nnd, _load_nnd)
_register("IndexHNSW2Level", "IHN2", _dump_hnsw2level, _load_hnsw2level)
_register("IndexIVFSpectralHash", "IwSH", _dump_spectralhash,
          _load_spectralhash)
_register("IndexIVFIndependentQuantizer", "IwIQ", _dump_independent,
          _load_independent)
_register("IndexShards", "IxSh", _dump_shards, _load_shards)
_register("IndexReplicas", "IxRp", _dump_replicas, _load_replicas)


_register("IndexLattice", "IxLt", _dump_lattice, _load_lattice)
_register("IndexQINCo", "IxQN", _dump_qinco, _load_qinco)
_register("IndexPQ", "IxPQ", _dump_pq, _load_pq)
_register("IndexScalarQuantizer", "IxSQ", _dump_sq, _load_sq)
_register("IndexIVFPQ", "IwPQ", _dump_ivfpq, _load_ivfpq)
_register("IndexIVFScalarQuantizer", "IwSQ", _dump_ivfsq, _load_ivfsq)
_register("IndexPreTransform", "IxPT", _dump_pretransform,
          _load_pretransform)
_register("IndexIDMap", "IxMp", _dump_idmap, _load_idmap)
_register("IndexIDMap2", "IxM2", _dump_idmap, _load_idmap)
_register("IndexRefine", "IxRF", _dump_refine, _load_refine)
_register("IndexRefineFlat", "IxRF", _dump_refine, _load_refine)
_register("IndexRefineSQ8Tier", "IxRT", _dump_refine_sq8_tier,
          _load_refine_sq8_tier)


def serialize_index(index) -> np.ndarray:
    """Index -> uint8 buffer (faiss serialize_index,
    python/__init__.py:315-339): the container bytes in memory, e.g. for
    shipping an index over a socket or storing it in a KV store."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "index.tann")
        write_index(index, p)
        return np.fromfile(p, dtype=np.uint8)


def deserialize_index(buf: np.ndarray):
    """uint8 buffer -> Index (faiss deserialize_index)."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "index.tann")
        np.asarray(buf, np.uint8).tofile(p)
        return read_index(p)
