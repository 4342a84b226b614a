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
        table[name] = {
            "dtype": arr.dtype.str,
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
    if index.invlists is not None:
        il = index.invlists
        meta["max_nblocks"] = il.max_nblocks_per_list
        coded = not hasattr(il, "data")
        meta["il_coded"] = coded
        arrays.update({
            "il_data": np.asarray(il.codes if coded else il.data),
            "il_ids": np.asarray(il.ids),
            "il_start": np.asarray(il.list_block_start),
            "il_nblocks": np.asarray(il.list_nblocks),
        })
        if not coded:
            arrays["il_norms"] = np.asarray(il.norms)
    if index._xb_host:
        arrays["xb_host"] = np.concatenate(index._xb_host, axis=0)
        arrays["ids_host"] = np.concatenate(index._ids_host, axis=0)
    return meta, arrays


def _restore_ivf_common(idx, meta, arrays):
    import jax.numpy as jnp

    from ..ops.ivf_scan import PackedInvLists

    qm, qa = _sub("quantizer", meta, arrays)
    idx.quantizer = load_index(qm, qa)
    idx.nprobe = int(meta["nprobe"])
    idx.ntotal = int(meta["ntotal"])
    idx.is_trained = True
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
    meta = {"tag": "IxMp", "d": index.d, "metric": index.metric_type,
            "ntotal": index.ntotal}
    arrays = {"id_map": np.asarray(index.id_map, np.int64)}
    sm, sa = dump_index(index.index)
    _flatten("sub", sm, sa, meta, arrays)
    return meta, arrays


def _load_idmap(meta, arrays):
    from ..models.idmap import IndexIDMap

    sm, sa = _sub("sub", meta, arrays)
    idx = IndexIDMap(load_index(sm, sa))
    idx.id_map = np.asarray(arrays["id_map"]).tolist()
    idx.ntotal = int(meta["ntotal"])
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


_register("IndexLattice", "IxLt", _dump_lattice, _load_lattice)
_register("IndexQINCo", "IxQN", _dump_qinco, _load_qinco)
_register("IndexPQ", "IxPQ", _dump_pq, _load_pq)
_register("IndexScalarQuantizer", "IxSQ", _dump_sq, _load_sq)
_register("IndexIVFPQ", "IwPQ", _dump_ivfpq, _load_ivfpq)
_register("IndexIVFScalarQuantizer", "IwSQ", _dump_ivfsq, _load_ivfsq)
_register("IndexPreTransform", "IxPT", _dump_pretransform,
          _load_pretransform)
_register("IndexIDMap", "IxMp", _dump_idmap, _load_idmap)
_register("IndexRefine", "IxRF", _dump_refine, _load_refine)
_register("IndexRefineFlat", "IxRF", _dump_refine, _load_refine)
