"""Descriptor-driven benchmarking framework — the role of the reference's
`benchs/bench_fw/` (descriptors.py / benchmark_io.py / benchmark.py /
optimize.py, ~3.6k LoC): datasets, codecs, and experiments are named by
declarative descriptors; every expensive artifact (vectors, trained
codec, populated index, ground truth, experiment results) is cached on
disk under a descriptor-derived filename, so re-running a sweep only
recomputes what changed.

Differences from the reference, by design:
  * artifacts serialize through `utils.index_io` (one registry for every
    index class) instead of per-type writers;
  * the sweep measures on-device batched search (the TPU serving model)
    rather than per-thread CPU loops;
  * Pareto filtering reuses `utils.autotune.OperatingPoints` — the same
    machinery the AutoTune layer uses, where the reference duplicates it
    (bench_fw/optimize.py vs AutoTune.cpp).

Typical use (mirrors bench_fw/benchmark.py's train/build/knn stages)::

    io = BenchmarkIO(path="/tmp/bench_cache")
    bm = Benchmark(
        io=io,
        training_vectors=DatasetDescriptor(namespace="syn",
                                           tablename="64_123",
                                           num_vectors=20000),
        database_vectors=DatasetDescriptor(namespace="syn",
                                           tablename="64_123",
                                           num_vectors=50000, split="db"),
        query_vectors=DatasetDescriptor(namespace="syn",
                                        tablename="64_123",
                                        num_vectors=500, split="q"),
        index_descs=[IndexDescriptor(d=64, factory="IVF64,Flat",
                                     search_params={"nprobe": [1, 4, 16]})],
        k=10,
    )
    results = bm.benchmark()
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from ..ops import distances as _D
from . import index_io
from .autotune import OperatingPoints, set_index_parameter
from .factory import index_factory

_METRICS = {"L2": _D.METRIC_L2, "IP": _D.METRIC_INNER_PRODUCT}


@dataclasses.dataclass
class DatasetDescriptor:
    """Names a vector set (bench_fw/descriptors.py:54 DatasetDescriptor).

    namespace:
      * ``"syn"`` — deterministic synthetic vectors; ``tablename`` is
        ``"{d}_{seed}"`` (the reference's 3rd convention) and
        ``num_vectors`` the row count;
      * ``"std_t" / "std_d" / "std_q"`` — train/database/query split of a
        zoo dataset via `utils.datasets.dataset_from_name`;
      * ``None`` — a local ``.npy`` file (``tablename``) under the
        BenchmarkIO path.
    """

    namespace: Optional[str] = None
    tablename: Optional[str] = None
    num_vectors: Optional[int] = None
    # disambiguates descriptors drawing different rows of one synthetic
    # pool (the reference separates them by seed only)
    split: str = ""
    desc_name: Optional[str] = None

    def __hash__(self):
        return hash(self.get_filename())

    def get_filename(self, prefix: Optional[str] = None) -> str:
        """Descriptor-derived cache stem, '.'-terminated (reference
        convention: callers append 'npy' / 'json' / 'codec')."""
        if self.desc_name is None:
            parts = []
            if self.namespace:
                parts.append(self.namespace)
            assert self.tablename is not None
            parts.append(str(self.tablename).replace("/", "_"))
            if self.split:
                parts.append(self.split)
            if self.num_vectors is not None:
                parts.append(str(self.num_vectors))
            self.desc_name = "_".join(parts) + "."
        name = self.desc_name
        return f"{prefix}_{name}" if prefix else name


@dataclasses.dataclass
class IndexDescriptor:
    """Names one index configuration (bench_fw/descriptors.py:160
    IndexDescriptorClassic): a factory string plus construction-time and
    search-time parameters."""

    d: int
    factory: str
    metric: str = "L2"
    # applied once after construction, e.g. {"efConstruction": 80}
    construction_params: Optional[Dict[str, Any]] = None
    # swept at search time: name -> list of values, e.g.
    # {"nprobe": [1, 4, 16], "k_factor": [2, 4]}
    search_params: Optional[Dict[str, List[Any]]] = None
    training_size: Optional[int] = None
    desc_name: Optional[str] = None

    def get_name(self) -> str:
        if self.desc_name is None:
            name = self.factory.replace(",", "_").replace("/", "_")
            if self.construction_params:
                cp = "_".join(f"{k}{v}" for k, v in
                              sorted(self.construction_params.items()))
                name += f".cp_{cp}"
            self.desc_name = f"{name}.{self.metric}.d{self.d}."
        return self.desc_name

    def param_grid(self) -> List[Dict[str, Any]]:
        """Cartesian sweep of search_params (bench_fw's
        param_dict_list expansion), stable order."""
        grid: List[Dict[str, Any]] = [{}]
        for pname in sorted(self.search_params or {}):
            grid = [dict(g, **{pname: v}) for g in grid
                    for v in self.search_params[pname]]
        return grid


def _param_name(params: Dict[str, Any]) -> str:
    return "_".join(f"{k}={v}" for k, v in sorted(params.items())) or "default"


class BenchmarkIO:
    """Disk + memory cache for benchmark artifacts
    (bench_fw/benchmark_io.py role). Filenames come from descriptors;
    anything already on disk is reused."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._mem: Dict[str, Any] = {}

    # -- primitive artifacts ------------------------------------------------
    def file_exist(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path, name))

    def write_nparray(self, arr: np.ndarray, name: str) -> None:
        np.save(os.path.join(self.path, name), arr, allow_pickle=False)

    def read_nparray(self, name: str) -> np.ndarray:
        return np.load(os.path.join(self.path, name), allow_pickle=False)

    def write_json(self, obj, name: str) -> None:
        with open(os.path.join(self.path, name), "w") as f:
            json.dump(obj, f, indent=1, default=float)

    def read_json(self, name: str):
        with open(os.path.join(self.path, name)) as f:
            return json.load(f)

    def write_index(self, index, name: str) -> None:
        index_io.write_index(index, os.path.join(self.path, name))

    def read_index(self, name: str):
        return index_io.read_index(os.path.join(self.path, name))

    # -- datasets -----------------------------------------------------------
    def get_dataset(self, desc: DatasetDescriptor) -> np.ndarray:
        key = desc.get_filename()
        if key in self._mem:
            return self._mem[key]
        fname = key + "npy"
        if self.file_exist(fname):
            x = self.read_nparray(fname)
        else:
            x = self._materialize(desc)
            self.write_nparray(x, fname)
        self._mem[key] = x
        return x

    def _materialize(self, desc: DatasetDescriptor) -> np.ndarray:
        ns = desc.namespace
        if ns == "syn":
            d_str, seed_str = str(desc.tablename).split("_")
            d, seed = int(d_str), int(seed_str)
            n = desc.num_vectors or 10000
            # one deterministic pool per (d, seed); splits draw disjoint
            # row blocks so db/queries/train never alias
            offset = {"": 0, "train": 0, "db": 1, "q": 2}.get(desc.split, 0)
            rs = np.random.RandomState(seed + 100003 * offset)
            d1 = 10
            x = np.sin(np.dot(rs.normal(size=(n, d1)),
                              rs.rand(d1, d)) * (rs.rand(d) * 4 + 0.1))
            return np.ascontiguousarray(x, np.float32)
        if ns in ("std_t", "std_d", "std_q"):
            from .datasets import dataset_from_name
            ds = dataset_from_name(str(desc.tablename))
            x = {"std_t": ds.get_train, "std_d": ds.get_database,
                 "std_q": ds.get_queries}[ns]()
            return np.ascontiguousarray(
                x[: desc.num_vectors] if desc.num_vectors else x, np.float32)
        # local file
        return self.read_nparray(str(desc.tablename))

    # -- ground truth -------------------------------------------------------
    def get_ground_truth(self, db: DatasetDescriptor, q: DatasetDescriptor,
                         k: int, metric: str) -> np.ndarray:
        name = (q.get_filename() + "gt_" + db.get_filename()
                + f"{metric}_k{k}.")
        fname = name + "npy"
        if self.file_exist(fname):
            return self.read_nparray(fname)
        from .contrib import knn_ground_truth
        xb, xq = self.get_dataset(db), self.get_dataset(q)
        _, gt = knn_ground_truth(xq, iter([xb]), k,
                                 metric=_METRICS[metric])
        gt = np.asarray(gt)
        self.write_nparray(gt, fname)
        return gt


@dataclasses.dataclass
class Benchmark:
    """Staged train -> build -> sweep benchmark over index descriptors
    (bench_fw/benchmark.py role). Every stage is cached through
    BenchmarkIO; `benchmark()` returns the reference-shaped result dict
    and writes it as JSON when `result_file` is given."""

    io: BenchmarkIO
    training_vectors: Optional[DatasetDescriptor]
    database_vectors: DatasetDescriptor
    query_vectors: DatasetDescriptor
    index_descs: List[IndexDescriptor]
    k: int = 10
    verbose: bool = False

    def _log(self, *a) -> None:
        if self.verbose:
            print("[bench_fw]", *a, flush=True)

    # -- stages ------------------------------------------------------------
    def train_one(self, desc: IndexDescriptor):
        """Trained (empty) codec for a descriptor, cached as
        '<name>codec' (bench_fw/index.py get_codec role)."""
        name = desc.get_name()
        codec_f, meta_f = name + "codec", name + "train.json"
        if self.io.file_exist(codec_f) and self.io.file_exist(meta_f):
            return (self.io.read_index(codec_f),
                    self.io.read_json(meta_f)["train_time"])
        index = index_factory(desc.d, desc.factory,
                              _METRICS[desc.metric])
        for pname, v in (desc.construction_params or {}).items():
            set_index_parameter(index, pname, v)
        t = 0.0
        if self.training_vectors is not None:
            xt = self.io.get_dataset(self.training_vectors)
            if desc.training_size:
                xt = xt[: desc.training_size]
            t0 = time.time()
            index.train(xt)
            t = time.time() - t0
        self.io.write_index(index, codec_f)
        self.io.write_json({"train_time": t}, meta_f)
        self._log(f"trained {name} in {t:.2f}s")
        return index, t

    def build_one(self, desc: IndexDescriptor):
        """Populated index, cached as '<name>index'."""
        name = desc.get_name()
        index_f, meta_f = name + "index", name + "build.json"
        if self.io.file_exist(index_f) and self.io.file_exist(meta_f):
            return (self.io.read_index(index_f),
                    self.io.read_json(meta_f)["add_time"])
        index, _ = self.train_one(desc)
        xb = self.io.get_dataset(self.database_vectors)
        t0 = time.time()
        index.add(xb)
        t = time.time() - t0
        self.io.write_index(index, index_f)
        self.io.write_json({"add_time": t}, meta_f)
        self._log(f"built {name} in {t:.2f}s")
        return index, t

    def benchmark_knn_one(self, desc: IndexDescriptor) -> Dict[str, Any]:
        """Sweep the descriptor's search grid; one result row per
        parameter combination (bench_fw/benchmark.py knn experiments)."""
        from .evaluation import recall_k_at_k

        index, add_t = self.build_one(desc)
        xq = self.io.get_dataset(self.query_vectors)
        gt = self.io.get_ground_truth(self.database_vectors,
                                      self.query_vectors, self.k,
                                      desc.metric)
        rows: Dict[str, Any] = {}
        for params in desc.param_grid():
            pkey = _param_name(params)
            rname = desc.get_name() + f"knn.{pkey}.json"
            if self.io.file_exist(rname):
                rows[pkey] = self.io.read_json(rname)
                continue
            for pname, v in params.items():
                set_index_parameter(index, pname, v)
            index.search(xq, self.k)            # compile + warm
            t0 = time.time()
            _, I = index.search(xq, self.k)
            dt = max(time.time() - t0, 1e-9)
            row = {
                "recall": float(recall_k_at_k(I, gt, self.k)),
                "time": dt / len(xq),
                "qps": len(xq) / dt,
                "k": self.k,
                "search_params": params,
                "add_time": add_t,
            }
            self.io.write_json(row, rname)
            rows[pkey] = row
            self._log(f"{desc.get_name()} {pkey}: "
                      f"R@{self.k}={row['recall']:.4f} "
                      f"QPS={row['qps']:.0f}")
        return rows

    def benchmark(self, result_file: Optional[str] = None) -> Dict[str, Any]:
        """Run every descriptor; returns {'indices', 'experiments',
        'optimal'} (the reference's benchmark result JSON shape plus the
        Pareto filter that bench_fw/optimize.py applies separately)."""
        results: Dict[str, Any] = {"indices": {}, "experiments": {}}
        ops_pareto = OperatingPoints()
        for desc in self.index_descs:
            name = desc.get_name()
            _, train_t = self.train_one(desc)
            index, add_t = self.build_one(desc)
            results["indices"][name] = {
                "train_time": train_t,
                "add_time": add_t,
                "ntotal": int(getattr(index, "ntotal", 0)),
            }
            for pkey, row in self.benchmark_knn_one(desc).items():
                ekey = f"{name}knn.{pkey}"
                results["experiments"][ekey] = row
                ops_pareto.add(row["recall"], row["time"], ekey)
        results["optimal"] = [
            {"key": p.key, "recall": p.perf, "time": p.t}
            for p in ops_pareto.optimal_pts()
        ]
        if result_file:
            self.io.write_json(results, result_file)
        return results
