"""Descriptor-driven benchmark framework — the role of the reference's
`benchs/bench_fw` (descriptors.py DatasetDescriptor/CodecDescriptor/
IndexDescriptor, benchmark.py Train/Build/SearchOperator, benchmark_io.py
file cache): reproducible experiment grids where every stage (trained
codec, built index, ground truth, search sweep) is keyed by a
deterministic descriptor name and cached on disk, so re-running a study
only executes what changed.

Compact TPU recast: one module, three descriptors + a Benchmark driver.
Stages cache under `workdir/` as index files (utils.index_io) and JSON
result rows; sweeps reuse autotune's Pareto frontier.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class DatasetDescriptor:
    """Names a dataset deterministically (DatasetDescriptor in
    descriptors.py:55 — there a blob-store path, here a generator spec or
    file path)."""

    kind: str = "synthetic"       # synthetic | surrogate | file
    d: int = 32
    nt: int = 10_000
    nb: int = 100_000
    nq: int = 1_000
    seed: int = 7
    path: Optional[str] = None    # kind == "file": fvecs/fbin stem

    def name(self) -> str:
        if self.kind == "file":
            base = os.path.basename(self.path or "data")
            return f"file_{base}"
        return (f"{self.kind}_d{self.d}_nt{self.nt}_nb{self.nb}"
                f"_nq{self.nq}_s{self.seed}")

    def load(self):
        from .datasets import SiftSurrogateDataset, SyntheticDataset

        if self.kind == "synthetic":
            return SyntheticDataset(d=self.d, nt=self.nt, nb=self.nb,
                                    nq=self.nq, seed=self.seed)
        if self.kind == "surrogate":
            return SiftSurrogateDataset(nt=self.nt, nb=self.nb,
                                        nq=self.nq, seed=self.seed)
        raise ValueError(f"unknown dataset kind {self.kind!r}")


@dataclasses.dataclass(frozen=True)
class CodecDescriptor:
    """A trained codec = factory string + training budget
    (CodecDescriptor, descriptors.py:211). Cached as an EMPTY trained
    index file."""

    factory: str
    niter: int = 10
    maxtrain: int = 0          # 0 = all of the train set

    def name(self, ds: DatasetDescriptor) -> str:
        spec = self.factory.replace(",", ".").replace("(", "_").replace(
            ")", "_")
        return f"{ds.name()}__{spec}_it{self.niter}_mt{self.maxtrain}"


@dataclasses.dataclass(frozen=True)
class IndexDescriptor:
    """codec + database add (IndexDescriptor, descriptors.py:279).
    Cached as a full index file."""

    codec: CodecDescriptor

    def name(self, ds: DatasetDescriptor) -> str:
        return self.codec.name(ds) + "__built"


@dataclasses.dataclass(frozen=True)
class KnnDescriptor:
    """One search configuration over a built index (KnnDescriptor)."""

    index: IndexDescriptor
    k: int = 10
    params: Tuple[Tuple[str, Any], ...] = ()    # (("nprobe", 8), ...)

    def name(self, ds: DatasetDescriptor) -> str:
        p = "_".join(f"{k}{v}" for k, v in self.params)
        return f"{self.index.name(ds)}__k{self.k}_{p}"


class Benchmark:
    """Orchestrates train -> build -> ground truth -> search sweeps with
    per-stage caching (benchmark.py Train/Build/SearchOperator +
    benchmark_io.py). Results accumulate in `workdir/results.json`."""

    def __init__(self, workdir: str, dataset: DatasetDescriptor,
                 verbose: bool = False):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.dsd = dataset
        self.ds = dataset.load()
        self.verbose = verbose
        self._results_path = os.path.join(workdir, "results.json")
        self.results: List[Dict[str, Any]] = []
        if os.path.exists(self._results_path):
            with open(self._results_path) as f:
                self.results = json.load(f)

    # --- stages -----------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name + ".tann")

    def train(self, cd: CodecDescriptor):
        """TrainOperator.train_one: factory + train, cached."""
        from . import index_io
        from .factory import index_factory

        p = self._path(cd.name(self.dsd))
        if os.path.exists(p):
            return index_io.read_index(p)
        idx = index_factory(self.ds.d, cd.factory)
        inner = idx
        while hasattr(inner, "base_index") or hasattr(inner, "index"):
            inner = getattr(inner, "base_index", None) or inner.index
        if hasattr(inner, "cp"):
            inner.cp.niter = cd.niter
        xt = self.ds.get_train(cd.maxtrain or None)
        t0 = time.time()
        idx.train(xt)
        if self.verbose:
            print(f"train[{cd.factory}]: {time.time()-t0:.1f}s")
        index_io.write_index(idx, p)
        return idx

    def build(self, idd: IndexDescriptor):
        """BuildOperator.build_one: train + add, cached."""
        from . import index_io

        p = self._path(idd.name(self.dsd))
        if os.path.exists(p):
            return index_io.read_index(p)
        idx = self.train(idd.codec)
        t0 = time.time()
        idx.add(self.ds.get_database())
        if self.verbose:
            print(f"build[{idd.codec.factory}]: {time.time()-t0:.1f}s")
        index_io.write_index(idx, p)
        return idx

    def ground_truth(self, k: int) -> np.ndarray:
        """SearchOperator.knn_ground_truth, cached."""
        p = os.path.join(self.workdir, f"{self.dsd.name()}__gt{k}.npy")
        if os.path.exists(p):
            return np.load(p)
        gt = self.ds.get_groundtruth(k)
        np.save(p, gt)
        return gt

    def knn_search(self, kd: KnnDescriptor, *, repeat: int = 3
                   ) -> Dict[str, Any]:
        """One search experiment -> result row (cached by name)."""
        from .evaluation import recall_k_at_k

        name = kd.name(self.dsd)
        for r in self.results:
            if r["name"] == name:
                return r
        idx = self.build(kd.index)
        for key, val in kd.params:
            # route through nested wrappers when needed
            tgt = idx
            while not hasattr(tgt, key) and (
                    hasattr(tgt, "base_index") or hasattr(tgt, "index")):
                tgt = getattr(tgt, "base_index", None) or tgt.index
            setattr(tgt, key, val)
        xq = self.ds.get_queries()
        gt = self.ground_truth(kd.k)
        Dv, Iv = idx.search(xq, kd.k)
        rec = recall_k_at_k(np.asarray(Iv), gt, kd.k)
        best = np.inf
        for _ in range(repeat):
            t0 = time.time()
            idx.search(xq, kd.k)
            best = min(best, time.time() - t0)
        row = {
            "name": name, "factory": kd.index.codec.factory,
            "k": kd.k, "params": dict(kd.params),
            "recall": float(rec), "qps": len(xq) / best,
            "ms_per_query": 1e3 * best / len(xq),
        }
        self.results.append(row)
        with open(self._results_path, "w") as f:
            json.dump(self.results, f, indent=1)
        return row

    # --- sweeps -----------------------------------------------------------
    def sweep(self, idd: IndexDescriptor, k: int,
              grid: Dict[str, Sequence[Any]], *, repeat: int = 3
              ) -> List[Dict[str, Any]]:
        """Cartesian sweep of search params (the reference's
        search_benchmark experiment loop)."""
        import itertools

        keys = list(grid)
        rows = []
        for combo in itertools.product(*(grid[g] for g in keys)):
            kd = KnnDescriptor(idd, k, tuple(zip(keys, combo)))
            rows.append(self.knn_search(kd, repeat=repeat))
        return rows

    def pareto(self, rows: Optional[List[Dict[str, Any]]] = None
               ) -> List[Dict[str, Any]]:
        """Recall/time Pareto frontier (optimize.py's operating points,
        via autotune.OperatingPoints)."""
        from .autotune import OperatingPoints

        rows = self.results if rows is None else rows
        ops = OperatingPoints()
        for r in rows:
            ops.add(r["recall"], r["ms_per_query"], r["name"])
        names = {op.key for op in ops.optimal_pts()}
        return [r for r in rows if r["name"] in names]
