"""Descriptor benchmark framework (benchs/bench_fw role): stage caching,
sweeps, Pareto frontier."""

import json
import os

import numpy as np

from tpu_ann.utils.bench_fw import (Benchmark, CodecDescriptor,
                                    DatasetDescriptor, IndexDescriptor)


def test_bench_fw_sweep_and_cache(tmp_path):
    dsd = DatasetDescriptor(kind="synthetic", d=32, nt=2000, nb=5000,
                            nq=50, seed=3)
    bm = Benchmark(str(tmp_path), dsd)
    idd = IndexDescriptor(CodecDescriptor("IVF16,Flat", niter=4))
    rows = bm.sweep(idd, 10, {"nprobe": [1, 4, 16]}, repeat=1)
    assert len(rows) == 3
    # recall grows with nprobe
    recs = [r["recall"] for r in rows]
    assert recs[-1] >= recs[0]
    assert recs[-1] > 0.9

    # stages were cached: codec + built index + gt + results
    files = os.listdir(tmp_path)
    assert any(f.endswith("__built.tann") for f in files)
    assert any("__gt10" in f for f in files)

    # a second Benchmark over the same workdir reuses every stage
    bm2 = Benchmark(str(tmp_path), dsd)
    rows2 = bm2.sweep(idd, 10, {"nprobe": [1, 4, 16]}, repeat=1)
    assert [r["name"] for r in rows2] == [r["name"] for r in rows]
    assert rows2[0]["qps"] == rows[0]["qps"]        # cached rows verbatim

    par = bm2.pareto()
    assert 1 <= len(par) <= 3
    best = max(par, key=lambda r: r["recall"])
    assert best["recall"] == max(recs)


def test_bench_fw_refine_param_routing(tmp_path):
    """Params route through wrappers (k_factor lives on IndexRefineFlat,
    nprobe on the inner IVF)."""
    dsd = DatasetDescriptor(kind="synthetic", d=32, nt=2000, nb=4000,
                            nq=40, seed=5)
    bm = Benchmark(str(tmp_path), dsd)
    idd = IndexDescriptor(CodecDescriptor("IVF16,PQ4,RFlat", niter=4))
    rows = bm.sweep(idd, 5, {"nprobe": [8], "k_factor": [2, 8]},
                    repeat=1)
    assert len(rows) == 2
    assert rows[1]["recall"] >= rows[0]["recall"] - 0.05
    assert rows[1]["recall"] > 0.8
