"""Descriptor-driven benchmark framework (utils/bench_fw.py — the
reference's benchs/bench_fw/ role): artifact caching, staged
train/build/knn sweep, Pareto output."""

import json
import os

import numpy as np
import pytest

from tpu_ann.utils.bench_fw import (
    Benchmark,
    BenchmarkIO,
    DatasetDescriptor,
    IndexDescriptor,
)


@pytest.fixture()
def bm(tmp_path):
    io = BenchmarkIO(path=str(tmp_path))
    return Benchmark(
        io=io,
        training_vectors=DatasetDescriptor(
            namespace="syn", tablename="32_77", num_vectors=4000,
            split="train"),
        database_vectors=DatasetDescriptor(
            namespace="syn", tablename="32_77", num_vectors=8000,
            split="db"),
        query_vectors=DatasetDescriptor(
            namespace="syn", tablename="32_77", num_vectors=100, split="q"),
        index_descs=[
            IndexDescriptor(d=32, factory="IVF32,Flat",
                            search_params={"nprobe": [1, 4, 16]}),
            IndexDescriptor(d=32, factory="Flat"),
        ],
        k=10,
    )


def test_descriptor_names_are_stable_and_distinct(bm):
    names = {d.get_name() for d in bm.index_descs}
    assert len(names) == 2
    a = DatasetDescriptor(namespace="syn", tablename="32_77",
                          num_vectors=8000, split="db")
    assert a.get_filename() == bm.database_vectors.get_filename()
    assert a.get_filename() != bm.query_vectors.get_filename()
    assert a.get_filename().endswith(".")


def test_benchmark_stages_and_results(bm):
    res = bm.benchmark(result_file="result.json")
    # index stage metadata
    ivf_name = bm.index_descs[0].get_name()
    assert res["indices"][ivf_name]["ntotal"] == 8000
    # one experiment row per grid point (+1 for Flat's default)
    assert len(res["experiments"]) == 4
    # recall is monotone-ish in nprobe and Flat is exact
    recs = [res["experiments"][f"{ivf_name}knn.nprobe={p}"]["recall"]
            for p in (1, 4, 16)]
    assert recs[0] <= recs[-1]
    flat_name = bm.index_descs[1].get_name()
    assert res["experiments"][f"{flat_name}knn.default"]["recall"] >= 0.999
    # Pareto set is non-empty, sorted by time, and includes the best recall
    opt = res["optimal"]
    assert opt and max(o["recall"] for o in opt) == max(
        e["recall"] for e in res["experiments"].values())
    # result JSON landed in the cache dir
    with open(os.path.join(bm.io.path, "result.json")) as f:
        assert json.load(f)["indices"]


def test_artifacts_are_cached_and_reused(bm, tmp_path):
    bm.benchmark_knn_one(bm.index_descs[0])
    name = bm.index_descs[0].get_name()
    codec = os.path.join(str(tmp_path), name + "codec")
    assert os.path.exists(codec)
    stamp = os.path.getmtime(codec)
    # poison the in-memory caches; a second run must hit the disk cache
    # (no retrain — file untouched) and return identical rows
    rows1 = bm.benchmark_knn_one(bm.index_descs[0])
    assert os.path.getmtime(codec) == stamp
    io2 = BenchmarkIO(path=str(tmp_path))
    bm2 = Benchmark(io=io2, training_vectors=bm.training_vectors,
                    database_vectors=bm.database_vectors,
                    query_vectors=bm.query_vectors,
                    index_descs=bm.index_descs, k=10)
    rows2 = bm2.benchmark_knn_one(bm.index_descs[0])
    assert rows1.keys() == rows2.keys()
    for k in rows1:
        assert rows1[k]["recall"] == rows2[k]["recall"]


def test_synthetic_splits_do_not_alias(bm):
    xb = bm.io.get_dataset(bm.database_vectors)
    xq = bm.io.get_dataset(bm.query_vectors)
    assert xb.shape == (8000, 32) and xq.shape == (100, 32)
    d = np.abs(xb[:100] - xq).sum()
    assert d > 1.0
