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


# --- Optimizer (bench_fw/optimize.py:24-282 role) --------------------------

def test_filter_results_pareto():
    from tpu_ann.utils.bench_fw import (PARETO_TIME, PARETO_TIME_SPACE,
                                        filter_results)

    rows = [
        {"factory": "A", "recall": 0.90, "time": 1.0, "code_size": 8},
        {"factory": "B", "recall": 0.95, "time": 2.0, "code_size": 8},
        {"factory": "C", "recall": 0.90, "time": 3.0, "code_size": 8},
        {"factory": "D", "recall": 0.99, "time": 2.0, "code_size": 64},
        {"factory": "Flat", "recall": 1.0, "time": 9.0, "code_size": 128},
    ]
    out = filter_results(rows, 0.5, PARETO_TIME)
    names = [r["factory"] for r in out]
    assert "C" not in names          # dominated by A
    assert "B" not in names          # dominated by D (equal time, more recall)
    assert "A" in names and "D" in names and "Flat" in names
    # accuracy floor
    out = filter_results(rows, 0.99, PARETO_TIME)
    assert {r["factory"] for r in out} == {"D", "Flat"}
    # name filter (include_flat=False role)
    out = filter_results(rows, 0.5, PARETO_TIME,
                         name_filter=lambda n: not n.startswith("Flat"))
    assert all(not r["factory"].startswith("Flat") for r in out)
    # time*space flips dominance: D (64B) no longer dominates B (8B)
    out = filter_results(rows, 0.5, PARETO_TIME_SPACE)
    assert "B" in [r["factory"] for r in out]


def test_optimizer_stages(tmp_path):
    """The staged driver reproduces the reference's output shape
    (bench_fw/optimize.py optimize(): nprobe probe, codec Pareto,
    quantizer Pareto, final crossed Pareto rows)."""
    from tpu_ann.utils.bench_fw import BenchmarkIO, Optimizer

    io = BenchmarkIO(path=str(tmp_path))
    train = DatasetDescriptor(namespace="syn", tablename="32_91",
                              num_vectors=3000, split="train")
    db = DatasetDescriptor(namespace="syn", tablename="32_91",
                           num_vectors=6000, split="db")
    q = DatasetDescriptor(namespace="syn", tablename="32_91",
                          num_vectors=80, split="q")
    opt = Optimizer(io=io)
    result = opt.optimize(
        32, train, [db], q, min_accuracy=0.3, nlist=32,
        quantizer_nlists=[32])
    assert isinstance(result["nprobe_at_95"], int)
    assert result["nprobe_at_95"] >= 1
    assert result["codecs"], "codec Pareto set must be non-empty"
    assert 32 in result["quantizers"]
    assert result["quantizers"][32], "quantizer Pareto set non-empty"
    rows = result["pareto"][db.get_filename()]
    assert rows, "final Pareto rows non-empty"
    for r in rows:
        assert r["recall"] >= 0.3
        assert "nprobe" in r["search_params"]
        assert r["code_size"] > 0
    # staged result files cached on disk
    assert io.file_exist("result_ivf32_flat.json")
    assert io.file_exist("result_ivf32_codec.json")
    assert io.file_exist("result_quantizer32.json")
