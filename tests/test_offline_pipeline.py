"""Offline sharded IVF pipeline + DAG scheduler (utils/offline_pipeline).

Mirrors the validation of the reference's demos/offline_ivf tests: run
the full train → shard → merge → search DAG on a small synthetic set,
check the merged index answers match, and that a re-launch is a no-op
(resume semantics of run_on_cluster.bash's file checks).
"""

import os

import numpy as np
import pytest

from tpu_ann.utils.offline_pipeline import (
    Job, JobRunner, OfflineIVFConfig, OfflineIVFPipeline)


@pytest.fixture()
def paths(tmp_path):
    r = np.random.RandomState(7)
    xt = r.randn(3000, 24).astype(np.float32)
    xb = r.randn(6000, 24).astype(np.float32)
    xq = r.randn(40, 24).astype(np.float32)
    # exact GT by brute force
    d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10].astype(np.int64)
    p = {}
    for name, arr in [("xt", xt), ("xb", xb), ("xq", xq), ("gt", gt)]:
        f = os.path.join(tmp_path, f"{name}.npy")
        np.save(f, arr)
        p[name] = f
    p["workdir"] = os.path.join(tmp_path, "work")
    return p


def test_job_runner_deps_and_markers(tmp_path):
    order = []
    jobs = [
        Job("c", lambda: order.append("c"), deps=("a", "b")),
        Job("a", lambda: order.append("a")),
        Job("b", lambda: order.append("b"), deps=("a",)),
    ]
    runner = JobRunner(str(tmp_path))
    executed = runner.run(jobs)
    assert order == ["a", "b", "c"]
    assert set(executed) == {"a", "b", "c"}
    # second run: everything marked done
    order.clear()
    assert runner.run(jobs) == []
    assert order == []

    with pytest.raises(ValueError, match="unknown dep"):
        runner.run([Job("x", lambda: None, deps=("ghost",))])


def test_pipeline_end_to_end_and_resume(paths):
    cfg = OfflineIVFConfig(
        factory="IVF64,Flat", d=24, workdir=paths["workdir"],
        xt_path=paths["xt"], xb_path=paths["xb"], xq_path=paths["xq"],
        gt_path=paths["gt"], nshard=3, nprobe=32, max_workers=2)
    pipe = OfflineIVFPipeline(cfg)
    executed = pipe.run()
    assert "train" in executed and "merge" in executed
    assert cfg.search_result["ntotal"] == 6000
    assert cfg.search_result["knn_intersection"] > 0.85  # nprobe=32/64 lists
    assert os.path.exists(pipe.merged_path)

    # resume: nothing re-runs
    pipe2 = OfflineIVFPipeline(cfg)
    assert pipe2.run() == []

    # delete one shard marker -> only that shard + downstream rerun
    os.remove(os.path.join(cfg.workdir, "shard1.done"))
    os.remove(os.path.join(cfg.workdir, "merge.done"))
    os.remove(os.path.join(cfg.workdir, "search.done"))
    executed = OfflineIVFPipeline(cfg).run()
    assert set(executed) == {"shard1", "merge", "search"}


def test_pipeline_subprocess_worker(paths):
    """One shard through a real subprocess (the cluster-worker model)."""
    cfg = OfflineIVFConfig(
        factory="IVF32,Flat", d=24, workdir=paths["workdir"] + "_sub",
        xt_path=paths["xt"], xb_path=paths["xb"], xq_path=paths["xq"],
        gt_path=paths["gt"], nshard=1, nprobe=8, use_subprocess=True)
    pipe = OfflineIVFPipeline(cfg)
    pipe.run()
    assert cfg.search_result["ntotal"] == 6000
    assert cfg.search_result["knn_intersection"] > 0.5
