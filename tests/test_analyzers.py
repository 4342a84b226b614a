"""IVF analyzers (utils/analyzers.py) — partition stats, probe coverage,
recall-loss attribution (the fork's ivf-/nprobe-/point-analyzer roles)."""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlatL2
from tpu_ann.models.ivf import IndexIVFFlat
from tpu_ann.utils import analyzers


@pytest.fixture(scope="module")
def built():
    r = np.random.RandomState(5)
    xb = r.randn(4000, 16).astype(np.float32)
    xq = r.randn(64, 16).astype(np.float32)
    d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10].astype(np.int64)
    idx = IndexIVFFlat(IndexFlatL2(16), 16, nlist=32)
    idx.train(xb[:2000])
    idx.add(xb)
    return idx, xq, gt


def test_partition_stats_and_csv(built, tmp_path):
    idx, _, _ = built
    ps = analyzers.ivf_partition_stats(idx)
    assert ps["nlist"] == 32 and ps["ntotal"] == 4000
    assert ps["sizes"].sum() == 4000
    assert ps["imbalance"] >= 1.0
    assert 0.0 <= ps["gini"] < 1.0
    f = tmp_path / "stats.csv"
    analyzers.export_partition_csv(idx, str(f))
    lines = f.read_text().strip().split("\n")
    assert lines[0] == "partition_id,vector_count"
    assert len(lines) == 33
    total = sum(int(l.split(",")[1]) for l in lines[1:])
    assert total == 4000


def test_probe_coverage_monotone(built):
    idx, xq, _ = built
    c4 = analyzers.probe_coverage(idx, xq, 4)
    c16 = analyzers.probe_coverage(idx, xq, 16)
    assert 0 < c4["mean_ratio"] < c16["mean_ratio"] <= 1.0
    c32 = analyzers.probe_coverage(idx, xq, 32)
    assert c32["mean_ratio"] == pytest.approx(1.0)


def test_recall_attribution(built):
    idx, xq, gt = built
    # all lists probed: no routing loss, flat storage: no ranking loss
    att = analyzers.recall_attribution(idx, xq, gt, k=10, nprobe=32)
    assert att["recall"] == pytest.approx(1.0)
    assert att["routing_loss"] == 0.0
    # few probes: every miss must be attributed to routing (flat codec
    # inside a probed list cannot rank a true neighbor out of top-k
    # unless k spills over the scanned set)
    att2 = analyzers.recall_attribution(idx, xq, gt, k=1, nprobe=1)
    assert att2["recall"] < 1.0
    assert att2["routing_loss"] > 0.0
    assert att2["routing_loss"] + att2["ranking_loss"] == pytest.approx(
        1.0 - att2["recall"])

    rep = analyzers.report(idx, xq, gt, k=10, nprobe=4)
    assert "routing=" in rep and "imbalance=" in rep


def test_list_of_ids_roundtrip(built):
    idx, _, _ = built
    ids = np.array([0, 1, 4000, -5, 3999])
    lists = idx.list_of_ids(ids)
    assert lists[2] == -1 and lists[3] == -1
    assert (lists[[0, 1, 4]] >= 0).all()
    # consistency with the probe machinery: the vector reconstructed from
    # id i must quantize to the list it is stored in
    v = idx.reconstruct(0)[None, :]
    nearest = idx.coarse_assign(v, 1)[0, 0]
    assert lists[0] == nearest
