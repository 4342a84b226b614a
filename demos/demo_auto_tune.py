#!/usr/bin/env python
"""Auto-tuning demo (reference: demos/demo_auto_tune.py): explore the
nprobe/efSearch grid of an IVF-HNSW index and print the Pareto front."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection


def main():
    from tpu_ann import IntersectionCriterion, ParameterSpace, index_factory
    from tpu_ann.utils.datasets import SyntheticDataset

    ds = SyntheticDataset(d=64, nt=20000, nb=100000, nq=500)
    index = index_factory(64, "IVF256_HNSW16,Flat")
    print("training", index)
    index.train(ds.get_train())
    index.add(ds.get_database())

    ps = ParameterSpace()
    ps.initialize(index)
    ps.verbose = True
    crit = IntersectionCriterion(ds.nq, 10)
    crit.set_groundtruth(None, ds.get_groundtruth(10))
    ops = ps.explore(index, ds.get_queries(), crit)

    print("\nPareto-optimal operating points:")
    for p in ops.optimal_pts():
        print(f"  {p.key}: recall={p.perf:.4f} t={p.t*1000:.1f}ms")


if __name__ == "__main__":
    main()
