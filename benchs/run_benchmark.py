#!/usr/bin/env python
"""Config-grid benchmark CLI (the fork's benchmark_advanced entrypoint).

Usage:
  python benchs/run_benchmark.py [--config benchs/benchmark.config]
      [--kind ivf_hnsw|ivf_flat] [--out results.csv]
      [--sift1m DIR | --synthetic NB]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(__file__), "benchmark.config"))
    ap.add_argument("--kind", default="ivf_hnsw",
                    choices=["ivf_hnsw", "ivf_flat"])
    ap.add_argument("--out", default="benchmark_results.csv")
    ap.add_argument("--sift1m", default=None,
                    help="directory with sift_*.fvecs files")
    ap.add_argument("--synthetic", type=int, default=100000,
                    help="synthetic database size when no dataset files")
    ap.add_argument("--hard", action="store_true",
                    help="use the calibrated-hard SIFT surrogate "
                         "instead of the easy SyntheticDataset")
    ap.add_argument("--per-query", type=int, default=0, metavar="N",
                    help="also measure TRUE per-query P99/P99.9 over "
                         "the first N queries (batch-1 loop; the "
                         "fork's 192-latency harness)")
    args = ap.parse_args()

    from tpu_ann.utils.benchmark import parse_config, run_grid
    from tpu_ann.utils.datasets import SyntheticDataset, load_sift1m

    if args.sift1m:
        ds = load_sift1m(args.sift1m)
    elif args.hard:
        from tpu_ann.utils.datasets import SiftSurrogateDataset

        nb = args.synthetic
        ds = SiftSurrogateDataset(nt=min(nb, 100000), nb=nb, nq=1000)
        # real-SIFT difficulty preset (datasets.SIFT1M_CALIBRATED)
        from tpu_ann.utils.datasets import SIFT1M_CALIBRATED, sift_surrogate
        n = ds.nt + ds.nb + ds.nq
        x = sift_surrogate(n, seed=7, **SIFT1M_CALIBRATED)
        ds.xt, ds.xb, ds.xq = (x[:ds.nt], x[ds.nt:ds.nt + ds.nb],
                               x[ds.nt + ds.nb:])
        ds._gt, ds._gt_k = None, 0
    else:
        nb = args.synthetic
        ds = SyntheticDataset(d=128, nt=min(nb, 100000), nb=nb, nq=1000)

    cfg = parse_config(args.config)
    results = run_grid(ds, cfg, index_kind=args.kind, out_csv=args.out,
                       per_query_sample=args.per_query)
    print(f"{len(results)} grid points -> {args.out}")


if __name__ == "__main__":
    main()
