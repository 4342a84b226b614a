#!/usr/bin/env python
"""One-command cold-cache-safe test runner (round-5 VERDICT #8).

jaxlib 0.9.0's CPU backend has a cumulative-state crash: a single
pytest process segfaults inside backend_compile_and_load after
compiling ~80% of this suite cold (tests/conftest.py history). The
persistent .jax_test_cache hides it on warm machines but "run pytest
until green" is not a CI story. This runner bounds per-process compile
state by splitting the suite's test FILES into batches and running
each batch in a FRESH pytest process — each batch compiles well under
the crash threshold, so a cold machine completes in one command:

    python tests/run_suite.py            # green from `rm -rf .jax_test_cache`
    python tests/run_suite.py --batches 8 --jobs 2
    python tests/run_suite.py -- -k ivf  # extra args go to pytest

The persistent compile cache stays on as an accelerator (batches still
share it), it's just no longer a correctness crutch. Batches are
balanced by file size (compile work tracks test volume closely enough)
and deterministic, so a failure names a reproducible batch.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def make_batches(files, n):
    """Greedy size-balanced partition, deterministic order."""
    sizes = sorted(((os.path.getsize(f), f) for f in files), reverse=True)
    batches = [[] for _ in range(n)]
    totals = [0] * n
    for sz, f in sizes:
        i = totals.index(min(totals))
        batches[i].append(f)
        totals[i] += sz
    return [sorted(b) for b in batches if b]


def run_batch(i, files, extra):
    cmd = [sys.executable, "-m", "pytest", "-q", *extra, *files]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO)
    return i, r.returncode, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=6,
                    help="fresh pytest processes to split files over")
    ap.add_argument("--jobs", type=int, default=1,
                    help="batches to run concurrently (each already uses "
                         "the 8-device virtual mesh; >2 oversubscribes "
                         "most hosts)")
    ap.add_argument("rest", nargs="*", help="extra pytest args after --")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(HERE, "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2
    batches = make_batches(files, args.batches)
    print(f"run_suite: {len(files)} files in {len(batches)} batches, "
          f"jobs={args.jobs}")

    failed = []
    if args.jobs <= 1:
        for i, b in enumerate(batches):
            i, rc, dt = run_batch(i, b, args.rest)
            print(f"[batch {i}] rc={rc} in {dt:.0f}s "
                  f"({len(b)} files)", flush=True)
            if rc:
                failed.append((i, b))
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(args.jobs) as ex:
            futs = [ex.submit(run_batch, i, b, args.rest)
                    for i, b in enumerate(batches)]
            for f in futs:
                i, rc, dt = f.result()
                print(f"[batch {i}] rc={rc} in {dt:.0f}s", flush=True)
                if rc:
                    failed.append((i, batches[i]))

    if failed:
        print(f"\nFAILED batches: {[i for i, _ in failed]}")
        for i, b in failed:
            print(f"  batch {i}: {' '.join(os.path.basename(x) for x in b)}")
        return 1
    print("\nall batches green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
