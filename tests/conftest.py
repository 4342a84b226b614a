"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the reference validates its
distributed paths on localhost the same way — SURVEY.md §4). Real-TPU
benchmarking happens in bench.py, not here.

The ambient environment points JAX at the (single, remote) TPU chip via a
sitecustomize that imports jax before any conftest runs, so env vars are too
late — force CPU through jax.config instead."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite compiles many hundreds of XLA
# programs in one process, and jaxlib 0.9.0's CPU compiler has a
# cumulative-state crash (segfault inside backend_compile_and_load after
# ~80% of the suite, reproduced with and without the native library —
# three runs, two different tests at the same position). Caching
# compiled executables on disk keeps repeat runs far below the
# crash threshold and makes them much faster. The directory lives next
# to the tests (gitignored) so it persists across runs on one machine.
#
# COLD machines: run `python tests/run_suite.py` — it splits the files
# over fresh pytest processes so each stays far below the crash
# threshold; measured green from `rm -rf .jax_test_cache` in one
# command (6 batches, 1370 s total; benchs/logs/r5_cold_suite.log).
# The cache then remains an accelerator, not a correctness crutch.
_cache = os.path.join(os.path.dirname(__file__), os.pardir,
                      ".jax_test_cache")
# tpu_ann/__init__.py installs its own cache config on import (10 s
# threshold aimed at expensive TPU compiles) — tell it to stand down so
# the test-suite settings below survive the first `import tpu_ann`.
os.environ["TPU_ANN_NO_COMPILE_CACHE"] = "1"
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fail fast if the platform override did not take. One observed suite
# run (round 5, run_suite batch 3) silently initialized against the
# real remote TPU instead of the virtual CPU mesh: sharded tests saw 1
# device, kernel-precision tests failed on MXU bf16 noise, and the
# batch contended with a live benchmark for the chip's HBM. Forcing
# device init here turns that failure mode into one clear error.
_devs = jax.devices()
if _devs[0].platform != "cpu" or len(_devs) != 8:
    raise RuntimeError(
        f"test suite must run on the virtual 8-device CPU mesh, got "
        f"{_devs} — the jax.config platform override did not take "
        f"(backend initialized before conftest?)")


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def small_ds():
    from tpu_ann.utils.datasets import SyntheticDataset

    return SyntheticDataset(d=32, nt=2000, nb=4000, nq=100)
