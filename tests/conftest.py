"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the reference validates its
distributed paths on localhost the same way — SURVEY.md §4). Real-TPU
benchmarking happens in bench.py, not here.

The ambient environment points JAX at the (single, remote) TPU chip via a
sitecustomize that imports jax before any conftest runs, so env vars are too
late — force CPU through jax.config instead."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def small_ds():
    from tpu_ann.utils.datasets import SyntheticDataset

    return SyntheticDataset(d=32, nt=2000, nb=4000, nq=100)
