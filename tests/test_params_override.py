"""Per-call SearchParameters leave index state untouched and match the
equivalent index-state setting (reference: tests/test_params_override.py)."""

import numpy as np
import pytest

from tpu_ann import index_factory
from tpu_ann.models.hnsw import SearchParametersHNSW
from tpu_ann.models.ivf import SearchParametersIVF


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(9)
    return (rs.randn(4000, 24).astype(np.float32),
            rs.randn(12000, 24).astype(np.float32),
            rs.randn(50, 24).astype(np.float32))


@pytest.mark.parametrize("spec", ["IVF32,Flat", "IVF32,PQ6x8",
                                  "IVF32,SQ8"])
def test_ivf_params_override_matches_state(data, spec):
    xt, xb, xq = data
    idx = index_factory(24, spec)
    idx.cp.niter = 4
    idx.train(xt)
    idx.add(xb)

    idx.nprobe = 1
    D_state1, I_state1 = idx.search(xq, 5)
    # override to 8 probes for one call
    D_ovr, I_ovr = idx.search(xq, 5, params=SearchParametersIVF(nprobe=8))
    idx.nprobe = 8
    D_state8, I_state8 = idx.search(xq, 5)
    assert np.array_equal(I_ovr, I_state8)
    # the override did not mutate index state
    idx.nprobe = 1
    D_again, I_again = idx.search(xq, 5)
    assert np.array_equal(I_again, I_state1)


def test_hnsw_params_override_matches_state(data):
    xt, xb, xq = data
    idx = index_factory(24, "HNSW16")
    idx.add(xb)

    idx.hnsw.efSearch = 8
    _, I_state8 = idx.search(xq, 5)
    _, I_ovr = idx.search(xq, 5, params=SearchParametersHNSW(efSearch=64))
    idx.hnsw.efSearch = 64
    _, I_state64 = idx.search(xq, 5)
    assert np.array_equal(I_ovr, I_state64)
    assert idx.hnsw.efSearch == 64  # only the explicit assignment changed it


def test_ivf_max_codes_param(data):
    xt, xb, xq = data
    idx = index_factory(24, "IVF32,Flat")
    idx.cp.niter = 4
    idx.train(xt)
    idx.add(xb)
    idx.nprobe = 16
    D_full, I_full = idx.search(xq, 5)
    # a tight scan budget must reduce (or equal) per-query work and can
    # only degrade results, never error
    D_cap, I_cap = idx.search(
        xq, 5, params=SearchParametersIVF(nprobe=16, max_codes=64))
    assert I_cap.shape == I_full.shape
    inter = np.mean([len(np.intersect1d(I_cap[i], I_full[i])) / 5
                     for i in range(len(xq))])
    assert inter <= 1.0
