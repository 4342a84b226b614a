"""L0 substrate tests vs numpy reference — the two-oracle scheme the
reference uses for its SIMD kernels (tests/test_distances_simd.cpp,
tests/test_heap.cpp): exact equivalence against a naive implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ann.ops import distances as D
from tpu_ann.ops import topk as T


def _np_l2(xq, xb):
    return ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)


@pytest.mark.parametrize("nq,nb,d", [(7, 33, 8), (32, 128, 16), (5, 1000, 24)])
def test_pairwise_l2_matches_numpy(rng, nq, nb, d):
    xq = rng.rand(nq, d).astype(np.float32)
    xb = rng.rand(nb, d).astype(np.float32)
    got = np.asarray(D.pairwise_l2sqr(jnp.asarray(xq), jnp.asarray(xb)))
    want = _np_l2(xq, xb)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pairwise_ip_matches_numpy(rng):
    xq = rng.rand(9, 12).astype(np.float32)
    xb = rng.rand(50, 12).astype(np.float32)
    got = np.asarray(D.pairwise_inner_product(jnp.asarray(xq), jnp.asarray(xb)))
    np.testing.assert_allclose(got, xq @ xb.T, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("metric", [D.METRIC_L2, D.METRIC_INNER_PRODUCT])
@pytest.mark.parametrize("db_block", [1 << 16, 64])  # single vs multi block
def test_knn_matches_numpy(rng, metric, db_block):
    nq, nb, d, k = 23, 517, 16, 10
    xq = rng.rand(nq, d).astype(np.float32)
    xb = rng.rand(nb, d).astype(np.float32)
    Dv, Iv = D.knn(jnp.asarray(xq), jnp.asarray(xb), k, metric,
                   db_block=db_block)
    Dv, Iv = np.asarray(Dv), np.asarray(Iv)
    if metric == D.METRIC_L2:
        ref = _np_l2(xq, xb)
        order = np.argsort(ref, axis=1, kind="stable")[:, :k]
    else:
        ref = xq @ xb.T
        order = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    ref_d = np.take_along_axis(ref, order, axis=1)
    np.testing.assert_allclose(Dv, ref_d, rtol=1e-4, atol=1e-4)
    # ids may differ on exact ties; distances via ids must match
    got_d = np.take_along_axis(ref, Iv, axis=1)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-4, atol=1e-4)


def test_knn_valid_n_masks_padding(rng):
    xb = rng.rand(100, 8).astype(np.float32)
    xq = xb[:5]
    # pretend capacity is 100 but only 50 rows are valid
    Dv, Iv = D.knn(jnp.asarray(xq), jnp.asarray(xb), 10, D.METRIC_L2,
                   valid_n=50)
    assert (np.asarray(Iv) < 50).all()


def test_knn_k_larger_than_nb(rng):
    xb = rng.rand(4, 8).astype(np.float32)
    Dv, Iv = D.knn(jnp.asarray(xb), jnp.asarray(xb), 8)
    Dv, Iv = np.asarray(Dv), np.asarray(Iv)
    assert Iv.shape == (4, 8)
    assert (Iv[:, 4:] == -1).all()
    assert np.isinf(Dv[:, 4:]).all()
    # self-match first
    np.testing.assert_array_equal(Iv[:, 0], np.arange(4))


def test_merge_topk(rng):
    d1 = np.array([[1.0, 3.0], [0.5, 2.0]], np.float32)
    i1 = np.array([[10, 30], [11, 21]], np.int32)
    d2 = np.array([[2.0, 4.0], [0.1, 5.0]], np.float32)
    i2 = np.array([[20, 40], [12, 52]], np.int32)
    Dv, Iv = T.merge_topk(jnp.asarray(d1), jnp.asarray(i1),
                          jnp.asarray(d2), jnp.asarray(i2), 3)
    np.testing.assert_allclose(np.asarray(Dv), [[1, 2, 3], [0.1, 0.5, 2.0]])
    np.testing.assert_array_equal(np.asarray(Iv), [[10, 20, 30], [12, 11, 21]])


def test_merge_topk_axis(rng):
    s, nq, kk, k = 4, 6, 5, 7
    dis = rng.rand(s, nq, kk).astype(np.float32)
    ids = rng.randint(0, 10000, size=(s, nq, kk)).astype(np.int32)
    Dv, Iv = T.merge_topk_axis(jnp.asarray(dis), jnp.asarray(ids), k)
    flat_d = np.moveaxis(dis, 0, 1).reshape(nq, -1)
    flat_i = np.moveaxis(ids, 0, 1).reshape(nq, -1)
    order = np.argsort(flat_d, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(Dv),
                               np.take_along_axis(flat_d, order, 1))
    np.testing.assert_array_equal(np.asarray(Iv),
                                  np.take_along_axis(flat_i, order, 1))
