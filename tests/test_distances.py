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


def test_extra_metrics_oracle():
    """utils/extra_distances roles: every extra metric matches a numpy
    oracle; knn_extra_metrics orders correctly (min for distances, max
    for Jaccard); IndexFlat routes extra metrics."""
    import numpy as np

    from tpu_ann.models.flat import IndexFlat
    from tpu_ann.ops import extra_distances as XD

    rs = np.random.RandomState(3)
    xq = np.abs(rs.randn(20, 12)).astype(np.float32) + 0.1
    xb = np.abs(rs.randn(200, 12)).astype(np.float32) + 0.1

    def oracle(metric, arg=0.0):
        out = np.zeros((len(xq), len(xb)), np.float32)
        for i, x in enumerate(xq):
            for j, y in enumerate(xb):
                if metric == XD.METRIC_L1:
                    out[i, j] = np.abs(x - y).sum()
                elif metric == XD.METRIC_Linf:
                    out[i, j] = np.abs(x - y).max()
                elif metric == XD.METRIC_Lp:
                    out[i, j] = (np.abs(x - y) ** arg).sum()
                elif metric == XD.METRIC_Canberra:
                    out[i, j] = (np.abs(x - y)
                                 / (np.abs(x) + np.abs(y))).sum()
                elif metric == XD.METRIC_BrayCurtis:
                    out[i, j] = np.abs(x - y).sum() / np.abs(x + y).sum()
                elif metric == XD.METRIC_JensenShannon:
                    m = 0.5 * (x + y)
                    out[i, j] = 0.5 * (-x * np.log(m / x)
                                       - y * np.log(m / y)).sum()
                elif metric == XD.METRIC_Jaccard:
                    out[i, j] = (np.minimum(x, y).sum()
                                 / np.maximum(x, y).sum())
                elif metric == XD.METRIC_ABS_INNER_PRODUCT:
                    out[i, j] = np.abs(x * y).sum()
        return out

    for metric, arg in [(XD.METRIC_L1, 0), (XD.METRIC_Linf, 0),
                        (XD.METRIC_Lp, 1.5), (XD.METRIC_Canberra, 0),
                        (XD.METRIC_BrayCurtis, 0),
                        (XD.METRIC_JensenShannon, 0),
                        (XD.METRIC_Jaccard, 0),
                        (XD.METRIC_ABS_INNER_PRODUCT, 0)]:
        got = XD.pairwise_extra_distances(xq, xb, metric, arg)
        ref = oracle(metric, arg)
        assert np.allclose(got, ref, rtol=2e-4, atol=2e-4), metric

        import jax.numpy as jnp

        D_, I_ = XD.knn_extra_metrics(jnp.asarray(xq), jnp.asarray(xb),
                                      5, metric, jnp.float32(arg))
        D_, I_ = np.asarray(D_), np.asarray(I_)
        if XD.is_similarity_extra(metric):
            ref_best = np.argsort(-ref, axis=1)[:, :5]
        else:
            ref_best = np.argsort(ref, axis=1)[:, :5]
        assert (I_ == ref_best).mean() > 0.98, metric

    # NaN-Euclidean: missing dims are skipped and rescaled
    xn = xq.copy()
    xn[0, 0] = np.nan
    got = XD.pairwise_extra_distances(xn[:1], xb[:3],
                                      XD.METRIC_NaNEuclidean)
    ref0 = 12 / 11 * ((xn[0, 1:] - xb[:3, 1:]) ** 2).sum(1)
    assert np.allclose(got[0], ref0, rtol=1e-4)

    # IndexFlat routes extra metrics
    idx = IndexFlat(12, XD.METRIC_L1)
    idx.add(xb)
    D1, I1 = idx.search(xq, 3)
    ref = oracle(XD.METRIC_L1)
    assert (I1 == np.argsort(ref, axis=1)[:, :3]).mean() > 0.98

    idx = IndexFlat(12, XD.METRIC_Lp)
    idx.metric_arg = 1.5
    idx.add(xb)
    D2, I2 = idx.search(xq, 3)
    ref = oracle(XD.METRIC_Lp, 1.5)
    assert (I2 == np.argsort(ref, axis=1)[:, :3]).mean() > 0.98
