"""Fused flat-scan Pallas kernel: equivalence to the exact blocked GEMM
path (interpret mode on the CPU mesh; compiled on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ann.ops import distances as D
from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db


@pytest.mark.parametrize("metric",
                         [D.METRIC_L2, D.METRIC_INNER_PRODUCT])
def test_flat_fused_matches_exact(metric):
    rng = np.random.RandomState(11)
    nb, d, nq, k = 5000, 48, 200, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    D0, I0 = D.knn(jnp.asarray(xq), jnp.asarray(xb), k, metric)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k, metric,
                            Q=128, R=1024, W=512, refine=4,
                            interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    D0, D1 = np.asarray(D0), np.asarray(D1)
    # the reservoir is deliberately lossy (bf16 scores + lane-min sketch
    # + exact f32 refine): candidate sets overlap near-perfectly and
    # matching ids carry exact f32 distances
    overlap = np.mean([
        len(set(I1[q]) & set(I0[q])) / k for q in range(nq)])
    assert overlap >= 0.97, overlap
    for q in range(nq):
        m0 = {i: v for i, v in zip(I0[q], D0[q])}
        m1 = {i: v for i, v in zip(I1[q], D1[q])}
        for i in set(I1[q]) & set(I0[q]):
            np.testing.assert_allclose(m1[i], m0[i], rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("refine", [0, 4])
def test_flat_fused_approx_select(refine):
    """sel='approx' (lax.approx_max_k reservoir selection) keeps
    near-exact overlap with the full-sort epilogue; under refine the
    surviving candidates carry exact f32 distances."""
    rng = np.random.RandomState(31)
    nb, d, nq, k = 5000, 48, 200, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    D0, I0 = D.knn(jnp.asarray(xq), jnp.asarray(xb), k, D.METRIC_L2)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, Q=128, R=1024, W=512,
                            refine=refine, sel="approx", interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    overlap = np.mean([
        len(set(I1[q]) & set(I0[q])) / k for q in range(nq)])
    assert overlap >= 0.95, overlap
    if refine:
        D0, D1 = np.asarray(D0), np.asarray(D1)
        for q in range(nq):
            m0 = {i: v for i, v in zip(I0[q], D0[q])}
            m1 = {i: v for i, v in zip(I1[q], D1[q])}
            for i in set(I1[q]) & set(I0[q]):
                np.testing.assert_allclose(m1[i], m0[i],
                                           rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("with_mask", [False, True])
def test_flat_fused_prepacked_matches_inline(with_mask):
    """packed=pack_flat_db(...) is bit-identical to the inline per-call
    DB prep, including valid_n baked at pack time and a per-call
    id_mask composed onto the packed bias plane."""
    rng = np.random.RandomState(7)
    cap, nvalid, d, nq, k = 3000, 2600, 48, 100, 10
    xb = rng.randn(cap, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    id_mask = None
    if with_mask:
        id_mask = jnp.asarray((rng.rand(cap) > 0.3).astype(np.uint8))
    kw = dict(Q=128, R=1024, W=512, refine=4, interpret=True)
    D0, I0 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, valid_n=jnp.int32(nvalid),
                            id_mask=id_mask, **kw)
    packed = pack_flat_db(jnp.asarray(xb), D.METRIC_L2,
                          valid_n=jnp.int32(nvalid), R=1024)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, id_mask=id_mask,
                            packed=packed, **kw)
    np.testing.assert_array_equal(np.asarray(I0), np.asarray(I1))
    np.testing.assert_allclose(np.asarray(D0), np.asarray(D1),
                               rtol=1e-6, atol=1e-6)
    if with_mask:  # masked-out ids never surface
        masked = set(np.flatnonzero(np.asarray(id_mask) == 0))
        assert not masked & set(np.asarray(I1).ravel().tolist())


def test_index_flat_packed_cache_invalidation():
    """IndexFlat reuses the packed layout across searches and rebuilds
    it after add()."""
    from tpu_ann.models.flat import IndexFlat

    rng = np.random.RandomState(3)
    idx = IndexFlat(32)
    idx.scan_mode = "fused"
    idx.fused_schedule = "grid"
    xb = rng.randn(300, 32).astype(np.float32)
    idx.add(xb)
    assert idx._fused_packed is None
    # interpret-mode kernel on CPU: monkey-less — fused path runs because
    # scan_mode='fused'; small shapes keep it fast
    import tpu_ann.models.flat as MF

    orig = MF.IndexFlat._fused_search_device

    def patched(self, xq_dev, k, id_mask=None):
        from tpu_ann.ops.flat_knn_pallas import flat_knn_fused, pack_flat_db

        if self._fused_packed is None:
            self._fused_packed = pack_flat_db(
                self._xb, self.metric_type, xb_norms=self._norms,
                valid_n=jnp.int32(self.ntotal), R=256)
        return flat_knn_fused(xq_dev, self._xb, k, self.metric_type,
                              id_mask=id_mask, packed=self._fused_packed,
                              Q=128, R=256, W=128, refine=4,
                              interpret=True)

    MF.IndexFlat._fused_search_device = patched
    try:
        xq = rng.randn(20, 32).astype(np.float32)
        D1, I1 = idx.search(xq, 5)
        cached = idx._fused_packed
        assert cached is not None
        idx.search(xq, 5)
        assert idx._fused_packed is cached          # reused
        idx.add(rng.randn(10, 32).astype(np.float32))
        assert idx._fused_packed is None            # invalidated
        D2, I2 = idx.search(xq, 5)
        D0, I0 = D.knn(jnp.asarray(xq), idx._xb, 5, D.METRIC_L2,
                       valid_n=jnp.int32(idx.ntotal))
        overlap = np.mean([len(set(np.asarray(I2)[q])
                               & set(np.asarray(I0)[q])) / 5
                           for q in range(20)])
        assert overlap >= 0.95, overlap
    finally:
        MF.IndexFlat._fused_search_device = orig


@pytest.mark.parametrize("schedule", ["grid", "pipe"])
def test_flat_fused_schedules_match_fori(schedule):
    """All chunk-loop schedules produce identical reservoirs."""
    rng = np.random.RandomState(21)
    nb, d, nq, k = 4096, 48, 200, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    kw = dict(Q=128, R=1024, W=512, refine=4, interpret=True)
    D0, I0 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, schedule="fori", **kw)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, schedule=schedule, **kw)
    np.testing.assert_array_equal(np.asarray(I0), np.asarray(I1))
    np.testing.assert_allclose(np.asarray(D0), np.asarray(D1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("unroll", [2, 3])
def test_flat_fused_unrolled_matches_fori(unroll):
    """unroll=U partitions chunks over U independent accumulators that
    min-merge at the end — same lane partition, so the same reservoir
    minima (nchunks=5 also exercises the round-up-to-U chunk padding)."""
    rng = np.random.RandomState(22)
    nb, d, nq, k = 5000, 48, 150, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    kw = dict(Q=128, R=1024, W=512, refine=4, interpret=True)
    D0, I0 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, **kw)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            D.METRIC_L2, unroll=unroll, **kw)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    # candidate minima are identical up to bf16 ties between chunks
    # assigned to different accumulators; the refined top-k overlap is
    # therefore near-perfect and matched ids score identically
    overlap = np.mean([
        len(set(I1[q]) & set(I0[q])) / k for q in range(nq)])
    assert overlap >= 0.99, overlap
    np.testing.assert_allclose(np.sort(np.asarray(D1), axis=1),
                               np.sort(np.asarray(D0), axis=1),
                               rtol=1e-4, atol=1e-3)


def test_flat_fused_valid_n_and_mask():
    rng = np.random.RandomState(12)
    nb, d, nq, k = 3000, 32, 100, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    # valid_n: rows >= 2500 must never appear
    D0, I0 = D.knn(jnp.asarray(xq), jnp.asarray(xb[:2500]), k)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                            valid_n=2500, Q=128, R=1024, W=512,
                            refine=4, interpret=True)
    I1 = np.asarray(I1)
    assert I1.max() < 2500
    overlap = np.mean([
        len(set(I1[q]) & set(np.asarray(I0)[q])) / k for q in range(nq)])
    assert overlap >= 0.97, overlap
    # IDSelector bitmap: only odd ids allowed
    mask = np.zeros(nb, np.uint8)
    mask[1::2] = 1
    _, I2 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k,
                           id_mask=jnp.asarray(mask), Q=128, R=1024,
                           W=512, refine=4, interpret=True)
    I2 = np.asarray(I2)
    assert (I2 % 2 == 1).all()


def test_flat_fused_small_and_kpad():
    """nb smaller than one chunk; k > effective candidates still pads."""
    rng = np.random.RandomState(13)
    xb = rng.randn(300, 16).astype(np.float32)
    xq = rng.randn(17, 16).astype(np.float32)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), 5,
                            Q=128, R=512, W=256, refine=4,
                            interpret=True)
    D0, I0 = D.knn(jnp.asarray(xq), jnp.asarray(xb), 5)
    overlap = np.mean([
        len(set(np.asarray(I1)[q]) & set(np.asarray(I0)[q])) / 5
        for q in range(17)])
    assert overlap >= 0.95, overlap


def test_index_flat_fused_dispatch():
    """IndexFlat routes through the kernel when the approx knobs are on
    and scan_mode forces it (auto stays exact off-TPU)."""
    from tpu_ann.models.flat import IndexFlatL2

    rng = np.random.RandomState(14)
    xb = rng.randn(4000, 32).astype(np.float32)
    xq = rng.randn(50, 32).astype(np.float32)
    idx = IndexFlatL2(32)
    idx.add(xb)
    D0, I0 = idx.search(xq, 10)
    # force the fused path in interpret mode via the kernel directly:
    # the model-level dispatch needs a real accelerator, so just check
    # the auto guard stays off on CPU
    idx.compute_dtype = "bfloat16"
    idx.approx_topk = True
    assert not idx._use_fused(10)
    idx.scan_mode = "xla"
    D1, I1 = idx.search(xq, 10)
    overlap = np.mean([
        len(set(I1[q]) & set(I0[q])) / 10 for q in range(50)])
    assert overlap >= 0.97, overlap


def test_tree_merge_matches_serial():
    """merge='tree' (log-depth two-stage fold) reaches the same exact
    refined results as the serial fold on every schedule."""
    import jax.numpy as jnp

    from tpu_ann.ops.flat_knn_pallas import flat_knn_fused

    rng = np.random.RandomState(3)
    xb = rng.randn(4096, 64).astype(np.float32)
    xq = rng.randn(128, 64).astype(np.float32)
    base = None
    for sched in ("fori", "grid", "pipe"):
        for merge in ("serial", "tree"):
            Dv, Iv = flat_knn_fused(
                jnp.asarray(xq), jnp.asarray(xb), 10, Q=64, R=1024,
                W=256, schedule=sched, merge=merge, interpret=True)
            got = (np.asarray(Dv), np.asarray(Iv))
            if base is None:
                base = got
            else:
                # same reservoir lane assignment -> identical candidates
                np.testing.assert_array_equal(base[1], got[1])
                np.testing.assert_allclose(base[0], got[0], rtol=1e-5)


@pytest.mark.parametrize("metric",
                         [D.METRIC_L2, D.METRIC_INNER_PRODUCT])
@pytest.mark.parametrize("sched,unroll", [("grid", 1), ("fori", 1),
                                          ("fori", 2)])
def test_packed_merge_matches_serial(metric, sched, unroll):
    """merge='packed' (single int32 reservoir: masked score bits +
    group index, one `min` per group) recovers the same candidates as
    the serial two-array fold; refined distances are exact f32."""
    rng = np.random.RandomState(5)
    nb, d, nq, k = 6000, 64, 150, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    kw = dict(Q=128, R=1024, W=256, refine=4, interpret=True)
    D0, I0 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k, metric,
                            merge="serial", **kw)
    D1, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), k, metric,
                            merge="packed", schedule=sched,
                            unroll=unroll, **kw)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    D0, D1 = np.asarray(D0), np.asarray(D1)
    # packed truncates score mantissas to 7 bits in the reservoir, so
    # near-tie lane winners can differ from the serial fold; the exact
    # refine re-rank keeps the final sets near-identical
    overlap = np.mean([
        len(set(I1[q]) & set(I0[q])) / k for q in range(nq)])
    assert overlap >= 0.97, overlap
    for q in range(nq):
        m0 = {i: v for i, v in zip(I0[q], D0[q])}
        m1 = {i: v for i, v in zip(I1[q], D1[q])}
        for i in set(I1[q]) & set(I0[q]):
            np.testing.assert_allclose(m1[i], m0[i], rtol=1e-5,
                                       atol=1e-5)


def test_packed_merge_valid_n():
    """+inf bias rows (valid_n) can never win a packed lane."""
    rng = np.random.RandomState(6)
    xb = rng.randn(3000, 32).astype(np.float32)
    xq = rng.randn(64, 32).astype(np.float32)
    _, I1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), 10,
                           valid_n=2500, merge="packed", Q=64, R=512,
                           W=256, refine=4, interpret=True)
    assert np.asarray(I1).max() < 2500


def test_reservoir_topk_matches_laxtopk():
    """sel='kernel' extraction oracle (interpret mode)."""
    from jax import lax

    from tpu_ann.ops.flat_knn_pallas import reservoir_topk

    rs = np.random.RandomState(3)
    resv = rs.randn(300, 256).astype(np.float32)
    resp = rs.randint(0, 10**6, size=(300, 256)).astype(np.int32)
    resv[7] = np.inf                      # dead row -> -1/inf outputs
    v, p = reservoir_topk(jnp.asarray(resv), jnp.asarray(resp), 12,
                          interpret=True)
    tv, ti = lax.top_k(-jnp.asarray(resv), 12)
    live = np.arange(300) != 7
    np.testing.assert_allclose(np.asarray(v)[live],
                               -np.asarray(tv)[live])
    ref_p = np.take_along_axis(resp, np.asarray(ti), axis=1)
    np.testing.assert_array_equal(np.asarray(p)[live], ref_p[live])
    assert (np.asarray(p)[7] == -1).all()


def test_flat_fused_sel_kernel_matches_exact():
    rs = np.random.RandomState(5)
    xb = rs.randn(3000, 24).astype(np.float32)
    xq = rs.randn(60, 24).astype(np.float32)
    kw = dict(Q=64, R=512, W=128, schedule="grid", interpret=True)
    d0, i0 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), 8,
                               refine=0, sel="exact", **kw)
    d1, i1 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), 8,
                               refine=0, sel="kernel", **kw)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-6)
    d2, i2 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), 8,
                               refine=4, sel="kernel", **kw)
    d3, i3 = flat_knn_fused(jnp.asarray(xq), jnp.asarray(xb), 8,
                               refine=4, sel="exact", **kw)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))


def test_int_exact_gate():
    """Integer-exactness auto-detection on the IndexFlat fused path."""
    from tpu_ann.models.flat import IndexFlat, _int_exact_stats

    rs = np.random.RandomState(6)
    xi = np.floor(rs.rand(500, 16) * 255).astype(np.float32)
    ok, mx = _int_exact_stats(jnp.asarray(xi))
    assert bool(np.asarray(ok)) and float(np.asarray(mx)) <= 255

    idx = IndexFlat(16)
    idx.add(xi)
    idx._fused_packed = object()          # pretend packed; set db stats
    idx._db_int_max = float(np.asarray(mx))
    assert idx._use_exact_kernel(jnp.asarray(xi[:8]))
    # float queries disable the exact path
    assert not idx._use_exact_kernel(jnp.asarray(xi[:8] + 0.5))
    # magnitude past the exact-f32-sum bound disables it:
    # 2 * d * qmax * dbmax must stay <= 2^24
    idx._db_int_max = 256.0
    big = np.full((4, 16), 256.0, np.float32)
    assert 2 * 16 * 256 * 256 <= 2**24   # d=16 still passes
    assert idx._use_exact_kernel(jnp.asarray(big))
    idx.d = 8192                          # force the bound to fail
    assert not idx._use_exact_kernel(jnp.asarray(big))
    # explicit pin wins
    idx.exact_kernel = False
    assert not idx._use_exact_kernel(jnp.asarray(xi[:8]))
