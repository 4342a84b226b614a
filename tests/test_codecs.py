"""PQ / SQ codec + IVF-coded + refine + transform tests — the reference's
test_index_accuracy.py / test_fast_scan equivalence style: codecs must
beat a recall floor and round-trip their codes."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.ivf_pq import (
    IndexIVFPQ,
    IndexIVFScalarQuantizer,
    make_ivf_pq,
)
from tpu_ann.models.pq import IndexPQ, IndexScalarQuantizer
from tpu_ann.models.refine import IndexRefineFlat
from tpu_ann.models.transforms import (
    IndexPreTransform,
    OPQMatrix,
    PCAMatrix,
    RandomRotationMatrix,
)
from tpu_ann.ops import pq as PQ
from tpu_ann.ops import sq as SQ
from tpu_ann.utils.evaluation import recall_at_r


# --- ops-level ------------------------------------------------------------

def test_pq_roundtrip_reduces_error(small_ds):
    xt = small_ds.get_train()
    codec = PQ.train_pq(xt, M=4, nbits=8, niter=8)
    cent = jnp.asarray(codec.centroids)
    codes = PQ.pq_encode(jnp.asarray(xt[:500]), cent)
    recon = np.asarray(PQ.pq_decode(codes, cent))
    mse = ((recon - xt[:500]) ** 2).mean()
    var = xt[:500].var()
    assert mse < 0.35 * var, f"PQ mse {mse} vs var {var}"


def test_pq_adc_matches_decoded(small_ds):
    """ADC table distance == exact distance to the reconstruction."""
    xt = small_ds.get_train()
    codec = PQ.train_pq(xt, M=4, nbits=8, niter=6)
    cent = jnp.asarray(codec.centroids)
    xq = small_ds.get_queries()[:10]
    codes = PQ.pq_encode(jnp.asarray(xt[:64]), cent)
    lut = PQ.query_tables(jnp.asarray(xq), cent)
    adc = np.asarray(PQ.adc_scan(
        lut, jnp.broadcast_to(codes[None], (10, 64, 4))))
    recon = np.asarray(PQ.pq_decode(codes, cent))
    exact = ((xq[:, None, :] - recon[None]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, exact, rtol=1e-3, atol=1e-3)


def test_adc_scan_db_matches_adc_scan(small_ds):
    """The shared-code one-hot-GEMM route == the per-query gather route."""
    xt = small_ds.get_train()
    codec = PQ.train_pq(xt, M=4, nbits=8, niter=6)
    cent = jnp.asarray(codec.centroids)
    xq = small_ds.get_queries()[:10]
    codes = PQ.pq_encode(jnp.asarray(xt[:64]), cent)
    lut = PQ.query_tables(jnp.asarray(xq), cent)
    ref = np.asarray(PQ.adc_scan(
        lut, jnp.broadcast_to(codes[None], (10, 64, 4))))
    db = np.asarray(PQ.adc_scan_db(lut, codes))
    np.testing.assert_allclose(db, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("qtype", [SQ.QT_8BIT, SQ.QT_8BIT_UNIFORM,
                                   SQ.QT_FP16, SQ.QT_BF16])
def test_sq_roundtrip(qtype, small_ds):
    xt = small_ds.get_train()[:500]
    codec = SQ.train_sq(xt, qtype)
    codes = SQ.sq_encode(jnp.asarray(xt), codec)
    recon = np.asarray(SQ.sq_decode(codes, codec))
    err = np.abs(recon - xt).max()
    scale = np.abs(xt).max()
    assert err < 0.02 * scale + 1e-2, f"qtype {qtype} err {err}"


# --- flat codec indexes ---------------------------------------------------

def test_index_pq_recall(small_ds):
    idx = IndexPQ(small_ds.d, M=8, nbits=8)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.7, f"IndexPQ recall {r}"   # 8-byte codes on 32d: lossy


def test_index_sq_recall(small_ds):
    idx = IndexScalarQuantizer(small_ds.d, SQ.QT_8BIT)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.95, f"IndexSQ recall {r}"  # 8-bit/dim is near-exact


# --- IVF coded ------------------------------------------------------------

def test_ivfpq_recall(small_ds):
    idx = make_ivf_pq(small_ds.d, nlist=32, M=8)
    idx.cp.niter = 6
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    _, I, st = idx.search_stats(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.65, f"IVFPQ recall {r}"
    assert st.ndis > 0


def test_ivfpq_decoded_cache_matches_gather_adc(small_ds):
    """The decoded cache (ops.ivf_scan.decode_code_invlists — the fast
    8-bit ADC) must return the same neighbors/distances as the LUT-gather
    ADC scan: ||q - c_l - dec(code)||^2 == sum_m lut[m][code_m] exactly
    (orthogonal subspaces), so the two paths may differ only by fp
    reduction order."""
    for br in (True, False):
        idx = make_ivf_pq(small_ds.d, nlist=16, M=8)
        idx.by_residual = br
        idx.cp.niter = 6
        idx.train(small_ds.get_train())
        idx.add(small_ds.get_database())
        idx.nprobe = 8

        idx.use_decoded_cache = False
        Dg, Ig = idx.search(small_ds.get_queries(), 10)
        idx.use_decoded_cache = True
        idx.decoded_cache_dtype = "float32"
        assert idx._decoded_cache() is not None
        Dd, Id = idx.search(small_ds.get_queries(), 10)

        # distances agree to fp tolerance; id rows agree except where
        # near-ties reorder
        np.testing.assert_allclose(Dd, Dg, rtol=2e-4, atol=2e-4)
        agree = (Id == Ig).mean()
        assert agree > 0.97, f"by_residual={br}: id agreement {agree}"

        # default bf16 cache: same neighbors to bf16 noise (the codec
        # error dominates; bf16 storage costs half the HBM)
        idx.decoded_cache_dtype = "bfloat16"
        idx._decoded = None
        Db, Ib = idx.search(small_ds.get_queries(), 10)
        np.testing.assert_allclose(Db, Dg, rtol=2e-2, atol=2e-2)
        assert (Ib == Ig).mean() > 0.9


def test_ivfpq_decoded_cache_rebuilds_after_add(small_ds):
    idx = make_ivf_pq(small_ds.d, nlist=16, M=8)
    idx.use_decoded_cache = True
    idx.cp.niter = 6
    xb = small_ds.get_database()
    idx.train(small_ds.get_train())
    idx.add(xb[:2000])
    c1 = idx._decoded_cache()
    assert c1 is not None and c1.ids is idx.invlists.ids
    idx.add(xb[2000:])
    c2 = idx._decoded_cache()
    assert c2 is not c1 and idx.ntotal == len(xb)
    idx.nprobe = 16
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.65


def test_ivfpqr_beats_base_ivfpq(small_ds):
    """IndexIVFPQR (faiss IndexIVFPQR.cpp): the refinement PQ re-rank must
    improve recall over the base IVFPQ at the same base code budget."""
    from tpu_ann.models.ivf_pq import IndexIVFPQR

    gt = small_ds.get_groundtruth(10)
    base = make_ivf_pq(small_ds.d, nlist=32, M=4)
    base.cp.niter = 6
    base.train(small_ds.get_train())
    base.add(small_ds.get_database())
    base.nprobe = 16
    _, Ib = base.search(small_ds.get_queries(), 10)
    rb = recall_at_r(Ib, gt, 10)

    idx = IndexIVFPQR(IndexFlat(small_ds.d), small_ds.d, 32, 4,
                      8, small_ds.d // 4, 8)
    idx.cp.niter = 6
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    _, Ir, st = idx.search_stats(small_ds.get_queries(), 10)
    rr = recall_at_r(Ir, gt, 10)
    assert rr > rb + 0.03, f"PQR {rr} vs PQ {rb}"
    assert st.ndis > 0


def test_ivfpqr_factory(small_ds):
    from tpu_ann.utils.factory import index_factory
    from tpu_ann.models.ivf_pq import IndexIVFPQR

    idx = index_factory(small_ds.d, "IVF32,PQ4+8")
    assert isinstance(idx, IndexIVFPQR)
    assert idx.M == 4 and idx.M_refine == 8


def test_ivfpq_residual_and_plain_paths(small_ds):
    """Both by_residual settings must search correctly (the residual ADC
    itself is validated exactly against reconstruction distances in
    test_pq_adc_matches_decoded; which path wins on recall is
    data-dependent)."""
    gt = small_ds.get_groundtruth(10)
    rs = {}
    for br in (True, False):
        idx = make_ivf_pq(small_ds.d, nlist=32, M=8)
        idx.by_residual = br
        idx.cp.niter = 6
        idx.train(small_ds.get_train())
        idx.add(small_ds.get_database())
        idx.nprobe = 32
        _, I = idx.search(small_ds.get_queries(), 10)
        rs[br] = recall_at_r(I, gt, 10)
    assert rs[True] > 0.85 and rs[False] > 0.85, rs


def test_ivfsq_recall(small_ds):
    from tpu_ann.models.flat import IndexFlat

    quant = IndexFlat(small_ds.d)
    idx = IndexIVFScalarQuantizer(quant, small_ds.d, 32, SQ.QT_8BIT)
    idx.cp.niter = 6
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 8
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.85, f"IVFSQ recall {r}"


# --- refine ---------------------------------------------------------------

def test_refine_flat_improves_pq(small_ds):
    base = IndexPQ(small_ds.d, M=4, nbits=8)
    idx = IndexRefineFlat(base)
    idx.k_factor = 8
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    gt = small_ds.get_groundtruth(10)
    _, Ib = base.search(small_ds.get_queries(), 10)
    _, Ir = idx.search(small_ds.get_queries(), 10)
    rb = recall_at_r(Ib, gt, 10)
    rr = recall_at_r(Ir, gt, 10)
    assert rr > rb + 0.1, (rb, rr)


# --- transforms -----------------------------------------------------------

def test_pca_reduces_dim(small_ds):
    pca = PCAMatrix(small_ds.d, 16)
    pca.train(small_ds.get_train())
    y = pca.apply(small_ds.get_database()[:100])
    assert y.shape == (100, 16)
    # PCA16 keeps most variance of this low-intrinsic-dim data
    assert y.var() > 0.5 * small_ds.get_database()[:100].var()


def test_random_rotation_preserves_distances(small_ds):
    rr = RandomRotationMatrix(small_ds.d, small_ds.d)
    rr.train()
    x = small_ds.get_database()[:50]
    y = rr.apply(x)
    dx = ((x[:1] - x) ** 2).sum(1)
    dy = ((y[:1] - y) ** 2).sum(1)
    np.testing.assert_allclose(dx, dy, rtol=1e-3, atol=1e-3)


def test_pretransform_index(small_ds):
    pca = PCAMatrix(small_ds.d, 24)
    sub = IndexFlat(24)
    idx = IndexPreTransform(pca, sub)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.8


def test_opq_rotation_is_orthonormal(small_ds):
    opq = OPQMatrix(small_ds.d, M=4)
    opq.niter = 3
    opq.train(small_ds.get_train()[:1000])
    eye = opq.A @ opq.A.T
    np.testing.assert_allclose(eye, np.eye(small_ds.d), atol=1e-4)


def test_itq_orthonormal(small_ds):
    from tpu_ann.models.transforms import ITQMatrix

    itq = ITQMatrix(small_ds.d, niter=10)
    itq.train(small_ds.get_train()[:1000])
    np.testing.assert_allclose(itq.A @ itq.A.T, np.eye(small_ds.d),
                               atol=1e-4)


def test_remap_dimensions(small_ds):
    from tpu_ann.models.transforms import RemapDimensionsTransform

    rm = RemapDimensionsTransform(small_ds.d, 16)
    y = rm.apply(small_ds.get_database()[:10])
    assert y.shape == (10, 16)
    x = small_ds.get_database()[:10]
    assert np.array_equal(y, x[:, rm.map])


def test_progressive_dim_clustering(small_ds):
    from tpu_ann.ops.kmeans import (
        ClusteringParameters,
        kmeans,
        progressive_dim_clustering,
    )

    cp = ClusteringParameters(niter=4, seed=3)
    cent, stats = progressive_dim_clustering(small_ds.get_train(), 16, cp)
    assert cent.shape == (16, small_ds.d)
    # objective should be in the same ballpark as plain k-means
    from tpu_ann.ops import distances as D
    import jax.numpy as jnp

    c2, st2 = kmeans(small_ds.get_train(), 16, cp)
    x = jnp.asarray(small_ds.get_train())
    o1 = float(D.knn(x, jnp.asarray(cent), 1)[0].sum())
    o2 = float(D.knn(x, jnp.asarray(c2), 1)[0].sum())
    assert o1 < o2 * 1.5


def test_pq4_pack_roundtrip(rng):
    from tpu_ann.ops.pq import pack_codes_4bit, unpack_codes_4bit

    codes = jnp.asarray(rng.randint(0, 16, size=(50, 8)).astype(np.uint8))
    packed = pack_codes_4bit(codes)
    assert packed.shape == (50, 4)
    assert np.array_equal(np.asarray(unpack_codes_4bit(packed)),
                          np.asarray(codes))


def test_index_pq4(small_ds):
    idx = IndexPQ(small_ds.d, M=8, nbits=4)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    assert idx.sa_code_size() == 4  # 8 x 4bit = 4 bytes
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.5


def test_ivfpq4_fastscan_layout(small_ds):
    """IVF + PQ8x4 packed codes (the x4fs analog)."""
    idx = make_ivf_pq(small_ds.d, nlist=32, M=8, nbits=4)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    assert idx.invlists.codes.shape[-1] == 4  # packed bytes
    idx.nprobe = 32
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    assert recall_at_r(I, gt, 10) > 0.5


# --- residual quantizer -----------------------------------------------------

def test_rq_roundtrip_beats_pq(small_ds):
    """RQ at the same byte budget should reconstruct at least as well as
    PQ (it usually wins on correlated data)."""
    from tpu_ann.ops.rq import rq_decode, rq_encode, train_rq

    xt = small_ds.get_train()
    codec = train_rq(xt, M=4, nbits=8, niter=8)
    cent = jnp.asarray(codec.codebooks)
    codes = rq_encode(jnp.asarray(xt[:500]), cent, beam=5)
    recon = np.asarray(rq_decode(codes, cent))
    mse_rq = ((recon - xt[:500]) ** 2).mean()
    pq_codec = PQ.train_pq(xt, M=4, nbits=8, niter=8)
    pcent = jnp.asarray(pq_codec.centroids)
    pcodes = PQ.pq_encode(jnp.asarray(xt[:500]), pcent)
    precon = np.asarray(PQ.pq_decode(pcodes, pcent))
    mse_pq = ((precon - xt[:500]) ** 2).mean()
    assert mse_rq < mse_pq * 1.3, (mse_rq, mse_pq)


def test_index_rq_recall(small_ds):
    from tpu_ann.models.rq import IndexResidualQuantizer

    idx = IndexResidualQuantizer(small_ds.d, M=8)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.7, r


def test_ivf_rq_recall(small_ds):
    from tpu_ann.models.rq import IndexIVFResidualQuantizer

    idx = IndexIVFResidualQuantizer(IndexFlat(small_ds.d), small_ds.d,
                                    nlist=32, M=8)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.6, r


def test_lsq_beats_rq_mse(small_ds):
    """ICM + least-squares refinement must reconstruct at least as well as
    the stage-wise-greedy RQ it warm-starts from (LocalSearchQuantizer's
    reason to exist, impl/LocalSearchQuantizer.cpp)."""
    from tpu_ann.ops.lsq import lsq_encode, train_lsq
    from tpu_ann.ops.rq import rq_decode, rq_encode, train_rq
    import jax

    xt = small_ds.get_train()
    rq = train_rq(xt, M=4, nbits=6, niter=8)
    rcodes = rq_encode(jnp.asarray(xt[:500]), jnp.asarray(rq.codebooks),
                       beam=5)
    mse_rq = ((np.asarray(rq_decode(rcodes, jnp.asarray(rq.codebooks)))
               - xt[:500]) ** 2).mean()

    lsq = train_lsq(xt, M=4, nbits=6, train_iters=4)
    lcodes = lsq_encode(jnp.asarray(xt[:500]), jnp.asarray(lsq.codebooks),
                        jax.random.PRNGKey(0))
    mse_lsq = ((np.asarray(rq_decode(lcodes, jnp.asarray(lsq.codebooks)))
                - xt[:500]) ** 2).mean()
    assert mse_lsq <= mse_rq * 1.05, (mse_lsq, mse_rq)


def test_index_lsq_recall(small_ds):
    from tpu_ann.models.rq import IndexLocalSearchQuantizer

    idx = IndexLocalSearchQuantizer(small_ds.d, M=8, nbits=6)
    idx.train_iters = 3
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.6, r


def test_index_prq_plsq_recall(small_ds):
    from tpu_ann.models.rq import (
        IndexProductLocalSearchQuantizer,
        IndexProductResidualQuantizer,
    )

    for cls in (IndexProductResidualQuantizer,
                IndexProductLocalSearchQuantizer):
        idx = cls(small_ds.d, nsplits=2, Msub=4, nbits=6)
        if hasattr(idx, "train_iters"):
            idx.train_iters = 3
        idx.train(small_ds.get_train())
        idx.add(small_ds.get_database())
        _, I = idx.search(small_ds.get_queries(), 10)
        gt = small_ds.get_groundtruth(10)
        r = recall_at_r(I, gt, 10)
        assert r > 0.6, (cls.__name__, r)
        # code round-trip
        codes = idx.sa_encode(small_ds.get_queries()[:8])
        rec = idx.sa_decode(codes)
        assert rec.shape == (8, small_ds.d)


def test_ivf_lsq_recall(small_ds):
    from tpu_ann.models.rq import IndexIVFLocalSearchQuantizer

    idx = IndexIVFLocalSearchQuantizer(IndexFlat(small_ds.d), small_ds.d,
                                       nlist=32, M=8, nbits=6)
    idx.cp.niter = 5
    idx.train_iters = 3
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.55, r


def test_factory_aq_spellings(small_ds):
    from tpu_ann.models.rq import (
        IndexIVFProductResidualQuantizer,
        IndexLocalSearchQuantizer,
        IndexProductLocalSearchQuantizer,
        IndexResidualQuantizer,
    )
    from tpu_ann.utils.factory import index_factory

    d = small_ds.d
    assert isinstance(index_factory(d, "RQ4x6"), IndexResidualQuantizer)
    assert isinstance(index_factory(d, "LSQ4x6"),
                      IndexLocalSearchQuantizer)
    assert isinstance(index_factory(d, "PLSQ2x2x6"),
                      IndexProductLocalSearchQuantizer)
    ivf = index_factory(d, "IVF32,PRQ2x2x6")
    assert isinstance(ivf, IndexIVFProductResidualQuantizer)
    assert ivf.nlist == 32 and ivf.nsplits == 2


@pytest.mark.parametrize("qtype", [SQ.QT_4BIT, SQ.QT_4BIT_UNIFORM,
                                   SQ.QT_6BIT])
def test_sq_lowbit_roundtrip(qtype, small_ds):
    """4/6-bit packed codecs: code_size honors the bit budget and decode
    error matches the level count (impl/ScalarQuantizer.h Codec4bit/6bit).
    """
    xt = small_ds.get_train()[:500]
    codec = SQ.train_sq(xt, qtype)
    codes = SQ.sq_encode(jnp.asarray(xt), codec)
    d = small_ds.d
    exp_size = (d + 1) // 2 if qtype != SQ.QT_6BIT else (d * 6 + 7) // 8
    assert codes.shape[1] == exp_size == codec.code_size
    recon = np.asarray(SQ.sq_decode(codes, codec))
    levels = 16 if qtype != SQ.QT_6BIT else 64
    max_err = (np.asarray(codec.vdiff) / levels).max()
    assert np.abs(recon - xt).max() <= max_err * 1.01


def test_sq_direct_codecs(rng):
    x = rng.randint(0, 255, size=(100, 16)).astype(np.float32)
    c = SQ.SQCodec(qtype=SQ.QT_8BIT_DIRECT, d=16)
    codes = SQ.sq_encode(jnp.asarray(x), c)
    np.testing.assert_array_equal(np.asarray(SQ.sq_decode(codes, c)), x)
    xs = x - 128.0
    cs = SQ.SQCodec(qtype=SQ.QT_8BIT_DIRECT_SIGNED, d=16)
    codes = SQ.sq_encode(jnp.asarray(xs), cs)
    np.testing.assert_array_equal(np.asarray(SQ.sq_decode(codes, cs)), xs)


def test_sq_rangestat_modes(small_ds):
    xt = small_ds.get_train()
    c1 = SQ.train_sq(xt, SQ.QT_8BIT, rangestat=SQ.RS_MEANSTD)
    c2 = SQ.train_sq(xt, SQ.QT_8BIT, rs_arg=0.05,
                     rangestat=SQ.RS_QUANTILES)
    # quantile window is strictly inside the minmax window
    c0 = SQ.train_sq(xt, SQ.QT_8BIT)
    assert (c2.vmin >= c0.vmin - 1e-6).all()
    assert (c2.vmin + c2.vdiff <= c0.vmin + c0.vdiff + 1e-6).all()
    assert c1.vdiff.shape == (small_ds.d,)


@pytest.mark.parametrize("qtype", [SQ.QT_4BIT, SQ.QT_6BIT])
def test_ivf_sq_lowbit_recall(small_ds, qtype):
    """Packed low-bit codes scanned with in-kernel unpacking must track
    the 8-bit path's recall at these easy scales."""
    quant = IndexFlat(small_ds.d)
    idx = IndexIVFScalarQuantizer(quant, small_ds.d, 32, qtype)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 16
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.8, (qtype, r)


def test_factory_sq_lowbit(small_ds):
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(small_ds.d, "IVF32,SQ6")
    assert idx.qtype == SQ.QT_6BIT
    idx = index_factory(small_ds.d, "SQ4")
    assert idx.qtype == SQ.QT_4BIT


def test_sdc_search(small_ds):
    """ST_SDC: symmetric code-to-code search — recall below ADC but well
    above chance (ProductQuantizer::compute_sdc_table path)."""
    from tpu_ann.models.pq import IndexPQ

    idx = IndexPQ(small_ds.d, M=8)
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.search_type = IndexPQ.ST_SDC
    _, I = idx.search(small_ds.get_queries(), 10)
    gt = small_ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.5, r


def test_polysemous_search(small_ds):
    """Polysemous: at ht = code bits the filter passes everything
    (== ADC recall); tightening ht cuts the hamming-pass count while
    recall degrades gracefully (the benchs/README.md:51-61 trade)."""
    from tpu_ann.models.pq import IndexPQ

    idx = IndexPQ(small_ds.d, M=8)
    idx.do_polysemous_training = True
    idx.polysemous_iters = 3000  # keep the test quick
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    gt = small_ds.get_groundtruth(10)

    _, I_adc = idx.search(small_ds.get_queries(), 10)
    r_adc = recall_at_r(I_adc, gt, 10)

    idx.search_type = IndexPQ.ST_POLYSEMOUS
    idx.polysemous_ht = idx.M * idx.nbits  # pass-all threshold
    _, I_all = idx.search(small_ds.get_queries(), 10)
    assert recall_at_r(I_all, gt, 10) == pytest.approx(r_adc, abs=1e-6)
    npass_all = idx.last_hamming_pass

    idx.polysemous_ht = 28
    _, I_ht = idx.search(small_ds.get_queries(), 10)
    r_ht = recall_at_r(I_ht, gt, 10)
    # measured trade at this scale: ~20% of candidates pass, recall ~0.6
    assert idx.last_hamming_pass < npass_all * 0.5
    assert r_ht > 0.4, r_ht


def test_polysemous_training_improves_correlation(small_ds):
    """After reordering, bit-Hamming between codes must correlate with
    true centroid distances better than the untrained order."""
    from tpu_ann.ops.polysemous import (
        _hamming_table,
        optimize_pq_for_hamming,
    )
    from tpu_ann.ops.pq import train_pq

    pqc = train_pq(small_ds.get_train(), M=4, nbits=6, niter=10)
    ham = _hamming_table(6).ravel()

    def corr(cents):
        cs = []
        for m in range(4):
            c = cents[m]
            d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1).ravel()
            cs.append(np.corrcoef(d2, ham)[0, 1])
        return np.mean(cs)

    c0 = corr(pqc.centroids)
    opt = optimize_pq_for_hamming(pqc.centroids, n_iter=4000)
    c1 = corr(opt)
    assert c1 > c0 + 0.02, (c0, c1)
    # reordering permutes, never changes, the centroid set
    for m in range(4):
        s0 = set(map(tuple, np.round(pqc.centroids[m], 5)))
        s1 = set(map(tuple, np.round(opt[m], 5)))
        assert s0 == s1


def test_ivf_rq_decoded_cache_matches_lut_scan(small_ds):
    """The additive-family decoded cache must agree with the LUT scan
    (stored-norm ADC): both compute ||q - c_l - dec(code)||^2."""
    from tpu_ann.models.rq import IndexIVFResidualQuantizer

    idx = IndexIVFResidualQuantizer(IndexFlat(small_ds.d), small_ds.d,
                                    16, 3, 8)
    idx.cp.niter = 5
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 8

    idx.use_decoded_cache = False
    Dg, Ig = idx.search(small_ds.get_queries(), 10)
    idx.use_decoded_cache = True
    idx.decoded_cache_dtype = "float32"
    assert idx._decoded_cache() is not None
    Dd, Id = idx.search(small_ds.get_queries(), 10)
    np.testing.assert_allclose(Dd, Dg, rtol=3e-4, atol=3e-4)
    assert (Id == Ig).mean() > 0.97


def test_ivfsq_sq8_view_consistent(small_ds):
    """IndexIVFScalarQuantizer's zero-copy SQ8 view must produce the
    same neighbors as the dequant scan (same codes, same affine)."""
    from tpu_ann.ops import ivf_scan

    idx = IndexIVFScalarQuantizer(IndexFlat(small_ds.d), small_ds.d, 16)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    idx.nprobe = 8
    xq = small_ds.get_queries()

    Dd, Id = idx.search(xq, 10)          # dequant scan path (CPU)
    view = idx._sq8_view()
    assert view is not None and view.data is idx.invlists.codes
    import jax.numpy as jnp

    _, probes = idx._coarse_search_device(jnp.asarray(xq), 8)
    Dv, Iv, _ = ivf_scan.scan_invlists(
        jnp.asarray(xq), probes.astype(jnp.int32), view, 10,
        max_nblocks=view.max_nblocks_per_list)
    assert (np.asarray(Iv) == Id).mean() > 0.97
    np.testing.assert_allclose(np.asarray(Dv), Dd, rtol=1e-4, atol=1e-4)


def test_index_pq_decoded_cache_matches_gather(small_ds):
    """Flat IndexPQ 8-bit: the decoded-row GEMM knn must agree with the
    LUT-gather ADC (same reconstruction distances)."""
    idx = IndexPQ(small_ds.d, M=8, nbits=8)
    idx.use_decoded_cache = False
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    Dg, Ig = idx.search(small_ds.get_queries(), 10)
    idx.use_decoded_cache = True
    Dd, Id = idx.search(small_ds.get_queries(), 10)
    # bf16 rows: distances to ~0.5%; neighbor sets near-identical
    overlap = np.mean([len(set(Id[q]) & set(Ig[q])) / 10
                       for q in range(len(Id))])
    assert overlap > 0.95, overlap
    np.testing.assert_allclose(Dd[:, 0], Dg[:, 0], rtol=2e-2, atol=2e-2)

    # incremental add keeps the cache aligned
    idx2 = IndexPQ(small_ds.d, M=8, nbits=8)
    idx2.use_decoded_cache = True
    idx2.train(small_ds.get_train())
    xb = small_ds.get_database()
    idx2.add(xb[:1000])
    idx2.add(xb[1000:])
    D2, I2 = idx2.search(small_ds.get_queries(), 10)
    assert (I2 == Id).mean() > 0.97


def test_residual_coarse_quantizer(small_ds):
    """AdditiveCoarseQuantizer family (IndexAdditiveQuantizer.h:150-260):
    virtual ksub^M centroid database; beam search vs exact enumeration;
    used as an IVF coarse quantizer through the factory grammar
    IVF{n}(RCQ{M}x{b})."""
    import tpu_ann
    from tpu_ann import ResidualCoarseQuantizer
    from tpu_ann.utils.evaluation import recall_at_r

    xt = small_ds.get_train()
    xb = small_ds.get_database()
    xq = small_ds.get_queries()
    d = small_ds.d

    rcq = ResidualCoarseQuantizer(d, 2, 4)   # 256 virtual centroids
    rcq.train(xt)
    assert rcq.ntotal == 256
    Db, Ib = rcq.search(xq, 4)
    rcq.set_beam_factor(-1)                  # exact enumeration
    De, Ie = rcq.search(xq, 4)
    assert (Ib[:, 0] == Ie[:, 0]).mean() > 0.95
    # returned distances are exact L2^2 to the decoded centroid
    c = rcq.reconstruct_batch(Ie[:5, 0])
    ref = ((xq[:5] - c) ** 2).sum(1)
    assert np.allclose(ref, De[:5, 0], rtol=1e-3, atol=1e-3)
    # add is forbidden (virtual database)
    with pytest.raises(RuntimeError):
        rcq.add(xb)

    # factory: IVF256(RCQ2x4),Flat end-to-end
    ivf = tpu_ann.index_factory(d, "IVF256(RCQ2x4),Flat")
    assert ivf.quantizer_trains_alone == 1
    ivf.train(xt)
    ivf.add(xb)
    ivf.nprobe = 16
    _, I = ivf.search(xq, 10)
    rec = recall_at_r(I, small_ds.get_groundtruth(10), 10)
    assert rec > 0.5, rec
    # nlist mismatch is rejected
    with pytest.raises(ValueError):
        tpu_ann.index_factory(d, "IVF100(RCQ2x4),Flat")


# --- aligned byte tier (relayout-free capacity-scale gather) ---------------

@pytest.mark.parametrize("n,rb", [(4096, 96), (1000, 128), (777, 97),
                                  (513, 1024), (300, 17)])
def test_aligned_byte_tier_bitexact(n, rb):
    """tier.gather must return the SAME BYTES as the naive u8[n,rb]
    row gather it replaces (the one XLA relayout-copies at 100M;
    benchs/logs/r5_queue10.log diagnosis, r5_queue11 hardware proof)."""
    rng = np.random.default_rng(42 + rb)
    x = rng.integers(0, 256, size=(n, rb), dtype=np.uint8)
    tier = SQ.AlignedByteTier.from_host(x)
    assert tier.nbytes % (SQ.LINE_BYTES * 8) == 0
    rows = rng.integers(0, n, size=(7, 33)).astype(np.int32)
    rows[0, :3] = [-5, 0, n - 1]          # clamp semantics
    got = np.asarray(tier.gather(jnp.asarray(rows)))
    ref = x[np.clip(rows, 0, n - 1)]
    np.testing.assert_array_equal(got, ref)


def test_aligned_byte_tier_reconstruct_sq8():
    rng = np.random.default_rng(3)
    d = 96
    xf = rng.normal(size=(2048, d)).astype(np.float32)
    codec = SQ.train_sq(xf, SQ.QT_8BIT)
    codes = np.asarray(SQ.sq_encode(jnp.asarray(xf), codec))
    tier = SQ.AlignedByteTier.from_host(codes)
    rows = jnp.asarray([0, 5, 2047], jnp.int32)
    rec = np.asarray(tier.reconstruct(rows, codec))
    full = np.asarray(SQ.sq_decode(jnp.asarray(codes), codec))
    np.testing.assert_array_equal(rec, full[[0, 5, 2047]])


def test_aligned_byte_tier_rejects_wide_rows():
    with pytest.raises(ValueError):
        SQ.AlignedByteTier.from_host(
            np.zeros((4, 2000), np.uint8))


def test_index_refine_sq8_tier():
    """IndexRefineSQ8Tier: base IVFPQ candidates re-ranked against the
    chip-resident aligned SQ8 tier must recover most of the recall an
    exact flat refine gets (SQ8 decode error is small at this scale)."""
    from tpu_ann.models.refine import IndexRefineSQ8Tier

    rng = np.random.default_rng(7)
    d, nb, nq = 32, 6000, 64
    xb = rng.normal(size=(nb, d)).astype(np.float32)
    xq = rng.normal(size=(nq, d)).astype(np.float32)
    gt_flat = IndexFlat(d)
    gt_flat.add(xb)
    _, gt = gt_flat.search(xq, 10)

    base = make_ivf_pq(d, nlist=32, M=8, nbits=8)
    idx = IndexRefineSQ8Tier(base)
    idx.train(xb)
    idx.add(xb)
    idx.k_factor = 8
    base.nprobe = 16
    _, I_base = base.search(xq, 10)
    _, I_ref = idx.search(xq, 10)
    r_base = recall_at_r(I_base, np.asarray(gt), 10)
    r_ref = recall_at_r(I_ref, np.asarray(gt), 10)
    assert r_ref > r_base + 0.05, (r_base, r_ref)
    assert r_ref > 0.85, (r_base, r_ref)

    rec = idx.reconstruct(5)
    err = np.abs(rec - xb[5]).max()
    assert err < 0.05, err
