"""Zn-sphere lattice codec + IndexLattice
(faiss/impl/lattice_Zn.{h,cpp}, faiss/IndexLattice.{h,cpp})."""

import numpy as np
import pytest

from tpu_ann.models.lattice import IndexLattice
from tpu_ann.ops.lattice import ZnSphereCodec, sphere_atoms


def test_sphere_atoms():
    a = sphere_atoms(4, 4)
    # 2,0,0,0 and 1,1,1,1
    assert sorted(map(tuple, a)) == [(1, 1, 1, 1), (2, 0, 0, 0)]


def test_codec_roundtrip_and_nearest(rng):
    zc = ZnSphereCodec(8, 10)
    x = rng.randn(300, 8).astype(np.float32)
    c = zc.search(x)
    assert (np.sum(c * c, axis=1) == 10).all()
    # nearest: no sign flip or swap improves the dot product
    dots = (x * c).sum(1)
    flip = dots + 2 * np.abs(x * c).min(axis=1)  # cheap sanity bound
    assert (dots >= -flip).all()
    codes = zc.encode(c)
    assert (codes < zc.nv).all()
    np.testing.assert_array_equal(zc.decode(codes), c)


def test_codec_bijective_small():
    zc = ZnSphereCodec(4, 4)
    assert zc.nv == 24          # 8 perms*signs of (2,0,0,0) + 16 of 1111
    allc = zc.decode(np.arange(zc.nv, dtype=np.uint64))
    assert len(set(map(tuple, allc))) == zc.nv
    np.testing.assert_array_equal(
        zc.encode(allc), np.arange(zc.nv, dtype=np.uint64))


def test_index_lattice(rng):
    d, nsq = 32, 4
    idx = IndexLattice(d, nsq=nsq, scale_nbit=6, r2=10)
    assert not idx.is_trained
    xt = rng.randn(500, d).astype(np.float32)
    idx.train(xt)
    xb = rng.randn(200, d).astype(np.float32)
    codes = idx.sa_encode(xb)
    assert codes.shape == (200, idx.sa_code_size())
    rec = idx.sa_decode(codes)
    assert rec.shape == (200, d)
    # reconstruction preserves direction reasonably: positive correlation
    cos = (rec * xb).sum(1) / (
        np.linalg.norm(rec, axis=1) * np.linalg.norm(xb, axis=1) + 1e-9)
    assert cos.mean() > 0.5
    # add + search path (blockwise decoded k-NN)
    idx.add(xb)
    Dv, Iv = idx.search(xb[:10], 4)
    dec = idx.sa_decode(idx._codes)
    full = ((xb[:10, None, :] - dec[None]) ** 2).sum(-1)
    oracle = np.sort(full, axis=1)[:, :4]
    np.testing.assert_allclose(np.sort(Dv, 1), oracle, rtol=1e-3,
                               atol=1e-3)


def test_index_lattice_errors():
    with pytest.raises(ValueError):
        IndexLattice(30, nsq=4, scale_nbit=4, r2=10)


def test_lattice_io_roundtrip(rng, tmp_path):
    from tpu_ann.utils import index_io

    idx = IndexLattice(16, nsq=2, scale_nbit=5, r2=10)
    xt = rng.randn(200, 16).astype(np.float32)
    idx.train(xt)
    idx.add(xt[:80])
    p = str(tmp_path / "lat.tann")
    index_io.write_index(idx, p)
    back = index_io.read_index(p)
    D0, I0 = idx.search(xt[:10], 3)
    D1, I1 = back.search(xt[:10], 3)
    np.testing.assert_array_equal(I0, I1)
    np.testing.assert_allclose(D0, D1, rtol=1e-5)


def test_lattice_factory(rng):
    from tpu_ann.utils.factory import index_factory

    idx = index_factory(32, "ZnLattice4x10_6")
    assert idx.nsq == 4 and idx.scale_nbit == 6 and idx.zn.r2 == 10


def test_codec_rec_matches_counts_and_roundtrips(rng):
    """ZnSphereCodecRec (lattice_Zn.h:116): same nv as the permutation
    codec (the sphere cardinality is combinatorially fixed), bijective
    codes, exact roundtrip on nearest-point projections."""
    from tpu_ann.ops.lattice import ZnSphereCodec, ZnSphereCodecRec

    for dim, r2 in ((4, 4), (8, 10), (16, 8)):
        zn = ZnSphereCodec(dim, r2)
        rec = ZnSphereCodecRec(dim, r2)
        assert rec.nv == zn.nv, (dim, r2)

        x = rng.randn(64, dim).astype("float32")
        c = zn.search(x)                       # exact sphere points
        codes = rec.encode_centroid(c)
        assert int(codes.max()) < rec.nv
        np.testing.assert_array_equal(rec.decode(codes), c)

    # small enough to enumerate: codes are a bijection
    rec = ZnSphereCodecRec(4, 4)
    allc = rec.decode(np.arange(rec.nv, dtype=np.uint64))
    assert len(np.unique(allc, axis=0)) == rec.nv
    assert (allc.astype(np.int64) ** 2).sum(1).max() == 4
    assert (allc.astype(np.int64) ** 2).sum(1).min() == 4


def test_codec_alt_dispatch(rng):
    from tpu_ann.ops.lattice import ZnSphereCodecAlt

    alt = ZnSphereCodecAlt(8, 10)       # power of 2 -> recursive codes
    assert alt.use_rec
    x = rng.randn(32, 8).astype("float32")
    c = alt.search(x)
    codes = alt.encode(x)
    np.testing.assert_array_equal(alt.decode(codes), c)
