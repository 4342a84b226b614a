"""Standalone codec (sa_encode/sa_decode) contracts, mirroring the
reference's tests/test_standalone_codec.py:

- TestEncodeDecode.do_encode_twice: encode -> decode -> encode is a
  fixed point (exactly for flat codecs; up to a few cell-flip rows for
  IVF/RQ, test_standalone_codec.py:20-55).
- TestAccuracy.compare_accuracy: reconstruction error strictly orders
  coarse < fine codecs (test_standalone_codec.py:130-200).
- IndexIVF sa codes = little-endian listno prefix (coarse_code_size
  bytes, IndexIVF.cpp encode_listno) + the list payload.
"""

import numpy as np
import pytest

from tpu_ann.utils.factory import index_factory

D = 96
NT, NB = 2000, 500


def _data(seed=123):
    rs = np.random.RandomState(seed)
    xt = rs.randn(NT, D).astype(np.float32)
    x = rs.randn(NB, D).astype(np.float32)
    return xt, x


@pytest.mark.parametrize("key,flips_ok", [
    ("SQ8", False),
    ("SQ6", False),
    ("SQfp16", False),
    ("SQbf16", False),
    ("PQ6np", False),
    ("PQ6x6np", False),
    ("IVF64,SQ8", True),
    ("IVF64,PQ6np", True),
    ("IVF64,Flat", True),
    ("RQ4x6", True),
])
def test_encode_twice(key, flips_ok):
    """encode(decode(encode(x))) == encode(x) — codes are a fixed point
    of the codec (reference do_encode_twice)."""
    xt, x = _data()
    codec = index_factory(D, key)
    codec.train(xt)
    assert codec.sa_code_size() > 0

    codes = codec.sa_encode(x)
    assert codes.shape == (NB, codec.sa_code_size())
    x2 = codec.sa_decode(codes)
    assert x2.shape == (NB, D)
    codes2 = codec.sa_encode(x2)

    if flips_ok:
        # some rows flip into a neighboring quantization cell
        nrowdiff = (codes != codes2).any(axis=1).sum()
        assert nrowdiff < 15, nrowdiff
        x3 = codec.sa_decode(codes2)
        same = ~(codes != codes2).any(axis=1)
        np.testing.assert_allclose(x2[same], x3[same], rtol=1e-5,
                                   atol=1e-5)
    else:
        np.testing.assert_array_equal(codes, codes2)
        np.testing.assert_allclose(x2, codec.sa_decode(codes2),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("lowac,highac", [
    ("SQ4", "SQ8"),
    ("SQ6", "SQ8"),
    ("SQ8", "SQfp16"),
    ("PQ6np", "PQ8np"),
    ("PQ8x6np", "PQ8np"),
    ("PQ8np", "IVF64,PQ8np"),
    ("IVF64,SQ4", "IVF64,SQ8"),
])
def test_compare_accuracy(lowac, highac):
    """Reconstruction error orders coarse > fine (reference
    compare_accuracy)."""
    xt, x = _data(7)
    errs = []
    for key in (lowac, highac):
        codec = index_factory(D, key)
        codec.train(xt)
        x2 = codec.sa_decode(codec.sa_encode(x))
        errs.append(float(((x - x2) ** 2).sum()))
    assert errs[0] > errs[1], (errs, lowac, highac)


def test_sa_code_size_known_before_train():
    """Code sizes are a function of the construction parameters
    (reference: sa_code_size right after index_factory)."""
    for key, expect in [
        ("SQ8", 96), ("SQ4", 48), ("SQ6", 72), ("SQfp16", 192),
        ("PQ8np", 8), ("PQ16x4", 8), ("RQ4x6", 8),
        ("IVF64,Flat", 1 + 4 * 96), ("IVF64,SQ8", 1 + 96),
        ("IVF64,PQ8np", 1 + 8), ("IVF300,Flat", 2 + 4 * 96),
    ]:
        codec = index_factory(D, key)
        assert codec.sa_code_size() == expect, (key, codec.sa_code_size())


def test_ivf_listno_prefix_roundtrip():
    """encode_listno/decode_listno: little-endian, coarse_code_size bytes
    (IndexIVF.cpp encode_listno); 2-byte path at nlist > 256."""
    idx = index_factory(D, "IVF300,Flat")
    assert idx.coarse_code_size() == 2
    lns = np.array([0, 1, 255, 256, 299], np.int64)
    enc = idx.encode_listno(lns)
    assert enc.shape == (5, 2)
    np.testing.assert_array_equal(enc[:, 0], lns & 0xFF)
    np.testing.assert_array_equal(enc[:, 1], lns >> 8)
    np.testing.assert_array_equal(idx.decode_listno(enc), lns)


def test_ivf_flat_sa_exact():
    """IVFFlat sa payload is the raw f32 vector: decode is exact, and the
    listno prefix matches the coarse assignment."""
    xt, x = _data(11)
    idx = index_factory(D, "IVF64,Flat")
    idx.train(xt)
    codes = idx.sa_encode(x)
    listno = idx.decode_listno(codes[:, :idx.coarse_code_size()])
    assign = np.asarray(idx.coarse_assign(x, 1))[:, 0]
    np.testing.assert_array_equal(listno, assign)
    np.testing.assert_array_equal(idx.sa_decode(codes), x)


def test_ivf_rq_sa_better_than_flat_rq():
    """IVF-RQ codes carry the centroid through the listno prefix, so the
    reconstruction beats the same RQ codec without the coarse stage."""
    xt, x = _data(13)
    flat = index_factory(D, "RQ4x6")
    flat.train(xt)
    e_flat = float(((x - flat.sa_decode(flat.sa_encode(x))) ** 2).sum())
    ivf = index_factory(D, "IVF64,RQ4x6")
    ivf.train(xt)
    e_ivf = float(((x - ivf.sa_decode(ivf.sa_encode(x))) ** 2).sum())
    assert e_ivf < e_flat, (e_ivf, e_flat)


def test_spectral_hash_encodes_but_wont_decode():
    from tpu_ann.models.flat import IndexFlat
    from tpu_ann.models.ivf_extra import IndexIVFSpectralHash

    xt, x = _data(17)
    idx = IndexIVFSpectralHash(IndexFlat(D), D, 16, nbit=64)
    idx.train(xt)
    codes = idx.sa_encode(x)
    assert codes.shape == (NB, idx.sa_code_size())
    with pytest.raises(NotImplementedError):
        idx.sa_decode(codes)
