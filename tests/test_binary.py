"""Binary index tests (reference: tests/test_index_binary.py /
test_binary_io.py style: Hamming-space parity with a numpy oracle)."""

import numpy as np
import pytest

from tpu_ann.models.binary import (
    IndexBinaryFlat,
    IndexBinaryFromFloat,
    IndexBinaryIVF,
)
from tpu_ann.models.flat import IndexFlat
from tpu_ann.ops import hamming as H

import jax.numpy as jnp


@pytest.fixture(scope="module")
def bin_data():
    rs = np.random.RandomState(7)
    d = 64
    xb = rs.randint(0, 256, size=(2000, d // 8)).astype(np.uint8)
    xq = rs.randint(0, 256, size=(50, d // 8)).astype(np.uint8)
    return d, xb, xq


def _hamming_oracle(xq, xb):
    lut = np.array([bin(i).count("1") for i in range(256)], np.int32)
    return lut[np.bitwise_xor(xq[:, None, :], xb[None, :, :])].sum(-1)


def test_pack_unpack_roundtrip(bin_data):
    d, xb, _ = bin_data
    bits = np.asarray(H.unpack_bits(jnp.asarray(xb)))
    repacked = np.asarray(H.pack_bits(jnp.asarray(bits)))
    assert np.array_equal(repacked, xb)


def test_binary_flat_matches_oracle(bin_data):
    d, xb, xq = bin_data
    idx = IndexBinaryFlat(d)
    idx.add(xb)
    D, I = idx.search(xq, 5)
    oracle = _hamming_oracle(xq, xb)
    best = np.sort(oracle, axis=1)[:, :5]
    assert np.array_equal(D, best)


def test_binary_flat_self(bin_data):
    d, xb, _ = bin_data
    idx = IndexBinaryFlat(d)
    idx.add(xb)
    D, I = idx.search(xb[:10], 1)
    assert (D[:, 0] == 0).all()


def test_binary_ivf(bin_data):
    d, xb, xq = bin_data
    idx = IndexBinaryIVF(None, d, nlist=16)
    idx.cp.niter = 5
    idx.train(xb)
    idx.add(xb)
    idx.nprobe = 16   # exhaustive: must equal flat
    Df, If = IndexBinaryFlatRef(d, xb).search(xq, 5)
    D, I = idx.search(xq, 5)
    assert np.array_equal(np.sort(D, 1), np.sort(Df, 1))


class IndexBinaryFlatRef:
    def __init__(self, d, xb):
        self.idx = IndexBinaryFlat(d)
        self.idx.add(xb)

    def search(self, xq, k):
        return self.idx.search(xq, k)


def test_binary_ivf_partial_probe(bin_data):
    d, xb, xq = bin_data
    idx = IndexBinaryIVF(None, d, nlist=16)
    idx.cp.niter = 5
    idx.train(xb)
    idx.add(xb)
    idx.nprobe = 4
    D, I = idx.search(xq, 5)
    flat = IndexBinaryFlat(d)
    flat.add(xb)
    Df, If = flat.search(xq, 5)
    # recall of Hamming IVF at nprobe=4/16
    inter = np.mean([len(np.intersect1d(I[i], If[i])) / 5
                     for i in range(len(xq))])
    assert inter > 0.5, inter


def test_binary_from_float(bin_data):
    d, xb, xq = bin_data
    idx = IndexBinaryFromFloat(IndexFlat(d))
    idx.add(xb)
    D, I = idx.search(xq, 5)
    flat = IndexBinaryFlat(d)
    flat.add(xb)
    Df, If = flat.search(xq, 5)
    assert np.array_equal(D, Df)


def test_binary_hnsw(bin_data):
    from tpu_ann.models.binary import IndexBinaryHNSW

    d, xb, xq = bin_data
    idx = IndexBinaryHNSW(d, M=16)
    idx.hnsw.efSearch = 64
    idx.add(xb)
    D, I = idx.search(xq, 5)
    flat = IndexBinaryFlat(d)
    flat.add(xb)
    Df, If = flat.search(xq, 5)
    inter = np.mean([len(np.intersect1d(I[i], If[i])) / 5
                     for i in range(len(xq))])
    assert inter > 0.7, inter
    # distances are genuine Hamming values for the found ids
    lut = np.array([bin(v).count("1") for v in range(256)], np.int32)
    for i in range(5):
        true = lut[np.bitwise_xor(xb[I[i, 0]], xq[i])].sum()
        assert D[i, 0] == true


def test_binary_hash(bin_data):
    from tpu_ann.models.binary import IndexBinaryHash

    d, xb, xq = bin_data
    idx = IndexBinaryHash(d, b=12)
    idx.nflip = 2
    idx.add(xb)
    D, I = idx.search(xq, 5)
    found = (I[:, 0] >= 0).mean()
    assert found > 0.9
    # self-search hits itself at distance 0
    D2, I2 = idx.search(xb[:10], 1)
    assert (D2[:, 0] == 0).all()


def _range_oracle(xq, xb, radius):
    """CSR oracle: all db codes with Hamming distance < radius."""
    dis = _hamming_oracle(xq, xb)
    lims = np.zeros(len(xq) + 1, np.int64)
    dd, ii = [], []
    for i in range(len(xq)):
        hit = np.nonzero(dis[i] < radius)[0]
        lims[i + 1] = lims[i] + len(hit)
        dd.append(dis[i][hit])
        ii.append(hit)
    return lims, np.concatenate(dd) if dd else np.zeros(0), \
        np.concatenate(ii) if ii else np.zeros(0)


def _sorted_pairs(lims, D, I):
    out = []
    for i in range(len(lims) - 1):
        seg = sorted(zip(I[lims[i]:lims[i + 1]], D[lims[i]:lims[i + 1]]))
        out.append(seg)
    return out


def test_binary_flat_range_search(bin_data):
    d, xb, xq = bin_data
    idx = IndexBinaryFlat(d)
    idx.add(xb)
    radius = 24
    lims, D, I = idx.range_search(xq, radius)
    lo, Do, Io = _range_oracle(xq, xb, radius)
    assert np.array_equal(lims, lo)
    assert _sorted_pairs(lims, D, I) == _sorted_pairs(lo, Do, Io)


def test_binary_ivf_range_search(bin_data):
    d, xb, xq = bin_data
    idx = IndexBinaryIVF(None, d, nlist=16)
    idx.cp.niter = 5
    idx.train(xb)
    idx.add(xb)
    idx.nprobe = 16   # exhaustive: must equal the oracle exactly
    radius = 24
    lims, D, I = idx.range_search(xq, radius)
    lo, Do, Io = _range_oracle(xq, xb, radius)
    assert np.array_equal(lims, lo)
    assert _sorted_pairs(lims, D, I) == _sorted_pairs(lo, Do, Io)


def test_binary_hash_range_search(bin_data):
    from tpu_ann.models.binary import IndexBinaryHash

    d, xb, xq = bin_data
    idx = IndexBinaryHash(d, b=12)
    idx.nflip = 2
    idx.add(xb)
    lims, D, I = idx.range_search(xq, 20)
    # every returned hit is a true hit (subset of the oracle)
    oracle = _hamming_oracle(xq, xb)
    for i in range(len(xq)):
        for j in range(lims[i], lims[i + 1]):
            assert oracle[i, I[j]] == D[j] < 20


def test_binary_multihash(bin_data):
    from tpu_ann.models.binary import IndexBinaryMultiHash

    d, xb, xq = bin_data
    idx = IndexBinaryMultiHash(d, nhash=4, b=12)
    idx.nflip = 1
    idx.add(xb)
    assert idx.hashtable_size() > 0
    D, I = idx.search(xq, 5)
    # multi-hash recall beats single-hash at the same b/nflip
    from tpu_ann.models.binary import IndexBinaryHash

    single = IndexBinaryHash(d, b=12)
    single.nflip = 1
    single.add(xb)
    Ds, Is = single.search(xq, 5)
    flat = IndexBinaryFlat(d)
    flat.add(xb)
    Df, If = flat.search(xq, 5)
    rec = lambda I_: np.mean([len(np.intersect1d(I_[i], If[i])) / 5
                              for i in range(len(xq))])
    assert rec(I) >= rec(Is)
    # self-search: every point hashes to its own buckets
    D2, I2 = idx.search(xb[:10], 1)
    assert (D2[:, 0] == 0).all()
    # range search returns only true hits
    lims, Dr, Ir = idx.range_search(xq, 20)
    oracle = _hamming_oracle(xq, xb)
    for i in range(len(xq)):
        for j in range(lims[i], lims[i + 1]):
            assert oracle[i, Ir[j]] == Dr[j] < 20


def test_binary_flat_remove_ids(bin_data):
    d, xb, _ = bin_data
    idx = IndexBinaryFlat(d)
    idx.add(xb)
    removed = idx.remove_ids(np.arange(0, 100))
    assert removed == 100 and idx.ntotal == len(xb) - 100
    # survivors renumbered: old row 100 is now row 0
    assert np.array_equal(idx.reconstruct(0), xb[100])


def test_index_binary_factory(bin_data):
    from tpu_ann import index_binary_factory
    from tpu_ann.models.binary import (IndexBinaryFlat, IndexBinaryHash,
                                       IndexBinaryHNSW, IndexBinaryIVF,
                                       IndexBinaryMultiHash)

    d, xb, xq = bin_data
    assert isinstance(index_binary_factory(d, "BFlat"), IndexBinaryFlat)
    assert isinstance(index_binary_factory(d, "BHNSW16"), IndexBinaryHNSW)
    assert isinstance(index_binary_factory(d, "BHash12"), IndexBinaryHash)
    mh = index_binary_factory(d, "BHash4x12")
    assert isinstance(mh, IndexBinaryMultiHash)
    assert (mh.nhash, mh.b) == (4, 12)
    ivf = index_binary_factory(d, "BIVF16")
    assert isinstance(ivf, IndexBinaryIVF) and ivf.nlist == 16
    hivf = index_binary_factory(d, "BIVF16_HNSW8")
    assert isinstance(hivf.quantizer, IndexBinaryHNSW)
    # the HNSW-quantizer binary IVF end-to-end
    hivf.cp.niter = 4
    hivf.train(xb)
    hivf.add(xb)
    hivf.nprobe = 8
    D, I = hivf.search(xq, 5)
    flat = IndexBinaryFlat(d)
    flat.add(xb)
    Df, If = flat.search(xq, 5)
    inter = np.mean([len(np.intersect1d(I[i], If[i])) / 5
                     for i in range(len(xq))])
    assert inter > 0.5, inter


def test_binary_multihash_io(tmp_path, bin_data):
    from tpu_ann.models.binary import IndexBinaryMultiHash
    from tpu_ann.utils.index_io import read_index, write_index

    d, xb, xq = bin_data
    idx = IndexBinaryMultiHash(d, nhash=3, b=10)
    idx.nflip = 2
    idx.add(xb)
    path = str(tmp_path / "bmh.tann")
    write_index(idx, path)
    idx2 = read_index(path)
    assert (idx2.nhash, idx2.b, idx2.nflip) == (3, 10, 2)
    D1, I1 = idx.search(xq, 5)
    D2, I2 = idx2.search(xq, 5)
    assert np.array_equal(D1, D2) and np.array_equal(I1, I2)


def test_knn_hamming_gemm_route(bin_data):
    """The ±1-GEMM (MXU) Hamming route is exactly equal to xor+popcount,
    including tie order (both derive ids from concat position)."""
    d, xb, xq = bin_data
    Dx, Ix = H.knn_hamming(jnp.asarray(xq), jnp.asarray(xb), 10, via="xor")
    Dg, Ig = H.knn_hamming(jnp.asarray(xq), jnp.asarray(xb), 10,
                           via="gemm")
    assert np.array_equal(np.asarray(Dx), np.asarray(Dg))
    assert np.array_equal(np.asarray(Ix), np.asarray(Ig))
    # blocked (multi-block fori path) too
    Db, Ib = H.knn_hamming(jnp.asarray(xq), jnp.asarray(xb), 10,
                           via="gemm", db_block=256)
    assert np.array_equal(np.asarray(Dx), np.asarray(Db))
