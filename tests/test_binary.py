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
