"""Factory tools (contrib/factory_tools.py role): reverse_index_factory
and get_code_size round-trips over the factory grammar."""
import numpy as np
import pytest

from tpu_ann.utils.factory import (get_code_size, index_factory,
                                   reverse_index_factory)

SPECS = [
    "Flat",
    "PQ4x8",
    "PQ8x4",
    "SQ8",
    "SQfp16",
    "RQ4x8",
    "LSQ4x8",
    "PRQ2x2x8",
    "HNSW16",
    "HNSW16,SQbf16",
    "HNSW16,SQ8",
    "HNSW16,PQ4x8",
    "IVF16,Flat",
    "IVF16,PQ4x8",
    "IVF16,PQ4x4fs",
    "IVF16,SQ8",
    "IVF16,RQ4x8",
    "IVF16,PRQ2x2x8",
    "IVF16_HNSW8,Flat",
    "IVF16,PQ4+8",
    "PCA16,Flat",
    "OPQ4_32,IVF16,PQ4x8",
    "IDMap,Flat",
    "IVF16,Flat,RFlat",
]


@pytest.mark.parametrize("spec", SPECS)
def test_reverse_round_trip(spec):
    """factory(spec) -> reverse -> factory gives the same class tree."""
    idx = index_factory(32, spec)
    rev = reverse_index_factory(idx)
    idx2 = index_factory(32, rev)
    assert type(idx2) is type(idx), (spec, rev)
    # one level deeper for wrappers
    for attr in ("index", "base_index", "quantizer"):
        a, b = getattr(idx, attr, None), getattr(idx2, attr, None)
        assert type(a) is type(b), (spec, rev, attr)


def test_get_code_size_basics():
    d = 64
    assert get_code_size(d, "Flat") == 4 * d
    assert get_code_size(d, "SQ8") == d
    assert get_code_size(d, "SQfp16") == 2 * d
    assert get_code_size(d, "PQ8") == 8
    assert get_code_size(d, "PQ8x4") == 4
    assert get_code_size(d, "IVF100,PQ16x8") == 16
    assert get_code_size(d, "IVF100,Flat") == 4 * d
    assert get_code_size(d, "RQ4x8") == 4 + 4  # stages + norm
    assert get_code_size(d, "IVF16,PQ4+8") == 12
    assert get_code_size(d, "PRQ2x2x8") == 4 + 4
    # transforms remap d before the container
    assert get_code_size(d, "PCA16,Flat") == 4 * 16
    assert get_code_size(d, "OPQ4_32,IVF16,PQ4x8") == 4
    # refine adds exact vectors at the ORIGINAL d
    assert get_code_size(d, "IVF16,SQ8,RFlat") == 4 * d + d
    # IDMap carries an 8-byte id
    assert get_code_size(d, "IDMap,Flat") == 8 + 4 * d
    # HNSW counts its level-0 links
    assert get_code_size(d, "HNSW16") == 4 * 2 * 16 + 4 * d


def test_code_size_matches_sa_code_size():
    """For codec indexes, get_code_size(spec) == index.sa_code_size()."""
    rs = np.random.RandomState(0)
    x = rs.randn(600, 32).astype(np.float32)
    for spec in ("PQ4x8", "SQ8", "SQfp16", "RQ4x8"):
        idx = index_factory(32, spec)
        idx.train(x)
        assert get_code_size(32, spec) == idx.sa_code_size(), spec
