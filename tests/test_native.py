"""Native host runtime tests — parity between the C++ scatter/readers and
the numpy reference paths (the reference's test style for SIMD kernels:
optimized vs naive equality, tests/test_distances_simd.cpp)."""

import numpy as np
import pytest

from tpu_ann.ops.ivf_scan import pack_invlists
from tpu_ann.utils import native
from tpu_ann.utils.datasets import fvecs_write, write_fbin

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="native library not built"
)


def test_fbin_roundtrip(tmp_path, rng):
    x = rng.rand(500, 12).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    write_fbin(p, x)
    y = native.read_fbin_native(p)
    assert np.array_equal(x, y)
    assert np.array_equal(x[100:150], native.read_fbin_native(p, 100, 50))


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.rand(300, 20).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    fvecs_write(p, x)
    assert np.array_equal(x, native.read_fvecs_native(p))
    assert np.array_equal(x[:100], native.read_fvecs_native(p, 100))


def test_pack_parity_with_numpy(rng):
    """Native scatter must produce the exact layout of the numpy packer."""
    x = rng.rand(2000, 16).astype(np.float32)
    ids = (np.arange(2000) * 3 + 1).astype(np.int32)
    assign = rng.randint(32, size=2000).astype(np.int64)
    nat = native.pack_rows_native(x, ids, assign, 32, 8)
    assert nat is not None
    data, nids, starts, nblocks = nat
    # numpy reference: force the fallback path
    saved = native._LIB
    native._LIB = None
    try:
        pil = pack_invlists(x, ids, assign, 32, block_size=8)
    finally:
        native._LIB = saved
    assert np.array_equal(np.asarray(pil.data), data)
    assert np.array_equal(np.asarray(pil.ids), nids)
    assert np.array_equal(np.asarray(pil.list_block_start),
                          starts.astype(np.int32))
    assert np.array_equal(np.asarray(pil.list_nblocks),
                          nblocks.astype(np.int32))


def test_pack_uint8_codes(rng):
    codes = rng.randint(0, 255, size=(1000, 8)).astype(np.uint8)
    ids = np.arange(1000, dtype=np.int32)
    assign = rng.randint(16, size=1000).astype(np.int64)
    nat = native.pack_rows_native(codes, ids, assign, 16, 8)
    data, nids, starts, nblocks = nat
    assert data.dtype == np.uint8
    # every original row present exactly once
    got = data.reshape(-1, 8)[nids.reshape(-1) >= 0]
    keys = nids.reshape(-1)[nids.reshape(-1) >= 0]
    assert np.array_equal(got[np.argsort(keys)], codes)


def test_norms(rng):
    x = rng.rand(1000, 33).astype(np.float32)
    np.testing.assert_allclose(
        native.norms_l2sqr_native(x), (x.astype(np.float64) ** 2).sum(1),
        rtol=1e-5,
    )


def test_reverse_edges_native_matches_numpy():
    """Native counting-scatter reverse edges == the numpy stable-sort
    path (ops/hnsw._reverse_candidates fallback)."""
    import numpy as np

    from tpu_ann.utils import native

    if not native.HAVE_NATIVE:
        import pytest

        pytest.skip("native library unavailable")
    r = np.random.RandomState(3)
    n, m, cap = 2000, 6, 4
    fwd = r.randint(-1, n, size=(n, m)).astype(np.int32)
    fd = r.rand(n, m).astype(np.float32)
    nat_i, nat_d = native.reverse_edges_native(fwd, fd, cap)
    src = np.repeat(np.arange(n, dtype=np.int32), m)
    dst = fwd.reshape(-1)
    dd = fd.reshape(-1)
    ok = dst >= 0
    src, dst, dd = src[ok], dst[ok], dd[ok]
    order = np.argsort(dst, kind="stable")
    src, dst, dd = src[order], dst[order], dd[order]
    pos = np.arange(len(dst)) - np.searchsorted(dst, dst)
    keep = pos < cap
    ref_i = np.full((n, cap), -1, np.int32)
    ref_d = np.full((n, cap), np.inf, np.float32)
    ref_i[dst[keep], pos[keep]] = src[keep]
    ref_d[dst[keep], pos[keep]] = dd[keep]
    np.testing.assert_array_equal(nat_i, ref_i)
    np.testing.assert_allclose(nat_d, ref_d)
