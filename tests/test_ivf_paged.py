"""Out-of-core paged IVF scan (ops/ivf_scan_paged.py — the
OnDiskInvertedLists.h:60-136 / GpuIndex.h:70+ auto-paging role).

Interpret-mode on CPU: tiny windows force every hard case — tiles
straddling window boundaries, tile batches splitting a window, unprobed
gaps skipped, cross-window per-pair merges."""

import numpy as np
import pytest

from tpu_ann.ops import distances as D
from tpu_ann.ops.ivf_scan_paged import (
    _plan_windows,
    create_paged_invlists,
    open_paged_invlists,
    paged_add_chunk,
    scan_invlists_paged,
)


@pytest.fixture()
def rng():
    return np.random.RandomState(7)


def _brute_gt(xq, x, probes, assign, k):
    """Exact top-k restricted to each query's probed lists."""
    nq = len(xq)
    Dv = np.full((nq, k), np.inf)
    Iv = np.full((nq, k), -1, np.int64)
    for q in range(nq):
        mask = np.isin(assign, probes[q][probes[q] >= 0])
        cand = np.where(mask)[0]
        if not len(cand):
            continue
        dd = ((x[cand] - xq[q]) ** 2).sum(1)
        o = np.argsort(dd, kind="stable")[:k]
        Dv[q, :len(o)] = dd[o]
        Iv[q, :len(o)] = cand[o]
    return Dv, Iv


def _build_paged(tmp_path, x, assign, nlist, chunks=3):
    n, d = x.shape
    sizes = np.bincount(assign, minlength=nlist)
    pil = create_paged_invlists(str(tmp_path / "paged"), nlist, sizes, d)
    fill = np.zeros(nlist, np.int64)
    bounds = np.linspace(0, n, chunks + 1).astype(int)
    for a, b in zip(bounds[:-1], bounds[1:]):
        paged_add_chunk(pil, fill, x[a:b],
                        np.arange(a, b, dtype=np.int64), assign[a:b])
    assert (fill == sizes).all()
    return pil


def test_plan_windows_covers_every_block():
    """Every tile's [bs, be) range is covered by its plan entries'
    clamped windows, in order, without overlap."""
    tile_bs = np.array([0, 3, 3, 10, 40, 40, 95, 0], np.int64)
    tile_be = np.array([5, 9, 30, 12, 42, 60, 99, 0], np.int64)
    W, TB = 8, 2
    seen = {t: [] for t in range(len(tile_bs))}
    for w0, ta, tb in _plan_windows(tile_bs, tile_be, W, TB):
        assert tb - ta <= TB
        for t in range(ta, tb):
            lo = max(int(tile_bs[t]), w0)
            hi = min(int(tile_be[t]), w0 + W)
            if hi > lo:
                seen[t].append((lo, hi))
    for t in range(len(tile_bs)):
        need = int(tile_be[t] - tile_bs[t])
        if need == 0:
            continue
        ivs = sorted(seen[t])
        # contiguous, non-overlapping, complete coverage
        assert ivs[0][0] == tile_bs[t]
        assert ivs[-1][1] == tile_be[t]
        for (a0, a1), (b0, b1) in zip(ivs[:-1], ivs[1:]):
            assert a1 == b0, (t, ivs)


def test_paged_matches_brute_force(tmp_path, rng):
    n, d, nlist, nq, k = 4000, 64, 23, 32, 10
    x = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    cents = rng.randn(nlist, d).astype(np.float32)
    assign = ((x[:, None, :16] - cents[None, :, :16]) ** 2).sum(-1).argmin(1)
    probes = np.argsort(
        ((xq[:, None, :16] - cents[None, :, :16]) ** 2).sum(-1), 1
    )[:, :6].astype(np.int32)

    pil = _build_paged(tmp_path, x, assign, nlist)
    # W=4 blocks (half a typical list), TB=3: forces straddles + batching
    stats = {}
    Dv, Iv, ndis = scan_invlists_paged(
        xq, probes, pil, k, window_blocks=4, TB=3, interpret=True,
        stats=stats)
    gtD, gtI = _brute_gt(xq, x, probes, assign, k)
    rec = np.mean([len(set(Iv[q]) & set(gtI[q])) / k for q in range(nq)])
    assert rec >= 0.95, rec
    # exact-f32 refine: matching ids carry exact distances
    for q in range(nq):
        common = set(Iv[q]) & set(gtI[q])
        for i in common:
            if i < 0:
                continue
            a = Dv[q][list(Iv[q]).index(i)]
            b = gtD[q][list(gtI[q]).index(i)]
            np.testing.assert_allclose(a, b, rtol=1e-4)
    assert stats["windows"] >= 2        # really paged
    assert ndis > 0


def test_paged_reload_and_big_window(tmp_path, rng):
    """mmap reopen gives identical results; one big window (everything
    resident at once) agrees with many small windows."""
    n, d, nlist, nq, k = 3000, 32, 16, 16, 5
    x = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    assign = rng.randint(nlist, size=n)
    probes = np.stack([rng.permutation(nlist)[:4] for _ in range(nq)]
                      ).astype(np.int32)
    _build_paged(tmp_path, x, assign, nlist)
    pil = open_paged_invlists(str(tmp_path / "paged"))
    D1, I1, _ = scan_invlists_paged(xq, probes, pil, k,
                                    window_blocks=2, TB=2, interpret=True)
    D2, I2, _ = scan_invlists_paged(xq, probes, pil, k,
                                    window_blocks=4096, TB=64,
                                    interpret=True)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5)


def test_paged_inner_product(tmp_path, rng):
    n, d, nlist, nq, k = 2000, 32, 11, 16, 5
    x = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    assign = rng.randint(nlist, size=n)
    probes = np.broadcast_to(np.arange(nlist, dtype=np.int32),
                             (nq, nlist)).copy()   # probe everything
    pil = _build_paged(tmp_path, x, assign, nlist)
    Dv, Iv, _ = scan_invlists_paged(
        xq, probes, pil, k, metric=D.METRIC_INNER_PRODUCT,
        window_blocks=3, TB=4, interpret=True)
    ips = xq @ x.T
    gtI = np.argsort(-ips, 1)[:, :k]
    rec = np.mean([len(set(Iv[q]) & set(gtI[q])) / k for q in range(nq)])
    assert rec >= 0.95, rec
    for q in range(nq):
        np.testing.assert_allclose(
            Dv[q, 0], ips[q, Iv[q, 0]], rtol=1e-4)


def test_paged_empty_and_invalid_probes(tmp_path, rng):
    n, d, nlist = 600, 32, 8
    x = rng.randn(n, d).astype(np.float32)
    assign = rng.randint(4, size=n)       # lists 4..7 stay EMPTY
    xq = rng.randn(4, d).astype(np.float32)
    probes = np.array([[0, 5, -1, 2]] * 4, np.int32)
    pil = _build_paged(tmp_path, x, assign, nlist)
    Dv, Iv, _ = scan_invlists_paged(xq, probes, pil, 5,
                                    window_blocks=2, TB=2, interpret=True)
    gtD, gtI = _brute_gt(xq, x, probes, assign, 5)
    for q in range(4):
        assert set(Iv[q][Iv[q] >= 0]) == set(gtI[q][gtI[q] >= 0])


# --- index level (models/ivf_paged.py, the 190-series workflow) ------------

def test_paged_index_build_save_load_search(tmp_path, rng):
    """Build -> save -> mmap-load -> search, recall parity vs the
    in-HBM IndexIVFFlat oracle on the same quantizer."""
    import jax.numpy as jnp

    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.models.ivf_paged import IndexIVFFlatPaged

    n, d, nlist, nq, k = 6000, 64, 32, 40, 10
    x = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)

    idx = IndexIVFFlatPaged(d, nlist, str(tmp_path / "pidx"))
    idx.scan_interpret = True
    idx.assign_chunk = 1500            # force multi-chunk build
    idx.window_blocks = 4              # force real paging
    idx.tile_batch = 4
    idx.cp_niter = 5
    idx.train(x[:3000])
    idx.add(x)
    assert idx.ntotal == n

    # oracle: in-HBM IVF with the SAME centroids
    oracle = make_ivf_flat(d, nlist=nlist)
    oracle.quantizer.add(idx.centroids)
    oracle.is_trained = True
    oracle.add(x)
    oracle.nprobe = 8

    idx2 = IndexIVFFlatPaged.load(str(tmp_path / "pidx"))
    idx2.scan_interpret = True
    idx2.window_blocks = 4
    idx2.tile_batch = 4
    idx2.nprobe = 8
    Dp, Ip, st = idx2.search_stats(xq, k)
    Do, Io = oracle.search(xq, k)
    rec = np.mean([len(set(Ip[q]) & set(np.asarray(Io)[q])) / k
                   for q in range(nq)])
    assert rec >= 0.98, rec
    assert st.extra["windows"] >= 2
    assert st.ndis > 0

    # registry round-trip (index file references the paged directory,
    # OnDiskInvertedLists-style)
    from tpu_ann.utils.index_io import read_index, write_index

    write_index(idx2, str(tmp_path / "pidx.idx"))
    idx3 = read_index(str(tmp_path / "pidx.idx"))
    idx3.scan_interpret = True
    idx3.window_blocks = 4
    idx3.tile_batch = 4
    D3, I3 = idx3.search(xq, k)
    np.testing.assert_array_equal(I3, Ip)


def test_paged_resident_tier(tmp_path, rng):
    """Hot-tier windows (resident device prefix) return identical
    results to fully-streamed windows."""
    from tpu_ann.ops.ivf_scan_paged import upload_resident

    n, d, nlist, nq, k = 3000, 32, 16, 16, 5
    x = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    assign = rng.randint(nlist, size=n)
    probes = np.stack([rng.permutation(nlist)[:6] for _ in range(nq)]
                      ).astype(np.int32)
    pil = _build_paged(tmp_path, x, assign, nlist)
    D0, I0, _ = scan_invlists_paged(xq, probes, pil, k,
                                    window_blocks=2, TB=2, interpret=True)
    res = upload_resident(pil, pil.nblocks // 2)
    s = {}
    D1, I1, _ = scan_invlists_paged(xq, probes, pil, k,
                                    window_blocks=2, TB=2, interpret=True,
                                    resident=res, stats=s)
    np.testing.assert_array_equal(I0, I1)
    np.testing.assert_allclose(D0, D1, rtol=1e-5)
    assert s["windows_resident"] >= 1
