"""Fused list-major Pallas IVF scan: equivalence to the query-major
compacted scan (interpret mode on the CPU mesh; compiled on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ann.ops import distances as D
from tpu_ann.ops.ivf_scan import pack_invlists, scan_invlists
from tpu_ann.ops.ivf_scan_pallas import scan_invlists_fused


@pytest.mark.parametrize("nprobe", [1, 8])
def test_fused_scan_matches_query_major(rng, nprobe):
    n, d, nlist, nq, k = 3000, 32, 24, 64, 10
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    cent = xb[rng.choice(n, nlist, replace=False)]
    _, assign = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]
    il = pack_invlists(xb, np.arange(n), assign, nlist, block_size=16)

    _, probes = D.knn(jnp.asarray(xq), jnp.asarray(cent), nprobe)
    probes = probes.astype(jnp.int32)

    D0, I0, _ = scan_invlists(jnp.asarray(xq), probes, il, k,
                              max_nblocks=il.max_nblocks_per_list)
    # kp=3k: per-pair extraction wide enough that the bf16 phase keeps
    # every true top-k candidate for the exact f32 refine
    D1, I1, _ = scan_invlists_fused(jnp.asarray(xq), probes, il, k,
                                    PT=32, CB=2, refine=4, kp=3 * k,
                                    interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    D0, D1 = np.asarray(D0), np.asarray(D1)
    # candidate sets overlap near-perfectly; matching ids carry exact
    # f32 distances (the scan itself is deliberately bf16 + f32 refine)
    overlap = np.mean([
        len(set(I1[q]) & set(I0[q])) / k for q in range(nq)])
    assert overlap >= 0.98, overlap
    for q in range(nq):
        common = set(I1[q]) & set(I0[q])
        m0 = {i: d for i, d in zip(I0[q], D0[q])}
        m1 = {i: d for i, d in zip(I1[q], D1[q])}
        for i in common:
            np.testing.assert_allclose(m1[i], m0[i], rtol=1e-4,
                                       atol=1e-4)


def test_fused_scan_empty_lists(rng):
    """Empty lists (zero-width ranges) and k > list size."""
    n, d, nlist, nq, k = 60, 16, 16, 8, 10
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    assign = np.zeros(n, np.int64)  # everything in list 0
    il = pack_invlists(xb, np.arange(n), assign, nlist, block_size=16)
    probes = jnp.asarray(
        np.stack([np.arange(4) for _ in range(nq)]), jnp.int32)
    # kp covers the whole non-empty list -> exact equivalence
    D1, I1, _ = scan_invlists_fused(jnp.asarray(xq), probes, il, k,
                                    PT=16, CB=2, kp=32, refine=4,
                                    interpret=True)
    D0, I0, _ = scan_invlists(jnp.asarray(xq), probes, il, k,
                              max_nblocks=il.max_nblocks_per_list)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=1e-4, atol=1e-4)


def test_fused_scan_inner_product(rng):
    """IP metric via the negate trick (canonical ascending in-kernel)."""
    n, d, nlist, nq, k = 3000, 32, 24, 64, 10
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    cent = xb[rng.choice(n, nlist, replace=False)]
    _, assign = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]
    il = pack_invlists(xb, np.arange(n), assign, nlist, block_size=16)
    _, probes = D.knn(jnp.asarray(xq), jnp.asarray(cent), 8)
    probes = probes.astype(jnp.int32)
    D0, I0, _ = scan_invlists(jnp.asarray(xq), probes, il, k,
                              D.METRIC_INNER_PRODUCT,
                              max_nblocks=il.max_nblocks_per_list)
    D1, I1, _ = scan_invlists_fused(jnp.asarray(xq), probes, il, k,
                                    D.METRIC_INNER_PRODUCT, PT=32, CB=2,
                                    kp=3 * k, refine=4, interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    overlap = np.mean([len(set(I1[q]) & set(I0[q])) / k for q in range(nq)])
    assert overlap >= 0.98, overlap
    # descending user-facing scores
    D1 = np.asarray(D1)
    assert (np.diff(D1, axis=1) <= 1e-5).all()


def test_fused_scan_sq8_stream(rng):
    """SQ8 storage (uint8 codes + folded dequant affine): the fused scan
    must match the query-major scan over the same SQ8 view — the dequant
    happens via the query transform, at HALF the bf16 stream bytes."""
    from tpu_ann.ops.ivf_scan import sq8_requantize_invlists

    n, d, nlist, nq, k = 3000, 32, 24, 64, 10
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    cent = xb[rng.choice(n, nlist, replace=False)]
    _, assign = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]
    il = pack_invlists(xb, np.arange(n), assign, nlist, block_size=16)
    sq8 = sq8_requantize_invlists(il)
    assert sq8.data.dtype == jnp.uint8

    _, probes = D.knn(jnp.asarray(xq), jnp.asarray(cent), 8)
    probes = probes.astype(jnp.int32)

    D0, I0, _ = scan_invlists(jnp.asarray(xq), probes, sq8, k,
                              max_nblocks=sq8.max_nblocks_per_list)
    D1, I1, _ = scan_invlists_fused(jnp.asarray(xq), probes, sq8, k,
                                    PT=32, CB=2, refine=4, kp=3 * k,
                                    interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    overlap = np.mean([len(set(I1[q]) & set(I0[q])) / k
                       for q in range(nq)])
    assert overlap >= 0.98, overlap
    # and the SQ8 distances track the exact f32 ones (8-bit/dim error)
    De, Ie, _ = scan_invlists(jnp.asarray(xq), probes, il, k,
                              max_nblocks=il.max_nblocks_per_list)
    common_rate = np.mean([len(set(I0[q]) & set(np.asarray(Ie)[q])) / k
                           for q in range(nq)])
    assert common_rate > 0.9, common_rate


def test_fused_scan_sq8_inner_product(rng):
    from tpu_ann.ops.ivf_scan import sq8_requantize_invlists

    n, d, nlist, nq, k = 2000, 32, 16, 32, 5
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    cent = xb[rng.choice(n, nlist, replace=False)]
    _, assign = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]
    il = pack_invlists(xb, np.arange(n), assign, nlist, block_size=16)
    sq8 = sq8_requantize_invlists(il)
    _, probes = D.knn(jnp.asarray(xq), jnp.asarray(cent), 8)
    probes = probes.astype(jnp.int32)
    D0, I0, _ = scan_invlists(jnp.asarray(xq), probes, sq8, k,
                              D.METRIC_INNER_PRODUCT,
                              max_nblocks=sq8.max_nblocks_per_list)
    D1, I1, _ = scan_invlists_fused(jnp.asarray(xq), probes, sq8, k,
                                    D.METRIC_INNER_PRODUCT, PT=32, CB=2,
                                    kp=3 * k, refine=4, interpret=True)
    overlap = np.mean([len(set(np.asarray(I1)[q]) & set(np.asarray(I0)[q]))
                       / k for q in range(nq)])
    assert overlap >= 0.95, overlap
    np.testing.assert_allclose(np.asarray(D1)[:, 0], np.asarray(D0)[:, 0],
                               rtol=1e-3, atol=1e-3)


def test_fused_scan_reservoir_epilogue(rng):
    """Reservoir mode (RW >= 8*kp): per-chunk lane-min fold + one
    end-of-tile extraction. Lossy by design (lane collisions), so assert
    overlap + exact distances on the overlap, not equality."""
    n, d, nlist, nq, k = 4000, 32, 16, 48, 10
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    cent = xb[rng.choice(n, nlist, replace=False)]
    _, assign = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]
    il = pack_invlists(xb, np.arange(n), assign, nlist, block_size=64)
    _, probes = D.knn(jnp.asarray(xq), jnp.asarray(cent), 8)
    probes = probes.astype(jnp.int32)
    D0, I0, _ = scan_invlists(jnp.asarray(xq), probes, il, k,
                              max_nblocks=il.max_nblocks_per_list)
    # CB*B = 16*64 = 1024, kp=16 -> RW=512 stays in reservoir mode
    D1, I1, _ = scan_invlists_fused(jnp.asarray(xq), probes, il, k,
                                    PT=16, CB=16, refine=4, RW=512,
                                    interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    D0, D1 = np.asarray(D0), np.asarray(D1)
    overlap = np.mean([len(set(I1[q]) & set(I0[q])) / k
                       for q in range(nq)])
    assert overlap >= 0.95, overlap
    for q in range(nq):
        m0 = dict(zip(I0[q], D0[q]))
        m1 = dict(zip(I1[q], D1[q]))
        for i in set(I1[q]) & set(I0[q]):
            np.testing.assert_allclose(m1[i], m0[i], rtol=1e-4, atol=1e-3)


def test_grid2d_matches_fused(rng):
    """The 2-D grid schedule (tile x chunk, Mosaic-pipelined) returns
    the manual-DMA fused scan's exact results — including -1 probes,
    empty lists, and maxc-truncation-free coverage."""
    from tpu_ann.ops.ivf_scan_pallas import (grid2d_maxc,
                                             scan_invlists_fused_grid)

    n, d, nlist, nq, nprobe, k = 20000, 64, 48, 80, 8, 10
    xb = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    assign = rng.randint(nlist - 4, size=n)      # 4 lists empty
    probes = np.stack([rng.permutation(nlist)[:nprobe]
                       for _ in range(nq)]).astype(np.int32)
    probes[0, 3] = -1
    il = pack_invlists(xb, np.arange(n), assign, nlist)
    Df, If, nd1 = scan_invlists_fused(jnp.asarray(xq),
                                      jnp.asarray(probes), il, k,
                                      interpret=True)
    mc = grid2d_maxc(il, probes)
    Dg, Ig, nd2 = scan_invlists_fused_grid(
        jnp.asarray(xq), jnp.asarray(probes), il, k, maxc=mc,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(If), np.asarray(Ig))
    np.testing.assert_allclose(np.asarray(Df), np.asarray(Dg),
                               rtol=1e-4)
    assert int(nd1) == int(nd2)
