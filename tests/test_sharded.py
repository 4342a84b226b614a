"""Multi-device tests on the virtual 8-device CPU mesh.

The reference validates distribution on localhost (RPC servers in-process,
SURVEY.md §4); the oracle is equivalence to the sequential implementation
(distributed_kmeans.py --test ladder). Same here: sharded results must
match the single-device ops exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ann.ops import distances as D
from tpu_ann.parallel import (
    make_mesh,
    shard_rows,
    sharded_kmeans_iter,
    sharded_knn,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_shards=4, n_replicas=2)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_knn_matches_local(mesh, rng):
    nq, nb, d, k = 16, 1000, 24, 10
    xq = rng.rand(nq, d).astype(np.float32)
    xb = rng.rand(nb, d).astype(np.float32)
    xb_p = shard_rows(xb, 4)
    Ds, Is = sharded_knn(
        jnp.asarray(xq), jnp.asarray(xb_p), k,
        mesh=mesh, valid_n=jnp.int32(nb),
    )
    Dr, Ir = D.knn(jnp.asarray(xq), jnp.asarray(xb), k)
    np.testing.assert_allclose(np.asarray(Ds), np.asarray(Dr), rtol=1e-5,
                               atol=1e-5)
    assert (np.asarray(Is) == np.asarray(Ir)).all()


def test_sharded_knn_ip(mesh, rng):
    nq, nb, d, k = 8, 256, 16, 5
    xq = rng.rand(nq, d).astype(np.float32)
    xb = rng.rand(nb, d).astype(np.float32)
    Ds, Is = sharded_knn(
        jnp.asarray(xq), jnp.asarray(xb), k,
        metric=D.METRIC_INNER_PRODUCT, mesh=mesh,
    )
    Dr, Ir = D.knn(jnp.asarray(xq), jnp.asarray(xb), k,
                   D.METRIC_INNER_PRODUCT)
    assert (np.asarray(Is) == np.asarray(Ir)).all()


def test_sharded_kmeans_iter_matches_serial(mesh, rng):
    n, d, k = 800, 16, 10
    x = rng.rand(n, d).astype(np.float32)
    cent = x[:k].copy()
    new_c, counts, obj = sharded_kmeans_iter(
        jnp.asarray(x), jnp.asarray(cent), k, mesh=mesh
    )
    # serial reference
    dis, assign = D.knn(jnp.asarray(x), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]
    ref_c = np.zeros((k, d), np.float32)
    ref_n = np.zeros(k)
    for i in range(n):
        ref_c[assign[i]] += x[i]
        ref_n[assign[i]] += 1
    ref_c = ref_c / np.maximum(ref_n, 1)[:, None]
    np.testing.assert_allclose(np.asarray(new_c), ref_c, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), ref_n)
    np.testing.assert_allclose(
        float(obj), float(np.asarray(dis)[:, 0].sum()), rtol=1e-4
    )


def test_kmeans_distributed_driver(mesh, rng):
    from tpu_ann.parallel.sharded import kmeans_distributed
    from tpu_ann.ops import distances as D
    import jax.numpy as jnp

    x = rng.rand(2000, 16).astype(np.float32)
    cent = kmeans_distributed(x, 16, mesh=mesh, niter=6)
    assert cent.shape == (16, 16)
    # all clusters populated
    _, a = D.knn(jnp.asarray(x), jnp.asarray(cent), 1)
    counts = np.bincount(np.asarray(a)[:, 0], minlength=16)
    assert (counts > 0).all()


def test_kmeans_checkpoint_resume(tmp_path, rng):
    from tpu_ann.ops.kmeans import ClusteringParameters, kmeans

    x = rng.rand(1000, 8).astype(np.float32)
    ck = str(tmp_path / "km.pkl")
    cp = ClusteringParameters(niter=6, seed=5)
    c1, st1 = kmeans(x, 8, cp, checkpoint=ck)
    import os
    assert os.path.exists(ck)
    # simulate a partial run: rewind checkpoint to iter 2 and resume
    import pickle
    with open(ck, "rb") as f:
        st = pickle.load(f)
    st["iter"] = 2
    with open(ck, "wb") as f:
        pickle.dump(st, f)
    c2, st2 = kmeans(x, 8, cp, checkpoint=ck)
    assert c2.shape == (8, 8)
    assert len(st2) == 3  # iters 3..5 only


def _pack_pq_shards(codes, assign, nlist, n_shards, block_size=16):
    """Pack row-partitions of coded invlists per shard with GLOBAL row ids,
    padded to common block counts, stacked on a leading shard axis."""
    from tpu_ann.ops.ivf_scan import pack_code_invlists

    n = len(codes)
    rows_per_shard = -(-n // n_shards)
    packs = []
    for s in range(n_shards):
        lo = s * rows_per_shard
        hi = min(lo + rows_per_shard, n)
        packs.append(pack_code_invlists(
            codes[lo:hi], np.arange(lo, hi), assign[lo:hi], nlist,
            block_size=block_size))
    max_blocks = max(p.codes.shape[0] for p in packs)
    mnb = max(p.max_nblocks_per_list for p in packs)
    cs, ids, lbs, lnb = [], [], [], []
    for p in packs:
        nbp = max_blocks - p.codes.shape[0]
        cs.append(np.pad(np.asarray(p.codes), ((0, nbp), (0, 0), (0, 0))))
        ids.append(np.pad(np.asarray(p.ids), ((0, nbp), (0, 0)),
                          constant_values=-1))
        lbs.append(np.asarray(p.list_block_start))
        lnb.append(np.asarray(p.list_nblocks))
    return (jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ids)),
            jnp.asarray(np.stack(lbs)), jnp.asarray(np.stack(lnb)), mnb)


@pytest.mark.parametrize("nbits", [8, 4])
def test_sharded_ivf_scan_pq_matches_single(mesh, rng, nbits):
    """Sharded PQ/x4fs ADC scan == single-device scan over the union pack
    (BASELINE config #5's code path on the virtual mesh)."""
    from tpu_ann.ops import pq as PQ
    from tpu_ann.ops.ivf_scan import pack_code_invlists, scan_invlists_pq
    from tpu_ann.parallel import sharded_ivf_scan_pq

    n, d, nlist, nq, k, M = 1024, 16, 12, 8, 5, 4
    xb = rng.rand(n, d).astype(np.float32)
    xq = rng.rand(nq, d).astype(np.float32)
    cent = xb[rng.choice(n, nlist, replace=False)]
    _, assign = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
    assign = np.asarray(assign)[:, 0]

    pqc = PQ.train_pq(xb - cent[assign], M, nbits)
    books = jnp.asarray(pqc.centroids)
    resid = jnp.asarray(xb - cent[assign])
    codes = np.asarray(PQ.pq_encode(resid, books))
    if nbits == 4:
        codes = np.asarray(PQ.pack_codes_4bit(jnp.asarray(codes)))

    cd, probes = D.knn(jnp.asarray(xq), jnp.asarray(cent), 6)
    probes = probes.astype(jnp.int32)
    cd = cd.astype(jnp.float32)

    # single-device oracle over the union pack (global row ids)
    union = pack_code_invlists(codes, np.arange(n), assign, nlist,
                               block_size=16)
    D1, I1, _ = scan_invlists_pq(
        jnp.asarray(xq), probes, cd, union, books, jnp.asarray(cent), k,
        max_nblocks=union.max_nblocks_per_list, packed4=(nbits == 4))

    cs, ids, lbs, lnb, mnb = _pack_pq_shards(codes, assign, nlist, 4)
    Ds, Is = sharded_ivf_scan_pq(
        jnp.asarray(xq), probes, cd, cs, ids, lbs, lnb, books,
        jnp.asarray(cent), k, max_nblocks=mnb, packed4=(nbits == 4),
        mesh=mesh)
    np.testing.assert_allclose(np.asarray(Ds), np.asarray(D1), rtol=1e-4,
                               atol=1e-4)
    # same candidate sets (ties may reorder equal distances)
    for q in range(nq):
        assert set(np.asarray(Is)[q].tolist()) == \
            set(np.asarray(I1)[q].tolist())


def test_sharded_fused_scan_matches_plain(mesh, rng):
    """Per-shard Pallas fused scan under shard_map (interpret mode on the
    CPU mesh) == the plain sharded scan."""
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.ops.ivf_scan import pack_invlists
    from tpu_ann.parallel.sharded import sharded_ivf_scan

    S, n_per, d, nlist, nq, k = 4, 1024, 32, 16, 32, 5
    cent = rng.rand(nlist, d).astype(np.float32)
    datas, idss, normss, lbss, lnbs = [], [], [], [], []
    mnb = 0
    pils = []
    for s in range(S):
        xb = rng.rand(n_per, d).astype(np.float32)
        _, a = D.knn(jnp.asarray(xb), jnp.asarray(cent), 1)
        a = np.asarray(a)[:, 0]
        pil = pack_invlists(xb, np.arange(s * n_per, (s + 1) * n_per),
                            a, nlist, block_size=16)
        pils.append(pil)
        mnb = max(mnb, pil.max_nblocks_per_list)
    # pad all shards to a common block count
    nbmax = max(p.data.shape[0] for p in pils)
    for p in pils:
        padb = nbmax - p.data.shape[0]
        datas.append(jnp.pad(p.data, ((0, padb), (0, 0), (0, 0))))
        idss.append(jnp.pad(p.ids, ((0, padb), (0, 0)),
                            constant_values=-1))
        normss.append(jnp.pad(p.norms, ((0, padb), (0, 0))))
        lbss.append(p.list_block_start)
        lnbs.append(p.list_nblocks)
    args = (jnp.stack(datas), jnp.stack(idss), jnp.stack(normss),
            jnp.stack(lbss), jnp.stack(lnbs))
    xq = jnp.asarray(rng.rand(nq, d).astype(np.float32))
    _, probes = D.knn(xq, jnp.asarray(cent), 4)
    probes = probes.astype(jnp.int32)

    D0, I0 = sharded_ivf_scan(xq, probes, *args, k, mesh=mesh,
                              max_nblocks=mnb)
    D1, I1 = sharded_ivf_scan(xq, probes, *args, k, mesh=mesh,
                              max_nblocks=mnb, fused=True, interpret=True)
    I0, I1 = np.asarray(I0), np.asarray(I1)
    overlap = np.mean([len(set(I1[q]) & set(I0[q])) / k
                       for q in range(nq)])
    assert overlap >= 0.95, overlap


def test_sharded_refine(mesh):
    """sharded_refine == exact distances over the candidate set
    (IndexRefineFlat's k_factor step on the mesh)."""
    import jax.numpy as jnp

    from tpu_ann.ops import distances as D
    from tpu_ann.parallel import sharded_refine

    rs = np.random.RandomState(4)
    n, d, nq, k, R = 256, 16, 8, 5, 12
    xb = rs.randn(n, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    # candidate pool: random ids + some -1 holes
    cand = rs.randint(0, n, size=(nq, R)).astype(np.int32)
    cand[:, -1] = -1
    Dv, Iv = sharded_refine(jnp.asarray(xq), jnp.asarray(cand),
                            jnp.asarray(xb), k, mesh=mesh)
    Dv, Iv = np.asarray(Dv), np.asarray(Iv)
    # oracle: exact L2 over the candidate set per query
    for q in range(nq):
        ids = cand[q][cand[q] >= 0]
        dis = ((xq[q][None] - xb[ids]) ** 2).sum(1)
        order = np.argsort(dis)[:k]
        np.testing.assert_allclose(np.sort(Dv[q]), np.sort(dis[order]),
                                   rtol=1e-4, atol=1e-4)
        assert set(Iv[q]) == set(ids[order])
