"""Per-query QueryLatencyStats parity (round-5 VERDICT #6).

The fork's core C++ contribution is a per-query stats array
(`QueryLatencyStats {total_us, quantization_us, list_scan_us}`,
faiss/IndexIVF.h:28-32, filled at faiss/IndexIVF.cpp:1064-1105)
consumed by per-query P99.9 analyses
(tutorial/python/192-hnsw-ivf-latency.py:338-392). These tests pin the
contract: (nq,) arrays, phase split summing to total, exact per-query
ndis, identical results to search(), and the benchmark helper's
per-query percentile report.
"""

import numpy as np

from tpu_ann.models.ivf import SearchParametersIVF, make_ivf_flat


def _built_index(small_ds, nlist=16, nprobe=4):
    index = make_ivf_flat(small_ds.d, nlist=nlist)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = nprobe
    return index


def test_per_query_contract(small_ds):
    index = _built_index(small_ds)
    xq = small_ds.get_queries()[:24]
    Dv, Iv, st = index.search_stats_per_query(xq, 5)
    pq = st.per_query
    assert pq is not None
    nq = len(xq)
    for f in ("total_us", "quantization_us", "list_scan_us", "ndis"):
        assert getattr(pq, f).shape == (nq,), f
    # phase split: total == quantization + list_scan, per query
    np.testing.assert_allclose(
        pq.total_us, pq.quantization_us + pq.list_scan_us, rtol=1e-9)
    assert (pq.total_us > 0).all()
    # batch aggregates are the per-query sums
    assert st.nq == nq
    np.testing.assert_allclose(st.total_us, pq.total_us.sum())
    np.testing.assert_allclose(st.quantization_us,
                               pq.quantization_us.sum())
    assert st.ndis == int(pq.ndis.sum())


def test_per_query_ndis_exact(small_ds):
    """ndis[q] must equal the summed sizes of q's probed lists."""
    import jax.numpy as jnp

    index = _built_index(small_ds, nprobe=3)
    xq = small_ds.get_queries()[:16]
    _, _, st = index.search_stats_per_query(xq, 5)
    lsizes = index._list_sizes_host()
    assert int(lsizes.sum()) == index.ntotal
    _, probes = index._coarse_search_device(jnp.asarray(xq), 3)
    probes = np.asarray(probes)
    expect = lsizes[probes].sum(1)
    np.testing.assert_array_equal(st.per_query.ndis, expect)


def test_per_query_results_match_search(small_ds):
    index = _built_index(small_ds)
    xq = small_ds.get_queries()[:16]
    D1, I1 = index.search(xq, 5)
    D2, I2, _ = index.search_stats_per_query(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)


def test_per_query_params_override(small_ds):
    index = _built_index(small_ds, nlist=16, nprobe=1)
    xq = small_ds.get_queries()[:8]
    _, _, st = index.search_stats_per_query(
        xq, 5, params=SearchParametersIVF(nprobe=16))
    assert st.nlist_visited == 8 * 16
    # exhaustive probing scans every stored vector
    assert (st.per_query.ndis == index.ntotal).all()


def test_per_query_generic_fallback(small_ds):
    """Non-IVF indexes get the generic per-query loop (total only)."""
    from tpu_ann.models.flat import IndexFlat

    idx = IndexFlat(small_ds.d)
    idx.add(small_ds.get_database())
    xq = small_ds.get_queries()[:8]
    Dv, Iv, st = idx.search_stats_per_query(xq, 5)
    assert st.per_query.total_us.shape == (8,)
    D1, I1 = idx.search(xq, 5)
    np.testing.assert_array_equal(I1, Iv)


def test_per_query_latency_report(small_ds):
    from tpu_ann.utils.benchmark import per_query_latency

    index = _built_index(small_ds)
    rep = per_query_latency(index, small_ds.get_queries(), 5, sample=16)
    assert rep["nq"] == 16
    for f in ("total_us", "quantization_us", "list_scan_us"):
        assert set(rep[f]) == {"mean", "p50", "p99", "p99.9"}
        assert rep[f]["p99.9"] >= rep[f]["p50"]
    assert rep["ndis"]["mean"] > 0


def test_per_query_hybrid(small_ds):
    """The namesake hybrid (HNSW coarse quantizer) reports the split."""
    from tpu_ann.models.ivf_hnsw import IndexIVFHNSW

    index = IndexIVFHNSW(small_ds.d, nlist=32)
    index.train(small_ds.get_train())
    index.add(small_ds.get_database())
    index.nprobe = 4
    index.coarse_mode = "quantizer"
    xq = small_ds.get_queries()[:8]
    _, _, st = index.search_stats_per_query(xq, 5)
    assert (st.per_query.quantization_us > 0).all()
    assert (st.per_query.list_scan_us > 0).all()
