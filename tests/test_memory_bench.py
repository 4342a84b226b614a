"""Memory accounting + benchmark harness unit tests."""

import numpy as np

from tpu_ann.models.ivf_hnsw import IndexIVFHNSW
from tpu_ann.utils.benchmark import parse_config
from tpu_ann.utils.memory import (
    MemoryMonitor,
    host_rss_bytes,
    index_memory_bytes,
)


def test_host_rss():
    assert host_rss_bytes() > 10 * 2**20  # a python process uses >10MB


def test_index_memory_accounting(small_ds):
    idx = IndexIVFHNSW(small_ds.d, nlist=16, M=8)
    idx.cp.niter = 4
    idx.train(small_ds.get_train())
    idx.add(small_ds.get_database())
    mem = index_memory_bytes(idx)
    assert mem["invlist_codes"] > small_ds.nb * small_ds.d * 4 * 0.9
    assert "quantizer_graph" in mem and mem["quantizer_graph"] > 0
    assert mem["total"] == sum(v for k, v in mem.items() if k != "total")


def test_memory_monitor_phases(small_ds):
    with MemoryMonitor(interval_s=0.05) as mon:
        mon.set_phase("alloc")
        x = np.zeros((1000, 1000))
        mon.set_phase("free")
        del x
    assert mon.peak_rss() > 0
    assert "alloc" in mon.report()


def test_parse_config(tmp_path):
    p = tmp_path / "b.config"
    p.write_text("""
# comment
[build]
nlist = 1024, 4096
[search]
nprobe_ratio = 0.01
k = 10
""")
    cfg = parse_config(str(p))
    assert cfg["build"]["nlist"] == [1024.0, 4096.0]
    assert cfg["search"]["k"] == [10.0]


def test_energy_monitor_graceful():
    """EnergyMonitor (fork t-energy.cpp role) reports None cleanly when
    RAPL is unavailable, and joules/watts when it is."""
    import time

    from tpu_ann.utils.memory import EnergyMonitor, rapl_available

    with EnergyMonitor() as em:
        time.sleep(0.05)
    assert em.seconds >= 0.05
    if rapl_available():
        assert em.joules is not None and em.joules >= 0
        assert em.watts is not None
    else:
        assert em.joules is None
        assert em.watts is None
        assert em.qps_per_watt(100) is None
