"""Memory accounting — the fork's `AdvancedMemoryMonitor`
(tutorial/python/190-hnsw-ivf-test.py:67-1046, 200-memory.py): RSS +
phase-marked sampling, re-based for TPU: device HBM comes from the PJRT
`memory_stats()` API (the fork's /proc/self/smaps mmap attribution has no
analog — device residency is explicit here), host RSS from /proc.

Equal-memory accounting vs the mmap reference (SURVEY.md §7 hard part 6):
`index_memory_bytes(index)` reports exactly the device bytes of
codes+ids+graph, the comparable quantity to the reference's code
bytes/vector.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Dict, List, Optional


def host_rss_bytes() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def device_memory_stats() -> Dict[str, int]:
    """bytes_in_use / peak_bytes_in_use from PJRT (0s when unsupported)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in stats.items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}


def index_memory_bytes(index) -> Dict[str, int]:
    """Device bytes of the index's arrays, by component — the equal-memory
    comparison quantity (codes/ids/graph/centroids)."""
    import numpy as np

    out: Dict[str, int] = {}

    def nbytes(a):
        try:
            return int(np.prod(a.shape)) * a.dtype.itemsize
        except Exception:
            return 0

    il = getattr(index, "invlists", None)
    if il is not None:
        payload = getattr(il, "data", None)
        if payload is None:
            payload = getattr(il, "codes", None)
        out["invlist_codes"] = nbytes(payload)
        out["invlist_ids"] = nbytes(il.ids)
        if hasattr(il, "norms"):
            out["invlist_norms"] = nbytes(il.norms)
    q = getattr(index, "quantizer", None)
    if q is not None:
        vecs = getattr(q, "vectors", None)
        if vecs is None and hasattr(q, "storage"):
            vecs = q.storage.vectors
        if vecs is not None:
            out["centroids"] = nbytes(vecs)
        g = getattr(q, "graph", None)
        if g is not None:
            out["quantizer_graph"] = (nbytes(g.neighbors0)
                                      + nbytes(g.upper_neighbors)
                                      + nbytes(g.levels))
    g = getattr(index, "graph", None)
    if g is not None:
        out["graph"] = (nbytes(g.neighbors0) + nbytes(g.upper_neighbors)
                        + nbytes(g.levels))
        out["storage"] = nbytes(index.storage.vectors)
    if hasattr(index, "_xb") and index._xb is not None:
        out["vectors"] = nbytes(index._xb)
    out["total"] = sum(out.values())
    return out


@dataclasses.dataclass
class MemorySample:
    t: float
    phase: str
    rss_bytes: int
    hbm_bytes: int


class MemoryMonitor:
    """Phase-marked sampling thread (AdvancedMemoryMonitor role)."""

    def __init__(self, interval_s: float = 0.5):
        self.interval = interval_s
        self.samples: List[MemorySample] = []
        self._phase = "init"
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._t0 = time.time()

    def set_phase(self, phase: str) -> None:
        self._phase = phase
        self._sample()

    def _sample(self) -> None:
        hbm = device_memory_stats().get("bytes_in_use", 0)
        self.samples.append(MemorySample(
            t=time.time() - self._t0, phase=self._phase,
            rss_bytes=host_rss_bytes(), hbm_bytes=hbm,
        ))

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            self._sample()

    def __enter__(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        self._sample()
        return False

    def peak_rss(self) -> int:
        return max((s.rss_bytes for s in self.samples), default=0)

    def peak_hbm(self) -> int:
        return max((s.hbm_bytes for s in self.samples), default=0)

    def report(self) -> str:
        lines = ["phase            t(s)    RSS(MB)   HBM(MB)"]
        seen = set()
        for s in self.samples:
            if s.phase not in seen:
                seen.add(s.phase)
                lines.append(f"{s.phase:<15} {s.t:7.1f} {s.rss_bytes/2**20:9.1f}"
                             f" {s.hbm_bytes/2**20:9.1f}")
        lines.append(f"peak RSS {self.peak_rss()/2**20:.1f} MB, "
                     f"peak HBM {self.peak_hbm()/2**20:.1f} MB")
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# Energy accounting (fork t-energy.cpp role: RAPL /sys/class/powercap
# energy_uj counters -> J and QPS/W). TPU chip power isn't exposed to the
# host, so this measures HOST package energy — still the fork's own
# methodology (it measured the CPU running the index). Gracefully reports
# unavailability where powercap doesn't exist (VMs, this image).
# ---------------------------------------------------------------------------

_RAPL_ROOT = "/sys/class/powercap"


def rapl_available() -> bool:
    import glob

    return bool(glob.glob(os.path.join(_RAPL_ROOT, "intel-rapl:*",
                                       "energy_uj")))


def _read_energy_uj() -> int:
    import glob

    total = 0
    for p in glob.glob(os.path.join(_RAPL_ROOT, "intel-rapl:*",
                                    "energy_uj")):
        try:
            with open(p) as f:
                total += int(f.read().strip())
        except OSError:
            pass
    return total


class EnergyMonitor:
    """Context manager: joules + mean watts over the enclosed block
    (fork tutorial/cpp/t-energy.cpp:30-71 semantics). `joules` is None
    when RAPL is unavailable. Handles one counter wraparound per domain
    heuristically (counters are 32/64-bit microjoules)."""

    def __init__(self):
        self.joules: Optional[float] = None
        self.seconds: float = 0.0

    def __enter__(self):
        self._avail = rapl_available()
        self._t0 = time.time()
        self._e0 = _read_energy_uj() if self._avail else 0
        return self

    def __exit__(self, *exc):
        self.seconds = time.time() - self._t0
        if self._avail:
            de = _read_energy_uj() - self._e0
            if de < 0:          # wrapped
                de += 1 << 32
            self.joules = de / 1e6
        return False

    @property
    def watts(self) -> Optional[float]:
        if self.joules is None or self.seconds <= 0:
            return None
        return self.joules / self.seconds

    def qps_per_watt(self, nq: int) -> Optional[float]:
        w = self.watts
        if not w:
            return None
        return (nq / self.seconds) / w
