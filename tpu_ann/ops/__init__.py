"""L0 kernel substrate: distances, k-select, and (later) Pallas fused scans."""

from . import distances, topk  # noqa: F401
