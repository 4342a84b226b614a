"""Mesh sharding / replication / distributed search (L6 equivalent)."""

from .sharded import (  # noqa: F401
    initialize_multihost,
    make_mesh,
    shard_rows,
    sharded_ivf_scan,
    sharded_ivf_scan_pq,
    sharded_kmeans_iter,
    sharded_knn,
    sharded_refine,
)
