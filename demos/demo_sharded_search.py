#!/usr/bin/env python
"""Mesh-sharded search demo (reference: demos/demo_client_server_ivf.py —
pickle/TCP RPC replaced by a device mesh with XLA collectives).

Run with a virtual device mesh:
  JAX_PLATFORMS=cpu python demos/demo_sharded_search.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection


def main():
    import jax

    if jax.default_backend() == "cpu" and len(jax.devices()) < 4:
        jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    import numpy as np

    from tpu_ann.ops import distances as D
    from tpu_ann.parallel import make_mesh, sharded_kmeans_iter, sharded_knn

    n_dev = len(jax.devices())
    n_rep = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(n_shards=n_dev // n_rep, n_replicas=n_rep)
    print(f"mesh: {dict(mesh.shape)}")

    rs = np.random.RandomState(0)
    xb = rs.rand(40000, 64).astype(np.float32)
    xq = rs.rand(1000, 64).astype(np.float32)

    # distributed k-means step (psum of per-centroid sums over the mesh)
    cent = jnp.asarray(xb[:64])
    cent, counts, obj = sharded_kmeans_iter(jnp.asarray(xb), cent, 64,
                                            mesh=mesh)
    print(f"kmeans step: obj={float(obj):.1f}")

    # sharded exact search: db row-sharded, queries replica-split,
    # all_gather + k-select merge (the ClientIndex/ResultHeap role)
    Ds, Is = sharded_knn(jnp.asarray(xq), jnp.asarray(xb), 10, mesh=mesh)
    Dr, Ir = D.knn(jnp.asarray(xq), jnp.asarray(xb), 10)
    agree = (np.asarray(Is) == np.asarray(Ir)).mean()
    print(f"sharded == single-device: {agree:.4f}")


if __name__ == "__main__":
    main()
