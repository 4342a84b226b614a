#!/usr/bin/env python
"""Client/server IVF search over TCP (reference:
demos/demo_client_server_ivf.py — contrib/client_server.py's
pickle-RPC ClientIndex/SearchServer, re-hosted on this package's
utils/rpc + utils/client_server).

Spawns N shard servers in subprocesses (each owning a slice of the
database), then fans queries from a ClientIndex and checks recall vs a
local exact search. Works on CPU:
  JAX_PLATFORMS=cpu python demos/demo_client_server_ivf.py
"""
import multiprocessing as mp
import os
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection

NSHARD = 2
D_, NB, NT, NQ, K = 32, 20_000, 5_000, 200, 10


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _serve(shard: int, port: int):
    from tpu_ann.models.ivf import make_ivf_flat
    from tpu_ann.utils.client_server import run_index_server

    rs = np.random.RandomState(7)
    xb = rs.rand(NB, D_).astype(np.float32)
    xt = rs.rand(NT, D_).astype(np.float32)
    lo, hi = shard * NB // NSHARD, (shard + 1) * NB // NSHARD

    index = make_ivf_flat(D_, nlist=64)
    index.cp.niter = 5
    index.train(xt)
    index.add_with_ids(xb[lo:hi], np.arange(lo, hi, dtype=np.int64))
    index.nprobe = 32
    run_index_server(index, port=port)


def main():
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.client_server import ClientIndex
    from tpu_ann.utils.evaluation import recall_k_at_k

    import jax.numpy as jnp

    ports = [_free_port() for _ in range(NSHARD)]
    procs = [mp.Process(target=_serve, args=(s, p), daemon=True)
             for s, p in enumerate(ports)]
    for p in procs:
        p.start()

    rs = np.random.RandomState(7)
    xb = rs.rand(NB, D_).astype(np.float32)
    _ = rs.rand(NT, D_).astype(np.float32)
    xq = rs.rand(NQ, D_).astype(np.float32)

    client = None
    deadline = time.time() + 90
    while client is None:
        try:
            client = ClientIndex([("localhost", p) for p in ports])
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.5)
    print(f"connected to {NSHARD} shards, ntotal={client.ntotal}")

    t0 = time.time()
    Dm, Im = client.search(xq, K)
    print(f"distributed search: {NQ} queries in {time.time()-t0:.2f}s")

    _, gt = D.knn(jnp.asarray(xq), jnp.asarray(xb), K)
    rec = recall_k_at_k(Im, np.asarray(gt), K)
    print(f"recall@{K} vs exact = {rec:.4f}")
    assert rec > 0.9, rec
    client.close()
    for p in procs:
        p.terminate()
    print("OK")


if __name__ == "__main__":
    mp.set_start_method("spawn")
    main()
