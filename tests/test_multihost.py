"""Multi-host (DCN) bring-up smoke test: two REAL processes joined by
jax.distributed, driving `sharded_knn` across the process boundary — the
localhost-distribution validation stance of the reference
(benchs/distributed_ondisk/README.md "Local tests" runs its distributed
paths on one machine the same way).

Each process owns one virtual CPU device; the coordinator is a local
TCP port; results must match a single-process exact knn.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]
    from tpu_ann.parallel.sharded import initialize_multihost
    initialize_multihost(coordinator=coord, num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2          # one CPU device per process

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rs = np.random.RandomState(0)
    xb = rs.randn(256, 16).astype(np.float32)
    xq = rs.randn(8, 16).astype(np.float32)

    from tpu_ann.parallel.sharded import make_mesh, sharded_knn
    mesh = make_mesh(n_shards=2)            # spans both processes' devices

    # global arrays from process-local slices (each process owns one
    # shard of xb; xq is replicated — the DCN data-ingestion pattern)
    sh_b = NamedSharding(mesh, P("shard", None))
    sh_q = NamedSharding(mesh, P(None, None))
    xb_g = jax.make_array_from_process_local_data(
        sh_b, xb[pid * 128:(pid + 1) * 128], xb.shape)
    xq_g = jax.make_array_from_process_local_data(sh_q, xq, xq.shape)

    D, I = sharded_knn(xq_g, xb_g, 4, mesh=mesh)
    D = np.asarray(D); I = np.asarray(I)

    # exact reference on the full array
    d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :4]
    assert (I == gt).mean() > 0.99, (pid, I[:2], gt[:2])
    print(f"proc {pid}: multihost sharded_knn ok", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sharded_knn(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # a clean interpreter: the axon sitecustomize registers the remote
    # TPU backend at startup, which would initialize PJRT before
    # jax.distributed.initialize can run
    for key in list(env):
        if key.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(key)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_NUM_CPU_DEVICES"] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed localhost bring-up timed out "
                    "(environment without loopback RPC)")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "multihost sharded_knn ok" in outs[0]
