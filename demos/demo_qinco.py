#!/usr/bin/env python
"""QINCo neural-codec demo (reference: demos/demo_qinco.py — load QINCo
weights and compare sa_encode/sa_decode reconstruction error against PQ
at the same code budget).

The reference loads pretrained PyTorch checkpoints; no weights ship
with this image, so this demo uses a deterministic random init — the
point is the API surface (IndexQINCo.sa_encode/sa_decode/search) and
the decode-as-einsum TPU path, not trained quality. Runs on CPU:
  JAX_PLATFORMS=cpu python demos/demo_qinco.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection


def main():
    from tpu_ann.models.qinco import IndexQINCo
    from tpu_ann.ops.pq import train_pq, pq_encode, pq_decode

    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    d, K, L, M, h = 32, 64, 2, 4, 32
    nb, nq, k = 1_000, 100, 10
    xb = rs.randn(nb, d).astype(np.float32)
    xq = (xb[:nq] + 0.05 * rs.randn(nq, d)).astype(np.float32)

    idx = IndexQINCo(d, K=K, L=L, M=M, h=h)
    print(f"IndexQINCo d={d} M={M} K={K}: "
          f"{idx.sa_code_size()} bytes/vector")

    t0 = time.time()
    codes = idx.sa_encode(xb)
    print(f"sa_encode {nb} vectors in {time.time()-t0:.1f}s "
          f"(greedy per-step argmin)")
    recon = idx.sa_decode(codes)
    q_err = float(np.mean((xb - recon) ** 2))

    # PQ at the same code budget (M 8-bit subquantizers)
    codec = train_pq(xb, M=M, nbits=8, niter=8)
    cent = jnp.asarray(codec.centroids)
    pq_recon = np.asarray(pq_decode(pq_encode(jnp.asarray(xb), cent),
                                    cent))
    pq_err = float(np.mean((xb - pq_recon) ** 2))
    print(f"reconstruction MSE: qinco(random init)={q_err:.4f} "
          f"trained PQ={pq_err:.4f}")

    idx.add(xb)
    D1, I1 = idx.search(xq, k)
    noisy_hit = float(np.mean(I1[:, 0] == np.arange(nq)))
    print(f"decoded-domain search, noisy queries: "
          f"self-hit@1={noisy_hit:.2f} (random init — no trained quality)")

    # Exact-path validation: querying with the decoded reconstructions
    # must return the corresponding database rows.
    D2, I2 = idx.search(recon[:nq].astype(np.float32), k)
    self_hit = float(np.mean(I2[:, 0] == np.arange(nq)))
    print(f"decoded-query self-hit@1={self_hit:.2f}")
    assert self_hit > 0.95, self_hit
    print("OK")


if __name__ == "__main__":
    main()
