#!/usr/bin/env python
"""Residual-quantizer demo (reference: demos/demo_residual_quantizer.cpp
— train an RQ codec, compare reconstruction error against PQ at the
same code budget, and run an IndexResidualQuantizer search).

Runs on CPU:
  JAX_PLATFORMS=cpu python demos/demo_residual_quantizer.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import _bootstrap  # noqa: F401,E402 — CPU/TPU platform selection


def main():
    import jax.numpy as jnp

    from tpu_ann.models.rq import IndexResidualQuantizer
    from tpu_ann.ops.pq import train_pq, pq_encode, pq_decode
    from tpu_ann.ops.rq import train_rq, rq_encode, rq_decode
    from tpu_ann.ops import distances as D
    from tpu_ann.utils.evaluation import recall_k_at_k

    rs = np.random.RandomState(5)
    d, M, nbits = 32, 4, 8
    nb, nt, nq, k = 10_000, 5_000, 200, 10
    # clustered data: isotropic gaussian noise around shared prototypes
    # (a 32-bit code can't capture 32 i.i.d. gaussian dims — real ANN
    # datasets have structure, so should a codec demo)
    protos = rs.randn(256, d).astype(np.float32)

    def draw(n):
        return (protos[rs.randint(256, size=n)]
                + 0.25 * rs.randn(n, d)).astype(np.float32)

    xt, xb = draw(nt), draw(nb)
    xq = (xb[:nq] + 0.05 * rs.randn(nq, d)).astype(np.float32)

    # codec-level comparison at the same M*nbits budget
    t0 = time.time()
    rq = train_rq(xt, M=M, nbits=nbits, niter=8)
    print(f"RQ trained in {time.time()-t0:.1f}s "
          f"({M}x{nbits}-bit, beam search encode)")
    codes = rq_encode(jnp.asarray(xb), jnp.asarray(rq.codebooks), beam=8)
    rq_err = float(np.mean(
        (xb - np.asarray(rq_decode(codes, jnp.asarray(rq.codebooks))))
        ** 2))

    pq = train_pq(xt, M=M, nbits=nbits, niter=8)
    cent = jnp.asarray(pq.centroids)
    pq_err = float(np.mean(
        (xb - np.asarray(pq_decode(pq_encode(jnp.asarray(xb), cent),
                                   cent))) ** 2))
    print(f"reconstruction MSE: RQ={rq_err:.4f} PQ={pq_err:.4f} "
          f"(RQ should win: codebooks see the running residual)")
    assert rq_err < pq_err

    # index-level search
    idx = IndexResidualQuantizer(d, M=M, nbits=nbits)
    idx.train(xt)
    idx.add(xb)
    D1, I1 = idx.search(xq, k)
    _, gt = D.knn(jnp.asarray(xq), jnp.asarray(xb), k)
    rec = recall_k_at_k(I1, np.asarray(gt), k)
    print(f"IndexResidualQuantizer recall@{k} vs exact = {rec:.4f}")
    assert rec > 0.5, rec
    print("OK")


if __name__ == "__main__":
    main()
