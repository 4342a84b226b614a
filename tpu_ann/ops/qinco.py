"""QINCo neural residual codec — inference in pure JAX.

TPU-native reimplementation of the reference's C++ QINCo inference
(faiss/utils/NeuralNet.{h,cpp}: Tensor2D/Linear/Embedding/FFN, QINCoStep,
QINCo — itself a translation of facebookresearch/Qinco model_qinco.py).

Semantics mirrored exactly (NeuralNet.cpp:190-344):
  decode:  xhat = codebook0[c0]
           per step: zqs = cb[ci]; zqs += MLPconcat([zqs, xhat]);
                     L x (zqs += FFN(zqs)); xhat += zqs
  encode:  greedy per step over ALL K candidate deltas, pick the one
           minimizing ||x - (xhat + delta)||^2.

TPU-first differences from the C++ (which materializes an (n*K, 2d)
concat and runs GEMMs over it, NeuralNet.cpp:213-235):
  * MLPconcat([cb, xhat]) is factored into cb @ W_cb + xhat @ W_xh + b —
    two small GEMMs of O((K + n) d^2) instead of one O(n K d^2) GEMM,
    then a broadcast add into the (n, K, d) candidate tensor;
  * everything is batched einsum on the MXU; encode chunks over n to
    bound the (chunk, K, d) activation memory;
  * parameters live in a pytree so the whole encode/decode jits.

Weights are inference-time state (the reference likewise only runs
pretrained PyTorch weights); `QINCoParams.random` gives a deterministic
init for tests, `from_arrays` loads an exported state dict.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from . import distances as D


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QINCoStepParams:
    codebook: jnp.ndarray       # (K, d)
    w_cb: jnp.ndarray           # (d, d)   MLPconcat weight, codebook half
    w_xh: jnp.ndarray           # (d, d)   MLPconcat weight, xhat half
    b: jnp.ndarray              # (d,)     MLPconcat bias
    ffn_w1: jnp.ndarray         # (L, d, h) residual block expand
    ffn_w2: jnp.ndarray         # (L, h, d) residual block project

    def tree_flatten(self):
        return ((self.codebook, self.w_cb, self.w_xh, self.b,
                 self.ffn_w1, self.ffn_w2), None)

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(*c)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QINCoParams:
    """d, K, L, h, M as in QINCo::QINCo (NeuralNet.h:128-140)."""

    codebook0: jnp.ndarray                 # (K, d)
    steps: List[QINCoStepParams]           # M - 1 entries

    def tree_flatten(self):
        return ((self.codebook0, self.steps), None)

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(*c)

    @property
    def d(self):
        return self.codebook0.shape[1]

    @property
    def K(self):
        return self.codebook0.shape[0]

    @property
    def M(self):
        return len(self.steps) + 1

    @classmethod
    def random(cls, d: int, K: int, L: int, M: int, h: int,
               seed: int = 42) -> "QINCoParams":
        rs = np.random.RandomState(seed)

        def lin(shape, fan_in):
            # torch nn.Linear default init: U(-1/sqrt(fan_in), ...)
            bound = 1.0 / np.sqrt(fan_in)
            return jnp.asarray(
                rs.uniform(-bound, bound, size=shape).astype(np.float32))

        steps = []
        for _ in range(M - 1):
            steps.append(QINCoStepParams(
                codebook=jnp.asarray(
                    rs.randn(K, d).astype(np.float32)),
                w_cb=lin((d, d), 2 * d),
                w_xh=lin((d, d), 2 * d),
                b=lin((d,), 2 * d),
                ffn_w1=lin((L, d, h), d),
                ffn_w2=lin((L, h, d), h),
            ))
        return cls(
            codebook0=jnp.asarray(rs.randn(K, d).astype(np.float32)),
            steps=steps,
        )

    @classmethod
    def from_arrays(cls, state: Dict[str, np.ndarray]) -> "QINCoParams":
        """Load an exported QINCo state dict (keys as in the PyTorch
        reference: codebook0.weight, steps.<i>.codebook.weight,
        steps.<i>.MLPconcat.{weight,bias},
        steps.<i>.residual_blocks.<j>.linear{1,2}.weight). Linear weights
        are (out, in) torch layout; MLPconcat's input is [code, xhat]."""
        cb0 = jnp.asarray(np.asarray(state["codebook0.weight"], np.float32))
        d = cb0.shape[1]
        steps = []
        i = 0
        while f"steps.{i}.codebook.weight" in state:
            w = np.asarray(state[f"steps.{i}.MLPconcat.weight"], np.float32)
            bias = np.asarray(state[f"steps.{i}.MLPconcat.bias"], np.float32)
            w1s, w2s = [], []
            j = 0
            while f"steps.{i}.residual_blocks.{j}.linear1.weight" in state:
                w1s.append(np.asarray(
                    state[f"steps.{i}.residual_blocks.{j}.linear1.weight"],
                    np.float32).T)
                w2s.append(np.asarray(
                    state[f"steps.{i}.residual_blocks.{j}.linear2.weight"],
                    np.float32).T)
                j += 1
            steps.append(QINCoStepParams(
                codebook=jnp.asarray(np.asarray(
                    state[f"steps.{i}.codebook.weight"], np.float32)),
                w_cb=jnp.asarray(w[:, :d].T),
                w_xh=jnp.asarray(w[:, d:].T),
                b=jnp.asarray(bias),
                ffn_w1=jnp.asarray(np.stack(w1s)),
                ffn_w2=jnp.asarray(np.stack(w2s)),
            ))
            i += 1
        return cls(codebook0=cb0, steps=steps)


def _residual_blocks(step: QINCoStepParams, z: jnp.ndarray) -> jnp.ndarray:
    """L x (z += linear2(relu(linear1(z)))) — FFN per NeuralNet.h:77-84."""
    L = step.ffn_w1.shape[0]
    for i in range(L):
        hdn = jax.nn.relu(z @ step.ffn_w1[i])
        z = z + hdn @ step.ffn_w2[i]
    return z


def _step_decode(step: QINCoStepParams, xhat: jnp.ndarray,
                 codes: jnp.ndarray) -> jnp.ndarray:
    """QINCoStep::decode (NeuralNet.cpp:190-202): returns the delta."""
    zqs = step.codebook[codes]                       # (n, d)
    zqs = zqs + zqs @ step.w_cb + xhat @ step.w_xh + step.b
    return _residual_blocks(step, zqs)


def _step_encode(step: QINCoStepParams, xhat: jnp.ndarray,
                 x: jnp.ndarray):
    """QINCoStep::encode (NeuralNet.cpp:204-260): all-K candidate deltas,
    greedy argmin. Returns (codes (n,), delta (n, d))."""
    n, d = xhat.shape
    K = step.codebook.shape[0]
    cb_term = step.codebook + step.codebook @ step.w_cb + step.b  # (K, d)
    xh_term = xhat @ step.w_xh                                    # (n, d)
    z = cb_term[None, :, :] + xh_term[:, None, :]                 # (n, K, d)
    z = _residual_blocks(step, z)
    # candidate xhat' = xhat + z ; pick argmin ||x - xhat'||^2
    r = (x - xhat)[:, None, :] - z                                # (n, K, d)
    err = jnp.sum(r * r, axis=-1)                                 # (n, K)
    codes = jnp.argmin(err, axis=1).astype(jnp.int32)
    delta = jnp.take_along_axis(
        z, codes[:, None, None].astype(jnp.int64), axis=1)[:, 0]
    return codes, delta


@jax.jit
def qinco_decode(params: QINCoParams, codes: jnp.ndarray) -> jnp.ndarray:
    """QINCo::decode (NeuralNet.cpp:300-307). codes: (n, M) int32."""
    xhat = params.codebook0[codes[:, 0]]
    for i, step in enumerate(params.steps):
        xhat = xhat + _step_decode(step, xhat, codes[:, i + 1])
    return xhat


@jax.jit
def qinco_encode(params: QINCoParams, x: jnp.ndarray) -> jnp.ndarray:
    """QINCo::encode (NeuralNet.cpp:309-344). x: (n, d) -> (n, M) int32."""
    x = x.astype(jnp.float32)
    _, c0 = D.knn(x, params.codebook0, 1, D.METRIC_L2)
    c0 = c0[:, 0].astype(jnp.int32)
    xhat = params.codebook0[c0]
    codes = [c0]
    for step in params.steps:
        ci, delta = _step_encode(step, xhat, x)
        xhat = xhat + delta
        codes.append(ci)
    return jnp.stack(codes, axis=1)


def encode_chunked(params: QINCoParams, x: np.ndarray,
                   chunk: int = 4096) -> np.ndarray:
    """Host driver bounding the (chunk, K, d) activation footprint."""
    outs = []
    for i in range(0, len(x), chunk):
        outs.append(np.asarray(
            qinco_encode(params, jnp.asarray(x[i:i + chunk]))))
    return (np.concatenate(outs) if outs
            else np.zeros((0, params.M), np.int32))


# --- bit packing (impl/io BitstringWriter role, vectorized) ---------------

def pack_codes(codes: np.ndarray, nbits: int) -> np.ndarray:
    """(n, M) int -> (n, ceil(M*nbits/8)) uint8, little-endian bitstream."""
    n, M = codes.shape
    total = M * nbits
    nbytes = -(-total // 8)
    codes = np.asarray(codes, np.uint64)
    shifts = np.arange(nbits, dtype=np.uint64)
    bits = ((codes[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    bits = bits.reshape(n, total)
    pad = nbytes * 8 - total
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((n, pad), np.uint8)], axis=1)
    return np.packbits(bits.reshape(n, nbytes, 8), axis=-1,
                       bitorder="little")[:, :, 0]


def unpack_codes(packed: np.ndarray, M: int, nbits: int) -> np.ndarray:
    n = len(packed)
    bits = np.unpackbits(packed[:, :, None], axis=-1,
                         bitorder="little").reshape(n, -1)
    bits = bits[:, :M * nbits].reshape(n, M, nbits)
    shifts = np.arange(nbits, dtype=np.uint64)
    wide = (bits.astype(np.uint64) << shifts).sum(-1, dtype=np.uint64)
    return wide if nbits > 31 else wide.astype(np.int32)
