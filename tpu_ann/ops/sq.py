"""Scalar quantization — TPU counterpart of faiss `impl/ScalarQuantizer.
{h,cpp}` (QT_8bit / QT_8bit_uniform / QT_fp16 / QT_bf16 codecs).

The reference stores per-dimension trained [vmin, vdiff] ranges and decodes
inside per-ISA SQDistanceComputer templates. Here codecs are plain jit
encode/decode functions; the IVF scan dequantizes gathered codes on the VPU
right before the distance contraction (decode-in-kernel), so HBM holds 1-2
bytes/dim like the reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Quantizer types (subset of faiss ScalarQuantizer::QuantizerType,
# impl/ScalarQuantizer.h:27-38)
QT_8BIT = 0          # per-dim trained min/range
QT_8BIT_UNIFORM = 1  # single min/range over all dims
QT_FP16 = 2
QT_BF16 = 3


@dataclasses.dataclass
class SQCodec:
    qtype: int
    d: int
    vmin: Optional[np.ndarray] = None    # (d,) or (1,) by qtype
    vdiff: Optional[np.ndarray] = None

    @property
    def code_size(self) -> int:
        if self.qtype in (QT_8BIT, QT_8BIT_UNIFORM):
            return self.d
        return 2 * self.d  # fp16 / bf16

    @property
    def code_dtype(self):
        if self.qtype in (QT_8BIT, QT_8BIT_UNIFORM):
            return np.uint8
        if self.qtype == QT_FP16:
            return np.float16
        return jnp.bfloat16


def train_sq(x: np.ndarray, qtype: int, rs_arg: float = 0.0) -> SQCodec:
    """Train ranges (ScalarQuantizer::train, RangeStat RS_minmax)."""
    x = np.ascontiguousarray(x, np.float32)
    d = x.shape[1]
    if qtype == QT_8BIT:
        vmin = x.min(axis=0)
        vmax = x.max(axis=0)
    elif qtype == QT_8BIT_UNIFORM:
        vmin = np.full(d, x.min(), np.float32)
        vmax = np.full(d, x.max(), np.float32)
    else:
        return SQCodec(qtype=qtype, d=d)
    vdiff = np.maximum(vmax - vmin, 1e-12).astype(np.float32)
    return SQCodec(qtype=qtype, d=d, vmin=vmin.astype(np.float32),
                   vdiff=vdiff)


def sq_encode(x: jnp.ndarray, codec: SQCodec) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    if codec.qtype in (QT_8BIT, QT_8BIT_UNIFORM):
        vmin = jnp.asarray(codec.vmin)
        vdiff = jnp.asarray(codec.vdiff)
        q = jnp.clip((x - vmin) / vdiff, 0.0, 1.0)
        return jnp.round(q * 255.0).astype(jnp.uint8)
    if codec.qtype == QT_FP16:
        return x.astype(jnp.float16)
    return x.astype(jnp.bfloat16)


def sq_decode(codes: jnp.ndarray, codec: SQCodec) -> jnp.ndarray:
    if codec.qtype in (QT_8BIT, QT_8BIT_UNIFORM):
        vmin = jnp.asarray(codec.vmin)
        vdiff = jnp.asarray(codec.vdiff)
        # reference decode: (code + 0.5) / 256 (Codec8bit::decode_component)
        return vmin + (codes.astype(jnp.float32) + 0.5) / 256.0 * vdiff
    return codes.astype(jnp.float32)
