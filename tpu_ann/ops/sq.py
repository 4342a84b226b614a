"""Scalar quantization — TPU counterpart of faiss `impl/ScalarQuantizer.
{h,cpp}` (QT_8bit / QT_4bit / QT_6bit, uniform and per-dim trained,
QT_fp16 / QT_bf16 / QT_8bit_direct codecs, RangeStat training modes).

The reference stores per-dimension trained [vmin, vdiff] ranges and decodes
inside per-ISA SQDistanceComputer templates. Here codecs are plain jit
encode/decode functions; the IVF scan dequantizes gathered codes on the VPU
right before the distance contraction (decode-in-kernel), so HBM holds the
same packed bytes/dim as the reference:

  QT_4bit  — two dims per byte (Codec4bit)
  QT_6bit  — four dims per three bytes (Codec6bit bit packing)
  QT_8bit  — one byte per dim
  fp16/bf16 — two bytes per dim
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Quantizer types (faiss ScalarQuantizer::QuantizerType,
# impl/ScalarQuantizer.h:27-38)
QT_8BIT = 0          # per-dim trained min/range
QT_8BIT_UNIFORM = 1  # single min/range over all dims
QT_FP16 = 2
QT_BF16 = 3
QT_4BIT = 4
QT_4BIT_UNIFORM = 5
QT_6BIT = 6
QT_8BIT_DIRECT = 7          # codes stored as-is (data already uint8)
QT_8BIT_DIRECT_SIGNED = 8   # decode = code - 128

# RangeStat (impl/ScalarQuantizer.h RangeStat): how train() derives ranges
RS_MINMAX = 0     # [min, max] of the training data
RS_MEANSTD = 1    # mean ± rs_arg * std
RS_QUANTILES = 2  # rs_arg/1-rs_arg quantiles

_NBITS = {QT_8BIT: 8, QT_8BIT_UNIFORM: 8, QT_4BIT: 4, QT_4BIT_UNIFORM: 4,
          QT_6BIT: 6}


@dataclasses.dataclass
class SQCodec:
    qtype: int
    d: int
    vmin: Optional[np.ndarray] = None    # (d,) or (1,) by qtype
    vdiff: Optional[np.ndarray] = None

    @property
    def code_size(self) -> int:
        if self.qtype in (QT_4BIT, QT_4BIT_UNIFORM):
            return (self.d + 1) // 2
        if self.qtype == QT_6BIT:
            return (self.d * 6 + 7) // 8
        if self.qtype in (QT_FP16, QT_BF16):
            return 2 * self.d
        return self.d  # 8-bit family

    @property
    def code_dtype(self):
        if self.qtype == QT_FP16:
            return np.float16
        if self.qtype == QT_BF16:
            return jnp.bfloat16
        return np.uint8


def train_sq(x: np.ndarray, qtype: int, rs_arg: float = 0.0,
             rangestat: int = RS_MINMAX) -> SQCodec:
    """Train ranges (ScalarQuantizer::train, train_Uniform/NonUniform).
    rangestat selects how the [vmin, vmax] window is derived; rs_arg is
    the std multiplier (RS_meanstd, default 3) or quantile (RS_quantiles,
    default 0.01)."""
    x = np.ascontiguousarray(x, np.float32)
    d = x.shape[1]
    if qtype in (QT_FP16, QT_BF16, QT_8BIT_DIRECT, QT_8BIT_DIRECT_SIGNED):
        return SQCodec(qtype=qtype, d=d)
    uniform = qtype in (QT_8BIT_UNIFORM, QT_4BIT_UNIFORM)
    xs = x.reshape(-1, 1) if uniform else x
    if rangestat == RS_MEANSTD:
        arg = rs_arg or 3.0
        mean, std = xs.mean(axis=0), xs.std(axis=0)
        vmin, vmax = mean - arg * std, mean + arg * std
    elif rangestat == RS_QUANTILES:
        arg = rs_arg or 0.01
        vmin = np.quantile(xs, arg, axis=0)
        vmax = np.quantile(xs, 1.0 - arg, axis=0)
    else:
        vmin, vmax = xs.min(axis=0), xs.max(axis=0)
    if uniform:
        vmin = np.full(d, vmin[0], np.float32)
        vmax = np.full(d, vmax[0], np.float32)
    vdiff = np.maximum(vmax - vmin, 1e-12).astype(np.float32)
    return SQCodec(qtype=qtype, d=d, vmin=vmin.astype(np.float32),
                   vdiff=vdiff)


# --- bit packing -----------------------------------------------------------

def pack_4bit(q: jnp.ndarray) -> jnp.ndarray:
    """(..., d) values < 16 -> (..., ceil(d/2)) bytes, low nibble first."""
    d = q.shape[-1]
    if d % 2:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, 1)])
    q = q.astype(jnp.uint8).reshape(q.shape[:-1] + (-1, 2))
    return (q[..., 0] | (q[..., 1] << 4)).astype(jnp.uint8)


def unpack_4bit(b: jnp.ndarray, d: int) -> jnp.ndarray:
    lo = b & 0x0F
    hi = b >> 4
    out = jnp.stack([lo, hi], axis=-1).reshape(b.shape[:-1] + (-1,))
    return out[..., :d]


def pack_6bit(q: jnp.ndarray) -> jnp.ndarray:
    """(..., d) values < 64 -> (..., 3d/4) bytes (Codec6bit layout:
    4 values per 3 bytes, little-endian bit stream)."""
    d = q.shape[-1]
    pad = (-d) % 4
    if pad:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, pad)])
    q = q.astype(jnp.uint16).reshape(q.shape[:-1] + (-1, 4))
    v0, v1, v2, v3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    b0 = (v0 | (v1 << 6)) & 0xFF
    b1 = ((v1 >> 2) | (v2 << 4)) & 0xFF
    b2 = ((v2 >> 4) | (v3 << 2)) & 0xFF
    out = jnp.stack([b0, b1, b2], axis=-1).astype(jnp.uint8)
    return out.reshape(out.shape[:-2] + (-1,))


def unpack_6bit(b: jnp.ndarray, d: int) -> jnp.ndarray:
    g = b.reshape(b.shape[:-1] + (-1, 3)).astype(jnp.uint16)
    b0, b1, b2 = g[..., 0], g[..., 1], g[..., 2]
    v0 = b0 & 0x3F
    v1 = ((b0 >> 6) | (b1 << 2)) & 0x3F
    v2 = ((b1 >> 4) | (b2 << 4)) & 0x3F
    v3 = (b2 >> 2) & 0x3F
    out = jnp.stack([v0, v1, v2, v3], axis=-1).astype(jnp.uint8)
    return out.reshape(out.shape[:-2] + (-1,))[..., :d]


# --- encode / decode --------------------------------------------------------

def sq_encode(x: jnp.ndarray, codec: SQCodec) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    qt = codec.qtype
    if qt == QT_FP16:
        return x.astype(jnp.float16)
    if qt == QT_BF16:
        return x.astype(jnp.bfloat16)
    if qt == QT_8BIT_DIRECT:
        return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    if qt == QT_8BIT_DIRECT_SIGNED:
        return jnp.clip(jnp.round(x) + 128, 0, 255).astype(jnp.uint8)
    nbits = _NBITS[qt]
    levels = (1 << nbits) - 1
    vmin = jnp.asarray(codec.vmin)
    vdiff = jnp.asarray(codec.vdiff)
    q = jnp.clip((x - vmin) / vdiff, 0.0, 1.0)
    q = jnp.round(q * levels).astype(jnp.uint8)
    if qt in (QT_4BIT, QT_4BIT_UNIFORM):
        return pack_4bit(q)
    if qt == QT_6BIT:
        return pack_6bit(q)
    return q


def sq_dequant_codes(codes: jnp.ndarray, qtype: int, d: int,
                     vmin: jnp.ndarray, vdiff: jnp.ndarray) -> jnp.ndarray:
    """Dequantize packed codes (any leading shape) -> float32 (..., d).
    The decode-in-kernel path shared by flat search and the IVF scan
    (SQDistanceComputer role). Reference decode is
    (code + 0.5) / 2^bits * vdiff + vmin (Codec*::decode_component)."""
    if qtype in (QT_FP16, QT_BF16):
        return codes.astype(jnp.float32)
    if qtype == QT_8BIT_DIRECT:
        return codes.astype(jnp.float32)
    if qtype == QT_8BIT_DIRECT_SIGNED:
        return codes.astype(jnp.float32) - 128.0
    if qtype in (QT_4BIT, QT_4BIT_UNIFORM):
        q = unpack_4bit(codes, d)
        scale = 16.0
    elif qtype == QT_6BIT:
        q = unpack_6bit(codes, d)
        scale = 64.0
    else:
        q = codes
        scale = 256.0
    return vmin + (q.astype(jnp.float32) + 0.5) / scale * vdiff


def sq_decode(codes: jnp.ndarray, codec: SQCodec) -> jnp.ndarray:
    vmin = (jnp.asarray(codec.vmin) if codec.vmin is not None
            else jnp.zeros((codec.d,), jnp.float32))
    vdiff = (jnp.asarray(codec.vdiff) if codec.vdiff is not None
             else jnp.ones((codec.d,), jnp.float32))
    return sq_dequant_codes(codes, codec.qtype, codec.d, vmin, vdiff)


# ---------------------------------------------------------------------------
# Layout-aligned byte tier: relayout-free row gather at capacity scale
# ---------------------------------------------------------------------------

LINE_BYTES = 1024  # one gather line: 8 sublanes x 128 lanes of u8


class AlignedByteTier:
    """Chip-resident byte-row store whose HBM layout IS the canonical
    u8 tiled layout, so a candidate-row gather inserts no relayout
    copy.

    Why it exists: passing a u8[n, row_bytes] array into a jitted
    gather makes XLA relayout the operand to its preferred tiled
    layout T(8,128)(4,1). The copy is materialized INSIDE the program:
    at n=100M, row_bytes=96 that is +11.9 GB of padded scratch on top
    of the 8.94 GB argument — 21.1 GB total, an OOM on a 16 GB chip
    (full XLA allocation dump: benchs/logs/r5_queue10.log). Storing
    the same bytes as u8[nlines, 1024] — both dims tile-aligned — the
    compact layout equals the tiled layout and the copy disappears;
    the 100M SQ8 refine tier then fits with ~4 GB of headroom.

    A row r's bytes live at flat offset row_bytes*r and span at most
    two lines (row_bytes <= 1024). Index math stays int32 for ANY
    n*row_bytes (n*row_bytes may exceed 2^31, e.g. 9.6e9 at 100M x 96)
    by factoring r through the row cycle: with g = gcd(row_bytes,
    1024) and P = 1024//g rows per cycle, each cycle advances exactly
    row_bytes//g lines, and the in-cycle byte offset row_bytes*(r%P)
    is < lcm(row_bytes, 1024) <= 2^20. Bit-exactness vs the naive
    u8[n, row_bytes] gather is asserted in tests/test_codecs.py and was
    re-proven on hardware at 1M (benchs/logs/r5_queue11.jsonl).

    Role parity: the chip-resident analog of the reference's refine
    storage in IndexRefine / offline_ivf's large-scale refine pass
    (faiss/IndexRefine.h:22, demos/offline_ivf/offline_ivf.py) at a
    scale where a naive device array cannot exist.
    """

    def __init__(self, lines: jnp.ndarray, n: int, row_bytes: int):
        if row_bytes > LINE_BYTES:
            raise ValueError(
                f"row_bytes={row_bytes} > {LINE_BYTES}: a row must "
                f"span <= 2 gather lines")
        self.lines = lines            # (nlines, 1024) u8 device array
        self.n = int(n)
        self.row_bytes = int(row_bytes)
        g = int(np.gcd(row_bytes, LINE_BYTES))
        self._cycle_rows = LINE_BYTES // g      # P
        self._cycle_lines = row_bytes // g      # lines per cycle

    @property
    def nbytes(self) -> int:
        return int(self.lines.shape[0]) * LINE_BYTES

    @classmethod
    def from_host(cls, x: np.ndarray) -> "AlignedByteTier":
        """Pack host u8 rows (n, row_bytes) — np.memmap accepted — into
        the aligned device tier. The tail is zero-padded so nlines is a
        multiple of 8 (sublane alignment => zero layout padding)."""
        if x.dtype != np.uint8 or x.ndim != 2:
            raise ValueError("expected u8 (n, row_bytes)")
        n, rb = x.shape
        total = n * rb
        unit = LINE_BYTES * 8
        padded = -(-total // unit) * unit
        if padded == total:
            flat = np.ascontiguousarray(x).reshape(-1)
        else:
            flat = np.zeros(padded, np.uint8)
            flat[:total] = np.ascontiguousarray(x).reshape(-1)
        lines = jnp.asarray(flat.reshape(-1, LINE_BYTES))
        return cls(lines, n, rb)

    def gather(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Relayout-free row gather: (...,) int32 row ids -> (...,
        row_bytes) u8. Jit-traceable; out-of-range/negative ids are
        clamped (callers mask them, as the IVF scan's padding does)."""
        rb, P, CL = self.row_bytes, self._cycle_rows, self._cycle_lines
        nlines = self.lines.shape[0]
        safe = jnp.clip(rows, 0, self.n - 1)
        q, m = safe // P, safe % P
        inb = rb * m                          # in-cycle byte offset
        line = q * CL + (inb // LINE_BYTES)
        off = inb % LINE_BYTES
        two = jnp.stack(
            [line, jnp.minimum(line + 1, nlines - 1)], axis=-1)
        g = self.lines[two].reshape(*safe.shape, 2 * LINE_BYTES)
        idx = off[..., None] + jnp.arange(rb, dtype=jnp.int32)
        return jnp.take_along_axis(g, idx, axis=-1)

    def reconstruct(self, rows: jnp.ndarray, codec: SQCodec) -> jnp.ndarray:
        """Gather + decode: row ids -> float32 (..., d) vectors."""
        return sq_decode(self.gather(rows), codec)
