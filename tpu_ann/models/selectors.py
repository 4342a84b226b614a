"""ID selectors — faiss `impl/IDSelector.{h,cpp}`: search-time result
filters (`IDSelectorRange/Array/Batch/Bitmap/Not/And/Or/Xor`), passed via
`SearchParameters.sel` (faiss/Index.h:64-69).

On TPU every selector lowers to one uint8 bitmap over the id space, and
the filter is a single gather+mask fused into the distance kernel — the
per-candidate `is_member` virtual call of the reference becomes a
vectorized lookup. Graph (HNSW) searches apply the filter at result
extraction while traversal stays unfiltered, matching the reference's
traverse-all / emit-filtered behavior.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class IDSelector:
    """Base: subclasses implement is_member (host) and make_bitmap."""

    def is_member(self, i: int) -> bool:
        raise NotImplementedError

    def make_bitmap(self, n: int) -> np.ndarray:
        """(n,) uint8 allow-mask over internal ids [0, n)."""
        out = np.zeros(n, np.uint8)
        for i in range(n):
            out[i] = self.is_member(i)
        return out


class IDSelectorRange(IDSelector):
    """imin <= id < imax (IDSelectorRange)."""

    def __init__(self, imin: int, imax: int):
        self.imin, self.imax = int(imin), int(imax)

    def is_member(self, i: int) -> bool:
        return self.imin <= i < self.imax

    def make_bitmap(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.uint8)
        out[max(self.imin, 0) : max(min(self.imax, n), 0)] = 1
        return out


class IDSelectorArray(IDSelector):
    """Explicit id list (IDSelectorArray / IDSelectorBatch)."""

    def __init__(self, ids: Sequence[int]):
        self.ids = np.asarray(ids, np.int64)

    def is_member(self, i: int) -> bool:
        return bool((self.ids == i).any())

    def make_bitmap(self, n: int) -> np.ndarray:
        out = np.zeros(n, np.uint8)
        sel = self.ids[(self.ids >= 0) & (self.ids < n)]
        out[sel] = 1
        return out


IDSelectorBatch = IDSelectorArray


class IDSelectorBitmap(IDSelector):
    """Bit-packed selector (IDSelectorBitmap: byte i>>3, bit i&7)."""

    def __init__(self, bitmap: np.ndarray):
        self.bitmap = np.asarray(bitmap, np.uint8)

    def is_member(self, i: int) -> bool:
        return bool((self.bitmap[i >> 3] >> (i & 7)) & 1)

    def make_bitmap(self, n: int) -> np.ndarray:
        idx = np.arange(n)
        return ((self.bitmap[idx >> 3] >> (idx & 7)) & 1).astype(np.uint8)


class IDSelectorAll(IDSelector):
    def is_member(self, i: int) -> bool:
        return True

    def make_bitmap(self, n: int) -> np.ndarray:
        return np.ones(n, np.uint8)


class IDSelectorNot(IDSelector):
    def __init__(self, sel: IDSelector):
        self.sel = sel

    def is_member(self, i: int) -> bool:
        return not self.sel.is_member(i)

    def make_bitmap(self, n: int) -> np.ndarray:
        return (1 - self.sel.make_bitmap(n)).astype(np.uint8)


class IDSelectorAnd(IDSelector):
    def __init__(self, lhs: IDSelector, rhs: IDSelector):
        self.lhs, self.rhs = lhs, rhs

    def is_member(self, i: int) -> bool:
        return self.lhs.is_member(i) and self.rhs.is_member(i)

    def make_bitmap(self, n: int) -> np.ndarray:
        return (self.lhs.make_bitmap(n) & self.rhs.make_bitmap(n))


class IDSelectorOr(IDSelector):
    def __init__(self, lhs: IDSelector, rhs: IDSelector):
        self.lhs, self.rhs = lhs, rhs

    def is_member(self, i: int) -> bool:
        return self.lhs.is_member(i) or self.rhs.is_member(i)

    def make_bitmap(self, n: int) -> np.ndarray:
        return (self.lhs.make_bitmap(n) | self.rhs.make_bitmap(n))


class IDSelectorXOr(IDSelector):
    def __init__(self, lhs: IDSelector, rhs: IDSelector):
        self.lhs, self.rhs = lhs, rhs

    def is_member(self, i: int) -> bool:
        return self.lhs.is_member(i) != self.rhs.is_member(i)

    def make_bitmap(self, n: int) -> np.ndarray:
        return (self.lhs.make_bitmap(n) ^ self.rhs.make_bitmap(n))
