"""Zn-sphere lattice codec (faiss/impl/lattice_Zn.{h,cpp}).

Quantizes a direction vector to the nearest point of the integer lattice
Z^dim restricted to the sphere ||c||^2 = r2, and enumeratively codes that
point into ceil(log2(nv)) bits, where nv is the exact number of lattice
points on the sphere.

Structure mirrors the reference:
  * "atoms" = non-increasing non-negative representatives of sphere
    points (lattice_Zn.cpp sphere_vertexes / ZnSphereSearch::search finds
    the best atom by dot product with the sorted |x| — which is the exact
    nearest sphere point);
  * a point factors as (atom, permutation of its entries, signs of its
    non-zeros), so nv = sum_atoms perms(atom) * 2^nnz(atom)
    (ZnSphereCodec::CodeSegment / Repeats combinatorics);
  * codes here use (offset[atom] + perm_rank * 2^nnz + sign_bits) with
    lexicographic multiset-permutation ranking — same code SIZE as the
    reference (nv is combinatorially fixed), not bit-identical ids.

All per-vector steps are vectorized across rows (numpy); the only loops
are over the dim positions of the unranking — the codec is host-side
metadata, exactly as in the reference (search-time decode of IndexLattice
runs blockwise on device via sa_decode + GEMM)."""

from __future__ import annotations

from math import comb
from typing import Dict, List, Tuple

import numpy as np


def sphere_atoms(dim: int, r2: int) -> np.ndarray:
    """All non-increasing sequences of non-negative ints with
    sum(x^2) == r2 (the sphere's canonical representatives)."""
    out: List[Tuple[int, ...]] = []

    def rec(prefix, remaining, maxv, slots):
        if remaining == 0:
            out.append(tuple(prefix + [0] * slots))
            return
        if slots == 0:
            return
        v = min(int(np.sqrt(remaining)), maxv)
        for val in range(v, 0, -1):
            rec(prefix + [val], remaining - val * val, val, slots - 1)

    rec([], r2, int(np.sqrt(r2)), dim)
    if not out:
        raise ValueError(f"no Z^{dim} points with squared norm {r2}")
    return np.array(out, np.int64)


def _perm_count(atom: np.ndarray) -> int:
    """Number of distinct permutations of the multiset `atom`."""
    n = len(atom)
    total = 1
    remaining = n
    for v in np.unique(atom):
        c = int((atom == v).sum())
        total *= comb(remaining, c)
        remaining -= c
    return total


class ZnSphereCodec:
    """ZnSphereSearch + enumerative codec (lattice_Zn.h:25-137)."""

    def __init__(self, dim: int, r2: int):
        self.dim = int(dim)
        self.r2 = int(r2)
        self.atoms = sphere_atoms(dim, r2)                  # (na, dim)
        self.natom = len(self.atoms)
        self.nnz = (self.atoms > 0).sum(1).astype(np.int64)
        self.perms = np.array([_perm_count(a) for a in self.atoms],
                              np.object_)
        sizes = [int(p) << int(z)
                 for p, z in zip(self.perms, self.nnz)]
        self.offsets = np.zeros(self.natom + 1, np.object_)
        for i, s in enumerate(sizes):
            self.offsets[i + 1] = self.offsets[i] + s
        self.nv = int(self.offsets[-1])
        self.nbits = max(int(self.nv - 1).bit_length(), 1)
        self._atom_index: Dict[Tuple[int, ...], int] = {
            tuple(int(v) for v in a): i for i, a in enumerate(self.atoms)}
        self._atoms_f = self.atoms.astype(np.float32)

    # --- nearest sphere point (ZnSphereSearch::search) -------------------
    def search(self, x: np.ndarray) -> np.ndarray:
        """x: (n, dim) float -> (n, dim) int lattice points on the
        sphere; nearest in L2 (equivalently max dot with ||c|| fixed)."""
        x = np.asarray(x, np.float32)
        ax = np.abs(x)
        order = np.argsort(-ax, axis=1, kind="stable")
        xs = np.take_along_axis(ax, order, axis=1)          # sorted desc
        best = np.argmax(xs @ self._atoms_f.T, axis=1)      # (n,)
        c_sorted = self.atoms[best]                         # (n, dim)
        c = np.zeros_like(c_sorted)
        np.put_along_axis(c, order, c_sorted, axis=1)
        sign = np.where(x < 0, -1, 1).astype(np.int64)
        return c * sign

    # --- multiset permutation (un)ranking --------------------------------
    def _rank_perm(self, mag: np.ndarray, atom_id: np.ndarray) -> np.ndarray:
        """Lexicographic rank of each row of |c| among the distinct
        permutations of its atom multiset. Vectorized across rows; loops
        over dim positions. Returns object-dtype ints (can exceed 64-bit
        for large dims)."""
        n, dim = mag.shape
        rank = np.array([0] * n, np.object_)
        # remaining value counts per row (values bounded by sqrt(r2))
        vmax = int(np.sqrt(self.r2)) + 1
        counts = np.zeros((n, vmax), np.int64)
        for v in range(vmax):
            counts[:, v] = (mag == v).sum(1)
        for pos in range(dim):
            rem = dim - pos
            cur = mag[:, pos]
            # perms of remaining slots with value v removed, for v < cur
            for v in range(vmax):
                take = (counts[:, v] > 0) & (v < cur)
                if not take.any():
                    continue
                idx = np.nonzero(take)[0]
                for i in idx:
                    c2 = counts[i].copy()
                    c2[v] -= 1
                    rank[i] += _perms_of_counts(c2, rem - 1)
            counts[np.arange(n), cur] -= 1
        return rank

    def _unrank_perm(self, rank: np.ndarray, atom: np.ndarray) -> np.ndarray:
        """Inverse of _rank_perm for a batch of rows (object ranks)."""
        n = len(rank)
        dim = self.dim
        vmax = int(np.sqrt(self.r2)) + 1
        out = np.zeros((n, dim), np.int64)
        counts = np.zeros((n, vmax), np.int64)
        for v in range(vmax):
            counts[:, v] = (atom == v).sum(1)
        rank = rank.copy()
        for pos in range(dim):
            rem = dim - pos
            for i in range(n):
                for v in range(vmax):
                    if counts[i, v] == 0:
                        continue
                    c2 = counts[i].copy()
                    c2[v] -= 1
                    block = _perms_of_counts(c2, rem - 1)
                    if rank[i] < block:
                        out[i, pos] = v
                        counts[i, v] -= 1
                        break
                    rank[i] -= block
        return out

    # --- enumerative encode/decode (EnumeratedVectors API) ---------------
    def encode(self, c: np.ndarray) -> np.ndarray:
        """(n, dim) lattice points -> uint64 ids < nv."""
        c = np.asarray(c, np.int64)
        mag = np.abs(c)
        smag = -np.sort(-mag, axis=1)
        atom_id = np.array(
            [self._atom_index[tuple(int(v) for v in row)] for row in smag],
            np.int64)
        pr = self._rank_perm(mag, atom_id)
        # sign bits over nonzero entries, in position order
        codes = np.zeros(len(c), np.object_)
        for i in range(len(c)):
            nz = np.nonzero(mag[i])[0]
            bits = 0
            for j, p in enumerate(nz):
                if c[i, p] < 0:
                    bits |= 1 << j
            codes[i] = (int(self.offsets[atom_id[i]])
                        + int(pr[i]) * (1 << len(nz)) + bits)
        return codes.astype(np.uint64)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        codes = np.asarray(codes, np.uint64)
        n = len(codes)
        offs = np.array([int(o) for o in self.offsets[1:]], np.object_)
        atom_id = np.array(
            [int(np.searchsorted(offs, int(cd), side="right"))
             for cd in codes], np.int64)
        atoms = self.atoms[atom_id]
        res = np.array([int(cd) - int(self.offsets[a])
                        for cd, a in zip(codes, atom_id)], np.object_)
        nnz = self.nnz[atom_id]
        signs = np.array([r & ((1 << int(z)) - 1)
                          for r, z in zip(res, nnz)], np.object_)
        pr = np.array([r >> int(z) for r, z in zip(res, nnz)], np.object_)
        mag = self._unrank_perm(pr, atoms)
        out = mag.copy()
        for i in range(n):
            nz = np.nonzero(mag[i])[0]
            for j, p in enumerate(nz):
                if (int(signs[i]) >> j) & 1:
                    out[i, p] = -out[i, p]
        return out


class ZnSphereCodecRec:
    """Recursive sphere codec for power-of-2 dims
    (faiss ZnSphereCodecRec, lattice_Zn.h:116-143): enumerates the
    Z^dim sphere by splitting the coordinates in halves — a point c
    factors as (r2 split, left half code, right half code) with
    nv(ld, r2) = sum_s nv(ld-1, s) * nv(ld-1, r2-s). Codes are the same
    SIZE as ZnSphereCodec's (nv is combinatorially fixed) but not
    bit-compatible with it — true of the reference too ("The codes are
    *not* compatible with the ones of ZnSphereCodec").

    Unlike ZnSphereCodec, decode cost is O(dim) table lookups per level
    with no multiset unranking — the point of the recursive scheme."""

    def __init__(self, dim: int, r2: int):
        if dim & (dim - 1) or dim <= 0:
            raise ValueError("ZnSphereCodecRec requires a power-of-2 dim")
        self.dim = int(dim)
        self.r2 = int(r2)
        self.log2_dim = dim.bit_length() - 1
        # all_nv[ld][s] = #points of Z^(2^ld) with squared norm exactly s
        L = self.log2_dim
        nv = [[0] * (r2 + 1) for _ in range(L + 1)]
        for s in range(r2 + 1):
            r = int(np.sqrt(s))
            nv[0][s] = 1 if s == 0 else (2 if r * r == s else 0)
        for ld in range(1, L + 1):
            for s in range(r2 + 1):
                nv[ld][s] = sum(nv[ld - 1][a] * nv[ld - 1][s - a]
                                for a in range(s + 1))
        self.all_nv = nv
        self.nv = int(nv[L][r2])
        if self.nv == 0:
            raise ValueError(f"no Z^{dim} points with squared norm {r2}")
        self.nbits = max(int(self.nv - 1).bit_length(), 1)
        self.code_size = -(-self.nbits // 8)

    def get_nv(self, ld: int, r2a: int) -> int:
        if r2a < 0 or r2a > self.r2:
            return 0
        return self.all_nv[ld][r2a]

    # --- encode ----------------------------------------------------------
    def _encode_rec(self, c: np.ndarray, ld: int, r2a: int) -> int:
        if ld == 0:
            v = int(c[0])
            if v * v != r2a:
                raise ValueError("not a sphere point at this radius")
            return 0 if v >= 0 else 1
        half = 1 << (ld - 1)
        a, b = c[:half], c[half:]
        ra = int((a.astype(np.int64) ** 2).sum())
        rb = r2a - ra
        off = sum(self.get_nv(ld - 1, s) * self.get_nv(ld - 1, r2a - s)
                  for s in range(ra))
        ca = self._encode_rec(a, ld - 1, ra)
        cb = self._encode_rec(b, ld - 1, rb)
        return off + ca * self.get_nv(ld - 1, rb) + cb

    def encode_centroid(self, c: np.ndarray) -> np.ndarray:
        """(n, dim) exact sphere points -> uint64 ids < nv."""
        c = np.atleast_2d(np.asarray(c, np.int64))
        return np.array(
            [self._encode_rec(row, self.log2_dim, self.r2) for row in c],
            np.uint64)

    encode = encode_centroid

    # --- decode ----------------------------------------------------------
    def _decode_rec(self, code: int, ld: int, r2a: int,
                    out: np.ndarray) -> None:
        if ld == 0:
            r = int(np.sqrt(r2a))
            out[0] = -r if code else r
            return
        half = 1 << (ld - 1)
        ra = 0
        while True:
            blk = self.get_nv(ld - 1, ra) * self.get_nv(ld - 1, r2a - ra)
            if code < blk:
                break
            code -= blk
            ra += 1
        rb = r2a - ra
        nb = self.get_nv(ld - 1, rb)
        self._decode_rec(code // nb, ld - 1, ra, out[:half])
        self._decode_rec(code % nb, ld - 1, rb, out[half:])

    def decode(self, codes: np.ndarray) -> np.ndarray:
        codes = np.atleast_1d(np.asarray(codes, np.uint64))
        out = np.zeros((len(codes), self.dim), np.int64)
        for i, cd in enumerate(codes):
            self._decode_rec(int(cd), self.log2_dim, self.r2, out[i])
        return out


class ZnSphereCodecAlt(ZnSphereCodec):
    """faiss ZnSphereCodecAlt (lattice_Zn.h:145+): uses the recursive
    codec when dim is a power of 2, the permutation codec otherwise.
    encode() accepts arbitrary vectors (nearest sphere point first)."""

    def __init__(self, dim: int, r2: int):
        super().__init__(dim, r2)
        self.use_rec = dim & (dim - 1) == 0
        self.znc_rec = ZnSphereCodecRec(dim, r2) if self.use_rec else None

    def encode(self, x: np.ndarray) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x))
        if np.issubdtype(x.dtype, np.floating):
            c = self.search(x)
        else:
            c = x.astype(np.int64)
        if self.use_rec:
            return self.znc_rec.encode_centroid(c)
        return super().encode(c)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        if self.use_rec:
            return self.znc_rec.decode(codes)
        return super().decode(codes)


_PERM_CACHE: Dict[Tuple[Tuple[int, ...], int], int] = {}


def _perms_of_counts(counts: np.ndarray, slots: int) -> int:
    """Distinct arrangements of the multiset described by `counts` into
    `slots` positions (sum(counts) == slots assumed)."""
    key = (tuple(int(c) for c in counts), slots)
    v = _PERM_CACHE.get(key)
    if v is not None:
        return v
    total = 1
    rem = slots
    for c in counts:
        if c:
            total *= comb(rem, int(c))
            rem -= int(c)
    _PERM_CACHE[key] = total
    return total
