"""VectorTransform family + IndexPreTransform — faiss
`VectorTransform.{h,cpp}` (RandomRotation, PCAMatrix, OPQMatrix,
NormalizationTransform, CenteringTransform) and `IndexPreTransform.{h,cpp}`.

All linear transforms are a single (d_in -> d_out) matmul on the MXU; OPQ
training runs the alternating PQ-fit / Procrustes-rotation loop of
`OPQMatrix::train` (VectorTransform.cpp) with jnp SVD.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..ops import distances as D
from .base import Index


class VectorTransform:
    """Base: y = apply(x), d_in -> d_out."""

    def __init__(self, d_in: int, d_out: int):
        self.d_in, self.d_out = int(d_in), int(d_out)
        self.is_trained = False

    def train(self, x: np.ndarray) -> None:
        self.is_trained = True

    def apply(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def reverse_transform(self, y: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class LinearTransform(VectorTransform):
    """y = x @ A.T + b (faiss LinearTransform, row-major A (d_out, d_in))."""

    def __init__(self, d_in: int, d_out: int):
        super().__init__(d_in, d_out)
        self.A: Optional[np.ndarray] = None   # (d_out, d_in)
        self.b: Optional[np.ndarray] = None   # (d_out,)
        self.is_orthonormal = False

    def apply(self, x: np.ndarray) -> np.ndarray:
        y = np.ascontiguousarray(x, np.float32) @ self.A.T
        if self.b is not None:
            y = y + self.b
        return y.astype(np.float32)

    def reverse_transform(self, y: np.ndarray) -> np.ndarray:
        if not self.is_orthonormal:
            raise NotImplementedError("reverse only for orthonormal A")
        yy = np.ascontiguousarray(y, np.float32)
        if self.b is not None:
            yy = yy - self.b
        return (yy @ self.A).astype(np.float32)


class RandomRotationMatrix(LinearTransform):
    """Orthonormal random rotation (faiss RandomRotationMatrix)."""

    def __init__(self, d_in: int, d_out: int, seed: int = 1234):
        super().__init__(d_in, d_out)
        self.seed = seed

    def train(self, x: Optional[np.ndarray] = None) -> None:
        rs = np.random.RandomState(self.seed)
        # d_out > d_in embeds into the larger space then rotates there
        # (faiss RandomRotationMatrix::init with d_out > d_in)
        dd = max(self.d_in, self.d_out)
        g = rs.randn(dd, dd)
        q, _ = np.linalg.qr(g)                 # orthogonal (dd, dd)
        self.A = q.T[: self.d_out, : self.d_in].astype(np.float32)
        self.is_orthonormal = self.d_out <= self.d_in
        self.is_trained = True


class PCAMatrix(LinearTransform):
    """PCA with optional whitening / random rotation in PCA space
    (faiss PCAMatrix: eigen_power, random_rotation)."""

    def __init__(self, d_in: int, d_out: int, eigen_power: float = 0.0,
                 random_rotation: bool = False):
        super().__init__(d_in, d_out)
        self.eigen_power = float(eigen_power)
        self.random_rotation = bool(random_rotation)
        self.mean: Optional[np.ndarray] = None
        self.eigenvalues: Optional[np.ndarray] = None

    def train(self, x: np.ndarray) -> None:
        x = np.ascontiguousarray(x, np.float64)
        self.mean = x.mean(axis=0)
        xc = x - self.mean
        cov = xc.T @ xc / len(x)
        w, v = np.linalg.eigh(cov)             # ascending
        order = np.argsort(-w)
        w = np.maximum(w[order], 1e-12)
        v = v[:, order]                        # columns = PCs
        A = v[:, : self.d_out].T               # (d_out, d_in)
        if self.eigen_power != 0.0:
            # eigen_power=-0.5 -> whitening: scale component i by w_i^-0.5
            A = A * (w[: self.d_out, None] ** self.eigen_power)
        if self.random_rotation:
            rr = RandomRotationMatrix(self.d_out, self.d_out)
            rr.train()
            A = rr.A @ A
        self.A = A.astype(np.float32)
        self.b = (-(self.mean @ A.T)).astype(np.float32)
        self.eigenvalues = w.astype(np.float32)
        self.is_orthonormal = self.eigen_power == 0.0 and not self.random_rotation
        self.is_trained = True


class CenteringTransform(VectorTransform):
    """Subtract the mean (faiss CenteringTransform)."""

    def __init__(self, d: int):
        super().__init__(d, d)
        self.mean: Optional[np.ndarray] = None

    def train(self, x: np.ndarray) -> None:
        self.mean = np.ascontiguousarray(x, np.float32).mean(axis=0)
        self.is_trained = True

    def apply(self, x: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(x, np.float32) - self.mean

    def reverse_transform(self, y: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(y, np.float32) + self.mean


class NormalizationTransform(VectorTransform):
    """L_norm row normalization (faiss NormalizationTransform, norm=2)."""

    def __init__(self, d: int, norm: float = 2.0):
        super().__init__(d, d)
        self.norm = norm
        self.is_trained = True

    def apply(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        n = np.linalg.norm(x, ord=self.norm, axis=1, keepdims=True)
        return x / np.maximum(n, 1e-12)


class RemapDimensionsTransform(VectorTransform):
    """Remap/shuffle dimensions (faiss RemapDimensionsTransform): either a
    uniform spread of d_in over d_out (uniform=True) or first-d_out."""

    def __init__(self, d_in: int, d_out: int, uniform: bool = True):
        super().__init__(d_in, d_out)
        if uniform:
            self.map = (np.arange(d_out) * d_in // d_out).astype(np.int64)
        else:
            self.map = np.minimum(np.arange(d_out), d_in - 1).astype(np.int64)
        self.is_trained = True

    def apply(self, x: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(x, np.float32)[:, self.map]


class ITQMatrix(LinearTransform):
    """ITQ rotation (faiss ITQMatrix::train): alternate {binarize rotated
    data, Procrustes to the sign matrix} — the ITQ binary-hashing
    rotation of Gong & Lazebnik."""

    def __init__(self, d: int, niter: int = 50, seed: int = 1234):
        super().__init__(d, d)
        self.niter = niter
        self.seed = seed

    def train(self, x: np.ndarray) -> None:
        x = np.ascontiguousarray(x, np.float32)
        x = x - x.mean(axis=0)
        rs = np.random.RandomState(self.seed)
        g = rs.randn(self.d_in, self.d_in)
        q, _ = np.linalg.qr(g)
        R = q.astype(np.float32)
        for _ in range(self.niter):
            z = x @ R
            b = np.sign(z)
            b[b == 0] = 1
            u, _, vt = np.linalg.svd(b.T @ x, full_matrices=False)
            R = ((u @ vt).T).astype(np.float32)
        self.A = R.T
        self.is_orthonormal = True
        self.is_trained = True


class OPQMatrix(LinearTransform):
    """OPQ rotation (faiss OPQMatrix::train): alternate {fit PQ on rotated
    data, solve orthogonal Procrustes to the PQ reconstruction}."""

    def __init__(self, d_in: int, M: int, d_out: int = 0):
        d_out = d_out or d_in
        super().__init__(d_in, d_out)
        self.M = int(M)
        self.niter = 10       # faiss default 50; 10 is within noise for tests
        self.niter_pq = 4
        self.seed = 1234

    def train(self, x: np.ndarray) -> None:
        from ..ops.pq import pq_decode, pq_encode, train_pq
        import jax.numpy as jnp

        x = np.ascontiguousarray(x, np.float32)
        n, d = x.shape
        rs = np.random.RandomState(self.seed)
        # OPQMatrix caps its training set (faiss max_train_points =
        # 256*256); beyond the statistical argument, the rotation loop's
        # (n, M*256) encode matrix is ~50 GB at n=1.5M
        if n > 65536:
            x = x[rs.choice(n, 65536, replace=False)]
            n = 65536
        # init: random orthonormal (d_out, d_in)
        g = rs.randn(self.d_out, self.d_in)
        u, _, vt = np.linalg.svd(g, full_matrices=False)
        A = (u @ vt).astype(np.float32)
        for it in range(self.niter):
            xr = x @ A.T                                   # (n, d_out)
            codec = train_pq(xr, self.M, 8, niter=self.niter_pq,
                             seed=self.seed + it)
            cent = jnp.asarray(codec.centroids)
            codes = pq_encode(jnp.asarray(xr), cent)
            recon = np.asarray(pq_decode(codes, cent))     # (n, d_out)
            # Procrustes: min_R ||x R^T - recon||, R orthogonal
            mcov = recon.T @ x                             # (d_out, d_in)
            u, _, vt = np.linalg.svd(mcov, full_matrices=False)
            A = (u @ vt).astype(np.float32)
        self.A = A
        self.is_orthonormal = True
        self.is_trained = True


class IndexPreTransform(Index):
    """Chain of transforms before an index (faiss IndexPreTransform)."""

    def __init__(self, *args):
        # faiss allows (vt, index) or (index)
        chain: List[VectorTransform] = []
        index: Optional[Index] = None
        for a in args:
            if isinstance(a, VectorTransform):
                chain.append(a)
            else:
                index = a
        if index is None:
            raise ValueError("IndexPreTransform needs a sub-index")
        super().__init__(chain[0].d_in if chain else index.d,
                         index.metric_type)
        self.chain = chain
        self.index = index
        self.is_trained = all(t.is_trained for t in chain) and index.is_trained

    def prepend_transform(self, vt: VectorTransform) -> None:
        self.chain.insert(0, vt)
        self.d = vt.d_in

    def _apply_chain(self, x: np.ndarray) -> np.ndarray:
        for t in self.chain:
            x = t.apply(x)
        return x

    def train(self, x) -> None:
        x = self._check_input(x)
        for t in self.chain:
            if not t.is_trained:
                t.train(x)
            x = t.apply(x)
        self.index.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self.index.add(self._apply_chain(x))
        self.ntotal = self.index.ntotal

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        return self.index.search(self._apply_chain(x), k, params=params)

    def range_search(self, x, radius: float):
        """Transform then forward, radius unchanged — exactly the
        reference's behavior (faiss/IndexPreTransform.h:61: the radius is
        interpreted in the transformed space, so non-isometric chains
        shift its meaning there too)."""
        x = self._check_input(x)
        return self.index.range_search(self._apply_chain(x), radius)

    def reset(self) -> None:
        self.index.reset()
        self.ntotal = 0

    def reconstruct(self, key: int) -> np.ndarray:
        y = self.index.reconstruct(key)
        for t in reversed(self.chain):
            y = t.reverse_transform(y[None])[0]
        return y
