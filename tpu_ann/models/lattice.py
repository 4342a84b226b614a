"""IndexLattice — vector codec from per-subvector Zn-sphere lattice
quantizers (faiss/IndexLattice.{h,cpp}).

Each d/nsq-dim subvector is coded as (norm scale in `scale_nbit` bits,
uniform in the trained [min,max] norm range) + (direction as the nearest
Zn-sphere lattice point, enumeratively coded — ops/lattice.py). Search
reuses the blockwise decode + GEMM k-NN of IndexNeuralNetCodec
(IndexFlatCodes::search semantics)."""

from __future__ import annotations

import numpy as np

from ..ops import distances as D
from ..ops.lattice import ZnSphereCodec
from .qinco import IndexNeuralNetCodec


class IndexLattice(IndexNeuralNetCodec):
    """faiss IndexLattice(d, nsq, scale_nbit, r2)."""

    def __init__(self, d: int, nsq: int, scale_nbit: int, r2: int,
                 metric: int = D.METRIC_L2):
        if d % nsq:
            raise ValueError("d must be a multiple of nsq")
        self.nsq = int(nsq)
        self.dsq = d // nsq
        self.scale_nbit = int(scale_nbit)
        self.zn = ZnSphereCodec(self.dsq, int(r2))
        self.lattice_nbit = self.zn.nbits
        # per-subvector code = scale + lattice id, uniform width
        super().__init__(d, M=nsq, nbits=self.scale_nbit + self.lattice_nbit,
                         metric=metric)
        self.trained = None        # (2, nsq): mins / maxs of subnorms
        self.is_trained = False

    # --- training (IndexLattice::train: per-subvector norm range) --------
    def train(self, x) -> None:
        x = self._check_input(x)
        sub = x.reshape(len(x), self.nsq, self.dsq)
        norms = np.sqrt((sub.astype(np.float64) ** 2).sum(-1))
        self.trained = np.stack([norms.min(0), norms.max(0)]).astype(
            np.float32)
        self.is_trained = True

    # --- codec (IndexLattice::sa_encode/sa_decode) ------------------------
    def net_encode(self, x: np.ndarray) -> np.ndarray:
        if not self.is_trained:
            raise RuntimeError("train first")
        n = len(x)
        sub = x.reshape(n, self.nsq, self.dsq)
        norms = np.sqrt((sub.astype(np.float64) ** 2).sum(-1)).astype(
            np.float32)
        mins, maxs = self.trained
        sc = 1 << self.scale_nbit
        span = np.maximum(maxs - mins, 1e-10)
        q = np.clip(((norms - mins) * sc / span).astype(np.int64), 0,
                    sc - 1)                              # (n, nsq)
        codes = np.zeros((n, self.nsq), np.uint64)
        for j in range(self.nsq):
            c = self.zn.search(sub[:, j, :])
            lat = self.zn.encode(c)
            codes[:, j] = (lat << np.uint64(self.scale_nbit)) | \
                q[:, j].astype(np.uint64)
        return codes

    def net_decode(self, codes: np.ndarray) -> np.ndarray:
        codes = np.asarray(codes, np.uint64)
        n = len(codes)
        mins, maxs = self.trained
        sc = float(1 << self.scale_nbit)
        r = np.sqrt(float(self.zn.r2))
        out = np.zeros((n, self.nsq, self.dsq), np.float32)
        mask = np.uint64((1 << self.scale_nbit) - 1)
        for j in range(self.nsq):
            qj = (codes[:, j] & mask).astype(np.float64)
            lat = codes[:, j] >> np.uint64(self.scale_nbit)
            c = self.zn.decode(lat).astype(np.float32)
            norm = ((qj + 0.5) * (maxs[j] - mins[j]) / sc + mins[j]) / r
            out[:, j, :] = c * norm[:, None].astype(np.float32)
        return out.reshape(n, self.d)

    # sa_encode/sa_decode come from IndexNeuralNetCodec: pack_codes /
    # unpack_codes already handle >31-bit-wide codes (uint64), and
    # net_decode re-casts to uint64 itself.
