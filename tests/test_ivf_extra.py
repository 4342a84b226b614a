"""IndexIVFSpectralHash + IndexIVFIndependentQuantizer tests
(reference: tests/test_index_composite.py style recall floors)."""

import numpy as np
import pytest

from tpu_ann.models.flat import IndexFlat
from tpu_ann.models.ivf import IndexIVFFlat
from tpu_ann.models.ivf_extra import (
    THRESH_CENTROID,
    THRESH_MEDIAN,
    IndexIVFIndependentQuantizer,
    IndexIVFSpectralHash,
)
from tpu_ann.models.transforms import PCAMatrix
from tpu_ann.utils.evaluation import recall_at_r


@pytest.fixture(scope="module")
def ds():
    import tpu_ann.utils.datasets as ds_mod

    return ds_mod.SyntheticDataset(d=32, nt=4000, nb=6000, nq=100)


@pytest.mark.parametrize("tt", ["global", THRESH_CENTROID, THRESH_MEDIAN])
def test_ivf_spectral_hash_recall(ds, tt):
    idx = IndexIVFSpectralHash(IndexFlat(ds.d), ds.d, 32, nbit=128,
                               period=1e8 if tt == "global" else 6.0)
    idx.threshold_type = tt
    idx.cp.niter = 6
    idx.train(ds.get_train())
    idx.add(ds.get_database())
    idx.nprobe = 8
    D, I, st = idx.search_stats(ds.get_queries(), 10)
    gt = ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    # binary codes over random projections: modest floor, as in the
    # reference's own spectral-hash tests
    assert r > 0.25, f"spectral hash ({tt}) recall {r}"
    assert st.ndis > 0
    assert (np.diff(D, axis=1) >= -1e-6).all()   # Hamming ascending


def test_ivf_spectral_hash_code_size(ds):
    idx = IndexIVFSpectralHash(IndexFlat(ds.d), ds.d, 16, nbit=64)
    idx.cp.niter = 4
    idx.train(ds.get_train())
    idx.add(ds.get_database())
    assert idx.invlists.codes.shape[-1] == 64 // 8


def test_ivf_independent_quantizer(ds):
    """Coarse assignment in full d, payload encoded after PCA to d/2."""
    d = ds.d
    inner = IndexIVFFlat(IndexFlat(d // 2), d // 2, 32)
    inner.cp.niter = 6
    vt = PCAMatrix(d, d // 2)
    idx = IndexIVFIndependentQuantizer(IndexFlat(d), inner, vt)
    idx.train(ds.get_train())
    idx.add(ds.get_database())
    idx.nprobe = 16
    _, I = idx.search(ds.get_queries(), 10)
    # ground truth in the PCA space restricted to coarse-raw assignment:
    # just require decent recall vs full-d ground truth
    gt = ds.get_groundtruth(10)
    r = recall_at_r(I, gt, 10)
    assert r > 0.5, f"independent quantizer recall {r}"
    assert idx.ntotal == len(ds.get_database())
