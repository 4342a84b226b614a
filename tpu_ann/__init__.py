"""tpu_ann — a TPU-native ANN index-and-query engine (JAX/XLA/Pallas).

Built from scratch with the capability surface of the Quaternijkon/hnsw-ivf
reference (a Faiss 1.10.0 fork): exact Flat search, k-means/IVF, HNSW, the
HNSW-as-coarse-quantizer IVF hybrid, PQ/SQ codecs, on-disk storage, and
mesh-sharded distribution — re-designed for the MXU/HBM/ICI instead of
SIMD/OpenMP/RPC. See SURVEY.md for the full blueprint.
"""

import os as _os

# Persistent XLA compilation cache: TPU compiles are expensive (minutes
# per new jitted shape through a remote-compile path), and index
# builds/searches reuse a small set of shapes across runs. Opt out with
# TPU_ANN_NO_COMPILE_CACHE=1; relocate with TPU_ANN_COMPILE_CACHE=path.
if _os.environ.get("TPU_ANN_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _cache = _os.path.expanduser(
            _os.environ.get("TPU_ANN_COMPILE_CACHE",
                            "~/.cache/tpu_ann_xla"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        # threshold chosen so quick CPU-mesh test compiles stay out of
        # the cache (their AOT reload path warns about machine-feature
        # strings) while the expensive TPU compiles are captured
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           10.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

from .ops.distances import (  # noqa: F401
    METRIC_INNER_PRODUCT,
    METRIC_L2,
    knn,
    knn_inner_product,
    knn_l2sqr,
    pairwise_distances,
)
from .ops.extra_distances import (  # noqa: F401
    METRIC_ABS_INNER_PRODUCT,
    METRIC_BrayCurtis,
    METRIC_Canberra,
    METRIC_JensenShannon,
    METRIC_Jaccard,
    METRIC_L1,
    METRIC_Linf,
    METRIC_Lp,
    METRIC_NaNEuclidean,
    knn_extra_metrics,
    pairwise_extra_distances,
)
from .models.base import Index, SearchStats  # noqa: F401
from .models.flat import IndexFlat, IndexFlatIP, IndexFlatL2  # noqa: F401
from .models.flat import IndexFlat1D  # noqa: F401
from .models.hnsw import (  # noqa: F401
    IndexHNSW,
    IndexHNSW2Level,
    IndexHNSWFlat,
    IndexHNSWPQ,
    IndexHNSWSQ,
    SearchParametersHNSW,
)
from .models.ivf_paged import IndexIVFFlatPaged  # noqa: F401
from .models.nsg import (  # noqa: F401
    IndexNNDescentFlat,
    IndexNSGFlat,
    IndexNSGPQ,
    IndexNSGSQ,
)
from .models.ivf import (  # noqa: F401
    IndexIVF,
    IndexIVFFlat,
    SearchParametersIVF,
    make_ivf_flat,
)
from .models.ivf_hnsw import IndexIVFHNSW  # noqa: F401
from .models.ivf_pq import (  # noqa: F401
    IndexIVFPQ,
    IndexIVFPQR,
    IndexIVFScalarQuantizer,
    make_ivf_pq,
)
from .models.ivf_extra import (  # noqa: F401
    IndexIVFIndependentQuantizer,
    IndexIVFSpectralHash,
)
from .models.pq import IndexPQ, IndexScalarQuantizer  # noqa: F401
from .models.refine import IndexRefine, IndexRefineFlat  # noqa: F401
from .models.rq import (  # noqa: F401
    IndexAdditiveQuantizer,
    IndexIVFResidualQuantizer,
    IndexResidualQuantizer,
    LocalSearchCoarseQuantizer,
    ResidualCoarseQuantizer,
)
from .models.transforms import (  # noqa: F401
    IndexPreTransform,
    OPQMatrix,
    PCAMatrix,
    RandomRotationMatrix,
)
from .models.base import SearchParameters, indexIVF_stats  # noqa: F401
from .models.binary import (  # noqa: F401
    IndexBinaryFlat,
    IndexBinaryFromFloat,
    IndexBinaryHash,
    IndexBinaryHNSW,
    IndexBinaryIVF,
    IndexBinaryMultiHash,
)
from .models.extra import (  # noqa: F401
    Index2Layer,
    IndexLSH,
    IndexRowwiseMinMax,
    IndexSplitVectors,
    MultiIndexQuantizer,
)
from .models.qinco import (  # noqa: F401
    IndexNeuralNetCodec,
    IndexQINCo,
)
from .models.lattice import IndexLattice  # noqa: F401
from .models.idmap import (  # noqa: F401
    IndexIDMap,
    IndexIDMap2,
    IndexReplicas,
    IndexShards,
)
from .models.selectors import (  # noqa: F401
    IDSelectorAll,
    IDSelectorAnd,
    IDSelectorArray,
    IDSelectorBatch,
    IDSelectorBitmap,
    IDSelectorNot,
    IDSelectorOr,
    IDSelectorRange,
    IDSelectorXOr,
)
from .ops.kmeans import (  # noqa: F401
    ClusteringParameters,
    Kmeans,
    kmeans,
)
from .utils.autotune import (  # noqa: F401
    IntersectionCriterion,
    OneRecallAtRCriterion,
    OperatingPoints,
    ParameterSpace,
)
from .utils.factory import index_binary_factory, index_factory  # noqa: F401
from .utils.index_io import (  # noqa: F401
    deserialize_index,
    read_index,
    serialize_index,
    write_index,
)
from .utils.interrupt import InterruptCallback, TimeoutGuard  # noqa: F401

__version__ = "0.1.0"
