"""Index types (L3 equivalent of faiss/*.h)."""

from .base import Index, SearchStats  # noqa: F401
from .flat import IndexFlat, IndexFlatIP, IndexFlatL2  # noqa: F401
from .flat import IndexFlat1D  # noqa: F401
from .hnsw import (  # noqa: F401
    IndexHNSW,
    IndexHNSW2Level,
    IndexHNSWFlat,
    IndexHNSWPQ,
    IndexHNSWSQ,
    SearchParametersHNSW,
)
from .ivf_paged import IndexIVFFlatPaged  # noqa: F401
from .nsg import (  # noqa: F401
    IndexNNDescentFlat,
    IndexNSGFlat,
    IndexNSGPQ,
    IndexNSGSQ,
)
from .ivf import (  # noqa: F401
    IndexIVF,
    IndexIVFFlat,
    IndexIVFFlatDedup,
    SearchParametersIVF,
    make_ivf_flat,
)
from .ivf_hnsw import IndexIVFHNSW  # noqa: F401
from .ivf_pq import (  # noqa: F401
    IndexIVFPQ,
    IndexIVFPQR,
    IndexIVFScalarQuantizer,
    make_ivf_pq,
)
from .pq import IndexPQ, IndexScalarQuantizer  # noqa: F401
from .refine import (  # noqa: F401
    IndexRefine,
    IndexRefineFlat,
    IndexRefineSQ8Tier,
)
from .rq import (  # noqa: F401
    AdditiveCoarseQuantizer,
    IndexAdditiveQuantizer,
    IndexIVFLocalSearchQuantizer,
    IndexIVFProductLocalSearchQuantizer,
    IndexIVFProductResidualQuantizer,
    IndexIVFResidualQuantizer,
    IndexLocalSearchQuantizer,
    IndexProductLocalSearchQuantizer,
    IndexProductResidualQuantizer,
    IndexResidualQuantizer,
    LocalSearchCoarseQuantizer,
    ResidualCoarseQuantizer,
)
from .binary import (  # noqa: F401
    IndexBinary,
    IndexBinaryFlat,
    IndexBinaryFromFloat,
    IndexBinaryHash,
    IndexBinaryHNSW,
    IndexBinaryIVF,
    IndexBinaryMultiHash,
)
from .extra import (  # noqa: F401
    Index2Layer,
    IndexLSH,
    IndexRandom,
    IndexRowwiseMinMax,
    IndexSplitVectors,
    MultiIndexQuantizer,
)
from .idmap import IndexIDMap, IndexIDMap2, IndexReplicas, IndexShards  # noqa: F401
from .selectors import (  # noqa: F401
    IDSelector,
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
from .transforms import (  # noqa: F401
    CenteringTransform,
    IndexPreTransform,
    LinearTransform,
    NormalizationTransform,
    OPQMatrix,
    PCAMatrix,
    RandomRotationMatrix,
    VectorTransform,
)
