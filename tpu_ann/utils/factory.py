"""index_factory — spec-string index construction (faiss
`index_factory.cpp:193-901`).

Supported grammar (the subset covering every index family in this
framework; same spelling as the reference):

  prefixes:    PCA<d>, PCAR<d>, PCAW<d>, OPQ<M>, OPQ<M>_<d>, RR<d>,
               L2norm, IDMap
  containers:  Flat, PQ<M>[x<nbits>], SQ8, SQfp16, SQbf16, HNSW<M>[,Flat],
               IVF<nlist>,<code>  IVF<nlist>_HNSW<M>,<code>
               (code = Flat | PQ<M> | SQ8 | SQfp16 | SQbf16)
  suffixes:    RFlat, Refine(Flat)

Examples: "IVF4096,Flat", "IVF65536_HNSW32,PQ32", "OPQ16_64,IVF1024,PQ16",
"HNSW32", "PCA32,Flat", "IVF1024,SQ8,RFlat".
"""

from __future__ import annotations

import re
from typing import List, Optional

from ..ops import distances as D
from ..ops import sq as SQ
from ..models.base import Index
from ..models.flat import IndexFlat
from ..models.hnsw import IndexHNSWFlat
from ..models.idmap import IndexIDMap
from ..models.ivf import IndexIVFFlat
from ..models.ivf_hnsw import IndexIVFHNSW
from ..models.ivf_pq import IndexIVFPQ, IndexIVFScalarQuantizer
from ..models.pq import IndexPQ, IndexScalarQuantizer
from ..models.refine import IndexRefineFlat
from ..models.transforms import (
    IndexPreTransform,
    NormalizationTransform,
    OPQMatrix,
    PCAMatrix,
    RandomRotationMatrix,
    VectorTransform,
)

_SQ_TYPES = {"SQ8": SQ.QT_8BIT, "SQ6": SQ.QT_6BIT, "SQ4": SQ.QT_4BIT,
             "SQfp16": SQ.QT_FP16, "SQbf16": SQ.QT_BF16}


def _parse_transform(tok: str, d: int) -> Optional[VectorTransform]:
    if m := re.fullmatch(r"PCA(\d+)", tok):
        return PCAMatrix(d, int(m.group(1)))
    if m := re.fullmatch(r"PCAR(\d+)", tok):
        return PCAMatrix(d, int(m.group(1)), random_rotation=True)
    if m := re.fullmatch(r"PCAW(\d+)", tok):
        return PCAMatrix(d, int(m.group(1)), eigen_power=-0.5)
    if m := re.fullmatch(r"OPQ(\d+)_(\d+)", tok):
        return OPQMatrix(d, int(m.group(1)), int(m.group(2)))
    if m := re.fullmatch(r"OPQ(\d+)", tok):
        return OPQMatrix(d, int(m.group(1)))
    if m := re.fullmatch(r"RR(\d+)", tok):
        return RandomRotationMatrix(d, int(m.group(1)))
    if tok == "L2norm":
        return NormalizationTransform(d)
    return None


def _make_ivf(nlist: int, hnsw_m: int, code: str, d: int,
              metric: int) -> Index:
    if code == "Flat":
        if hnsw_m:
            idx = IndexIVFHNSW(d, nlist, metric, M=hnsw_m)
        else:
            idx = IndexIVFFlat(IndexFlat(d, metric), d, nlist, metric)
        return idx
    if code == "FlatDedup":
        from ..models.ivf import IndexIVFFlatDedup

        return IndexIVFFlatDedup(IndexFlat(d, metric), d, nlist, metric)
    quant: Index
    if hnsw_m:
        quant = IndexHNSWFlat(d, hnsw_m, metric)
    else:
        quant = IndexFlat(d, metric)
    if m := re.fullmatch(r"PQ(\d+)\+(\d+)", code):
        # "PQ8+16" = IVFPQR: base PQ8 + 16-subquantizer refinement PQ
        # (faiss index_factory.cpp IVFPQR spelling)
        from ..models.ivf_pq import IndexIVFPQR

        return IndexIVFPQR(quant, d, nlist, int(m.group(1)),
                           8, int(m.group(2)), 8, metric)
    if m := re.fullmatch(r"PQ(\d+)(?:x(\d+))?(?:fs(?:_\d+)?)?", code):
        # "PQ32x4fs" = 4-bit packed fast-scan layout (our packed codes
        # are block-native already; the _bbs suffix is accepted/ignored)
        return IndexIVFPQ(quant, d, nlist, int(m.group(1)),
                          int(m.group(2) or 8), metric)
    if code in _SQ_TYPES:
        return IndexIVFScalarQuantizer(quant, d, nlist, _SQ_TYPES[code],
                                       metric)
    if m := re.fullmatch(r"(RQ|LSQ)(\d+)x(\d+)", code):
        from ..models.rq import (
            IndexIVFLocalSearchQuantizer,
            IndexIVFResidualQuantizer,
        )

        cls = (IndexIVFResidualQuantizer if m.group(1) == "RQ"
               else IndexIVFLocalSearchQuantizer)
        return cls(quant, d, nlist, int(m.group(2)), int(m.group(3)),
                   metric)
    if m := re.fullmatch(r"(PRQ|PLSQ)(\d+)x(\d+)x(\d+)", code):
        from ..models.rq import (
            IndexIVFProductLocalSearchQuantizer,
            IndexIVFProductResidualQuantizer,
        )

        cls = (IndexIVFProductResidualQuantizer if m.group(1) == "PRQ"
               else IndexIVFProductLocalSearchQuantizer)
        return cls(quant, d, nlist, int(m.group(2)), int(m.group(3)),
                   int(m.group(4)), metric)
    raise ValueError(f"index_factory: bad IVF code {code!r}")


def index_factory(d: int, spec: str, metric: int = D.METRIC_L2) -> Index:
    """Build an index from a faiss-style factory string."""
    toks = [t for t in spec.split(",") if t]
    if not toks:
        raise ValueError("empty factory spec")

    # --- suffixes ---------------------------------------------------------
    refine_flat = False
    if toks and toks[-1] in ("RFlat", "Refine(Flat)"):
        refine_flat = True
        toks = toks[:-1]

    # --- prefixes (transforms + IDMap) ------------------------------------
    transforms: List[VectorTransform] = []
    idmap = False
    cur_d = d
    while toks:
        if toks[0] == "IDMap":
            idmap = True
            toks = toks[1:]
            continue
        vt = _parse_transform(toks[0], cur_d)
        if vt is None:
            break
        transforms.append(vt)
        cur_d = vt.d_out
        toks = toks[1:]
    if not toks:
        raise ValueError(f"index_factory({spec!r}): no index container")

    # --- container --------------------------------------------------------
    head = toks[0]
    rest = toks[1:]
    index: Index
    if m := re.fullmatch(r"IVF(\d+)(?:_HNSW(\d+))?", head):
        nlist = int(m.group(1))
        hnsw_m = int(m.group(2) or 0)
        code = rest[0] if rest else "Flat"
        rest = rest[1:] if rest else rest
        index = _make_ivf(nlist, hnsw_m, code, cur_d, metric)
    elif m := re.fullmatch(r"HNSW(\d+)?", head):
        # parse_IndexHNSW grammar (index_factory.cpp:443-490): storage
        # code after the comma — Flat | PQ<M>[x<nbits>] | SQ* | <n>+PQ<m>
        hm = int(m.group(1) or 32)
        code = rest[0] if rest else "Flat"
        if rest:
            rest = rest[1:]
        if code == "Flat":
            index = IndexHNSWFlat(cur_d, hm, metric)
        elif mm := re.fullmatch(r"PQ(\d+)(?:x(\d+))?", code):
            from ..models.hnsw import IndexHNSWPQ

            index = IndexHNSWPQ(cur_d, int(mm.group(1)), hm,
                                int(mm.group(2) or 8), metric)
        elif code in ("SQfp16", "SQbf16"):
            from ..models.hnsw import IndexHNSWSQ

            qt = {"SQfp16": "float16", "SQbf16": "bfloat16"}[code]
            index = IndexHNSWSQ(cur_d, qt, hm, metric)
        elif code == "SQ8":
            # 'SQ8' means 8-bit storage everywhere else in this factory;
            # IndexHNSWSQ only has 16-bit storage so far — refuse rather
            # than silently doubling the requested footprint
            raise ValueError(
                "HNSW,SQ8: int8 graph storage is not implemented yet — "
                "use HNSW<M>,SQfp16 / SQbf16 (16-bit) or HNSW<M>,PQ<m>")
        elif mm := re.fullmatch(r"(\d+)\+PQ(\d+)", code):
            from ..models.hnsw import IndexHNSW2Level

            index = IndexHNSW2Level(cur_d, int(mm.group(1)),
                                    int(mm.group(2)), hm, metric=metric)
        else:
            raise ValueError(f"index_factory: unknown HNSW storage "
                             f"{code!r}")
    elif head == "Flat":
        index = IndexFlat(cur_d, metric)
    elif m := re.fullmatch(r"PQ(\d+)(?:x(\d+))?(?:fs(?:_\d+)?)?", head):
        index = IndexPQ(cur_d, int(m.group(1)), int(m.group(2) or 8), metric)
    elif head in _SQ_TYPES:
        index = IndexScalarQuantizer(cur_d, _SQ_TYPES[head], metric)
    elif m := re.fullmatch(r"(RQ|LSQ)(\d+)x(\d+)", head):
        from ..models.rq import (
            IndexLocalSearchQuantizer,
            IndexResidualQuantizer,
        )

        cls = (IndexResidualQuantizer if m.group(1) == "RQ"
               else IndexLocalSearchQuantizer)
        index = cls(cur_d, int(m.group(2)), int(m.group(3)), metric)
    elif m := re.fullmatch(r"LSH(\d*)(r?)(t?)", head):
        # index_factory.cpp:545 "LSH[nbits][r][t]"
        from ..models.extra import IndexLSH

        nbits = int(m.group(1) or cur_d)
        nbits = -(-nbits // 8) * 8      # our LSH packs whole bytes
        index = IndexLSH(cur_d, nbits, rotate_data=bool(m.group(2)),
                         train_thresholds=bool(m.group(3)))
    elif m := re.fullmatch(r"ZnLattice(\d+)x(\d+)_(\d+)", head):
        # index_factory.cpp:554 "ZnLattice{nsq}x{r2}_{scale_nbit}"
        from ..models.lattice import IndexLattice

        index = IndexLattice(cur_d, nsq=int(m.group(1)),
                             scale_nbit=int(m.group(3)),
                             r2=int(m.group(2)), metric=metric)
    elif m := re.fullmatch(r"(PRQ|PLSQ)(\d+)x(\d+)x(\d+)", head):
        from ..models.rq import (
            IndexProductLocalSearchQuantizer,
            IndexProductResidualQuantizer,
        )

        cls = (IndexProductResidualQuantizer if m.group(1) == "PRQ"
               else IndexProductLocalSearchQuantizer)
        index = cls(cur_d, int(m.group(2)), int(m.group(3)),
                    int(m.group(4)), metric)
    else:
        raise ValueError(f"index_factory: unknown container {head!r}")
    if rest:
        raise ValueError(f"index_factory({spec!r}): trailing tokens {rest}")

    # --- wrap -------------------------------------------------------------
    if refine_flat:
        index = IndexRefineFlat(index)
    if transforms:
        index = IndexPreTransform(*transforms, index)
    if idmap:
        index = IndexIDMap(index)
    return index
