"""index_factory — spec-string index construction (faiss
`index_factory.cpp:193-901`).

Supported grammar (the subset covering every index family in this
framework; same spelling as the reference):

  prefixes:    PCA<d>, PCAR<d>, PCAW<d>, OPQ<M>, OPQ<M>_<d>, RR<d>,
               L2norm, IDMap
  containers:  Flat, PQ<M>[x<nbits>], SQ8, SQfp16, SQbf16, HNSW<M>[,Flat],
               IVF<nlist>,<code>  IVF<nlist>_HNSW<M>,<code>
               IVF<nlist>(RCQ<M>x<b> | LSCQ<M>x<b>),<code>
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


def _make_coarse(spec: str, d: int, nlist: int, metric: int):
    """Parenthesized coarse quantizer (index_factory.cpp coarse grammar):
    RCQ{M}x{b} / LSCQ{M}x{b} — additive virtual-centroid quantizers whose
    ksub^M must equal nlist."""
    m = re.fullmatch(r"(RCQ|LSCQ)(\d+)x(\d+)", spec)
    if not m:
        raise ValueError(f"index_factory: bad coarse quantizer {spec!r}")
    from ..models.rq import (LocalSearchCoarseQuantizer,
                             ResidualCoarseQuantizer)

    cls = (ResidualCoarseQuantizer if m.group(1) == "RCQ"
           else LocalSearchCoarseQuantizer)
    M, b = int(m.group(2)), int(m.group(3))
    if (1 << (M * b)) != nlist:
        raise ValueError(
            f"index_factory: {spec} yields {1 << (M * b)} centroids, "
            f"but nlist={nlist}")
    return cls(d, M, b, metric)


def _make_ivf(nlist: int, hnsw_m: int, code: str, d: int,
              metric: int, coarse: str = "") -> Index:
    if code == "Flat":
        if hnsw_m:
            idx = IndexIVFHNSW(d, nlist, metric, M=hnsw_m)
        elif coarse:
            idx = IndexIVFFlat(_make_coarse(coarse, d, nlist, metric), d,
                               nlist, metric)
            idx.quantizer_trains_alone = 1
        else:
            idx = IndexIVFFlat(IndexFlat(d, metric), d, nlist, metric)
        return idx
    if code == "FlatDedup":
        from ..models.ivf import IndexIVFFlatDedup

        return IndexIVFFlatDedup(IndexFlat(d, metric), d, nlist, metric)
    quant: Index
    qta = 0
    if hnsw_m:
        quant = IndexHNSWFlat(d, hnsw_m, metric)
    elif coarse:
        quant = _make_coarse(coarse, d, nlist, metric)
        qta = 1
    else:
        quant = IndexFlat(d, metric)
    def _qta(idx):
        if qta:
            idx.quantizer_trains_alone = 1
        return idx

    if m := re.fullmatch(r"PQ(\d+)\+(\d+)", code):
        # "PQ8+16" = IVFPQR: base PQ8 + 16-subquantizer refinement PQ
        # (faiss index_factory.cpp IVFPQR spelling)
        from ..models.ivf_pq import IndexIVFPQR

        return _qta(IndexIVFPQR(quant, d, nlist, int(m.group(1)),
                                8, int(m.group(2)), 8, metric))
    if m := re.fullmatch(r"PQ(\d+)(?:x(\d+))?(?:fs(?:_\d+)?|np)?", code):
        # "PQ32x4fs" = 4-bit packed fast-scan layout (our packed codes
        # are block-native already; the _bbs suffix is accepted/ignored).
        # "PQ8np" = no polysemous training (index_factory.cpp) — our
        # IndexIVFPQ never polysemous-trains, so np maps to the default.
        return _qta(IndexIVFPQ(quant, d, nlist, int(m.group(1)),
                               int(m.group(2) or 8), metric))
    if code in _SQ_TYPES:
        return _qta(IndexIVFScalarQuantizer(quant, d, nlist,
                                            _SQ_TYPES[code], metric))
    if m := re.fullmatch(r"(RQ|LSQ)(\d+)x(\d+)(?:fs(?:_\d+)?)?", code):
        from ..models.rq import (
            IndexIVFLocalSearchQuantizer,
            IndexIVFResidualQuantizer,
        )

        cls = (IndexIVFResidualQuantizer if m.group(1) == "RQ"
               else IndexIVFLocalSearchQuantizer)
        return _qta(cls(quant, d, nlist, int(m.group(2)), int(m.group(3)),
                        metric))
    if m := re.fullmatch(r"(PRQ|PLSQ)(\d+)x(\d+)x(\d+)", code):
        from ..models.rq import (
            IndexIVFProductLocalSearchQuantizer,
            IndexIVFProductResidualQuantizer,
        )

        cls = (IndexIVFProductResidualQuantizer if m.group(1) == "PRQ"
               else IndexIVFProductLocalSearchQuantizer)
        return _qta(cls(quant, d, nlist, int(m.group(2)), int(m.group(3)),
                        int(m.group(4)), metric))
    raise ValueError(f"index_factory: bad IVF code {code!r}")


def index_factory(d: int, spec: str, metric: int = D.METRIC_L2) -> Index:
    """Build an index from a faiss-style factory string."""
    toks = [t for t in spec.split(",") if t]
    if not toks:
        raise ValueError("empty factory spec")

    # --- suffixes ---------------------------------------------------------
    refine_flat = False
    refine_sq8t = False
    if toks and toks[-1] in ("RFlat", "Refine(Flat)"):
        refine_flat = True
        toks = toks[:-1]
    elif toks and toks[-1] in ("RSQ8t", "Refine(SQ8Tier)"):
        # capacity-scale re-rank against a chip-resident SQ8 tier in
        # the relayout-free AlignedByteTier layout (models/refine.py)
        refine_sq8t = True
        toks = toks[:-1]

    # --- prefixes (transforms + IDMap) ------------------------------------
    transforms: List[VectorTransform] = []
    idmap = 0                # 0 none / 1 IDMap / 2 IDMap2
    cur_d = d
    while toks:
        if toks[0] in ("IDMap", "IDMap2"):
            idmap = 2 if toks[0] == "IDMap2" else 1
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
    if m := re.fullmatch(r"IVF(\d+)(?:_HNSW(\d+))?(?:\(([^)]+)\))?", head):
        nlist = int(m.group(1))
        hnsw_m = int(m.group(2) or 0)
        coarse = m.group(3) or ""
        code = rest[0] if rest else "Flat"
        rest = rest[1:] if rest else rest
        index = _make_ivf(nlist, hnsw_m, code, cur_d, metric,
                          coarse=coarse)
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
            from ..models.hnsw import IndexHNSWSQ

            index = IndexHNSWSQ(cur_d, "sq8", hm, metric)
        elif mm := re.fullmatch(r"(\d+)\+PQ(\d+)", code):
            from ..models.hnsw import IndexHNSW2Level

            index = IndexHNSW2Level(cur_d, int(mm.group(1)),
                                    int(mm.group(2)), hm, metric=metric)
        else:
            raise ValueError(f"index_factory: unknown HNSW storage "
                             f"{code!r}")
    elif m := re.fullmatch(r"NSG(\d+)?", head):
        # parse_IndexNSG grammar (index_factory.cpp:492-516): storage
        # code after the comma — Flat | PQ<m>[x<nbits>] | SQ*
        from ..models.nsg import IndexNSGFlat, IndexNSGPQ, IndexNSGSQ

        R = int(m.group(1) or 32)
        code = rest[0] if rest else "Flat"
        if rest:
            rest = rest[1:]
        if code == "Flat":
            index = IndexNSGFlat(cur_d, R, metric)
        elif mm := re.fullmatch(r"PQ(\d+)(?:x(\d+))?", code):
            index = IndexNSGPQ(cur_d, int(mm.group(1)), R,
                               int(mm.group(2) or 8), metric)
        elif code in _SQ_TYPES:
            index = IndexNSGSQ(cur_d, _SQ_TYPES[code], R, metric)
        else:
            raise ValueError(f"index_factory: unknown NSG storage "
                             f"{code!r}")
    elif head == "Flat":
        index = IndexFlat(cur_d, metric)
    elif m := re.fullmatch(r"PQ(\d+)(?:x(\d+))?(?:fs(?:_\d+)?|np)?", head):
        # np = no polysemous training (our IndexPQ default already)
        index = IndexPQ(cur_d, int(m.group(1)), int(m.group(2) or 8), metric)
    elif head in _SQ_TYPES:
        index = IndexScalarQuantizer(cur_d, _SQ_TYPES[head], metric)
    elif m := re.fullmatch(r"(RQ|LSQ)(\d+)x(\d+)(?:fs(?:_\d+)?)?", head):
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
    if refine_sq8t:
        from ..models.refine import IndexRefineSQ8Tier

        index = IndexRefineSQ8Tier(index)
    if transforms:
        index = IndexPreTransform(*transforms, index)
    if idmap:
        from ..models.idmap import IndexIDMap2

        index = (IndexIDMap2 if idmap == 2 else IndexIDMap)(index)
    return index


# ---------------------------------------------------------------------------
# factory tools (contrib/factory_tools.py role): reverse-engineer the
# factory string / per-vector storage from an index or spec.
# ---------------------------------------------------------------------------

_SQ_NAMES = {v: k for k, v in _SQ_TYPES.items()}


def index_binary_factory(d: int, spec: str):
    """Binary index factory (index_factory.cpp:907-944
    ``index_binary_factory``): BFlat / BIVF{n} / BIVF{n}_HNSW{M} /
    BHNSW{M} / BHash{b} / BHash{nhash}x{b}."""
    import re

    from ..models.binary import (IndexBinaryFlat, IndexBinaryHash,
                                 IndexBinaryHNSW, IndexBinaryIVF,
                                 IndexBinaryMultiHash)

    m = re.fullmatch(r"BIVF(\d+)_HNSW(\d+)", spec)
    if m:
        return IndexBinaryIVF(IndexBinaryHNSW(d, int(m.group(2))), d,
                              int(m.group(1)))
    m = re.fullmatch(r"BIVF(\d+)", spec)
    if m:
        return IndexBinaryIVF(IndexBinaryFlat(d), d, int(m.group(1)))
    m = re.fullmatch(r"BHNSW(\d+)", spec)
    if m:
        return IndexBinaryHNSW(d, int(m.group(1)))
    m = re.fullmatch(r"BHash(\d+)x(\d+)", spec)
    if m:
        return IndexBinaryMultiHash(d, int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"BHash(\d+)", spec)
    if m:
        return IndexBinaryHash(d, int(m.group(1)))
    if spec == "BFlat":
        return IndexBinaryFlat(d)
    raise ValueError(f"description {spec!r} did not generate a binary index")


def get_code_size(d: int, spec: str) -> int:
    """Per-vector storage bytes implied by a factory string
    (contrib/factory_tools.py:get_code_size role; own grammar walk)."""
    toks = [t for t in spec.split(",") if t]
    if not toks:
        raise ValueError("empty factory spec")
    size = 0
    if toks[-1] in ("RFlat", "Refine(Flat)"):
        toks = toks[:-1]
        size += 4 * d          # refine stores exact f32 vectors
    elif toks[-1] in ("RSQ8t", "Refine(SQ8Tier)"):
        toks = toks[:-1]
        size += d              # refine stores one SQ8 byte per dim
    cur_d = d
    while toks:
        tok = toks[0]
        if tok in ("IDMap", "IDMap2"):
            size += 8
            toks = toks[1:]
            continue
        if m := re.fullmatch(r"(?:PCA[RW]?|OPQ\d+_|RR)(\d+)", tok):
            cur_d = int(m.group(1))
            toks = toks[1:]
            continue
        if re.fullmatch(r"OPQ(\d+)|ITQ\d*|L2norm", tok):
            toks = toks[1:]
            continue
        break
    if not toks:
        raise ValueError(f"get_code_size({spec!r}): no container")
    head, rest = toks[0], toks[1:]
    if m := re.fullmatch(r"IVF(\d+)(?:_HNSW(\d+))?(?:\([^)]+\))?", head):
        code = rest[0] if rest else "Flat"
        return size + _code_bytes(cur_d, code)
    if m := re.fullmatch(r"HNSW(\d+)?", head):
        links = 4 * 2 * int(m.group(1) or 32)   # ~2M int32 level-0 edges
        code = rest[0] if rest else "Flat"
        return size + links + _code_bytes(cur_d, code)
    return size + _code_bytes(cur_d, head)


def _code_bytes(d: int, code: str) -> int:
    if code == "Flat":
        return 4 * d
    if code in _SQ_TYPES:
        bits = {"SQ8": 8, "SQ6": 6, "SQ4": 4,
                "SQfp16": 16, "SQbf16": 16}[code]
        return (d * bits + 7) // 8
    def _qta(idx):
        if qta:
            idx.quantizer_trains_alone = 1
        return idx

    if m := re.fullmatch(r"PQ(\d+)\+(\d+)", code):
        return int(m.group(1)) + int(m.group(2))
    if m := re.fullmatch(r"PQ(\d+)(?:x(\d+))?(?:fs(?:_\d+)?)?", code):
        return (int(m.group(1)) * int(m.group(2) or 8) + 7) // 8
    if m := re.fullmatch(r"(?:P?RQ|P?LSQ)(\d+)x(\d+)(?:x(\d+))?", code):
        # additive codes: one uint8 per stage + f32 reconstruction norm
        # (ST_norm_float layout, ops/rq.py RQCodec.code_size)
        stages = (int(m.group(1)) * int(m.group(2)) if m.group(3)
                  else int(m.group(1)))
        return stages + 4
    if m := re.fullmatch(r"LSH(\d*)r?t?", code):
        nbits = int(m.group(1) or d)
        return (-(-nbits // 8))
    raise ValueError(f"get_code_size: unknown code {code!r}")


def get_hnsw_M(index) -> int:
    """Max level-0 degree of an HNSW index (factory_tools.get_hnsw_M)."""
    return int(index.hnsw.M)


def reverse_index_factory(index) -> str:
    """Best-effort factory string for an index
    (contrib/factory_tools.py:reverse_index_factory role). The returned
    spec re-parses to the same index class/layout."""
    from ..models.extra import IndexLSH
    from ..models.flat import IndexFlat
    from ..models.hnsw import IndexHNSW, IndexHNSWPQ, IndexHNSWSQ
    from ..models.idmap import IndexIDMap
    from ..models.ivf import IndexIVF, IndexIVFFlat
    from ..models.ivf_pq import (IndexIVFPQ, IndexIVFPQR,
                                 IndexIVFScalarQuantizer)
    from ..models.refine import IndexRefine, IndexRefineSQ8Tier
    from ..models.rq import (IndexIVFProductResidualQuantizer,
                             IndexIVFResidualQuantizer,
                             IndexProductResidualQuantizer,
                             IndexResidualQuantizer)
    from ..models.transforms import (IndexPreTransform, LinearTransform,
                                     OPQMatrix, PCAMatrix,
                                     RandomRotationMatrix)

    if isinstance(index, IndexPreTransform):
        parts = []
        for vt in index.chain:
            if isinstance(vt, OPQMatrix):
                parts.append(f"OPQ{vt.M}_{vt.d_out}" if vt.d_out != vt.d_in
                             else f"OPQ{vt.M}")
            elif isinstance(vt, PCAMatrix):
                parts.append(f"PCA{vt.d_out}")
            elif isinstance(vt, RandomRotationMatrix):
                parts.append(f"RR{vt.d_out}")
            else:
                raise ValueError(f"cannot reverse transform {vt!r}")
        return ",".join(parts + [reverse_index_factory(index.index)])
    if isinstance(index, IndexIDMap):
        return "IDMap," + reverse_index_factory(index.index)
    if isinstance(index, IndexRefine):
        from ..models.flat import IndexFlat as _F

        if isinstance(index.refine_index, _F):
            return reverse_index_factory(index.base_index) + ",RFlat"
        raise ValueError("cannot reverse non-Flat refine")
    if isinstance(index, IndexRefineSQ8Tier):
        return reverse_index_factory(index.base_index) + ",RSQ8t"
    if isinstance(index, IndexIVF):
        prefix = f"IVF{index.nlist}"
        if isinstance(index.quantizer, IndexHNSW):
            prefix += f"_HNSW{get_hnsw_M(index.quantizer)}"
        else:
            from ..models.rq import (AdditiveCoarseQuantizer,
                                     LocalSearchCoarseQuantizer)

            if isinstance(index.quantizer, AdditiveCoarseQuantizer):
                kind = ("LSCQ" if isinstance(index.quantizer,
                                             LocalSearchCoarseQuantizer)
                        else "RCQ")
                prefix += (f"({kind}{index.quantizer.M}"
                           f"x{index.quantizer.nbits})")
        if isinstance(index, IndexIVFPQR):
            return f"{prefix},PQ{index.M}+{index.M_refine}"
        if isinstance(index, IndexIVFPQ):
            suffix = "fs" if index.nbits == 4 else ""
            return f"{prefix},PQ{index.M}x{index.nbits}{suffix}"
        if isinstance(index, IndexIVFScalarQuantizer):
            return f"{prefix},{_SQ_NAMES[index.qtype]}"
        if isinstance(index, IndexIVFProductResidualQuantizer):
            kind = ("PLSQ" if "LocalSearch" in type(index).__name__
                    else "PRQ")
            return (f"{prefix},{kind}{index.nsplits}x{index.Msub}"
                    f"x{index.nbits}")
        if isinstance(index, IndexIVFResidualQuantizer):
            kind = ("LSQ" if "LocalSearch" in type(index).__name__
                    else "RQ")
            return f"{prefix},{kind}{index.M}x{index.nbits}"
        from ..models.ivf_hnsw import IndexIVFHNSW as _IVFH

        if isinstance(index, (IndexIVFFlat, _IVFH)):
            return f"{prefix},Flat"
        raise ValueError(f"cannot reverse {type(index).__name__}")
    if isinstance(index, IndexHNSWPQ):
        return (f"HNSW{get_hnsw_M(index)},"
                f"PQ{index.pq_m}x{index.nbits}")
    if isinstance(index, IndexHNSWSQ):
        name = {"float16": "SQfp16", "bfloat16": "SQbf16",
                "sq8": "SQ8"}[index.storage_dtype]
        return f"HNSW{get_hnsw_M(index)},{name}"
    if isinstance(index, IndexHNSW):
        return f"HNSW{get_hnsw_M(index)}"
    if isinstance(index, IndexLSH):
        return f"LSH{index.nbits}" + ("r" if index.rotate_data else "")
    if isinstance(index, IndexProductResidualQuantizer):
        kind = "PLSQ" if "LocalSearch" in type(index).__name__ else "PRQ"
        return f"{kind}{index.nsplits}x{index.Msub}x{index.nbits}"
    if isinstance(index, IndexResidualQuantizer):
        kind = "LSQ" if "LocalSearch" in type(index).__name__ else "RQ"
        return f"{kind}{index.M}x{index.nbits}"
    from ..models.pq import IndexPQ, IndexScalarQuantizer

    if isinstance(index, IndexPQ):
        return f"PQ{index.M}x{index.nbits}"
    if isinstance(index, IndexScalarQuantizer):
        return _SQ_NAMES[index.qtype]
    if isinstance(index, IndexFlat):
        return "Flat"
    raise ValueError(f"cannot reverse {type(index).__name__}")
