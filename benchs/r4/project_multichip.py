"""v5p-8 Deep100M QPS projection from measured single-chip components
(VERDICT round-4 item 10: attach a number to the sharded claim before
multi-chip hardware exists).

Model (IndexShardsIVF design, = parallel/sharded.sharded_ivf_scan:
shared coarse quantizer replicated, invlists row-partitioned over S
shards, all_gather + k-select merge, validated functionally on the
virtual 8-device mesh by dryrun_multichip):

    t_batch(S) = t_coarse               (replicated: same GEMM per chip)
               + t_scan(N/S)            (per-shard local fused scan)
               + t_allgather(S, nq, k)  (ICI: (S-1)/S * S*nq*k*8B)
               + t_merge                (k-select over S*k per query)

    QPS(S)     = nq / t_batch(S)        (per pod-slice)

Inputs are MEASURED single-v5e-chip times (sources cited inline); the
v5p translation keeps scan time CONSERVATIVE (the fused IVF scan is
dispatch-latency-bound at ~1% HBM utilization on v5e — BENCHMARKS.md
"utilization" — so we do NOT scale it by the 3.4x HBM-bandwidth or
2.3x MXU advantage of v5p; only the coarse GEMM, which is MXU-bound,
gets the MXU ratio). ICI numbers: v5p 3D torus, ~90 GB/s/link one-way
x 6 links/chip; we charge the all_gather at ONE link's bandwidth plus
1 us/hop latency x S hops — pessimistic for a 3D torus.

Run: python benchs/r4/project_multichip.py [results_hybrid10m.json]
"""
import json
import os
import sys

NQ = 10_000
K = 10
S = 8                                  # v5p-8 mesh (one shard axis)
N_TARGET = 100_000_000                 # Deep100M
MXU_RATIO = 459.0 / 197.0              # v5p / v5e bf16 peak
ICI_BW = 90e9                          # B/s, one v5p link, one-way
ICI_HOP_US = 1.0

# Measured v5e single-chip components (cited):
#   Deep10M IVF65536,PQ32x4fs nprobe=8: 38_747 QPS  (BENCHMARKS.md
#     "End-to-end at the BASELINE #5 single-chip config", round 2)
#   Deep10M ...,RFlat k_factor=32 nprobe=16: 17_536 QPS @ 0.977 R@10
#     (BENCHMARKS.md round 3 "recall-competitive coded operating point")
#   coarse fraction: quantization_us / total from the Deep10M stats rows
#     (results_hybrid10m.json when present; fallback 15% from the round-3
#     1M-scale stats split, BENCHMARKS.md)
CONFIGS = [
    ("IVF65536,PQ32x4fs nprobe=8", 38_747, 0.309),
    ("IVF65536,PQ32x4fs nprobe=16", 31_476, 0.316),
    ("IVF65536,PQ32x4fs,RFlat kf=32 nprobe=16", 17_536, 0.977),
]


def coarse_fraction():
    """quantization_us / total_us from the Deep10M hybrid stats rows."""
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "results_hybrid10m.json")
    try:
        rows = json.load(open(path))
        fr = [r["quant_us"] / (r["quant_us"] + r["scan_us"])
              for r in rows if r.get("mode") == "auto" and r.get("quant_us")]
        if fr:
            return sum(fr) / len(fr), f"measured ({path})"
    except Exception:  # noqa: BLE001
        pass
    return 0.15, "fallback estimate (round-3 1M stats split)"


def project():
    cf, cf_src = coarse_fraction()
    print(f"coarse fraction of single-chip batch time: {cf:.3f} "
          f"[{cf_src}]")
    print(f"\n{'config':<45} {'v5e 1chip':>10} {'v5p-8 pod':>10} "
          f"{'eff':>6}")
    out = []
    for name, qps1, recall in CONFIGS:
        t1 = NQ / qps1                       # measured single-chip batch s
        t_coarse = t1 * cf / MXU_RATIO       # replicated, MXU-bound
        # per-shard scan: Deep10M-sized measurement covers 10M rows;
        # each v5p-8 shard holds 12.5M -> scale blocks touched by 1.25;
        # NO v5p speedup credit (latency-bound kernel, see module doc)
        t_scan = t1 * (1 - cf) * (N_TARGET / S / 10_000_000)
        ag_bytes = (S - 1) * NQ * K * 8      # (S-1)/S * S*nq*k*(4+4)B
        t_ici = ag_bytes / ICI_BW + S * ICI_HOP_US * 1e-6
        t_merge = 0.0002                     # k-select over S*k, measured
        #   class of cost: merge_topk_axis on (8,10k,10) ~ 0.2 ms on v5e
        t = t_coarse + t_scan + t_ici + t_merge
        qps = NQ / t
        # parallel efficiency = share of pod time in useful local scan
        eff = t_scan / t
        out.append(dict(config=name, recall=recall,
                        v5e_1chip_qps=qps1,
                        v5p8_deep100m_qps=round(qps),
                        t_coarse_ms=round(t_coarse * 1e3, 2),
                        t_scan_ms=round(t_scan * 1e3, 2),
                        t_ici_ms=round(t_ici * 1e3, 3)))
        print(f"{name:<45} {qps1:>10,} {round(qps):>10,} "
              f"{eff:>6.2f}")
    res = os.path.join(os.path.dirname(__file__),
                       "results_multichip_projection.json")
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {res}")


if __name__ == "__main__":
    project()
