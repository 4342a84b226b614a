"""Stage-1 of build100m.py split out: generate the 100M x 96 clustered
synthetic memmap WITHOUT importing jax, so it can run on CPU/disk while
the TPU is busy with other queued measurements. Byte-identical to
build100m.py's generator (same seeds / chunking)."""
import os
import time

import numpy as np

ROOT = "/root/data100m"
DATA = os.path.join(ROOT, "x.f32")
N, D_ = 100_000_000, 96
SEED = 7
CHUNK = 2_000_000

os.makedirs(ROOT, exist_ok=True)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


rs0 = np.random.RandomState(SEED)
CENTS = rs0.randn(4096, D_).astype(np.float32) * 2.0

if os.path.exists(DATA) and os.path.getsize(DATA) == N * D_ * 4:
    log("dataset already complete")
else:
    log("generating 100M x 96 ...")
    mm = np.memmap(DATA, mode="w+", dtype=np.float32, shape=(N, D_))
    for i in range(0, N, CHUNK):
        rs = np.random.RandomState(SEED + 1 + i // CHUNK)
        a = rs.randint(4096, size=min(CHUNK, N - i))
        mm[i:i + CHUNK] = (CENTS[a]
                           + rs.randn(min(CHUNK, N - i), D_).astype(np.float32) * 0.8)
        if (i // CHUNK) % 10 == 0:
            log(f"  gen {i + CHUNK:,}/{N:,}")
    mm.flush()
    del mm
    log("DONE")
