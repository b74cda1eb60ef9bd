#!/usr/bin/env python
"""Headline benchmark: rank of a random sparse 10k x 10k matrix over
GF(42013) at density 1e-3 (BASELINE.json config #2), end-to-end through the
public API on whatever jax backend is present (the real TPU chip under the
driver).

Prints ONE JSON line:
  {"metric": ..., "value": nnz/s, "unit": "nnz/s", "vs_baseline": ratio}

vs_baseline normalizes against BASELINE.md's north-star target (10x an
estimated 1e6 nnz/s SpaSM single-core rate => 1.0 means target met).  The
reference publishes no numbers of its own (BASELINE.md), and its CLI tools
are not available in this environment to measure directly.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import spasm_tpu as st

N = 10_000
DENSITY = 1e-3
SEED = 20240816
TARGET_NNZ_PER_S = 10e6  # north-star: 10x est. 1M nnz/s single-core SpaSM


def main():
    f = st.field(42013)
    rng = np.random.default_rng(SEED)
    A = st.SparseGFp.rand(f, N, N, DENSITY, rng)

    # warm-up on a small instance so one-time jit compiles (persistently
    # cached) don't pollute the measurement
    warm = st.SparseGFp.rand(f, 512, 512, DENSITY * 4, rng)
    st.rank(warm)

    t0 = time.time()
    r = st.rank(A)
    wall = time.time() - t0

    value = A.nnz / wall
    print(json.dumps({
        "metric": f"rank {N}x{N} d={DENSITY} mod 42013 throughput",
        "value": round(value, 1),
        "unit": "nnz/s",
        "vs_baseline": round(value / TARGET_NNZ_PER_S, 4),
        "detail": {"rank": r, "nnz": A.nnz, "wall_s": round(wall, 3)},
    }))


if __name__ == "__main__":
    main()
