#!/usr/bin/env python
"""Headline benchmark, matching BASELINE.json's metric ("Schur-update nnz/s
per chip + wall-clock rank time on GL7d/relat matrices"): exact rank of the
GL7d-class structured case — the d9 simplex boundary matrix on 26 vertices
(5,311,735 x 3,124,550, 53.1M nnz; the same size class as GL7d17) — through
the public API on whatever jax backend is present (the real TPU chip under
the driver).  The detail payload carries the other BASELINE configs: the
random 10k x 10k flagship (config #2; metric-capped — see NOTES_r2.md's
ceiling analysis: an effectively full-rank random 10k rank costs ~n^3/3
field ops for ANY exact method, so its nnz/s saturates near ~300k at light
speed), the d7 structured case (2.56M nnz), and a kernel-basis case
(d8, 28.1M nnz).  Rounds 1-2 reported the flagship as the headline; the
history is preserved in detail["flagship"] with the same fields.

Prints ONE JSON line:
  {"metric": ..., "value": nnz/s, "unit": "nnz/s", "vs_baseline": ratio,
   "detail": {..., "structured": {...}}}

Measurement protocol: the flagship case is run twice and the best wall is
reported (both appear in the detail payload).  The warm-up phase first
exercises the device channel (the tunneled TPU link pays a one-time
30-300 s setup cost on the FIRST device->host transfer of a process —
measured, see NOTES_r2.md) and a small end-to-end rank, so the reported
number is the framework's steady-state throughput, not the link's
process-setup lottery.  One-time jit compiles persist across processes
(jax_compilation_cache_dir), so the second run measures pure execution.

vs_baseline normalizes against BASELINE.md's north-star target (10x an
estimated 1e6 nnz/s SpaSM single-core rate => 1.0 means target met).  The
reference publishes no numbers of its own (BASELINE.md), and its CLI tools
are not available in this environment to measure directly.
"""

import json
import sys
import time
from math import comb

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from spasm_tpu.utils.hostmem import prefault, tune_host_malloc

# first-touch page faults on this VM run ~1000x slower than warm pages;
# keep glibc from munmapping large temporaries so they stay warm
# (utils/hostmem.py — measured 400x on repeated large fills)
tune_host_malloc()

import spasm_tpu as st
from spasm_tpu.fixtures import simplex_boundary

N = 10_000
DENSITY = 1e-3
SEED = 20240816
TARGET_NNZ_PER_S = 10e6  # north-star: 10x est. 1M nnz/s single-core SpaSM
BOUNDARY_N, BOUNDARY_K = 22, 7  # 319770 x 170544, 2.56M nnz, rank C(21,7)
# d9-scale case (GL7d-class size): 5,311,735 x 3,124,550, 53.1M nnz
LARGE_N, LARGE_K = 26, 9


def warm_device_channel():
    """Pay the tunneled link's one-time costs outside the measurement:
    first dispatch, first H2D, first D2H (process channel setup)."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(1024, dtype=jnp.int32)
    np.asarray(jax.block_until_ready(x + 1))


def main():
    # fault the expected peak host footprint up front (parallel touches
    # beat the serial mid-run fault path ~2-5x on this VM) so measured
    # phases run on warm pages
    prefault(6 << 30)
    f = st.field(42013)
    rng = np.random.default_rng(SEED)
    A = st.SparseGFp.rand(f, N, N, DENSITY, rng)

    warm_device_channel()
    # warm-up on a small instance so one-time jit compiles (persistently
    # cached) don't pollute the measurement
    warm = st.SparseGFp.rand(f, 512, 512, DENSITY * 4, rng)
    st.rank(warm)

    runs = []
    r = None
    for _ in range(3):  # the tunneled link has slow phases; best-of-3
        t0 = time.time()
        r = st.rank(A)
        runs.append(round(time.time() - t0, 3))
    wall = min(runs)
    value = A.nnz / wall

    B = simplex_boundary(BOUNDARY_N, BOUNDARY_K)
    runs_b = []
    rb = None
    for _ in range(3):  # host-phase wall noise on this VM is 2-5x
        t0 = time.time()
        rb = st.rank(B)
        runs_b.append(round(time.time() - t0, 3))
    wall_b = min(runs_b)
    assert rb == comb(BOUNDARY_N - 1, BOUNDARY_K), rb

    # d9-scale structured case: 53M nnz, the reference's GL7d-class size
    C = simplex_boundary(LARGE_N, LARGE_K)
    runs_c = []
    rc = None
    for _ in range(3):  # headline case; 3 reps bound the VM's iowait noise
        t0 = time.time()
        rc = st.rank(C)
        runs_c.append(round(time.time() - t0, 3))
    wall_c = min(runs_c)
    assert rc == comb(LARGE_N - 1, LARGE_K), rc
    large_detail = {
        "case": f"simplex boundary d{LARGE_K} on {LARGE_N} vertices",
        "shape": list(C.shape), "nnz": C.nnz, "rank": rc,
        "wall_s": wall_c, "runs_s": runs_c,
        "nnz_per_s": round(C.nnz / wall_c, 1),
    }

    # kernel (null-space) basis — the other headline derived op
    D = simplex_boundary(LARGE_N, 8)  # d8 on 26: 3.1M x 1.56M, 28.1M nnz
    runs_k = []
    K = None
    for _ in range(2):
        t0 = time.time()
        K = st.kernel(D)
        runs_k.append(round(time.time() - t0, 3))
    wall_k = min(runs_k)
    assert K.shape == (D.shape[1] - comb(LARGE_N - 1, 8), D.shape[1])
    kernel_detail = {
        "case": f"kernel basis, simplex boundary d8 on {LARGE_N} vertices",
        "shape": list(D.shape), "nnz": D.nnz,
        "kernel_rows": K.shape[0], "kernel_nnz": K.nnz,
        "wall_s": wall_k, "runs_s": runs_k,
    }

    value_c = C.nnz / wall_c
    print(json.dumps({
        "metric": f"rank GL7d-class simplex boundary d{LARGE_K} on "
                  f"{LARGE_N} vertices ({C.nnz} nnz) mod 42013 throughput",
        "value": round(value_c, 1),
        "unit": "nnz/s",
        "vs_baseline": round(value_c / TARGET_NNZ_PER_S, 4),
        "detail": {
            "rank": rc, "nnz": C.nnz, "wall_s": wall_c, "runs_s": runs_c,
            "flagship": {
                "case": f"rank {N}x{N} d={DENSITY} mod 42013 (rounds 1-2 "
                        "headline; metric-capped, see module docstring)",
                "rank": r, "nnz": A.nnz, "wall_s": wall, "runs_s": runs,
                "nnz_per_s": round(value, 1),
            },
            "structured": {
                "case": f"simplex boundary d{BOUNDARY_K} on "
                        f"{BOUNDARY_N} vertices",
                "shape": list(B.shape), "nnz": B.nnz, "rank": rb,
                "wall_s": wall_b, "runs_s": runs_b,
                "nnz_per_s": round(B.nnz / wall_b, 1),
            },
            "structured_large": large_detail,
            "kernel_basis": kernel_detail,
        },
    }))


if __name__ == "__main__":
    main()
