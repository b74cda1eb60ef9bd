#!/usr/bin/env python
"""TPU batch 2: 20k rank (auto dense budget), block-size sweep, d8 host."""
import itertools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


t0 = time.time()
np.asarray(jax.block_until_ready(jnp.arange(1024, dtype=jnp.int32) + 1))
log(f"[setup] channel {time.time()-t0:.1f}s")

import spasm_tpu as st
from spasm_tpu.echelonize import _auto_dense_budget

f = st.field(42013)
log(f"[setup] auto dense budget: {_auto_dense_budget():,} elements")
rng = np.random.default_rng(20240816)
st.rank(st.SparseGFp.rand(f, 512, 512, 4e-3, rng))

# ---- E1: block-size sweep on the 10k flagship ----
A = st.SparseGFp.rand(f, 10000, 10000, 1e-3, rng)
for bs in (512, 1000, 2048):
    ts = []
    for _ in range(2):
        t0 = time.time()
        r = st.rank(A, dense_block_size=bs)
        ts.append(round(time.time() - t0, 2))
    log(f"[10k bs={bs}] runs {ts} rank={r}")

# ---- E2: 20k x 20k d=1e-3 (auto budget must enable the dense finish) ----
A2 = st.SparseGFp.rand(f, 20000, 20000, 1e-3, rng)
for i in range(2):
    t0 = time.time()
    r2 = st.rank(A2)
    log(f"[20k] run{i}: {time.time()-t0:.2f}s rank={r2} "
        f"({A2.nnz/(time.time()-t0):.0f} nnz/s, nnz={A2.nnz})")

# ---- E3: d8 on 24 vertices (11.8M nnz) through the host path ----
t0 = time.time()
rows = list(itertools.combinations(range(24), 9))
cols = {c: i for i, c in enumerate(itertools.combinations(range(24), 8))}
ii = np.empty(9 * len(rows), np.int64)
jj = np.empty(9 * len(rows), np.int64)
vv = np.empty(9 * len(rows), np.int64)
k = 0
for ri, face in enumerate(rows):
    for t in range(9):
        ii[k] = ri
        jj[k] = cols[face[:t] + face[t + 1:]]
        vv[k] = (-1) ** t
        k += 1
B = st.SparseGFp.from_coo(f, len(rows), len(cols), ii, jj, vv)
log(f"[d8] built {B.shape} nnz={B.nnz} in {time.time()-t0:.1f}s")
from math import comb
for i in range(2):
    t0 = time.time()
    rb = st.rank(B)
    dt = time.time() - t0
    log(f"[d8] run{i}: {dt:.2f}s rank={rb} ({B.nnz/dt:.0f} nnz/s)")
    assert rb == comb(23, 8), rb
log("[done]")
