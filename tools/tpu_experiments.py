#!/usr/bin/env python
"""Batched TPU-side experiments (one process = one tunnel setup)."""
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
log(f"[setup] d2h channel: {time.time()-t0:.1f}s")

import spasm_tpu as st
from spasm_tpu import echelonize

f = st.field(42013)

# ---- build fixtures ----
rows = list(itertools.combinations(range(22), 8))
cols = {c: i for i, c in enumerate(itertools.combinations(range(22), 7))}
ii, jj, vv = [], [], []
for ri, face in enumerate(rows):
    for t in range(8):
        ii.append(ri)
        jj.append(cols[face[:t] + face[t + 1:]])
        vv.append((-1) ** t)
B = st.SparseGFp.from_coo(f, len(rows), len(cols), ii, jj, vv)
rng = np.random.default_rng(20240816)
A = st.SparseGFp.rand(f, 10000, 10000, 1e-3, rng)
st.rank(st.SparseGFp.rand(f, 512, 512, 4e-3, rng))
log("[setup] fixtures built, small rank warm")

# ---- E1: 10k flagship, 4 reps (new extraction) ----
for i in range(4):
    t0 = time.time()
    r = st.rank(A)
    log(f"[10k] run{i}: {time.time()-t0:.2f}s rank={r}")

# ---- E2: 10k phase split (host side) ----
from spasm_tpu.sputil import mod_reduce
from spasm_tpu.pivots import find_structural_pivots
from spasm_tpu.csr import SparseGFp
import importlib
ech = importlib.import_module("spasm_tpu.echelonize")
import scipy.sparse as sp

S = mod_reduce(A.to_scipy(), f)
Sw = SparseGFp.from_scipy(S, f.p, assume_canonical=True)
t0 = time.time()
prows, pcols, counts = find_structural_pivots(Sw)
t1 = time.time()
npiv = prows.size
Upart = S[prows]
piv_vals = np.asarray(Upart[np.arange(npiv), pcols]).ravel().astype(np.int64)
scales = f.inv(piv_vals)
Upart = sp.csr_matrix(Upart)
row_of_entry = np.repeat(np.arange(npiv), np.diff(Upart.indptr))
Upart.data = f.normalize(Upart.data * scales[row_of_entry])
from spasm_tpu.elimination import compute_levels
Uw = SparseGFp.from_scipy(Upart, f.p, assume_canonical=True)
levels_blk = compute_levels(Uw, pcols)
rest_mask = np.ones(S.shape[0], bool)
rest_mask[prows] = False
S_rest = S[np.flatnonzero(rest_mask)]
t2 = time.time()
est = ech.schur_estimate_density(f, Upart, pcols, levels_blk, S_rest)
t3 = time.time()
alive = np.unique(S.indices)
blk = ech._dense_finish_blocked(f, S, np.arange(10000, dtype=np.int64),
                                alive, 0, ech.EchelonizeOptions(), [])
t4 = time.time()
log(f"[10k phases] pivots {t1-t0:.3f} upart+levels {t2-t1:.3f} "
    f"est {t3-t2:.3f} finish {t4-t3:.3f}")

# ---- E3: d7 host 3 reps ----
for i in range(3):
    t0 = time.time()
    fact = echelonize(B)
    dt = time.time() - t0
    log(f"[d7 host] run{i}: {dt:.2f}s rank={fact.r} ({B.nnz/dt:.0f} nnz/s)")
log("[done]")
