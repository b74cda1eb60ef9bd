#!/usr/bin/env python
"""Probe the resident-round programs at d7-like shapes on the TPU:
separate lower / compile / execute timings per program."""
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
from spasm_tpu.ops import resident as rz

f = st.field(42013)

# real d7 data
rows = list(itertools.combinations(range(22), 8))
cols = {c: i for i, c in enumerate(itertools.combinations(range(22), 7))}
ii, jj, vv = [], [], []
for ri, face in enumerate(rows):
    for t in range(8):
        ii.append(ri)
        jj.append(cols[face[:t] + face[t + 1:]])
        vv.append((-1) ** t)
B = st.SparseGFp.from_coo(f, len(rows), len(cols), ii, jj, vv)
S = B.to_scipy()
n, m = S.shape
nnz0 = S.nnz
cap = rz._bucket_pow2(8 * nnz0)
cap_hits = max(1 << 12, cap // 16)
ku = 16
n_b = rz._bucket_pow2(n, lo=1 << 12)
m_b = rz._bucket_pow2(m, lo=1 << 12)
npool = rz._bucket_pow2(min(n, m), lo=1 << 12)
log(f"shapes: n_b={n_b} m_b={m_b} cap={cap} ku={ku} npool={npool}")

Sc = S.tocoo()
rows_h = np.full(cap, n_b, np.int32)
cols_h = np.zeros(cap, np.int32)
vals_h = np.zeros(cap, np.int32)
rows_h[:Sc.row.size] = Sc.row
cols_h[:Sc.col.size] = Sc.col
vals_h[:Sc.data.size] = Sc.data
t0 = time.time()
state = (jnp.asarray(rows_h), jnp.asarray(cols_h), jnp.asarray(vals_h),
         jnp.full((npool, ku), -1, jnp.int32),
         jnp.zeros((npool, ku), jnp.int32),
         jnp.zeros(npool, jnp.int32),
         jnp.zeros(npool, jnp.int32),
         jnp.int32(0))
jax.block_until_ready(state[0])
log(f"h2d: {time.time()-t0:.1f}s")

t0 = time.time()
low = rz._round_begin.lower(f, (n_b, m_b), ku, npool, *state)
log(f"lower _round_begin: {time.time()-t0:.1f}s")
t0 = time.time()
comp = low.compile()
log(f"compile _round_begin: {time.time()-t0:.1f}s")
t0 = time.time()
out = comp(*state)
jax.block_until_ready(out[13])
log(f"exec _round_begin: {time.time()-t0:.1f}s  npiv={int(out[13])} "
    f"depth={int(out[14])} ovf={bool(out[15])}")

cand_state = out[:8]
u_cols, u_vals, lev, col2piv, write_ptr = out[8:13]
depth_d = out[14]
t0 = time.time()
low2 = rz._waves_all.lower(f, n_b, cap_hits, depth_d, cand_state[0],
                           cand_state[1], cand_state[2], u_cols, u_vals,
                           lev, col2piv, write_ptr)
log(f"lower _waves_all: {time.time()-t0:.1f}s")
t0 = time.time()
comp2 = low2.compile()
log(f"compile _waves_all: {time.time()-t0:.1f}s")
t0 = time.time()
w = comp2(depth_d, cand_state[0], cand_state[1], cand_state[2], u_cols,
          u_vals, lev, col2piv, write_ptr)
jax.block_until_ready(w[0])
log(f"exec _waves_all: {time.time()-t0:.1f}s ovf={bool(w[4])}")

t0 = time.time()
c = rz._compact(f, (n_b, m_b), w[0], w[1], w[2])
jax.block_until_ready(c[0])
log(f"compile+exec _compact: {time.time()-t0:.1f}s nnz={int(c[3])}")
log("[done]")
