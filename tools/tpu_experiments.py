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

# ---- E1: 10k flagship, 3 reps ----
for i in range(3):
    t0 = time.time()
    r = st.rank(A)
    log(f"[10k] run{i}: {time.time()-t0:.2f}s rank={r}")

# ---- E2: 10k dense-finish phase split ----
from spasm_tpu.sputil import mod_reduce
from spasm_tpu.ops import dense as dense_ops

S = mod_reduce(A.to_scipy(), f)
alive = np.unique(S.indices)
na = alive.size
colmap = np.full(S.shape[1], -1, np.int64)
colmap[alive] = np.arange(na)
Sc = S.tocoo()
rows_all = Sc.row
cols_all = colmap[Sc.col]
vals_all = f.normalize(Sc.data)
order = np.argsort(rows_all, kind="stable")
rows_all, cols_all, vals_all = (rows_all[order], cols_all[order],
                                vals_all[order])
n_s = S.shape[0]
bs = dense_ops._bucket(1000)
na_b = dense_ops._bucket(na)
n_pad = -(-n_s // bs) * bs
ncap = max(512, 1 << int(rows_all.size - 1).bit_length())
ri = np.pad(rows_all.astype(np.int32), (0, ncap - rows_all.size))
ci = np.pad(cols_all.astype(np.int32), (0, ncap - rows_all.size))
vi = np.pad(vals_all.astype(np.int32), (0, ncap - rows_all.size))
for rep in range(3):
    t0 = time.time()
    rid, cid, vid = jnp.asarray(ri), jnp.asarray(ci), jnp.asarray(vi)
    jax.block_until_ready(vid)
    t1 = time.time()
    out = dense_ops.fused_blocked_finish(
        f, (n_pad, na_b), na, bs, dense_ops.DEFAULT_PANEL, rid, cid, vid)
    Ud, pc_map, r_d, ranks, prows, pcols = out
    jax.block_until_ready(Ud)
    t2 = time.time()
    nnz_d = dense_ops.count_nonzero_device(Ud)
    t3 = time.time()
    ecap = max(128, 1 << int(max(1, nnz_d - 1)).bit_length())
    er, ec, ev = (np.asarray(x) for x in dense_ops.extract_sparse(Ud, ecap))
    rk = np.asarray(ranks)
    t4 = time.time()
    log(f"[finish] rep{rep}: h2d {t1-t0:.3f} compute {t2-t1:.3f} "
        f"nnzcount {t3-t2:.3f} extract+meta {t4-t3:.3f} (ecap={ecap})")

# ---- E3: d7 host vs resident rounds ----
for mode, kw in [("host", dict(device_rounds=False)),
                 ("resident", dict(device_rounds=True))]:
    for i in range(3):
        t0 = time.time()
        fact = echelonize(B, **kw)
        dt = time.time() - t0
        log(f"[d7 {mode}] run{i}: {dt:.2f}s rank={fact.r} "
            f"({B.nnz/dt:.0f} nnz/s)")

# ---- E4: resident round primitive cost: sort of a 32M pool ----
cap = 1 << 25
r_ = jnp.asarray(np.random.randint(0, 1 << 18, cap, dtype=np.int32))
c_ = jnp.asarray(np.random.randint(0, 1 << 18, cap, dtype=np.int32))
v_ = jnp.asarray(np.random.randint(-21000, 21000, cap, dtype=np.int32))


@jax.jit
def sort3(r, c, v):
    return jax.lax.sort((r, c, v), num_keys=2)


jax.block_until_ready(sort3(r_, c_, v_))
t0 = time.time()
for _ in range(3):
    out = sort3(r_, c_, v_)
jax.block_until_ready(out)
log(f"[sort] 32M 3-tuple lax.sort: {(time.time()-t0)/3*1e3:.0f} ms")
log("[done]")
