#!/usr/bin/env python
"""Hardware validation: exactness of the device kernels on the REAL TPU
(the pytest suite pins the CPU backend; this drives the same oracles on
the chip).  Prints PASS/FAIL per check and exits nonzero on any FAIL."""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

t0 = time.time()
np.asarray(jax.block_until_ready(jnp.arange(1024, dtype=jnp.int32) + 1))
print(f"[setup] channel {time.time()-t0:.1f}s on", jax.devices()[0].platform,
      flush=True)

import spasm_tpu as st
from spasm_tpu.field import Field
from spasm_tpu.ops import modmul
from spasm_tpu.ops.matmul import modmatmul_jit
from spasm_tpu.ops import dense as dense_ops

fails = []


def check(name, cond):
    print(("PASS " if cond else "FAIL ") + name, flush=True)
    if not cond:
        fails.append(name)


rng = np.random.default_rng(0)

# 1. elementwise ops, all tiers, on chip
for p in (42013, 92681, 104729, 2**31 - 1, 2147483659, 4294967291):
    f = Field(p)
    a = f.rand(4096, rng).astype(np.int32)
    b = f.rand(4096, rng).astype(np.int32)
    a[:2] = [f.halfp, f.mhalfp]
    b[:2] = [f.halfp, f.mhalfp]
    aj, bj = jnp.array(a), jnp.array(b)
    ok = (np.array_equal(np.asarray(modmul.add(f, aj, bj)), f.add(a, b))
          and np.array_equal(np.asarray(modmul.sub(f, aj, bj)), f.sub(a, b))
          and np.array_equal(np.asarray(modmul.mul(f, aj, bj)), f.mul(a, b)))
    check(f"elementwise tier-{f.tier} p={p}", ok)

# 2. matmul vs big-int oracle, all tiers (Pallas fast path where eligible)
for p in (42013, 92681, 2**31 - 1, 4294967291):
    f = Field(p)
    a = f.rand((96, 160), rng)
    b = f.rand((160, 64), rng)
    want = f.normalize(a.astype(object) @ b.astype(object)).astype(np.int64)
    got = np.asarray(modmatmul_jit(f, jnp.array(a, jnp.int32),
                                   jnp.array(b, jnp.int32)))
    check(f"modmatmul p={p}", np.array_equal(got, want))

# 3. Pallas fused matmul at MXU size (tier A)
f = Field(42013)
a = f.rand((512, 512), rng)
b = f.rand((512, 512), rng)
want = f.normalize(a.astype(object) @ b.astype(object)).astype(np.int64)
from spasm_tpu.ops import pallas_matmul as pm

if pm.available() and pm.supported(f):
    got = np.asarray(pm.modmatmul_pallas(f, jnp.array(a, jnp.int32),
                                         jnp.array(b, jnp.int32)))
    check("pallas modmatmul 512^3", np.array_equal(got, want))

# 4. device RREF (scale-free panel kernel) vs host
X = f.rand((1024, 640), rng)
X[rng.random((1024, 640)) > 0.2] = 0
out = dense_ops.rref(f, X, host_cutoff=0)
want = dense_ops._host_rref(f, X, False)
check("device RREF rank/pivots", out["rank"] == want["rank"]
      and np.array_equal(out["piv_cols"], want["piv_cols"]))
check("device RREF values", np.array_equal(out["R"][out["piv_rows"]],
                                           want["R"][want["piv_rows"]]))

# 5. classic (per-step-inverse) panel kernel path: 65536 < p <= 92681
f2 = Field(92681)
X2 = f2.rand((512, 384), rng)
X2[rng.random((512, 384)) > 0.3] = 0
out2 = dense_ops.rref(f2, X2, host_cutoff=0)
want2 = dense_ops._host_rref(f2, X2, False)
check("device RREF p=92681 (classic kernel)",
      out2["rank"] == want2["rank"]
      and np.array_equal(out2["R"][out2["piv_rows"]],
                         want2["R"][want2["piv_rows"]]))

# 5b. tier-B (uint32-split scale-free) panel kernel: 92681 < p < 2**31
for p_b in (104729, 2147483629):
    f3 = Field(p_b)
    X3 = f3.rand((512, 384), rng)
    X3[rng.random((512, 384)) > 0.3] = 0
    out3 = dense_ops.rref(f3, X3, host_cutoff=0)
    want3 = dense_ops._host_rref(f3, X3, False)
    check(f"device RREF p={p_b} (tier-B panel kernel)",
          out3["rank"] == want3["rank"]
          and np.array_equal(out3["R"][out3["piv_rows"]],
                             want3["R"][want3["piv_rows"]]))

# 6. end-to-end rank on chip vs known values
A = st.SparseGFp.rand(Field(42013), 3000, 3000, 2e-3,
                      np.random.default_rng(5))
r_dev = st.rank(A)
import jax as _jax
# host-only rank (no dense device finish): force GPLU via enable_dense
r_host = st.echelonize(A, enable_dense=False).r
check("end-to-end rank device==host (3k random)", r_dev == r_host)

from spasm_tpu.fixtures import expected_boundary_rank, simplex_boundary

B = simplex_boundary(18, 5)
check("boundary d5/18 rank", st.rank(B) == expected_boundary_rank(18, 5))

print("ALL PASS" if not fails else f"FAILURES: {fails}", flush=True)
sys.exit(1 if fails else 0)
