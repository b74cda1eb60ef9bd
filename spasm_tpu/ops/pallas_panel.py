"""Pallas kernel for the dense-RREF panel factorization.

The blocked Jordan elimination (ops/dense.py) spends most of its time in
the per-panel sequential loop: 128 pivot-select / scale / rank-1-update
steps.  As XLA ops each step pays dispatch + HBM round-trip latency; here
the whole loop runs inside one kernel with the panel P (n x c) and the
correction G (n x c) resident in VMEM.

Per pivot step the pivot-row scaling is folded into the elimination
coefficient: with beta[pr] = pinv - 1 and beta[i] = -col[i] * pinv
otherwise, ONE fused rank-1 update  P += beta * P[pr]  both scales the
pivot row to a unit pivot and eliminates its column everywhere else, and
the same beta updates G against g_row = G[pr] + e_slot.  The correction
invariant is  row_i_final = X_i + G_i @ X[prows, :]  (no separate row
scalings — the s vector of the earlier design is identically 1 and
gone).  Products |beta| * |P| <= (p/2)^2 + p/2 < 2^31 stay exact in
int32 for tier-A primes, so each update needs a single float-Barrett
reduction (delayed mod).

Semantics are identical to dense._panel_eliminate (the XLA fallback).
Tier-A primes with p >= _MIN_P only (float Barrett reduction); larger or
tiny primes and n > MAX_ROWS fall back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from .pallas_matmul import _MIN_P, _mod_balanced_f32, available

MAX_ROWS = 4096  # P + G + input copy at c=128 must fit 16 MiB VMEM


def supported(f: Field, n: int) -> bool:
    return f.tier == "a" and f.p >= _MIN_P and n <= MAX_ROWS


def _inv_scalar(f: Field, x):
    """Fermat inverse of a scalar via square-and-multiply (exact for
    tier-A p; x == 0 gives 0, callers mask)."""
    e = f.p - 2
    result = jnp.int32(1)
    base = x
    while e:
        if e & 1:
            result = _mod_balanced_f32(f.p, result * base)
        base = _mod_balanced_f32(f.p, base * base)
        e >>= 1
    return result


def _kernel(f: Field, npivcols: int, c: int,
            j0_ref, p_in, ispiv_in, P, G, prow, pcol, pfound, ispiv):
    n = P.shape[0]
    p = f.p
    half = jnp.int32(p // 2)
    P[:] = p_in[:]
    ispiv[:] = ispiv_in[:]
    G[:] = jnp.zeros_like(G)
    prow[:] = jnp.zeros_like(prow)
    pcol[:] = jnp.zeros_like(pcol)
    pfound[:] = jnp.zeros_like(pfound)
    j0 = j0_ref[0]
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    slotid = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)

    def body(jj, kk):
        Pv = P[:]
        # single-column extraction via masked lane reduce (dynamic lane
        # slices must be 128-aligned on TPU)
        col = jnp.sum(jnp.where(colid == jj, Pv, 0), axis=1,
                      keepdims=True)  # (n, 1)
        eligible = (j0 + jj) < npivcols
        cand = (col != 0) & (ispiv[:] == 0) & eligible
        # first candidate row via int min-reduce (Mosaic argmax is f32-only)
        pr = jnp.min(jnp.where(cand, rowid, jnp.int32(n)))
        found = pr < n
        prc = jnp.where(found, pr, 0)
        is_pr = rowid == pr  # (n, 1)
        pv = jnp.sum(jnp.where(is_pr, col, 0))
        pinv = _inv_scalar(f, pv)
        # beta folds scale + eliminate into one rank-1:
        #   row pr:   + (pinv - 1) * row_pr  == scale to unit pivot
        #   row i!=pr:  - col_i * pinv * row_pr  == eliminate column jj
        bpr = pinv - jnp.int32(1)
        bpr = jnp.where(bpr < -half, bpr + jnp.int32(p), bpr)  # rebalance
        beta = jnp.where(is_pr, bpr, _mod_balanced_f32(p, col * (-pinv)))
        beta = jnp.where(found, beta, jnp.int32(0))
        Prow = P[pl.ds(prc, 1), :]                       # (1, c)
        grow = G[pl.ds(prc, 1), :] + jnp.where(slotid == kk, jnp.int32(1),
                                               jnp.int32(0))
        # |beta * Prow| <= (p/2)^2 and |P| <= p/2: exact int32, one mod
        P[:] = _mod_balanced_f32(p, Pv + beta * Prow)
        G[:] = _mod_balanced_f32(p, G[:] + beta * grow)
        # bookkeeping
        fi = found.astype(jnp.int32)
        ispiv[:] = jnp.where(is_pr & found, 1, ispiv[:])
        slot_hit = (slotid == kk) & found
        prow[:] = jnp.where(slot_hit, pr, prow[:])
        pcol[:] = jnp.where(slot_hit, jj, pcol[:])
        pfound[:] = jnp.where(slot_hit, 1, pfound[:])
        return kk + fi

    jax.lax.fori_loop(0, c, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(0, 1))
def panel_eliminate_pallas(f: Field, npivcols: int, P, is_piv_row, j0):
    """Drop-in for dense._panel_eliminate with the same outputs."""
    n, c = P.shape
    j0_arr = jnp.asarray(j0, jnp.int32).reshape(1)
    ispiv_i32 = is_piv_row.astype(jnp.int32).reshape(n, 1)
    kern = functools.partial(_kernel, f, npivcols, c)
    out_shapes = (
        jax.ShapeDtypeStruct((n, c), jnp.int32),   # P
        jax.ShapeDtypeStruct((n, c), jnp.int32),   # G
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # prow
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # pcol
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # pfound
        jax.ShapeDtypeStruct((n, 1), jnp.int32),   # ispiv
    )
    P2, G, prow, pcol, pfound, ispiv = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        out_shape=out_shapes,
        interpret=not available(),
    )(j0_arr, P, ispiv_i32)
    return (P2, G, prow[0], pcol[0], pfound[0].astype(bool),
            ispiv[:, 0].astype(bool))
