"""Pallas kernel for the dense-RREF panel factorization.

The blocked Jordan elimination (ops/dense.py) spends most of its time in
the per-panel sequential loop: 128 pivot-select / scale / rank-1-update
steps.  As XLA ops each step pays dispatch + HBM round-trip latency; here
the whole loop runs inside one kernel with the panel P (n x c) and the
correction G (n x c) resident in VMEM.

Two kernels, same outputs as dense._panel_eliminate (the XLA fallback):

* ``_kernel_scalefree`` (p <= 65535, incl. the default 42013): the pivot
  step is division-free — P_i <- pv*P_i - col_i*P[pr] — with per-row
  accumulated scales recovered by ONE vectorized Fermat inverse in the
  epilogue.  This removes the ~30-op sequential inverse chain from every
  pivot step's critical path (the dominant cost of the classic kernel).
* ``_kernel`` (65536 < p <= 92681): the classic form with the per-step
  scalar inverse; beta[pr] = pinv - 1, beta[i] = -col[i] * pinv, one
  fused rank-1 update for scale + eliminate.
* ``_kernel_b`` (tier B: 92681 < p < 2**31): the SAME scale-free
  recurrence in uint32 residues [0, p) with an exact 16x16-split
  multiply (float-Barrett partial reductions + mod-doubling shift
  reassembly, the elementwise analog of pallas_matmul's tier-B
  epilogue).  Division-free like the tier-A scale-free kernel, so the
  whole prime range below 2**31 runs without a per-step inverse chain.

The correction invariant for all: row_i_final = X_i + G_i @ X[prows].
Products stay exact (int32 bounds for tier A, uint32 split for tier B;
see each kernel's docstring).  p >= _MIN_P required; tier-C primes and
n > MAX_ROWS fall back to XLA.
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

# Scale-free kernel range: one Jordan step computes pv*P - col*P[pr]
# before a single Barrett reduction; |pv*P| + |col*P[pr]| <= 2*(p/2)^2
# must stay below 2^31, i.e. p <= 65535.  Larger tier-A primes use the
# per-step-inverse kernel.
_SCALEFREE_MAX_P = 65535


# The tier-B kernel carries an extra H (scaled-G) output, the per-row
# scale vector, and the 16x16 uint32-split temporaries: at (2048, 128)
# its scoped VMEM footprint is 17.01 MiB vs the 16 MiB v5e limit
# (measured: compile-time OOM).  Cap tier-B panels at 1024 rows; larger
# panels take the XLA fallback (same results, ~1.5x the panel wall).
MAX_ROWS_B = 1024


def supported(f: Field, n: int) -> bool:
    if f.tier == "b" and f.p > _SCALEFREE_MAX_P:
        return f.p >= _MIN_P and n <= MAX_ROWS_B
    return f.tier in ("a", "b") and f.p >= _MIN_P and n <= MAX_ROWS


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


def _next_cand_col(P, ispiv, jj, j0, npivcols, colid1):
    """Smallest column index >= jj that holds a candidate pivot (a nonzero
    in a non-pivot row, within the eligible range), or c if none.

    Columns with no candidate are exact no-op steps of the sequential
    Jordan loop, so jumping over them preserves bit-identical output while
    making the loop trip count proportional to the PIVOTS FOUND rather
    than the panel width — the sparse panels of a blocked finish scan
    ~4x fewer steps (profiled on the 10k flagship).  Candidate columns
    never appear to the LEFT of jj later: fill-in only adds nonzeros, but
    the sequential loop also never revisits columns, so skipping matches
    the reference fori semantics exactly.
    """
    n, c = P.shape
    candmat = (P[:] != 0) & (ispiv[:] == 0)      # (n, c)
    percol = jnp.max(jnp.where(candmat, 1, 0), axis=0)[None, :]  # (1, c)
    ok = ((percol > 0) & (colid1 >= jj)
          & ((j0 + colid1) < npivcols))
    return jnp.min(jnp.where(ok, colid1, jnp.int32(c)))


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
    colid1 = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)

    def cond(carry):
        jj, kk = carry
        return jj < c

    def body(carry):
        jj0, kk = carry
        Pv = P[:]
        jj = _next_cand_col(P, ispiv, jj0, j0, npivcols, colid1)

        @pl.when(jj < c)
        def _step():
            # single-column extraction via masked lane reduce (dynamic
            # lane slices must be 128-aligned on TPU)
            col = jnp.sum(jnp.where(colid == jj, Pv, 0), axis=1,
                          keepdims=True)  # (n, 1)
            cand = (col != 0) & (ispiv[:] == 0)
            # first candidate row via int min-reduce (Mosaic argmax is
            # f32-only); a candidate exists by _next_cand_col
            pr = jnp.min(jnp.where(cand, rowid, jnp.int32(n)))
            is_pr = rowid == pr  # (n, 1)
            pv = jnp.sum(jnp.where(is_pr, col, 0))
            pinv = _inv_scalar(f, pv)
            # beta folds scale + eliminate into one rank-1:
            #   row pr:   + (pinv - 1) * row_pr  == scale to unit pivot
            #   row i!=pr:  - col_i * pinv * row_pr  == eliminate col jj
            bpr = pinv - jnp.int32(1)
            bpr = jnp.where(bpr < -half, bpr + jnp.int32(p), bpr)
            beta = jnp.where(is_pr, bpr,
                             _mod_balanced_f32(p, col * (-pinv)))
            Prow = P[pl.ds(pr, 1), :]                       # (1, c)
            grow = G[pl.ds(pr, 1), :] + jnp.where(
                slotid == kk, jnp.int32(1), jnp.int32(0))
            # |beta * Prow| <= (p/2)^2, |P| <= p/2: exact int32, one mod
            P[:] = _mod_balanced_f32(p, Pv + beta * Prow)
            G[:] = _mod_balanced_f32(p, G[:] + beta * grow)
            # bookkeeping
            ispiv[:] = jnp.where(is_pr, 1, ispiv[:])
            slot_hit = slotid == kk
            prow[:] = jnp.where(slot_hit, pr, prow[:])
            pcol[:] = jnp.where(slot_hit, jj, pcol[:])
            pfound[:] = jnp.where(slot_hit, 1, pfound[:])

        stepped = (jj < c).astype(jnp.int32)
        return jnp.where(jj < c, jj + 1, jnp.int32(c)), kk + stepped

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


def _kernel_scalefree(f: Field, npivcols: int, c: int,
                      j0_ref, p_in, ispiv_in, P, H, sref, prow, pcol,
                      pfound, ispiv):
    """Scale-free (division-free) Jordan panel.  Each pivot step is

        P_i <- pv * P_i - col_i * P[pr]        (i != pr; P[pr] kept)
        H_i <- pv * H_i - col_i * (H[pr] + s[pr] * e_slot)
        H[pr] += (s[pr] - pv) * e_slot
        s_i <- pv * s_i;  s[pr] <- pv

    where pv/col are the OBSERVED (scaled) values and s is the per-row
    accumulated scale: P_i = s_i * T_i and H_i = s_i * G_i with (T, G)
    the classic kernel's outputs (derivation: substituting the scaled
    quantities into the classic update with beta = -col_T * pinv_T shows
    the observed update preserves these invariants, because the observed
    pivot value is pv = s[pr] * pv_T).  The per-step modular inverse of
    the classic kernel disappears; the jit epilogue applies ONE
    vectorized Fermat inverse of s to recover (T, G) with unit pivots.
    Exact for p <= _SCALEFREE_MAX_P: |pv*P| + |col*P[pr]| <= 2*(p/2)^2
    < 2^31, one float-Barrett per update."""
    n = P.shape[0]
    p = f.p
    P[:] = p_in[:]
    ispiv[:] = ispiv_in[:]
    H[:] = jnp.zeros_like(H)
    sref[:] = jnp.ones_like(sref)
    prow[:] = jnp.zeros_like(prow)
    pcol[:] = jnp.zeros_like(pcol)
    pfound[:] = jnp.zeros_like(pfound)
    j0 = j0_ref[0]
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    slotid = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    colid1 = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)

    def cond(carry):
        jj, kk = carry
        return jj < c

    def body(carry):
        jj0, kk = carry
        jj = _next_cand_col(P, ispiv, jj0, j0, npivcols, colid1)

        @pl.when(jj < c)
        def _step():
            Pv = P[:]
            sv = sref[:]
            col = jnp.sum(jnp.where(colid == jj, Pv, 0), axis=1,
                          keepdims=True)  # (n, 1)
            cand = (col != 0) & (ispiv[:] == 0)
            pr = jnp.min(jnp.where(cand, rowid, jnp.int32(n)))
            is_pr = rowid == pr  # (n, 1)
            Prow = P[pl.ds(pr, 1), :]                       # (1, c)
            # pivot value from the sliced row (a (1, c) lane reduce) and
            # the scale from a ref slice — instead of two more (n, 1)
            # cross-row reductions on the latency-bound step chain
            pv = jnp.sum(jnp.where(slotid == jj, Prow, 0))
            s_pr = sref[pl.ds(pr, 1), :][0, 0]
            hrow = _mod_balanced_f32(
                p, H[pl.ds(pr, 1), :]
                + jnp.where(slotid == kk, s_pr, jnp.int32(0)))
            colz = jnp.where(jnp.logical_not(is_pr), col, 0)
            pvz = jnp.where(jnp.logical_not(is_pr), pv, jnp.int32(1))
            # |pv*P| + |col*Prow| <= 2*(p/2)^2 < 2^31: exact, one mod
            P[:] = _mod_balanced_f32(p, pvz * Pv - colz * Prow)
            H[:] = _mod_balanced_f32(p, pvz * H[:] - colz * hrow)
            # pivot row's own slot: H[pr] += (s[pr] - pv) * e_slot
            w = _mod_balanced_f32(p, s_pr - pv)
            hpr = H[pl.ds(pr, 1), :]
            hpr_new = _mod_balanced_f32(
                p, hpr + jnp.where(slotid == kk, w, jnp.int32(0)))
            H[pl.ds(pr, 1), :] = hpr_new
            # scales: every row picks up pv; the pivot row resets to pv
            s_new = _mod_balanced_f32(p, pv * sv)
            sref[:] = jnp.where(is_pr, pv, s_new)
            ispiv[:] = jnp.where(is_pr, 1, ispiv[:])
            slot_hit = slotid == kk
            prow[:] = jnp.where(slot_hit, pr, prow[:])
            pcol[:] = jnp.where(slot_hit, jj, pcol[:])
            pfound[:] = jnp.where(slot_hit, 1, pfound[:])

        stepped = (jj < c).astype(jnp.int32)
        return jnp.where(jj < c, jj + 1, jnp.int32(c)), kk + stepped

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


# -------------------- tier B (92681 < p < 2**31) --------------------
#
# All values live as uint32 residues in [0, p) (stored in int32 refs —
# nonnegative, so the int32<->uint32 casts are exact).  The elementwise
# product of two residues uses a 16x16 split: the three partial products
# are exact in uint32, each is float-Barrett-reduced to [0, p), and the
# 2**16 shifts reassemble through exact mod-doubling chains — the
# elementwise analog of pallas_matmul._mulmod_u32.


def _modu32(p: int, v):
    """v mod p for uint32 v, 92681 < p < 2**31: float-Barrett quotient
    (conversion error of v < 2**32 is <= 256 => quotient error
    < 256/p + eps < 0.01), exact wrap-around multiply-subtract, one
    conditional +p correction (q is within {q_true, q_true + 1}).
    Conversions go through 16-bit halves / int32 — Mosaic has no direct
    u32<->f32 casts (pallas_matmul._u32_to_f32)."""
    from .pallas_matmul import _u32_to_f32
    import numpy as np

    pu = jnp.uint32(p)
    q = jnp.round(_u32_to_f32(v)
                  * np.float32(1.0 / p)).astype(jnp.int32).astype(jnp.uint32)
    r = v - q * pu
    return jnp.where(r > jnp.uint32(1 << 31), r + pu, r)


def _addmod_u(p: int, a, b):
    pu = jnp.uint32(p)
    s = a + b  # both < p < 2**31: exact
    return jnp.where(s >= pu, s - pu, s)


def _submod_u(p: int, a, b):
    pu = jnp.uint32(p)
    return jnp.where(a >= b, a - b, a + (pu - b))


def _mulmod_u(p: int, x, y):
    """(x * y) mod p, x and y uint32 arrays (broadcastable) in [0, p),
    92681 < p < 2**31.  Exact: partials < 2**32 in uint32, shifts via
    mod-doubling."""
    mask = jnp.uint32(0xFFFF)
    x1, x0 = x >> 16, x & mask
    y1, y0 = y >> 16, y & mask
    t_lo = _modu32(p, x0 * y0)
    t_mid = _modu32(p, x1 * y0 + x0 * y1)  # each < 2**31, sum < 2**32
    t_hi = _modu32(p, x1 * y1)
    r = t_hi
    for _ in range(16):
        r = _addmod_u(p, r, r)
    r = _addmod_u(p, r, t_mid)
    for _ in range(16):
        r = _addmod_u(p, r, r)
    return _addmod_u(p, r, t_lo)


def _kernel_b(f: Field, npivcols: int, c: int,
              j0_ref, p_in, ispiv_in, P, H, sref, prow, pcol,
              pfound, ispiv):
    """Tier-B scale-free Jordan panel: the _kernel_scalefree recurrence
    (see its docstring for the derivation) with every product routed
    through the exact uint32 split multiply — division-free, so no
    per-step inverse chain for ANY p < 2**31."""
    n = P.shape[0]
    p = f.p
    P[:] = p_in[:]                      # already unsigned residues
    ispiv[:] = ispiv_in[:]
    H[:] = jnp.zeros_like(H)
    sref[:] = jnp.ones_like(sref)
    prow[:] = jnp.zeros_like(prow)
    pcol[:] = jnp.zeros_like(pcol)
    pfound[:] = jnp.zeros_like(pfound)
    j0 = j0_ref[0]
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    slotid = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    colid1 = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    u0 = jnp.uint32(0)

    def cond(carry):
        jj, kk = carry
        return jj < c

    def body(carry):
        jj0, kk = carry
        jj = _next_cand_col(P, ispiv, jj0, j0, npivcols, colid1)

        @pl.when(jj < c)
        def _step():
            Pv = P[:]
            col = jnp.sum(jnp.where(colid == jj, Pv, 0), axis=1,
                          keepdims=True)    # (n, 1) int32, in [0, p)
            cand = (col != 0) & (ispiv[:] == 0)
            pr = jnp.min(jnp.where(cand, rowid, jnp.int32(n)))
            is_pr = rowid == pr             # (n, 1)
            pv = jnp.sum(jnp.where(is_pr, col, 0))
            pvu = pv.astype(jnp.uint32)
            s_pr = jnp.sum(jnp.where(is_pr, sref[:], 0))
            s_pru = s_pr.astype(jnp.uint32)
            Prow = P[pl.ds(pr, 1), :].astype(jnp.uint32)   # (1, c)
            hrow = _addmod_u(
                p, H[pl.ds(pr, 1), :].astype(jnp.uint32),
                jnp.where(slotid == kk, s_pru, u0))
            colu = col.astype(jnp.uint32)
            colz = jnp.where(jnp.logical_not(is_pr), colu, u0)
            pvz = jnp.where(jnp.logical_not(is_pr), pvu,
                            jnp.uint32(1))  # (n, 1)
            Pu = Pv.astype(jnp.uint32)
            Hu = H[:].astype(jnp.uint32)
            P[:] = _submod_u(p, _mulmod_u(p, pvz, Pu),
                             _mulmod_u(p, colz, Prow)).astype(jnp.int32)
            H[:] = _submod_u(p, _mulmod_u(p, pvz, Hu),
                             _mulmod_u(p, colz, hrow)).astype(jnp.int32)
            # pivot row's own slot: H[pr] += (s[pr] - pv) * e_slot
            w = _submod_u(p, s_pru, pvu)
            hpr = H[pl.ds(pr, 1), :].astype(jnp.uint32)
            H[pl.ds(pr, 1), :] = _addmod_u(
                p, hpr, jnp.where(slotid == kk, w, u0)).astype(jnp.int32)
            # scales: every row picks up pv; the pivot row resets to pv
            sv = sref[:].astype(jnp.uint32)
            s_new = _mulmod_u(p, pvu, sv)
            sref[:] = jnp.where(is_pr, pvu, s_new).astype(jnp.int32)
            ispiv[:] = jnp.where(is_pr, 1, ispiv[:])
            slot_hit = slotid == kk
            prow[:] = jnp.where(slot_hit, pr, prow[:])
            pcol[:] = jnp.where(slot_hit, jj, pcol[:])
            pfound[:] = jnp.where(slot_hit, 1, pfound[:])

        stepped = (jj < c).astype(jnp.int32)
        return jnp.where(jj < c, jj + 1, jnp.int32(c)), kk + stepped

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _panel_tier_b_jit(f: Field, npivcols: int, P, is_piv_row, j0):
    from . import modmul

    n, c = P.shape
    j0_arr = jnp.asarray(j0, jnp.int32).reshape(1)
    ispiv_i32 = is_piv_row.astype(jnp.int32).reshape(n, 1)
    # balanced int32 -> unsigned residues stored in int32 (p < 2**31)
    Pu = jnp.where(P < 0, P + jnp.int32(f.p), P)
    kern = functools.partial(_kernel_b, f, npivcols, c)
    out_shapes = (
        jax.ShapeDtypeStruct((n, c), jnp.int32),   # P (s-scaled, [0,p))
        jax.ShapeDtypeStruct((n, c), jnp.int32),   # H (s-scaled G)
        jax.ShapeDtypeStruct((n, 1), jnp.int32),   # per-row scales s
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # prow
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # pcol
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # pfound
        jax.ShapeDtypeStruct((n, 1), jnp.int32),   # ispiv
    )
    Ps, Hs, sv, prow, pcol, pfound, ispiv = pl.pallas_call(
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
    )(j0_arr, Pu, ispiv_i32)
    # one vectorized Fermat inverse of the scales (modmul's tier-B path
    # accepts any representative in (-p, p), incl. the unsigned [0, p))
    e = f.p - 2
    sinv = jnp.ones_like(sv)
    base = sv
    while e:
        if e & 1:
            sinv = modmul.mul(f, sinv, base)
        base = modmul.mul(f, base, base)
        e >>= 1
    P2 = modmul.mul(f, Ps, sinv)
    G = modmul.mul(f, Hs, sinv)
    return (P2, G, prow[0], pcol[0], pfound[0].astype(bool),
            ispiv[:, 0].astype(bool))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _panel_scalefree_jit(f: Field, npivcols: int, P, is_piv_row, j0):
    n, c = P.shape
    j0_arr = jnp.asarray(j0, jnp.int32).reshape(1)
    ispiv_i32 = is_piv_row.astype(jnp.int32).reshape(n, 1)
    kern = functools.partial(_kernel_scalefree, f, npivcols, c)
    out_shapes = (
        jax.ShapeDtypeStruct((n, c), jnp.int32),   # P (s-scaled)
        jax.ShapeDtypeStruct((n, c), jnp.int32),   # H (s-scaled G)
        jax.ShapeDtypeStruct((n, 1), jnp.int32),   # per-row scales s
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # prow
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # pcol
        jax.ShapeDtypeStruct((1, c), jnp.int32),   # pfound
        jax.ShapeDtypeStruct((n, 1), jnp.int32),   # ispiv
    )
    Ps, Hs, sv, prow, pcol, pfound, ispiv = pl.pallas_call(
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
    # ONE vectorized Fermat inverse of the scale vector per panel (vs one
    # scalar inverse per pivot step): _inv_scalar's square-and-multiply is
    # elementwise jnp, so it vectorizes over (n, 1) directly
    sinv = _inv_scalar(f, sv)
    P2 = _mod_balanced_f32(f.p, Ps * sinv)
    G = _mod_balanced_f32(f.p, Hs * sinv)
    return (P2, G, prow[0], pcol[0], pfound[0].astype(bool),
            ispiv[:, 0].astype(bool))


@functools.partial(jax.jit, static_argnums=(0, 1))
def panel_eliminate_pallas(f: Field, npivcols: int, P, is_piv_row, j0):
    """Drop-in for dense._panel_eliminate with the same outputs."""
    if f.p <= _SCALEFREE_MAX_P:
        return _panel_scalefree_jit(f, npivcols, P, is_piv_row, j0)
    if f.tier == "b":
        return _panel_tier_b_jit(f, npivcols, P, is_piv_row, j0)
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
