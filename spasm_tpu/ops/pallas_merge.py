"""Pallas TPU kernel: fused per-row bitonic merge + segmented modular sum.

This is the device SPA's hot stage (ops/sparse_onepass.py): given a
(R, W) tile of (col, val) contributions per row — the row's own entries
plus its scaled U*-row expansions — sort each row by column, sum runs of
equal columns exactly mod p, and flag the surviving slots.  The host
analog is csrc/schur_mod.c's scatter accumulator (the reference's
spasm_scatter.c inner loop, src/SpaSM.jl:619-621); a TPU has no efficient
random scatter, so the accumulator becomes a lane-axis bitonic network +
log-shift scan, entirely in VMEM (one HBM read + one write per slot,
no intermediate round trips — the XLA lax.sort path materializes both).

W must be a power of two >= 128 (lane width); the row-block size adapts
so a tile stays ~128k elements.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from . import modmul


def _addmod_fn(f: Field):
    if f.p <= (1 << 30):
        half = jnp.int32(f.halfp)
        mhalf = jnp.int32(f.mhalfp)
        p = jnp.int32(f.p)

        def fold_add(a, b):
            s = a + b
            s = jnp.where(s > half, s - p, s)
            return jnp.where(s < mhalf, s + p, s)

        return fold_add
    return lambda a, b: modmul.add(f, a, b)


def _merge_kernel_body(f: Field, W: int,
                       m_ref, cols_ref, vals_ref,
                       ocols_ref, ovals_ref, keep_ref):
    m = m_ref[0]
    cols = cols_ref[:]
    vals = vals_ref[:]
    RB = cols.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, W), 1)
    add = _addmod_fn(f)

    # --- bitonic sort by col, vals carried ---------------------------------
    k = 2
    while k <= W:
        j = k // 2
        while j >= 1:
            pc = jnp.where((lane & j) == 0,
                           pltpu.roll(cols, W - j, 1),
                           pltpu.roll(cols, j, 1))
            pv = jnp.where((lane & j) == 0,
                           pltpu.roll(vals, W - j, 1),
                           pltpu.roll(vals, j, 1))
            lower = (lane & j) == 0
            asc = (lane & k) == 0 if k < W else jnp.bool_(True)
            want_larger = lower != asc
            # logical form, not where(bool, bool, bool): Mosaic lowers a
            # bool select to an i8->i1 trunci it cannot compile
            swap = (want_larger & (pc > cols)) | (~want_larger & (pc < cols))
            cols = jnp.where(swap, pc, cols)
            vals = jnp.where(swap, pv, vals)
            j //= 2
        k *= 2

    # --- segmented inclusive modular sum over equal-col runs ---------------
    # flags ride as int32 0/1: Mosaic cannot tpu.dynamic_rotate i1 vectors
    prev_col = pltpu.roll(cols, 1, 1)
    change = ((lane == 0) | (cols != prev_col)).astype(jnp.int32)
    v = vals
    flg = change
    shift = 1
    while shift < W:
        v_prev = jnp.where(lane >= shift, pltpu.roll(v, shift, 1), 0)
        f_prev = jnp.maximum(pltpu.roll(flg, shift, 1),
                             (lane < shift).astype(jnp.int32))
        v = jnp.where(flg > 0, v, add(v, v_prev))
        flg = jnp.maximum(flg, f_prev)
        shift <<= 1
    next_col = pltpu.roll(cols, W - 1, 1)
    last = (lane == W - 1) | (cols != next_col)
    keep = last & (v != 0) & (cols < m)
    ocols_ref[:] = cols
    ovals_ref[:] = v
    # int32 mask out (i1 VMEM stores are another Mosaic unsupported case)
    keep_ref[:] = keep.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0,))
def merge_rows_pallas(f: Field, tile_cols, tile_vals, m):
    """Sort+merge every row of (R, W) int32 (cols, vals); W pow2 >= 128.
    Returns (cols, vals, keep) like the lax.sort path in sparse_onepass.
    ``m`` (the column-sentinel bound) may be traced — it rides in SMEM."""
    R, W = tile_cols.shape
    assert W >= 128 and (W & (W - 1)) == 0, W
    RB = max(8, min(R, (1 << 17) // W))
    while R % RB:
        RB //= 2
    RB = max(RB, 1)
    grid = (R // RB,)
    kern = functools.partial(_merge_kernel_body, f, W)
    m_arr = jnp.asarray(m, jnp.int32).reshape(1)
    cols_s, v, keep_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((R, W), jnp.int32),
        ],
    )(m_arr, tile_cols, tile_vals)
    return cols_s, v, keep_i.astype(jnp.bool_)
