"""Device-resident multi-round structural elimination.

The host echelonize driver (echelonize.py) re-wraps the Schur complement
in scipy every round; this module is the TPU-resident equivalent of the
reference's in-memory round loop (``spasm_echelonize``'s pivot-search +
``spasm_schur`` iteration, src/SpaSM.jl:758-778,860-866): the working
matrix lives on device as sorted fixed-capacity COO across ALL rounds,
and each round is ONE fused jitted step —

  1. per-row segment metadata (leading column, weight) via the sort order;
  2. Faugère-Lachartre election entirely on device: one (n,)-sized sort by
     (leading column, weight, row), first-of-column wins;
  3. pivot rows scaled to unit pivots (vectorized Fermat inverse) and
     packed into a padded ELL block by GATHERS (no host loop, no scatter
     with duplicate indices on the hot path);
  4. elimination-DAG levels by a scatter-max fixpoint;
  5. the level-wave expand/sort/reduce elimination
     (ops/sparse_device.make_wave_body) over a traced depth;
  6. this round's pivots appended to device-side U/metadata pools.

Only four scalars (npiv, overflow, nnz, active rows) cross the link per
round for the stopping rules — S, U and all metadata stay on device until
the loop ends.  Capacity overflow (entry pool, per-wave hits, ELL width,
pivot pool) aborts the device phase with the previous round's state
intact; the host loop continues from there.

Pivot strategy is FL-rows only (the device analog of
``spasm_pivots_extract_structural``'s first phase, src/SpaSM.jl:775-778);
the host loop's FL-cols/greedy completion still runs afterwards on the
residual, so the combined pivot quality matches the host-only path over
extra rounds.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..field import Field
from . import modmul
from .sparse_device import make_wave_body

DEFAULT_KU = 96


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _round_step(f: Field, cap: int, cap_hits: int, ku: int, npool: int,
                nm, rows, cols, vals, up_cols, up_vals, up_pcol, up_prow,
                col2piv_pool, r_dev):
    n, m = nm
    idx = jnp.arange(cap, dtype=jnp.int32)
    live = rows < n
    prev_same = jnp.concatenate(
        [jnp.zeros(1, bool), rows[1:] == rows[:-1]])
    next_same = jnp.concatenate(
        [rows[1:] == rows[:-1], jnp.zeros(1, bool)])
    is_first = live & ~prev_same
    is_last = live & ~next_same

    # per-row segment metadata (entries sorted by (row, col): the leading
    # entry of each row is its first)
    rows_f = jnp.where(is_first, rows, n)
    first_of_row = jnp.full(n + 1, cap, jnp.int32).at[rows_f].min(idx)[:n]
    rows_l = jnp.where(is_last, rows, n)
    last1_of_row = jnp.zeros(n + 1, jnp.int32).at[rows_l].max(idx + 1)[:n]
    has_row = first_of_row < cap
    weight = jnp.where(has_row, last1_of_row - first_of_row, 0)
    fo = jnp.clip(first_of_row, 0, cap - 1)
    lead_col = jnp.where(has_row, cols[fo], m)
    lead_val = jnp.where(has_row, vals[fo], 0)
    act_rows = has_row.sum()

    # FL election: sort rows by (lead_col, weight, row); the first row of
    # each lead-column group wins that column (lightest, lowest index —
    # deterministic)
    rid = jnp.arange(n, dtype=jnp.int32)
    sc, sw, sr = jax.lax.sort((lead_col, weight, rid), num_keys=3)
    won = (sc < m) & jnp.concatenate(
        [jnp.ones(1, bool), sc[1:] != sc[:-1]])
    pividx_s = jnp.cumsum(won.astype(jnp.int32)) - 1   # valid where won
    npiv = won.sum()
    is_piv_row = jnp.zeros(n, bool).at[sr].set(won)    # sr is a permutation
    # per-pivot (by increasing pivot column) metadata; slot n is trash
    tgt = jnp.where(won, pividx_s, n)
    piv_row_of = jnp.zeros(n + 1, jnp.int32).at[tgt].set(sr)[:n]
    piv_col_of = jnp.zeros(n + 1, jnp.int32).at[tgt].set(sc)[:n]
    ctgt = jnp.where(won, sc, m)
    col2piv = jnp.full(m + 1, -1, jnp.int32).at[ctgt].set(
        jnp.where(won, pividx_s, -1))[:m]

    # scale pivot rows to unit pivots; build the U ELL block by gathers
    pv = lead_val[piv_row_of]
    pinv = modmul.inv_scalar(f, pv)                    # vectorized Fermat
    ku_ovf = jnp.any(jnp.where(is_piv_row, weight, 0) > ku)
    kpos = jnp.arange(ku, dtype=jnp.int32)[None, :]
    kid = jnp.arange(n, dtype=jnp.int32)[:, None]
    src = first_of_row[piv_row_of][:, None] + kpos     # (n, ku)
    u_valid = (kpos < weight[piv_row_of][:, None]) & (kid < npiv)
    srcc = jnp.clip(src, 0, cap - 1)
    u_cols = jnp.where(u_valid, cols[srcc], -1)
    u_vals = jnp.where(u_valid, modmul.mul(f, vals[srcc], pinv[:, None]), 0)

    # elimination-DAG levels (longest path) by scatter-max fixpoint
    hit = jnp.where(u_cols >= 0, col2piv[jnp.clip(u_cols, 0, m - 1)], -1)
    edge = (hit >= 0) & (hit != kid) & u_valid
    src_k = jnp.where(edge, kid, 0).ravel()
    dst_k = jnp.where(edge, hit, n).ravel()
    edge_f = edge.ravel()

    def lev_cond(c):
        _, changed, it = c
        return changed & (it < n)

    def lev_body(c):
        lev, _, it = c
        cand = jnp.where(edge_f, lev[src_k] + 1, 0)
        new = jnp.zeros(n + 1, jnp.int32).at[dst_k].max(cand)[:n]
        new = jnp.maximum(new, lev)
        return new, jnp.any(new != lev), it + 1

    lev, _, _ = jax.lax.while_loop(
        lev_cond, lev_body,
        (jnp.zeros(n, jnp.int32), npiv > 0, jnp.int32(0)))
    depth = jnp.where(npiv > 0, lev.max() + 1, 0)

    # drop pivot rows from S, then run the level waves
    entry_piv = live & is_piv_row[jnp.clip(rows, 0, n - 1)]
    rows_w = jnp.where(entry_piv, n, rows)
    cols_w = jnp.where(entry_piv, 0, cols)
    vals_w = jnp.where(entry_piv, 0, vals)
    one_wave = make_wave_body(f, cap, cap_hits, u_cols, u_vals, lev,
                              col2piv, jnp.int32(n))
    ovf0 = ku_ovf & False  # input-derived False
    rows_w, cols_w, vals_w, wave_ovf = jax.lax.fori_loop(
        0, depth, one_wave, (rows_w, cols_w, vals_w, ovf0))
    nnz = (rows_w < n).sum()

    # append this round's pivots to the device pools
    pool_ovf = (r_dev + npiv) > npool
    pool_row = jnp.where((kid[:, 0] < npiv) & ~pool_ovf,
                         r_dev + kid[:, 0], npool)
    up_cols = up_cols.at[pool_row].set(u_cols, mode="drop")
    up_vals = up_vals.at[pool_row].set(u_vals, mode="drop")
    up_pcol = up_pcol.at[pool_row].set(piv_col_of, mode="drop")
    up_prow = up_prow.at[pool_row].set(piv_row_of, mode="drop")
    col2piv_pool = jnp.where((col2piv >= 0) & ~pool_ovf,
                             col2piv + r_dev, col2piv_pool)
    r_new = r_dev + jnp.where(pool_ovf, 0, npiv)
    overflow = ku_ovf | wave_ovf | pool_ovf
    return (rows_w, cols_w, vals_w, up_cols, up_vals, up_pcol, up_prow,
            col2piv_pool, r_new, npiv, overflow, nnz, act_rows)


def _bucket_pow2(x: int, lo: int = 1 << 14) -> int:
    return max(lo, 1 << int(max(1, x - 1)).bit_length())


def device_echelon_rounds(f: Field, S, opts, max_round: int,
                          cap_factor: int = 8, ku: int = DEFAULT_KU):
    """Run FL structural-pivot rounds fully on device.

    S: scipy csr (canonical, mod-reduced).  Returns None if the device
    phase could not run (round-0 overflow), else a dict with
    ``U`` (scipy csr, unit pivot rows in elimination order), ``pcols``,
    ``prows`` (pivot row ids in S's numbering), ``S_rest`` (scipy csr,
    same shape as S with pivot rows emptied), and ``rounds``.
    """
    import scipy.sparse as sp

    n, m = S.shape
    nnz0 = S.nnz
    if nnz0 == 0 or n == 0:
        return None
    cap = _bucket_pow2(cap_factor * nnz0)
    cap_hits = max(1 << 12, cap // 8)
    npool = min(n, m)
    Sc = S.tocoo()
    order = np.lexsort((Sc.col, Sc.row))
    ri, ci, vi = Sc.row[order], Sc.col[order], Sc.data[order]
    rows = np.full(cap, n, np.int32)
    cols = np.zeros(cap, np.int32)
    vals = np.zeros(cap, np.int32)
    rows[:ri.size] = ri
    cols[:ci.size] = ci
    vals[:vi.size] = vi

    state = (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
             jnp.full((npool, ku), -1, jnp.int32),
             jnp.zeros((npool, ku), jnp.int32),
             jnp.zeros(npool, jnp.int32),
             jnp.zeros(npool, jnp.int32),
             jnp.full(m, -1, jnp.int32),
             jnp.int32(0))
    rounds = 0
    while rounds < max_round:
        out = _round_step(f, cap, cap_hits, ku, npool, (n, m), *state)
        new_state = out[:9]
        npiv, ovf, nnz, act = jax.device_get(out[9:13])
        if ovf:
            if rounds == 0:
                return None  # nothing accepted; host path takes over
            break
        state = new_state
        rounds += 1
        if npiv == 0 or nnz == 0:
            break
        if npiv < opts.min_pivot_proportion * max(1, min(int(act), m)):
            break
        dens = int(nnz) / max(1, int(act) * m)
        if dens >= opts.sparsity_threshold:
            break
    r = int(jax.device_get(state[8]))
    if r == 0:
        return None

    rows_d, cols_d, vals_d = state[0], state[1], state[2]
    up_cols, up_vals, up_pcol, up_prow = state[3], state[4], state[5], state[6]
    nnz_s = int(jax.device_get((rows_d < n).sum()))
    # S is compacted to the front after each wave's sort
    sr = np.asarray(rows_d[:nnz_s]).astype(np.int64)
    sc_ = np.asarray(cols_d[:nnz_s]).astype(np.int64)
    sv = np.asarray(vals_d[:nnz_s]).astype(np.int64)
    S_rest = sp.csr_matrix((sv, (sr, sc_)), shape=(n, m), dtype=np.int64)
    # U pool -> csr (first r rows of the ELL block)
    uc = np.asarray(up_cols[:r])
    uv = np.asarray(up_vals[:r])
    uok = uc >= 0
    urow = np.repeat(np.arange(r, dtype=np.int64), uok.sum(axis=1))
    U = sp.csr_matrix(
        (uv[uok].astype(np.int64), (urow, uc[uok].astype(np.int64))),
        shape=(r, m), dtype=np.int64)
    pcols = np.asarray(up_pcol[:r]).astype(np.int64)
    prows = np.asarray(up_prow[:r]).astype(np.int64)
    return dict(U=U, pcols=pcols, prows=prows, S_rest=S_rest,
                rounds=rounds, r=r)
