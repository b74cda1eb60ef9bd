"""Device-resident multi-round structural elimination.

The host echelonize driver (echelonize.py) re-wraps the Schur complement
in scipy every round; this module is the TPU-resident equivalent of the
reference's in-memory round loop (``spasm_echelonize``'s pivot-search +
``spasm_schur`` iteration, src/SpaSM.jl:758-778,860-866): the working
matrix lives on device as fixed-capacity COO across ALL rounds, and a
round is driven by three small jitted programs (deliberately small — one
fused megaprogram is slow to compile on remote-compile links):

``_round_begin``
  one (cap,)-sort + duplicate-sum + compaction of the entry pool, per-row
  segment metadata, Faugère-Lachartre election (an (n,)-sort by leading
  column / weight / row; first of each column wins), vectorized Fermat
  inverses, gather-based ELL packing of the pivot block, a scatter-max
  level fixpoint, and removal of the pivot rows from S.

``_wave_bounded``
  ONE elimination wave: a 2-bit-key sort groups the pool as [level-t
  hits][other live][dead], then the hits are expanded in fixed-size
  chunks (ELL gather + compact + append at the write pointer), consuming
  the hit entries and skipping each U row's unit-pivot entry (equivalent
  to emitting the cancellation, by linearity).  Duplicate (row, col)
  positions are allowed to accumulate — each partial coefficient emits
  separately — and are only summed at the next round's sort.  Every op is
  bounded by O(pool sort) or O(chunk * ku): the earlier whole-pool
  gather/nonzero/scatter formulation faulted the TPU at 2^25-entry pools.

``_extract``
  final sort + duplicate-sum + compaction for reading S back.

Pivots accumulate in device pools; only stop-rule scalars (npiv, depth,
overflow, nnz) cross the host link each round.  Capacity overflow (entry
pool, per-wave hits, ELL width, pivot pool) aborts the device phase with
the previous round's state intact; the host loop continues from there,
adding FL-cols/greedy completion and any remaining rounds on the
residual.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..field import Field
from . import modmul
from .sparse_device import _segments_sum_mod

DEFAULT_KU = 64


def _partition_keep(n: int, keep, rows, cols, vals):
    """Stable-compact keepers to the front via ONE lax.sort on the keep
    flag (lax.sort is stable).  Avoids jnp.nonzero(size=cap): its
    scatter-based lowering stalls/faults the TPU at 2^25-element pools
    (NOTES_r2.md), while same-size sorts run fine."""
    ks = jnp.where(keep, jnp.int32(0), jnp.int32(1))
    ks, rows, cols, vals = jax.lax.sort((ks, rows, cols, vals), num_keys=1)
    dead = ks != 0
    rows = jnp.where(dead, n, rows)
    cols = jnp.where(dead, 0, cols)
    vals = jnp.where(dead, 0, vals)
    return rows, cols, vals, (ks == 0).sum()


@functools.partial(jax.jit, static_argnums=(0, 1))
def _compact(f: Field, nm, rows, cols, vals):
    """Sort by (row, col), sum duplicate positions mod p, drop zeros and
    dead entries, compact live entries to the front.  Returns the new
    (rows, cols, vals, nnz)."""
    n, m = nm
    cap = rows.shape[0]
    rows, cols, vals = jax.lax.sort((rows, cols, vals), num_keys=2)
    change = jnp.ones(cap, bool)
    change = change.at[1:].set(
        (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1]))
    sums = _segments_sum_mod(f, vals, change)
    is_last = jnp.ones(cap, bool)
    is_last = is_last.at[:-1].set(change[1:])
    keep = is_last & (sums != 0) & (rows < n)
    rows, cols, vals, nnz = _partition_keep(n, keep, rows, cols, sums)
    return rows, cols, vals, nnz


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _round_begin(f: Field, nm, ku: int, npool: int,
                 rows, cols, vals, up_cols, up_vals, up_pcol, up_prow,
                 r_dev):
    """Compact the pool, elect FL pivots, build the scaled pivot ELL block
    and its wave levels, drop pivot rows from S, append to the pools.

    Returns (state..., u_cols, u_vals, lev, col2piv, write_ptr, npiv,
    depth, overflow)."""
    n, m = nm
    cap = rows.shape[0]
    # input invariant: entries sorted by (row, col), duplicates summed,
    # live entries compacted to the front (host upload / _compact output)
    nnz = (rows < n).sum()
    idx = jnp.arange(cap, dtype=jnp.int32)
    live = rows < n
    prev_same = jnp.concatenate(
        [jnp.zeros(1, bool), rows[1:] == rows[:-1]])
    next_same = jnp.concatenate(
        [rows[1:] == rows[:-1], jnp.zeros(1, bool)])
    is_first = live & ~prev_same
    is_last = live & ~next_same
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

    # FL election: first row of each leading-column group (lightest,
    # lowest index — deterministic)
    rid = jnp.arange(n, dtype=jnp.int32)
    sc, sw, sr = jax.lax.sort((lead_col, weight, rid), num_keys=3)
    won = (sc < m) & jnp.concatenate(
        [jnp.ones(1, bool), sc[1:] != sc[:-1]])
    pividx_s = jnp.cumsum(won.astype(jnp.int32)) - 1
    npiv = won.sum()
    is_piv_row = jnp.zeros(n, bool).at[sr].set(won)    # sr is a permutation
    tgt = jnp.where(won, pividx_s, n)                  # slot n is trash
    piv_row_of = jnp.zeros(n + 1, jnp.int32).at[tgt].set(sr)[:n]
    piv_col_of = jnp.zeros(n + 1, jnp.int32).at[tgt].set(sc)[:n]
    ctgt = jnp.where(won, sc, m)
    col2piv = jnp.full(m + 1, -1, jnp.int32).at[ctgt].set(
        jnp.where(won, pividx_s, -1))[:m]

    # scale pivot rows to unit pivots; ELL block built by gathers
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

    # drop pivot rows from S (they live on in the U pool)
    entry_piv = live & is_piv_row[jnp.clip(rows, 0, n - 1)]
    rows = jnp.where(entry_piv, n, rows)
    cols = jnp.where(entry_piv, 0, cols)
    vals = jnp.where(entry_piv, 0, vals)
    n_dropped = entry_piv.sum()
    # pool entries are compacted: live region is [0, nnz) minus dropped
    # pivot entries interleaved — the wave appends go after nnz anyway
    write_ptr = nnz

    # append this round's pivots to the device pools
    pool_ovf = (r_dev + npiv) > npool
    pool_row = jnp.where((kid[:, 0] < npiv) & ~pool_ovf,
                         r_dev + kid[:, 0], npool)
    up_cols = up_cols.at[pool_row].set(u_cols, mode="drop")
    up_vals = up_vals.at[pool_row].set(u_vals, mode="drop")
    up_pcol = up_pcol.at[pool_row].set(piv_col_of, mode="drop")
    up_prow = up_prow.at[pool_row].set(piv_row_of, mode="drop")
    r_new = r_dev + jnp.where(pool_ovf, 0, npiv)
    overflow = ku_ovf | pool_ovf
    return (rows, cols, vals, up_cols, up_vals, up_pcol, up_prow, r_new,
            u_cols, u_vals, lev, col2piv, write_ptr, npiv, depth,
            overflow, act_rows)


# expansion-op element budget for one hit chunk: every per-chunk op is
# bounded by ~2^21 elements regardless of pool size (the earlier
# whole-pool nonzero/gather/scatter formulation faulted the TPU at
# 2^25-entry pools — see NOTES_r2.md)
_CHUNK_ELEMS = 1 << 21


def _chunk_width(ku: int) -> int:
    return max(1 << 12, _CHUNK_ELEMS // ku)


def _wave_bounded(f: Field, n: int, rows, cols, vals, u_cols, u_vals,
                  lev, col2piv, t, write_ptr, overflow):
    """One elimination wave with bounded-size ops.

    A 2-bit-key sort groups the pool as [level-t hits][other live][dead];
    hits are then expanded in fixed _CHUNK-sized pieces (each piece: ELL
    gather, mask, compact, append) under a while_loop with a dynamic trip
    count.  Hits are CONSUMED (killed after expansion) and the pivot-
    column entry of each U row is skipped — algebraically identical to
    emitting the cancellation (the old formulation), by linearity."""
    cap = rows.shape[0]
    npiv_cap, ku = u_cols.shape
    CH = min(_chunk_width(ku), cap)
    m = col2piv.shape[0]
    piv = col2piv[jnp.clip(cols, 0, m - 1)]
    live = (rows < n) & (vals != 0)
    is_hit = live & (piv >= 0) & (lev[jnp.clip(piv, 0, npiv_cap - 1)] == t)
    key = jnp.where(is_hit, 0, jnp.where(live, 1, 2)).astype(jnp.int32)
    # sort by (hit-flag, row, col): dedups AND groups hits in a prefix in
    # one pass (hit-ness is a column property, so a (row, col) group never
    # straddles keys 0/1).  Summing duplicates EVERY wave keeps the pool
    # at the true fill (the defer-to-round-end variant overflowed 8x nnz
    # pools on cascade-heavy structured matrices).
    key, rows, cols, vals = jax.lax.sort((key, rows, cols, vals),
                                         num_keys=3)
    from .sparse_device import _segments_sum_mod

    change = jnp.ones(cap, bool)
    change = change.at[1:].set((key[1:] != key[:-1])
                               | (rows[1:] != rows[:-1])
                               | (cols[1:] != cols[:-1]))
    sums = _segments_sum_mod(f, vals, change)
    is_last = jnp.ones(cap, bool)
    is_last = is_last.at[:-1].set(change[1:])
    keep = is_last & (sums != 0) & (key <= 1)
    # stable keep-partition preserves the (hit, row, col) order, so hits
    # stay a contiguous prefix (sort-based — see _partition_keep)
    ks = jnp.where(keep, key, jnp.int32(2))
    ks, rows, cols, vals = jax.lax.sort((ks, rows, cols, sums), num_keys=1)
    dead = ks == 2
    rows = jnp.where(dead, n, rows)
    cols = jnp.where(dead, 0, cols)
    vals = jnp.where(dead, 0, vals)
    nhits = (ks == 0).sum().astype(jnp.int32)
    nlive = (ks <= 1).sum().astype(jnp.int32)  # hits + other live
    wp0 = nlive  # appends start right after the live region

    def chunk_cond(c):
        ci, _, _, _, wp, ovf = c
        return (ci * CH < nhits) & jnp.logical_not(ovf)

    def chunk_body(c):
        ci, rows, cols, vals, wp, ovf = c
        base = ci * CH
        h_rows = jax.lax.dynamic_slice(rows, (base,), (CH,))
        h_cols = jax.lax.dynamic_slice(cols, (base,), (CH,))
        h_vals = jax.lax.dynamic_slice(vals, (base,), (CH,))
        in_range = (jnp.arange(CH, dtype=jnp.int32) + base) < nhits
        h_piv = jnp.where(in_range,
                          col2piv[jnp.clip(h_cols, 0, m - 1)], 0)
        h_piv = jnp.clip(h_piv, 0, npiv_cap - 1)
        e_cols = u_cols[h_piv]                          # (CH, ku)
        e_vals = modmul.mul(f, modmul.neg(f, h_vals)[:, None],
                            u_vals[h_piv])
        e_rows = jnp.broadcast_to(h_rows[:, None], e_cols.shape)
        own_piv = jnp.where(
            e_cols >= 0, col2piv[jnp.clip(e_cols, 0, m - 1)], -1)
        e_live = ((e_cols >= 0) & (e_vals != 0) & in_range[:, None]
                  & (own_piv != h_piv[:, None]))  # skip the unit pivot
        flat = e_live.ravel()
        n_emit = flat.sum().astype(jnp.int32)
        ovf = ovf | (wp + n_emit > cap)
        eidx = jnp.nonzero(flat, size=CH * ku,
                           fill_value=CH * ku)[0]
        eok = eidx < CH * ku
        ei = jnp.clip(eidx, 0, CH * ku - 1)
        a_rows = jnp.where(eok, e_rows.ravel()[ei], n)
        a_cols = jnp.where(eok, e_cols.ravel()[ei], 0)
        a_vals = jnp.where(eok, e_vals.ravel()[ei], 0)
        tgt = jnp.where(eok, wp + jnp.arange(CH * ku,
                                             dtype=jnp.int32), cap)
        rows = rows.at[tgt].set(a_rows, mode="drop", unique_indices=True)
        cols = cols.at[tgt].set(a_cols, mode="drop", unique_indices=True)
        vals = vals.at[tgt].set(a_vals, mode="drop", unique_indices=True)
        return ci + 1, rows, cols, vals, wp + n_emit, ovf

    _, rows, cols, vals, wp, overflow = jax.lax.while_loop(
        chunk_cond, chunk_body,
        (jnp.int32(0), rows, cols, vals, wp0, overflow))
    # consume the hits: kill slots [0, nhits)
    idx = jnp.arange(cap, dtype=jnp.int32)
    dead = idx < nhits
    rows = jnp.where(dead, n, rows)
    cols = jnp.where(dead, 0, cols)
    vals = jnp.where(dead, 0, vals)
    return rows, cols, vals, wp, overflow


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _waves_all(f: Field, n: int, cap_hits: int, depth,
               rows, cols, vals, u_cols, u_vals, lev, col2piv, write_ptr):
    """All elimination waves in one dispatch (fori_loop over the traced
    depth) — one host->device round trip per round instead of per wave.
    cap_hits is kept in the signature for call compatibility; the bounded
    formulation has no per-wave hit capacity (hits are chunked)."""

    def body(t, carry):
        rows, cols, vals, wp, ovf = carry
        return _wave_bounded(f, n, rows, cols, vals, u_cols,
                             u_vals, lev, col2piv, t, wp, ovf)

    ovf0 = depth < 0  # input-derived False
    return jax.lax.fori_loop(
        0, depth, body, (rows, cols, vals, write_ptr, ovf0))


def _bucket_pow2(x: int, lo: int = 1 << 14) -> int:
    return max(lo, 1 << int(max(1, x - 1)).bit_length())


def device_echelon_rounds(f: Field, S, opts, max_round: int,
                          cap_factor: int = 8, ku: int | None = None):
    """Run FL structural-pivot rounds fully on device.

    S: scipy csr (canonical, mod-reduced).  Returns None if the device
    phase could not run (round-0 overflow or a pool past the validated
    size envelope — see EchelonizeOptions.device_rounds_max_pool), else a
    dict with ``U`` (scipy csr, unit pivot rows in elimination order),
    ``pcols``, ``prows`` (pivot row ids in S's numbering), ``S_rest``
    (scipy csr, same shape as S with pivot rows removed/empty), and
    ``rounds``.
    """
    import scipy.sparse as sp

    n, m = S.shape
    nnz0 = S.nnz
    if nnz0 == 0 or n == 0:
        return None
    cap = _bucket_pow2(cap_factor * nnz0)
    max_pool = getattr(opts, "device_rounds_max_pool", 1 << 22)
    if max_pool and cap > max_pool:
        return None  # untested envelope: host loop takes over
    cap_hits = max(1 << 12, cap // 16)
    if ku is None:
        max_len = int(np.diff(S.indptr).max()) if nnz0 else 1
        ku = min(128, _bucket_pow2(max_len, lo=16))
    # bucket the id spaces so one compiled program serves a whole range of
    # matrix shapes (distinct shapes would otherwise recompile everything
    # — minutes over a remote-compile link).  Rows >= n simply never hold
    # entries; columns >= m never win an election.
    n_b = _bucket_pow2(n, lo=1 << 12)
    m_b = _bucket_pow2(m, lo=1 << 12)
    npool = _bucket_pow2(min(n, m), lo=1 << 12)
    Sc = S.tocoo()
    rows = np.full(cap, n_b, np.int32)
    cols = np.zeros(cap, np.int32)
    vals = np.zeros(cap, np.int32)
    rows[:Sc.row.size] = Sc.row
    cols[:Sc.col.size] = Sc.col
    vals[:Sc.data.size] = Sc.data
    state = (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
             jnp.full((npool, ku), -1, jnp.int32),
             jnp.zeros((npool, ku), jnp.int32),
             jnp.zeros(npool, jnp.int32),
             jnp.zeros(npool, jnp.int32),
             jnp.int32(0))
    rounds = 0
    nm = (n_b, m_b)
    stop = "max_round"
    nnz_last = nnz0
    while rounds < max_round:
        out = _round_begin(f, nm, ku, npool, *state)
        cand_state = out[:8]
        u_cols, u_vals, lev, col2piv, write_ptr = out[8:13]
        depth_d = out[14]
        rows_w, cols_w, vals_w, write_ptr, ovf_d = _waves_all(
            f, n_b, cap_hits, depth_d, cand_state[0], cand_state[1],
            cand_state[2], u_cols, u_vals, lev, col2piv, write_ptr)
        rows_w, cols_w, vals_w, nnz_d = _compact(f, nm, rows_w, cols_w,
                                                 vals_w)
        npiv, ovf0, act, wave_ovf, nnz_true = jax.device_get(
            (out[13], out[15], out[16], ovf_d, nnz_d))
        if ovf0 or bool(wave_ovf):
            stop = "overflow"
            break
        if int(npiv) == 0:
            stop = "no-pivots"
            break
        state = (rows_w, cols_w, vals_w) + cand_state[3:]
        rounds += 1
        nnz_last = int(nnz_true)
        if int(npiv) < opts.min_pivot_proportion * max(1, min(int(act), m)):
            stop = "pivots"
            break
        if nnz_last == 0:
            stop = "empty"
            break
        if nnz_last / max(1, int(act) * m) >= opts.sparsity_threshold:
            stop = "density"
            break
    if rounds == 0:
        return None
    r = int(jax.device_get(state[7]))
    if r == 0:
        return None

    # accepted states are already compacted (round-end _compact)
    rows_c, cols_c, vals_c = state[0], state[1], state[2]

    def materialize_S():
        sr = np.asarray(rows_c[:nnz_last]).astype(np.int64)
        sc_ = np.asarray(cols_c[:nnz_last]).astype(np.int64)
        sv = np.asarray(vals_c[:nnz_last]).astype(np.int64)
        return sp.csr_matrix((sv, (sr, sc_)), shape=(n, m), dtype=np.int64)

    # U pool -> csr (first r rows of the ELL block)
    uc = np.asarray(state[3][:r])
    uv = np.asarray(state[4][:r])
    uok = uc >= 0
    urow = np.repeat(np.arange(r, dtype=np.int64), uok.sum(axis=1))
    U = sp.csr_matrix(
        (uv[uok].astype(np.int64), (urow, uc[uok].astype(np.int64))),
        shape=(r, m), dtype=np.int64)
    pcols = np.asarray(state[5][:r]).astype(np.int64)
    prows = np.asarray(state[6][:r]).astype(np.int64)
    return dict(U=U, pcols=pcols, prows=prows,
                materialize_S=materialize_S, rounds=rounds, r=r,
                stop=stop, nnz_rest=nnz_last, n_b=n_b,
                S_dev=(rows_c, cols_c, vals_c))


# ---------- device-S -> dense-finish bridge (no host round trip) ----------


@functools.partial(jax.jit, static_argnums=(0,))
def _renumber_rows(n_b: int, rows):
    """Compact the (sorted) pool's row ids to 0..nact-1.  Returns the
    renumbered rows (dead entries -> n_b), the original id of each compact
    row (orig_of, (n_b,)), and nact."""
    cap = rows.shape[0]
    live = rows < n_b
    prev_same = jnp.concatenate([jnp.zeros(1, bool), rows[1:] == rows[:-1]])
    is_first = live & ~prev_same
    new_of_entry = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    rows2 = jnp.where(live, new_of_entry, n_b)
    tgt = jnp.where(is_first, new_of_entry, n_b)
    orig_of = jnp.zeros(n_b + 1, jnp.int32).at[tgt].set(rows)[:n_b]
    return rows2, orig_of, is_first.sum()


@jax.jit
def _block_offsets(rows, bounds):
    """searchsorted offsets of the (sorted, renumbered) rows at the block
    boundaries."""
    return jnp.searchsorted(rows, bounds)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _slice_block(ncap: int, n_b: int, rows, cols, vals, off, count, b0):
    """Extract a block's entries: ncap (static, bucketed) entries starting
    at off, masked to the first `count`, rows rebased to b0."""
    cap = rows.shape[0]
    off = jnp.minimum(off, cap - ncap)
    r = jax.lax.dynamic_slice(rows, (off,), (ncap,))
    c = jax.lax.dynamic_slice(cols, (off,), (ncap,))
    v = jax.lax.dynamic_slice(vals, (off,), (ncap,))
    ok = jnp.arange(ncap, dtype=jnp.int32) < count
    r = jnp.where(ok, r - b0, 0)
    c = jnp.where(ok, c, 0)
    v = jnp.where(ok, v, 0)
    return r, c, v
