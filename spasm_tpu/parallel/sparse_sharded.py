"""Row-sharded sparse Schur updates over a device mesh.

The sparse analog of sharded.py's dense rounds (SURVEY.md section 2.11,
item 1): the working matrix's rows are partitioned across the mesh, the
pivot-row block U (selected per round) is replicated — the role the
pivot-row all-gather plays over ICI — and every shard eliminates its rows
independently with the device-resident sparse waves
(ops/sparse_device.wave_eliminate_device).  No cross-shard traffic is
needed during a wave: Schur updates are row-local once U is replicated.

Pivot selection: ``sharded_fl_election`` runs the Faugère-Lachartre row
election fully on device — per-shard segment reductions over the local COO
entries, then two ``pmin`` all-reduces over the mesh (weight, then row-id
tie-break) — bit-identical to the host ``pivots.fl_row_pivots`` and
independent of shard count.  The FL-cols/greedy completion strategies stay
host-side (they see only the small residual after FL).

Multi-process: every helper routes H2D through ``_global_put`` and D2H
through ``_global_get``, which switch to
``jax.make_array_from_process_local_data`` / ``process_allgather`` when
``jax.process_count() > 1`` — the same code path then runs across hosts
over DCN (each process holds the same host-global matrix, the device work
is sharded; see tools/multihost_demo.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..csr import SparseGFp
from ..field import Field
from ..ops.sparse_device import ell_pack, wave_eliminate_device

BIG = np.int32(2**31 - 1)


def _global_put(x, sharding):
    """device_put that also works when the mesh spans processes (each
    process passes the identical host-global array)."""
    if jax.process_count() > 1:
        # explicit global_shape: x IS the host-global array (identical on
        # every process); the API slices out this process's shards
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape=np.shape(x))
    return jax.device_put(jnp.asarray(x), sharding)


def _global_get(x) -> np.ndarray:
    """Fetch a (possibly cross-process) sharded array to every host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def shard_rows(B: SparseGFp, nshards: int, cap_per_shard: int):
    """Partition B's rows evenly into per-shard COO blocks of identical
    static capacity (padding rows = local row count sentinel).  One
    vectorized pass: CSR entry order is row-sorted, so shard boundaries
    are a searchsorted and the within-shard positions an arange split."""
    n = B.n
    per = -(-n // nshards)
    i, j, v = B.to_coo()
    bounds = np.searchsorted(i, np.arange(nshards + 1) * per)
    cnts = np.diff(bounds)
    if cnts.max(initial=0) > cap_per_shard:
        raise ValueError("cap_per_shard too small for shard nnz")
    rows_l = np.full((nshards, cap_per_shard), per, np.int32)
    cols_l = np.zeros((nshards, cap_per_shard), np.int32)
    vals_l = np.zeros((nshards, cap_per_shard), np.int32)
    sidx = np.repeat(np.arange(nshards), cnts)
    pos = np.arange(i.size) - np.repeat(bounds[:-1], cnts)
    rows_l[sidx, pos] = i - sidx * per
    cols_l[sidx, pos] = j
    vals_l[sidx, pos] = v
    return rows_l, cols_l, vals_l, per


def _fl_election_local(axis, per, m, rows, cols, shard_id):
    """Per-shard FL-row election (inside shard_map): for each column, the
    best (weight, global row) among local rows whose leftmost entry is
    that column, combined across shards with pmin."""
    live = rows < per
    rsafe = jnp.where(live, rows, per)
    csafe = jnp.where(live, cols, m)
    weight = jnp.zeros(per + 1, jnp.int32).at[rsafe].add(
        live.astype(jnp.int32))
    leftmost = jnp.full(per + 1, m, jnp.int32).at[rsafe].min(csafe)
    # park empty rows (weight 0 has leftmost m already) and the sentinel
    row_ids = jnp.arange(per + 1, dtype=jnp.int32)
    gid = shard_id * per + row_ids
    bw = jnp.full(m + 1, BIG, jnp.int32).at[leftmost].min(
        jnp.where(weight > 0, weight, BIG))
    bw_g = jax.lax.pmin(bw, axis)
    is_best = (weight > 0) & (weight == bw_g[leftmost])
    br = jnp.full(m + 1, BIG, jnp.int32).at[leftmost].min(
        jnp.where(is_best, gid, BIG))
    br_g = jax.lax.pmin(br, axis)
    return bw_g[:m], br_g[:m]


def sharded_fl_election(f: Field, mesh: Mesh, B: SparseGFp,
                        axis: str = "rows"):
    """Faugère-Lachartre row pivots elected on device over the mesh.

    Returns (rows, cols) in increasing pivot-column order — bit-identical
    to ``pivots.fl_row_pivots(B)`` (per column: the row of minimum
    (weight, row-id) among rows whose leftmost entry is that column),
    independent of shard count.  The distributed analog of
    ``spasm_pivots_extract_structural``'s FL phase
    (src/SpaSM.jl:775-778) with the conflict resolution as two pmin
    all-reduces (SURVEY.md section 2.11 item 2).
    """
    nshards = mesh.shape[axis]
    n, m = B.shape
    per_nnz = max(1, -(-B.nnz // nshards))
    cap = max(1024, 1 << (2 * per_nnz - 1).bit_length())
    rows_l, cols_l, vals_l, per = shard_rows(B, nshards, cap)
    sharding = NamedSharding(mesh, P(axis, None))
    rows_d = _global_put(rows_l, sharding)
    cols_d = _global_put(cols_l, sharding)

    def body(r_l, c_l):
        sid = jax.lax.axis_index(axis).astype(jnp.int32)
        bw, br = _fl_election_local(axis, per, m, r_l[0], c_l[0], sid)
        return bw, br

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(), P())))
    bw_g, br_g = fn(rows_d, cols_d)
    bw_g = np.asarray(jax.device_get(bw_g))
    br_g = np.asarray(jax.device_get(br_g))
    pcols = np.flatnonzero(bw_g < BIG).astype(np.int64)
    prows = br_g[pcols].astype(np.int64)
    return prows, pcols


def sharded_fl_col_election(f: Field, mesh: Mesh, B: SparseGFp,
                            col_selected, row_used, axis: str = "rows"):
    """Faugère-Lachartre "on columns" elected on device over the mesh —
    bit-identical to ``pivots.fl_col_pivots`` and shard-count invariant.

    Device phase (one shard_map): per shard, (a) the topmost candidate
    global row per unselected column (rows must be locally unused), pmin
    over the mesh; (b) each local row's count of entries in already-
    selected columns (the append-invariant check), returned row-sharded.
    Host phase: O(m) dedup (one pivot per row via min column), invariant
    filter, decreasing-row order — exactly the host strategy's steps.

    Masks are updated in place like ``fl_col_pivots``.  Returns
    (rows, cols) in decreasing-row order.
    """
    nshards = mesh.shape[axis]
    n, m = B.shape
    per_nnz = max(1, -(-B.nnz // nshards))
    cap = max(1024, 1 << (2 * per_nnz - 1).bit_length())
    rows_l, cols_l, vals_l, per = shard_rows(B, nshards, cap)
    ru_flat = np.zeros(nshards * per, np.int32)
    ru_flat[:n] = row_used
    ru_l = ru_flat.reshape(nshards, per)

    sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    rows_d = _global_put(rows_l, sharding)
    cols_d = _global_put(cols_l, sharding)
    ru_d = _global_put(ru_l, sharding)
    cs_d = _global_put(col_selected.astype(np.int32), rep)

    def body(r_l, c_l, ru_row, cs_):
        sid = jax.lax.axis_index(axis).astype(jnp.int32)
        rows, cols, ru1 = r_l[0], c_l[0], ru_row[0]
        live = rows < per
        rsafe = jnp.where(live, rows, per)
        csafe = jnp.where(live, cols, m)
        ru_pad = jnp.concatenate([ru1, jnp.ones((1,), jnp.int32)])
        cs_pad = jnp.concatenate([cs_, jnp.ones((1,), jnp.int32)])
        cand = live & (ru_pad[rsafe] == 0) & (cs_pad[csafe] == 0)
        gid = sid * per + rsafe
        mr = jnp.full(m + 1, BIG, jnp.int32).at[csafe].min(
            jnp.where(cand, gid, BIG))
        mr_g = jax.lax.pmin(mr, axis)
        hits = jnp.zeros(per + 1, jnp.int32).at[rsafe].add(
            (live & (cs_pad[csafe] == 1)).astype(jnp.int32))
        return mr_g[:m][None], hits[:per][None]

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=(P(), P(axis, None))))
    mr_g, hits_d = fn(rows_d, cols_d, ru_d, cs_d)
    mr_g = np.asarray(jax.device_get(mr_g)).ravel()[:m]
    hits = _global_get(hits_d).ravel()[:n]
    cols_c = np.flatnonzero(mr_g < BIG).astype(np.int64)
    rows_c = mr_g[cols_c].astype(np.int64)
    if rows_c.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # one pivot per row: keep the smallest column of each winner row
    from ..native import scatter_min

    min_col = np.full(n, m, np.int64)
    scatter_min(min_col, rows_c, cols_c)
    keep = min_col[rows_c] == cols_c
    rows_c, cols_c = rows_c[keep], cols_c[keep]
    order = np.argsort(rows_c, kind="stable")
    rows_c, cols_c = rows_c[order], cols_c[order]
    ok = hits[rows_c] == 0
    rows_c, cols_c = rows_c[ok], cols_c[ok]
    rows_c, cols_c = rows_c[::-1].copy(), cols_c[::-1].copy()
    row_used[rows_c] = True
    col_selected[cols_c] = True
    return rows_c, cols_c


def sharded_sparse_eliminate(f: Field, mesh: Mesh, U: SparseGFp, piv_cols,
                             levels, B: SparseGFp, cap_factor: int = 8,
                             axis: str = "rows"):
    """Eliminate U's pivot columns from all rows of B, rows sharded over
    the mesh.  Returns the eliminated SparseGFp or None on any shard's
    capacity overflow (caller falls back to the host waves)."""
    nshards = mesh.shape[axis]
    npiv, m = U.shape
    if npiv == 0:
        return B
    per_nnz = max(1, -(-B.nnz // nshards))
    cap = max(1024, 1 << int(cap_factor * per_nnz - 1).bit_length())
    cap_hits = max(256, cap // 8)
    rows_l, cols_l, vals_l, per = shard_rows(B, nshards, cap)

    u_cols, u_vals = ell_pack(U)
    col2piv = np.full(m, -1, np.int64)
    col2piv[np.asarray(piv_cols)] = np.arange(npiv)
    depth = int(np.asarray(levels).max()) + 1

    sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    rows_d = _global_put(rows_l, sharding)
    cols_d = _global_put(cols_l, sharding)
    vals_d = _global_put(vals_l, sharding)
    uc = _global_put(np.asarray(u_cols, np.int32), rep)
    uv = _global_put(np.asarray(u_vals, np.int32), rep)
    pcd = _global_put(np.asarray(piv_cols, np.int32), rep)
    lvd = _global_put(np.asarray(levels, np.int32), rep)
    c2p = _global_put(np.asarray(col2piv, np.int32), rep)

    def body(r_l, c_l, v_l, uc_, uv_, pc_, lv_, c2p_):
        rr, cc, vv, nnz, ovf = wave_eliminate_device(
            f, cap, cap_hits, depth, r_l[0], c_l[0], v_l[0],
            uc_, uv_, pc_, lv_, c2p_, per)
        return (rr[None], cc[None], vv[None], nnz[None], ovf[None])

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P(), P(), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None),
                   P(axis), P(axis)))
    rr, cc, vv, nnz, ovf = fn(rows_d, cols_d, vals_d, uc, uv, pcd, lvd, c2p)
    if bool(_global_get(ovf).any()):
        return None
    rr = _global_get(rr)
    cc = _global_get(cc)
    vv = _global_get(vv)
    # vectorized reassembly: local row + shard offset in one broadcast,
    # one boolean compress over all shards (the per-shard Python loop
    # cost O(nshards) passes at scale)
    keep = rr < per
    gids = (rr.astype(np.int64)
            + (np.arange(nshards, dtype=np.int64) * per)[:, None])
    return SparseGFp.from_coo(
        f, B.n, m, gids[keep], cc[keep].astype(np.int64),
        vv[keep].astype(np.int64), sum_duplicates=False)
